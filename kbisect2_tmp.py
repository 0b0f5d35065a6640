import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from tpusgl.ops.paged_attention import paged_decode_attention

rng = np.random.default_rng(0)
B, Hq, Hkv, D = 256, 14, 2, 64
C = 2048
LEN = 1024

def chain(P, BP, SB, n_layers=24, **kw):
    pps = C//P
    n_pages = B*C//P
    kv_l = jnp.zeros(((n_pages+1)*P, Hkv*2*D), jnp.bfloat16)
    tbl = jnp.asarray(rng.integers(1, n_pages, (B, pps)), jnp.int32)
    lens = jnp.full((B,), LEN, jnp.int32)
    def f(q):
        x = q
        for _ in range(n_layers):
            x = paged_decode_attention(x, kv_l, lens, tbl, num_kv_heads=Hkv,
                                       page_size=P, pages_per_block=BP,
                                       seqs_per_block=SB, **kw)
        return x
    return jax.jit(f)

q0 = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
for (P, BP, SB) in [(64, 4, 16), (64, 4, 1), (128, 2, 16), (64, 8, 32), (256, 1, 16)]:
    f = chain(P, BP, SB)
    r = f(q0); np.asarray(r)
    t0 = time.perf_counter(); n = 10
    for _ in range(n):
        r = f(q0); np.asarray(r)
    dt = (time.perf_counter()-t0)/n
    per = dt/24
    byt = B*LEN*Hkv*2*D*2
    print(f"P={P} BP={BP} SB={SB}: {dt*1e3:.1f}ms/24 = {per*1e6:.0f}us/layer -> {byt/per/1e9:.0f} GB/s", flush=True)
