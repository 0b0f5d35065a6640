import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from tpusgl.ops.paged_attention import paged_decode_attention

rng = np.random.default_rng(0)
C, LEN, n = 2048, 1024, 10

def bench(name, Hq, Hkv, D, P, BP, SB, B=256):
    pps = C//P
    n_pages = B*C//P
    kv_l = jnp.zeros(((n_pages+1)*P, Hkv*2*D), jnp.bfloat16)
    tbl = jnp.asarray(rng.integers(1, n_pages, (B, pps)), jnp.int32)
    lens = jnp.full((B,), LEN, jnp.int32)
    q0 = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
    def f(q):
        x = q
        for _ in range(24):
            x = paged_decode_attention(x, kv_l, lens, tbl, num_kv_heads=Hkv,
                                       page_size=P, pages_per_block=BP, seqs_per_block=SB)
        return x
    f = jax.jit(f)
    r = f(q0); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(q0); np.asarray(r)
    dt = (time.perf_counter()-t0)/n
    byt = B*LEN*Hkv*2*D*2
    print(f"{name}: {dt/24*1e6:.0f}us/layer -> {byt/(dt/24)/1e9:.0f} GB/s", flush=True)

bench("0.5B P=32 BP=32 SB=16", 14, 2, 64, 32, 32, 16)
bench("0.5B P=64 BP=16 SB=16", 14, 2, 64, 64, 16, 16)
bench("0.5B P=64 BP=32 SB=16", 14, 2, 64, 64, 32, 16)
bench("0.5B P=128 BP=16 SB=16", 14, 2, 64, 128, 16, 16)
bench("1.5B P=64 BP=16 SB=16", 12, 2, 128, 64, 16, 16)
bench("1.5B P=64 BP=32 SB=16", 12, 2, 128, 64, 32, 16)
