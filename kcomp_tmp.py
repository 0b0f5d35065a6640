import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from tpusgl.ops.paged_attention import paged_decode_attention
from jax.experimental.pallas.ops.tpu.ragged_paged_attention import ragged_paged_attention as rpa

rng = np.random.default_rng(0)
B, Hq, Hkv, D = 256, 12, 2, 128
C, LEN = 2048, 1024
P = 32
pps = C//P
n_pages = B*C//P

# ---- library kernel, 24 chained ----
kv_pages = jnp.zeros((n_pages, P, 2*Hkv, D), jnp.bfloat16)
page_indices = jnp.asarray(rng.integers(1, n_pages, (B, pps)), jnp.int32)
kv_lens = jnp.full((B,), LEN, jnp.int32)
cu = jnp.arange(B+1, dtype=jnp.int32)
ns = jnp.array([B], jnp.int32)
def lib_chain(q):
    x = q
    for _ in range(24):
        x = rpa(x, kv_pages, kv_lens, page_indices, cu, ns, sm_scale=D**-0.5)
    return x
q0 = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
f = jax.jit(lib_chain)
r = f(q0); np.asarray(r)
t0 = time.perf_counter(); n = 10
for _ in range(n):
    r = f(q0); np.asarray(r)
dt = (time.perf_counter()-t0)/n
byt = B*LEN*Hkv*2*D*2
print(f"library rpa 24x: {dt*1e3:.1f}ms = {dt/24*1e6:.0f}us/layer -> {byt/(dt/24)/1e9:.0f} GB/s", flush=True)

# ---- mine, same geometry ----
kv_l = jnp.zeros(((n_pages+1)*P, Hkv*2*D), jnp.bfloat16)
tbl = jnp.asarray(rng.integers(1, n_pages, (B, pps)), jnp.int32)
for SB, BP in [(16, 8), (256, 8)]:
    def mine(q, SB=SB, BP=BP):
        x = q
        for _ in range(24):
            x = paged_decode_attention(x, kv_l, kv_lens, tbl, num_kv_heads=Hkv,
                                       page_size=P, pages_per_block=BP, seqs_per_block=SB)
        return x
    f = jax.jit(mine)
    r = f(q0); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(q0); np.asarray(r)
    dt = (time.perf_counter()-t0)/n
    print(f"mine SB={SB} BP={BP} 24x: {dt*1e3:.1f}ms = {dt/24*1e6:.0f}us/layer -> {byt/(dt/24)/1e9:.0f} GB/s", flush=True)
