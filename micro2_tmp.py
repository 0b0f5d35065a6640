import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(0)
def timeit(f, *a, n=50):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n

# ---- 1. int8 weight matmul: does XLA fuse dequant? 0.5B mlp shape ----
IN, OUT, B = 896, 9728, 256
w8 = jnp.asarray(rng.integers(-127, 127, (IN, OUT)), jnp.int8)
s = jnp.asarray(rng.random(OUT), jnp.float32)
wb = jnp.asarray(rng.normal(size=(IN, OUT)), jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(B, IN)), jnp.bfloat16)
f_bf = jax.jit(lambda x, w: x @ w)
f_i8 = jax.jit(lambda x, w, s: ((jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)) * s).astype(x.dtype))
dt = timeit(f_bf, x, wb);  print(f"bf16 matmul   [{B},{IN}]x[{IN},{OUT}]: {dt*1e6:.0f}us -> {(IN*OUT*2)/dt/1e9:.0f} GB/s wread", flush=True)
dt = timeit(f_i8, x, w8, s); print(f"int8 matmul  (cast path)        : {dt*1e6:.0f}us -> {(IN*OUT)/dt/1e9:.0f} GB/s wread", flush=True)
# int8 with int32 accum (native int8 MXU path needs int8 x too; try bf16 dot with int8 cast only)
f_i8b = jax.jit(lambda x, w, s: (jax.lax.dot_general(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (((1,),(0,)),((),())), preferred_element_type=jnp.float32) * s).astype(jnp.bfloat16))
dt = timeit(f_i8b, x, w8, s); print(f"int8 matmul  (bf16 cast)        : {dt*1e6:.0f}us -> {(IN*OUT)/dt/1e9:.0f} GB/s wread", flush=True)

# ---- 2. decode kernel tuning at B=256 ----
import tpusgl.ops.paged_attention as pa
Hq, Hkv, D = 14, 2, 64
def kperf(P, BP, B, LEN, C=2048, dtype=jnp.bfloat16):
    pps = C//P
    n_pages = (B*C)//P
    kv_l = jnp.zeros(((n_pages+1)*P, Hkv*2*D), dtype)
    tbl = jnp.asarray(rng.integers(1, n_pages, (B, pps)), jnp.int32)
    lens = jnp.full((B,), LEN, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
    f = jax.jit(functools.partial(pa.paged_decode_attention, num_kv_heads=Hkv, page_size=P, pages_per_block=BP))
    dt = timeit(f, q, kv_l, lens, tbl)
    byt = B*LEN*Hkv*2*D*jnp.dtype(dtype).itemsize
    print(f"kernel P={P} BP={BP} B={B} len={LEN}: {dt*1e6:.0f}us -> {byt/dt/1e9:.1f} GB/s", flush=True)

kperf(32, 8, 256, 1024)
kperf(32, 16, 256, 1024)
kperf(64, 8, 256, 1024)
kperf(64, 4, 256, 1024)
kperf(128, 2, 256, 1024)
kperf(32, 8, 32, 1024)
kperf(64, 8, 32, 1024)
kperf(64, 16, 256, 1024)
