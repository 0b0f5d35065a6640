import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
rng = np.random.default_rng(0)

GB = 268*1024*1024  # 268MB bf16 elems
x = jnp.asarray(rng.normal(size=(GB//2,)), jnp.bfloat16)  # 268MB? no: GB//2 elems * 2B = 268MB
def red_chain(x, q):
    acc = q
    for _ in range(8):
        acc = acc + jnp.sum((x * acc[0]).astype(jnp.float32))[None]
    return acc
f = jax.jit(red_chain)
q = jnp.ones((1,), jnp.float32)
r = f(x, q); np.asarray(r)
n = 10
t0 = time.perf_counter()
for _ in range(n):
    r = f(x, r); np.asarray(r)
dt = (time.perf_counter()-t0)/n/8
print(f"reduce 268MB: {dt*1e3:.2f}ms -> {268e6/dt/1e9*1.048:.0f} GB/s read", flush=True)

# copy bandwidth: y = x + c chained
def copy_chain(x):
    for _ in range(4):
        x = x + jnp.bfloat16(1)
    return x
f2 = jax.jit(copy_chain, donate_argnums=0)
y = f2(x); 
t0 = time.perf_counter()
for _ in range(n):
    y = f2(y)
np.asarray(y[:8])
dt = (time.perf_counter()-t0)/n/4
print(f"add 268MB (r+w): {dt*1e3:.2f}ms -> {2*268e6/dt/1e9*1.048:.0f} GB/s", flush=True)

# matmul weight-read at 24-layer scale: [256,896]x[896,9728] chained
w = jnp.asarray(rng.normal(size=(24, 896, 9728)), jnp.bfloat16)
a = jnp.asarray(rng.normal(size=(256, 896)), jnp.bfloat16)
def mm_chain(a):
    x = a
    for i in range(24):
        y = jnp.dot(x, w[i], preferred_element_type=jnp.float32)
        x = (y[:, :896] + y[:, 896:2*896]*0.1).astype(jnp.bfloat16)
    return x
f3 = jax.jit(mm_chain)
r = f3(a); np.asarray(r)
t0 = time.perf_counter()
for _ in range(n):
    r = f3(a); np.asarray(r)
dt = (time.perf_counter()-t0)/n/24
print(f"matmul wread 17.4MB: {dt*1e6:.0f}us/layer -> {896*9728*2/dt/1e9:.0f} GB/s", flush=True)
