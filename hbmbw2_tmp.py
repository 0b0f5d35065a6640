import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
rng = np.random.default_rng(0)
n = 10

# 2D reduce
x = jnp.asarray(rng.normal(size=(524288, 256)), jnp.bfloat16)  # 268MB
f = jax.jit(lambda x, c: jnp.sum((x.astype(jnp.float32) * c)))
r = f(x, 1.0); np.asarray(r)
t0 = time.perf_counter()
for i in range(n):
    r = f(x, float(i)); np.asarray(r)
dt = (time.perf_counter()-t0)/n
print(f"2D reduce 268MB: {dt*1e3:.2f}ms -> {268e6/dt/1e9:.0f} GB/s read", flush=True)

# matmul weight-read, w as arg
w = jnp.asarray(rng.normal(size=(24, 896, 9728)), jnp.bfloat16)
a0 = jnp.asarray(rng.normal(size=(256, 896)), jnp.bfloat16)
def mm_chain(a, w):
    x = a
    for i in range(24):
        y = jnp.dot(x, w[i], preferred_element_type=jnp.float32)
        x = (y[:, :896] + y[:, 896:2*896]*0.1).astype(jnp.bfloat16)
    return x
f3 = jax.jit(mm_chain)
r = f3(a0, w); np.asarray(r)
t0 = time.perf_counter()
for _ in range(n):
    r = f3(r, w); np.asarray(r)
dt = (time.perf_counter()-t0)/n/24
print(f"matmul wread 17.4MB: {dt*1e6:.0f}us/layer -> {896*9728*2/dt/1e9:.0f} GB/s", flush=True)

# int8 weights same shapes
w8 = jnp.asarray(rng.integers(-127, 127, (24, 896, 9728)), jnp.int8)
s8 = jnp.ones((24, 9728), jnp.float32)
def mm8_chain(a, w8, s8):
    x = a
    for i in range(24):
        y = jnp.dot(x, w8[i].astype(jnp.bfloat16), preferred_element_type=jnp.float32) * s8[i]
        x = (y[:, :896] + y[:, 896:2*896]*0.1).astype(jnp.bfloat16)
    return x
f4 = jax.jit(mm8_chain)
r = f4(a0, w8, s8); np.asarray(r)
t0 = time.perf_counter()
for _ in range(n):
    r = f4(r, w8, s8); np.asarray(r)
dt = (time.perf_counter()-t0)/n/24
print(f"int8 matmul wread 8.7MB: {dt*1e6:.0f}us/layer -> {896*9728/dt/1e9:.0f} GB/s", flush=True)
