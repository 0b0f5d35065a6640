import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(0)
R, C = 256, 2048
Hq, Hkv, D = 14, 2, 64
G = Hq//Hkv
LEN = 1024

# contiguous cache per layer: [R, C, Hkv, 2, D] -> store as [R, C, Hkv*2*D]
kv = jnp.zeros((R, C, Hkv*2*D), jnp.bfloat16)
seq_lens = jnp.full((R,), LEN, jnp.int32)
q0 = jnp.asarray(rng.normal(size=(R, Hq, D)), jnp.bfloat16)

def attn(q, kv, seq_lens):
    B = q.shape[0]
    kvr = kv.reshape(B, C, Hkv, 2, D)
    k = kvr[:, :, :, 0, :]  # [B, C, Hkv, D]
    v = kvr[:, :, :, 1, :]
    qg = q.reshape(B, Hkv, G, D)
    s = jnp.einsum("bkgd,bckd->bkgc", qg.astype(jnp.float32), k.astype(jnp.float32)) * (D**-0.5)
    mask = (jnp.arange(C, dtype=jnp.int32)[None, :] < seq_lens[:, None])[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgc,bckd->bkgd", p, v.astype(jnp.float32))
    return o.reshape(B, Hq, D).astype(q.dtype)

def chain(q):
    x = q
    for _ in range(24):
        x = attn(x, kv, seq_lens)
    return x
f = jax.jit(chain)
r = f(q0); np.asarray(r)
n = 10
t0 = time.perf_counter()
for _ in range(n):
    r = f(q0); np.asarray(r)
dt = (time.perf_counter()-t0)/n/24
byt = R*C*Hkv*2*D*2  # full cache read
print(f"contig jnp attn: {dt*1e6:.0f}us/layer -> {byt/dt/1e9:.0f} GB/s cache-stream ({R*LEN*Hkv*2*D*2/dt/1e9:.0f} GB/s useful)", flush=True)

# bf16 scores variant (halve score traffic)
def attn16(q, kv, seq_lens):
    B = q.shape[0]
    kvr = kv.reshape(B, C, Hkv, 2, D)
    k = kvr[:, :, :, 0, :]; v = kvr[:, :, :, 1, :]
    qg = q.reshape(B, Hkv, G, D)
    s = jnp.einsum("bkgd,bckd->bkgc", qg, k, preferred_element_type=jnp.float32) * (D**-0.5)
    mask = (jnp.arange(C, dtype=jnp.int32)[None, :] < seq_lens[:, None])[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("bkgc,bckd->bkgd", p, v, preferred_element_type=jnp.float32)
    return o.reshape(B, Hq, D).astype(q.dtype)
f = jax.jit(lambda q: functools.reduce(lambda x, _: attn16(x, kv, seq_lens), range(24), q))
r = f(q0); np.asarray(r)
t0 = time.perf_counter()
for _ in range(n):
    r = f(q0); np.asarray(r)
dt = (time.perf_counter()-t0)/n/24
print(f"contig jnp bf16: {dt*1e6:.0f}us/layer -> {byt/dt/1e9:.0f} GB/s cache-stream", flush=True)
