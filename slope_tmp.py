import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
rng = np.random.default_rng(0)

def slope(make_chain, args, k1=8, k2=32, n=8):
    """per-unit time via (T(k2)-T(k1))/(k2-k1), min over n trials."""
    f1, f2 = jax.jit(make_chain(k1)), jax.jit(make_chain(k2))
    np.asarray(f1(*args)); np.asarray(f2(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1 = time.perf_counter()
        np.asarray(f2(*args)); t2 = time.perf_counter()
        best = min(best, ((t2-t1) - (t1-t0)) / (k2-k1))
    return best

x = jnp.asarray(rng.normal(size=(524288, 256)), jnp.bfloat16)  # 268MB
def mk_reduce(k):
    def f(x):
        acc = jnp.float32(0)
        for i in range(k):
            acc = acc + jnp.sum(x.astype(jnp.float32)) * (1.0 + acc*0)
        return acc
    return f
dt = slope(mk_reduce, (x,))
print(f"reduce 268MB: {dt*1e3:.2f}ms -> {268e6/dt/1e9:.0f} GB/s read", flush=True)

w = jnp.asarray(rng.normal(size=(897*9728,)), jnp.bfloat16)
wm = w[:896*9728].reshape(896, 9728)
a0 = jnp.asarray(rng.normal(size=(256, 896)), jnp.bfloat16)
def mk_mm(k):
    def f(a0, wm):
        xx = a0
        for i in range(k):
            y = jnp.dot(xx, wm, preferred_element_type=jnp.float32)
            xx = (y[:, :896] + y[:, 896:2*896]*0.1).astype(jnp.bfloat16)
        return xx
    return f
dt = slope(mk_mm, (a0, wm))
print(f"matmul wread 17.4MB: {dt*1e6:.0f}us -> {896*9728*2/dt/1e9:.0f} GB/s", flush=True)

# contig attention layer (0.5B geom, R=256, C=2048)
R, C, Hq, Hkv, D = 256, 2048, 14, 2, 64
G = Hq//Hkv
kv = jnp.asarray(rng.normal(size=(R, C, Hkv*2*D)), jnp.bfloat16)
lens = jnp.full((R,), 1024, jnp.int32)
q0 = jnp.asarray(rng.normal(size=(R, Hq, D)), jnp.bfloat16)
def attn(q, kv, lens):
    kvr = kv.reshape(R, C, Hkv, 2, D)
    k = kvr[:, :, :, 0, :]; v = kvr[:, :, :, 1, :]
    qg = q.reshape(R, Hkv, G, D)
    s = jnp.einsum("bkgd,bckd->bkgc", qg, k, preferred_element_type=jnp.float32) * (D**-0.5)
    mask = (jnp.arange(C, dtype=jnp.int32)[None, :] < lens[:, None])[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("bkgc,bckd->bkgd", p, v, preferred_element_type=jnp.float32)
    return o.reshape(R, Hq, D).astype(q.dtype)
def mk_attn(k):
    def f(q0, kv, lens):
        xx = q0
        for _ in range(k):
            xx = attn(xx, kv, lens)
        return xx
    return f
dt = slope(mk_attn, (q0, kv, lens))
print(f"contig attn 268MB cache: {dt*1e6:.0f}us -> {R*C*Hkv*2*D*2/dt/1e9:.0f} GB/s", flush=True)

# my paged kernel
from tpusgl.ops.paged_attention import paged_decode_attention
P = 64
n_pages = R*C//P
kv_l = jnp.zeros(((n_pages+1)*P, Hkv*2*D), jnp.bfloat16)
tbl = jnp.asarray(rng.integers(1, n_pages, (R, C//P)), jnp.int32)
def mk_pal(k):
    def f(q0, kv_l, lens, tbl):
        xx = q0
        for _ in range(k):
            xx = paged_decode_attention(xx, kv_l, lens, tbl, num_kv_heads=Hkv,
                                        page_size=P, pages_per_block=8, seqs_per_block=16)
        return xx
    return f
dt = slope(mk_pal, (q0, kv_l, lens, tbl))
print(f"paged kernel (134MB useful): {dt*1e6:.0f}us -> {R*1024*Hkv*2*D*2/dt/1e9:.0f} GB/s", flush=True)
