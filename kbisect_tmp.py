import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(0)
B, Hq, Hkv, D, P, BP = 256, 14, 2, 64, 64, 4
G = Hq//Hkv
C = 2048
pps = C//P
n_pages = B*C//P
row = Hkv*2*D
NEG = -1e30
LEN = 1024
kv_l = jnp.zeros(((n_pages+1)*P, row), jnp.bfloat16)
tbl = jnp.asarray(rng.integers(1, n_pages, (B, pps)), jnp.int32)
lens = jnp.full((B,), LEN, jnp.int32)
q0 = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)

def make(mode):
    def kernel(lens_ref, tbl_ref, q_ref, kv_hbm, out_ref, bufs, sems, slot_ref):
        b = pl.program_id(0)
        N = BP*P
        nb = pl.cdiv(lens_ref[b], N)
        nv = pl.cdiv(lens_ref[b], P)
        def copies(blk, slot):
            out = []
            for i in range(BP):
                pidx = jnp.minimum(blk*BP+i, pps-1)
                pid = jnp.where(blk*BP+i < nv, tbl_ref[b, pidx], 0)
                out.append(pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(pl.multiple_of(pid*P, P), P)],
                    bufs.at[slot, i], sems.at[slot]))
            return out
        if mode == "empty":
            out_ref[0] = q_ref[0]
            return
        if mode == "compute_only":
            def body(blk, carry):
                m, l, acc = carry
                kvb = bufs[jax.lax.rem(blk, 2)]
                pos = blk*N + jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
                valid = pos < lens_ref[b]
                mo, lo, ao = [], [], []
                for h in range(Hkv):
                    k_h = kvb[:, :, 2*h*D:(2*h+1)*D].reshape(N, D).astype(jnp.float32)
                    v_h = kvb[:, :, (2*h+1)*D:(2*h+2)*D].reshape(N, D).astype(jnp.float32)
                    q_h = q_ref[0, h*G:(h+1)*G, :].astype(jnp.float32)
                    s = jax.lax.dot_general(q_h, k_h, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
                    s = jnp.where(valid, s, NEG)
                    m_h = jnp.maximum(m[h], jnp.max(s, 1, keepdims=True))
                    p = jnp.exp(s - m_h)
                    a = jnp.exp(m[h] - m_h)
                    l_h = a*l[h] + jnp.sum(p, 1, keepdims=True)
                    pv = jax.lax.dot_general(p, v_h, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
                    mo.append(m_h); lo.append(l_h); ao.append(a*acc[h]+pv)
                return tuple(mo), tuple(lo), tuple(ao)
            init = (tuple(jnp.full((G,1), NEG, jnp.float32) for _ in range(Hkv)),
                    tuple(jnp.zeros((G,1), jnp.float32) for _ in range(Hkv)),
                    tuple(jnp.zeros((G,D), jnp.float32) for _ in range(Hkv)))
            m, l, acc = jax.lax.fori_loop(0, nb, body, init)
            for h in range(Hkv):
                out_ref[0, h*G:(h+1)*G, :] = (acc[h]/jnp.maximum(l[h],1e-30)).astype(out_ref.dtype)
            return
        # dma_only
        @pl.when((b == 0) & (nb > 0))
        def _():
            for c in copies(0, 0): c.start()
        def body(blk, acc):
            slot = jax.lax.rem(blk, 2)
            @pl.when(blk+1 < nb)
            def _():
                for c in copies(blk+1, jax.lax.rem(blk+1, 2)): c.start()
            for c in copies(blk, slot): c.wait()
            return acc + jnp.sum(bufs[slot, 0, 0, :].astype(jnp.float32))
        acc = jax.lax.fori_loop(0, nb, body, jnp.float32(0))
        out_ref[0] = (q_ref[0].astype(jnp.float32) + acc).astype(out_ref.dtype)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,),
        in_specs=[pl.BlockSpec((1, Hq, D), lambda b, l, t: (b, 0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, l, t: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, BP, P, row), kv_l.dtype),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SMEM((1,), jnp.int32)])
    single = lambda q: pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype))(lens, tbl, q, kv_l)
    def chain24(q):
        for _ in range(24):
            q = single(q)
        return q
    return jax.jit(chain24)

from tpusgl.ops.paged_attention import paged_decode_attention
def real_chain(q):
    x = q
    for _ in range(24):
        x = paged_decode_attention(x, kv_l, lens, tbl, num_kv_heads=Hkv, page_size=P, pages_per_block=BP)
    return x
modes = [("empty", make("empty")), ("dma_only", make("dma_only")),
         ("compute_only", make("compute_only")), ("real", jax.jit(real_chain))]
for name, f in modes:
    r = f(q0); np.asarray(r)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        r = f(r)
        np.asarray(r)
    dt = (time.perf_counter()-t0)/n
    per_layer = (dt)/24
    byt = B*LEN*row*2
    print(f"{name:13s}: {dt*1e3:.1f}ms/24calls = {per_layer*1e6:.0f}us/layer -> {byt/per_layer/1e9:.0f} GB/s", flush=True)
