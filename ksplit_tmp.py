import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(0)
B, Hq, Hkv, D = 256, 14, 2, 64
G = Hq//Hkv
C, LEN = 2048, 1024
NEG = -1e30

def make(mode, P, BP, SB):
    pps = C//P
    n_pages = B*C//P
    row = Hkv*2*D
    kv_l = jnp.zeros(((n_pages+1)*P, row), jnp.bfloat16)
    tbl = jnp.asarray(rng.integers(1, n_pages, (B, pps)), jnp.int32)
    lens = jnp.full((B,), LEN, jnp.int32)
    N = BP*P

    def kernel(lens_ref, tbl_ref, q_ref, kv_hbm, out_ref, bufs, sems, slot_ref):
        g = pl.program_id(0)
        def nblocks(seq): return pl.cdiv(lens_ref[seq], N)
        def copies(seq, blk, slot):
            nv = pl.cdiv(lens_ref[seq], P)
            out = []
            for i in range(BP):
                pidx = jnp.minimum(blk*BP+i, pps-1)
                pid = jnp.where(blk*BP+i < nv, tbl_ref[seq, pidx], 0)
                out.append(pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(pl.multiple_of(pid*P, P), P)],
                    bufs.at[slot, i], sems.at[slot]))
            return out
        def start(seq, blk, slot):
            if mode == "compute_only": return
            for c in copies(seq, blk, slot): c.start()
        def start_next(after_b, slot):
            @pl.when(after_b + 1 < B)
            def _():
                @pl.when(nblocks(after_b+1) > 0)
                def _():
                    start(after_b+1, 0, slot)
        @pl.when(g == 0)
        def _():
            slot_ref[0] = 0
            @pl.when(nblocks(0) > 0)
            def _():
                start(0, 0, 0)
        cur = slot_ref[0]
        for s in range(SB):
            b = g*SB + s
            nb = nblocks(b)
            @pl.when(nb > 0)
            def _run(b=b, s=s, nb=nb, cur=cur):
                kv_len = lens_ref[b]
                def body(blk, carry):
                    m, l, acc = carry
                    slot = jax.lax.rem(cur+blk, 2)
                    nslot = jax.lax.rem(cur+blk+1, 2)
                    @pl.when(blk+1 < nb)
                    def _():
                        start(b, blk+1, nslot)
                    @pl.when(blk+1 == nb)
                    def _():
                        start_next(b, nslot)
                    if mode != "compute_only":
                        for c in copies(b, blk, slot): c.wait()
                    if mode == "dma_only":
                        t = bufs[slot, 0, 0, 0:128].astype(jnp.float32)
                        return (m[0]+jnp.sum(t),)*1 + m[1:], l, acc
                    kvb = bufs[slot]
                    pos = blk*N + jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
                    valid = pos < kv_len
                    mo, lo, ao = [], [], []
                    for h in range(Hkv):
                        k_h = kvb[:, :, 2*h*D:(2*h+1)*D].reshape(N, D).astype(jnp.float32)
                        v_h = kvb[:, :, (2*h+1)*D:(2*h+2)*D].reshape(N, D).astype(jnp.float32)
                        q_h = q_ref[s, h*G:(h+1)*G, :].astype(jnp.float32)
                        sc = jax.lax.dot_general(q_h, k_h, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
                        sc = jnp.where(valid, sc, NEG)
                        m_h = jnp.maximum(m[h], jnp.max(sc, 1, keepdims=True))
                        p = jnp.exp(sc - m_h)
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
                    out_ref[s, h*G:(h+1)*G, :] = (acc[h]/jnp.maximum(l[h], 1e-30)).astype(out_ref.dtype)
            @pl.when(nb == 0)
            def _empty(b=b, s=s, cur=cur):
                start_next(b, cur)
                out_ref[s] = jnp.zeros((Hq, D), out_ref.dtype)
            cur = jax.lax.rem(cur + nb, 2)
        slot_ref[0] = cur

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B//SB,),
        in_specs=[pl.BlockSpec((SB, Hq, D), lambda g, l, t: (g, 0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((SB, Hq, D), lambda g, l, t: (g, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, BP, P, row), kv_l.dtype),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SMEM((1,), jnp.int32)])
    single = lambda q: pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype))(lens, tbl, q, kv_l)
    def chain(q):
        x = q
        for _ in range(24):
            x = single(x)
        return x
    return jax.jit(chain)

q0 = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
byt = B*LEN*Hkv*2*D*2
for mode in ("dma_only", "compute_only", "full"):
    for (P, BP, SB) in [(32, 8, 16), (128, 4, 16)]:
        f = make(mode, P, BP, SB)
        r = f(q0); np.asarray(r)
        t0 = time.perf_counter(); n = 10
        for _ in range(n):
            r = f(q0); np.asarray(r)
        dt = (time.perf_counter()-t0)/n/24
        print(f"{mode:13s} P={P} BP={BP}: {dt*1e6:.0f}us/layer -> {byt/dt/1e9:.0f} GB/s", flush=True)
