"""Minimal repro of the XLA MSA S(1) staging waste (VERDICT r4 #2).

The decode program (window 8 x 28 layers) shows ~3.0-3.5 ms/iteration of
memory-space-assignment copies (ops whose output layout carries ":S(1)")
around the paged-attention kernel calls and KV scatters. This script
reproduces the program shape in isolation — L layers x W window of
[scatter new KV] -> [pallas paged-attention] over multi-GB pools — and
aggregates device time by op, splitting out S(1)-annotated copies, so
program-structure variants can be compared quickly.

Variants:
  --variant base       write_kv scatter + kernel per layer (prod shape)
  --variant nokernel   scatter only (isolates: does the KERNEL cause it?)
  --variant noscatter  kernel only (isolates: does the SCATTER cause it?)
  --variant stacked    one [L, rows, W] pool instead of L separate arrays

Usage: python tools/repro_msa_staging.py --variant base --layers 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tpusgl.ops.attention import scale_rows_per_page
from tpusgl.ops.paged_attention import paged_decode_attention


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base",
                    choices=["base", "nokernel", "noscatter", "stacked"])
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--live", type=int, default=90)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--trace-dir", default="/tmp/repro_msa")
    args = ap.parse_args()

    B, Hq, Hkv, D, P, BP = args.batch, 28, 4, 128, 128, 8
    L, W = args.layers, args.window
    pages_per_seq = 17
    n_pages = args.live * pages_per_seq
    rows_total = (n_pages + 1) * P
    R8 = scale_rows_per_page(Hkv)

    rng = np.random.default_rng(0)
    tbl = np.zeros((B, pages_per_seq), np.int32)
    for b in range(args.live):
        tbl[b] = 1 + b * pages_per_seq + np.arange(pages_per_seq)
    lens = np.zeros((B,), np.int32)
    lens[: args.live] = np.sort(rng.integers(100, 1125, args.live))[::-1]
    tbl_j = jnp.asarray(tbl)

    def make_pool():
        kv = jnp.asarray(
            rng.integers(-127, 127, (rows_total, Hkv * 2 * D)), jnp.int8
        )
        sc = jnp.asarray(
            rng.uniform(0.01, 0.05, ((rows_total // P) * R8, P)), jnp.float32
        )
        return kv, sc

    if args.variant == "stacked":
        kv0, sc0 = make_pool()
        kv_all = jnp.broadcast_to(kv0, (L,) + kv0.shape).copy()
        sc_all = jnp.broadcast_to(sc0, (L,) + sc0.shape).copy()
        pools = (kv_all, sc_all)
    else:
        pools = tuple(make_pool() for _ in range(L))

    q0 = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
    kn0 = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.bfloat16)
    # each window step writes B new tokens at per-request slots
    out_loc = jnp.asarray(
        (np.arange(B) * pages_per_seq * P + (lens % P))[:, None], np.int32
    )
    lens_j = jnp.asarray(lens)

    from tpusgl.ops.attention import write_kv

    def step(pools, q, k_new, v_new):
        outs = []
        for li in range(L):
            if args.variant == "stacked":
                kv_l = (pools[0][li], pools[1][li])
            else:
                kv_l = pools[li]
            for w in range(W):
                if args.variant != "noscatter":
                    kv_l = write_kv(k_new, v_new, kv_l, out_loc)
                if args.variant != "nokernel":
                    o = paged_decode_attention(
                        q, kv_l[0], lens_j, tbl_j,
                        num_kv_heads=Hkv, page_size=P, pages_per_block=BP,
                        kv_scale=kv_l[1],
                    )
                    q = (q + 0.0 * o).astype(q.dtype)  # chain dependence
            if args.variant == "stacked":
                pools = (pools[0].at[li].set(kv_l[0]),
                         pools[1].at[li].set(kv_l[1]))
            else:
                pools = pools[:li] + (kv_l,) + pools[li + 1 :]
            outs.append(q)
        return pools, q

    fn = jax.jit(step, donate_argnums=(0,))
    pools, o = fn(pools, q0, kn0, kn0)
    jax.block_until_ready(o)
    print("compiled", file=sys.stderr)

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        pools, o = fn(pools, q0, kn0, kn0)
    jax.block_until_ready(o)
    jax.profiler.stop_trace()

    from tpusgl.utils.trace import find_trace_file, load_events

    evs, pnames = load_events(find_trace_file(args.trace_dir))
    import collections
    import re

    dur = collections.Counter()
    s1 = collections.Counter()
    for e in evs:
        if e.get("ph") != "X" or "TPU" not in pnames.get(e.get("pid"), ""):
            continue
        a = e.get("args") or {}
        name = e["name"]
        if name.startswith("jit_"):
            continue
        key = re.sub(r"[.\d]+$", "", name)
        dur[key] += e.get("dur", 0)
        if ":S(1)" in (a.get("shape_with_layout") or ""):
            s1[key] += e.get("dur", 0)
    per_iter = args.iters * L * W
    total = sum(dur.values())
    s1_total = sum(s1.values())
    print(f"variant={args.variant} layers={L} window={W} iters={args.iters}")
    print(f"device total {total/1e3:.1f} ms; S(1)-annotated {s1_total/1e3:.1f} ms"
          f" ({100*s1_total/max(total,1):.0f}%);"
          f" per kernel-call {total/max(per_iter,1):.1f} us")
    for k, d in dur.most_common(12):
        print(f"  {d/1e3:9.2f} ms  s1={s1.get(k,0)/1e3:8.2f} ms  {k[:70]}")


if __name__ == "__main__":
    main()
