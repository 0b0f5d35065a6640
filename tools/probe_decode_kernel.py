"""Standalone decode-attention kernel probe at bench geometry.

Measures the Pallas paged decode kernel in isolation on the real TPU with
jax.profiler (wall clock lies on the remote backend — see
.claude/skills/verify/SKILL.md), comparing merge_seqs variants. This is the
harness behind the round-5 "2-sequence compute merging" numbers in
PERF_BREAKDOWN.md.

Usage:
    python tools/probe_decode_kernel.py [--iters 50] [--merges 1,2]
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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--merges", default="1,2")
    ap.add_argument("--live", type=int, default=90)   # live sequences
    ap.add_argument("--batch", type=int, default=96)  # padded batch
    ap.add_argument("--hq", type=int, default=28)
    ap.add_argument("--hkv", type=int, default=4)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--ppb", type=int, default=8)
    ap.add_argument("--ctx", default="mix", help="'mix' or a fixed int")
    ap.add_argument("--static-scale", action="store_true",
                    help="static per-layer k/v scales instead of the "
                    "per-token scale pool (isolates the in-kernel "
                    "scale-row machinery cost)")
    ap.add_argument("--trace-dir", default="/tmp/probe_decode_trace")
    args = ap.parse_args()

    B, Hq, Hkv, D, P, BP = (
        args.batch, args.hq, args.hkv, args.d, args.page, args.ppb
    )
    pages_per_seq = 17  # bench: 2176-token rows / 128-token pages
    n_pages = args.live * pages_per_seq
    rows_total = (n_pages + 1) * P
    R8 = scale_rows_per_page(Hkv)

    rng = np.random.default_rng(0)
    kv = jnp.asarray(
        rng.integers(-127, 127, (rows_total, Hkv * 2 * D)), jnp.int8
    )
    sc = jnp.asarray(
        rng.uniform(0.01, 0.05, ((rows_total // P) * R8, P)), jnp.float32
    )
    # Whole-row preallocation -> physically contiguous per-request page runs
    # (block_contig fast path), exactly like the bench workload.
    tbl = np.zeros((B, pages_per_seq), np.int32)
    for b in range(args.live):
        tbl[b] = 1 + b * pages_per_seq + np.arange(pages_per_seq)
    lens = np.zeros((B,), np.int32)
    if args.ctx == "mix":
        lens[: args.live] = rng.integers(100, 1125, args.live)  # avg ~612
    else:
        lens[: args.live] = int(args.ctx)
    # bench sorts decode rows by length (desc) for merge-group balance
    lens[: args.live] = np.sort(lens[: args.live])[::-1]
    lens_j = jnp.asarray(lens)
    tbl_j = jnp.asarray(tbl)

    qs = [
        jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
        for _ in range(8)
    ]

    fns = {}
    for m in [int(x) for x in args.merges.split(",")]:
        if args.static_scale:
            fns[m] = jax.jit(
                lambda q, kv, lens, tbl, sc, m=m: paged_decode_attention(
                    q, kv, lens, tbl, num_kv_heads=Hkv, page_size=P,
                    pages_per_block=BP, k_scale=0.03, v_scale=0.03,
                    merge_seqs=m,
                )
            )
        else:
            fns[m] = jax.jit(
                lambda q, kv, lens, tbl, sc, m=m: paged_decode_attention(
                    q, kv, lens, tbl, num_kv_heads=Hkv, page_size=P,
                    pages_per_block=BP, kv_scale=sc, merge_seqs=m,
                )
            )
        out = fns[m](qs[0], kv, lens_j, tbl_j, sc)
        out.block_until_ready()
        print(f"merge_seqs={m}: compiled, out {out.shape}", file=sys.stderr)

    # cross-check the variants agree on the same inputs
    outs = {m: np.asarray(fns[m](qs[0], kv, lens_j, tbl_j, sc),
                          np.float32) for m in fns}
    ms = sorted(outs)
    for m in ms[1:]:
        live = lens > 0
        d = np.max(np.abs(outs[ms[0]][live] - outs[m][live]))
        print(f"max |merge{ms[0]} - merge{m}| over live rows = {d}",
              file=sys.stderr)

    from tpusgl.utils.trace import aggregate

    for m, fn in fns.items():
        tdir = f"{args.trace_dir}_m{m}"
        jax.profiler.start_trace(tdir)
        rs = []
        for i in range(args.iters):
            rs.append(fn(qs[i % len(qs)], kv, lens_j, tbl_j, sc))
        jax.block_until_ready(rs)
        jax.profiler.stop_trace()
        print(f"--- merge_seqs={m} ---")
        for r in aggregate(tdir):
            if "paged_attention" in r["key"]:
                per_call = r["ms"] * 1e3 / max(r["count"], 1)
                print(f"{r['ms']:9.2f} ms x{r['count']:4d} "
                      f"({per_call:7.1f} us/call) {r['gbps']:7.0f} GB/s  "
                      f"{r['key'][:80]}")


if __name__ == "__main__":
    main()
