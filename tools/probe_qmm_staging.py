"""Repro/probe for the per-call weight-copy waste on quant_matmul (the
"MSA S(1) staging" line of PERF_BREAKDOWN: the real bench trace shows
~2.2 ms/iter of `slice-done s8[4736,3584]` ops — the 68 MB int8 down-proj
weight copied in 4 async slices around EVERY kernel call, 28x per decode
iteration).

Runs L chained quant_matmul calls at a chosen geometry under the profiler
and reports per-call kernel time AND per-call slice/copy time, so program-
structure variants can be compared.

Usage: python tools/probe_qmm_staging.py [--kn 18944,3584] [--layers 28]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kn", default="18944,3584")
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", default="chain", choices=["chain", "layer"],
                    help="chain: back-to-back down-proj matmuls; layer: "
                    "full decode-layer mimic (qkv/attn/o/gate_up/down + "
                    "window) where the per-call weight copies cost real "
                    "time like the bench program")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--trace-dir", default="/tmp/probe_qmm")
    args = ap.parse_args()

    K, N = (int(x) for x in args.kn.split(","))
    L, M = args.layers, args.m

    from tpusgl.ops.linear import enable_quant_matmul
    from tpusgl.ops.quant_matmul import quant_matmul_any

    enable_quant_matmul(True)
    rng = np.random.default_rng(0)

    if args.mode == "chain":
        lins = [
            {"w": jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8),
             "s": jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)}
            for _ in range(L)
        ]
        x0 = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)

        def step(x, lins):
            for lin in lins:
                y = quant_matmul_any(x, lin)  # [M, N]
                x = x + jnp.pad(y, ((0, 0), (0, K - N)))[:, :K].astype(x.dtype) * 0.0 \
                    + jnp.float32(1e-6).astype(x.dtype)
            return x, y

        operands = (x0, lins)
        fn = jax.jit(step)
    else:
        # 7B decode-layer mimic: qkv -> paged attention -> o -> gate_up ->
        # down, times L layers times `window` tokens.
        from tpusgl.ops.attention import scale_rows_per_page
        from tpusgl.ops.paged_attention import paged_decode_attention

        H, Hq, Hkv, D, I, P, BP = 3584, 28, 4, 128, 18944, 128, 8
        pages_per_seq = 17
        n_pages = 90 * pages_per_seq
        rows_total = (n_pages + 1) * P
        R8 = scale_rows_per_page(Hkv)

        def mk(k, n):
            return {
                "w": jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8),
                "s": jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32),
            }

        layers = [
            {"qkv": mk(H, (Hq + 2 * Hkv) * D), "o": mk(Hq * D, H),
             "gate_up": mk(H, 2 * I), "down": mk(I, H),
             "kv": jnp.asarray(
                 rng.integers(-127, 127, (rows_total, Hkv * 2 * D)), jnp.int8),
             "sc": jnp.asarray(
                 rng.uniform(0.01, 0.05, ((rows_total // P) * R8, P)),
                 jnp.float32)}
            for _ in range(L)
        ]
        tbl = np.zeros((M, pages_per_seq), np.int32)
        for b in range(min(M, 90)):
            tbl[b] = 1 + b * pages_per_seq + np.arange(pages_per_seq)
        lens = np.zeros((M,), np.int32)
        lens[:90] = np.sort(rng.integers(100, 1125, 90))[::-1]
        tbl_j, lens_j = jnp.asarray(tbl), jnp.asarray(lens)
        x0 = jnp.asarray(rng.normal(size=(M, H)), jnp.bfloat16)

        def step(x, layers):
            for _ in range(args.window):
                for ly in layers:
                    qkv = quant_matmul_any(x, ly["qkv"])
                    q = qkv[:, : Hq * D].reshape(M, Hq, D)
                    attn = paged_decode_attention(
                        q, ly["kv"], lens_j, tbl_j, num_kv_heads=Hkv,
                        page_size=P, pages_per_block=BP, kv_scale=ly["sc"],
                    ).reshape(M, Hq * D)
                    x = x + quant_matmul_any(attn, ly["o"]) * 0.001
                    gu = quant_matmul_any(x, ly["gate_up"])
                    act = (jax.nn.silu(gu[:, :I]) * gu[:, I:]).astype(x.dtype)
                    x = x + quant_matmul_any(act, ly["down"]) * 0.001
            return x, x

        operands = (x0, layers)
        fn = jax.jit(step)

    x, y = fn(*operands)
    jax.block_until_ready(y)
    print("compiled", file=sys.stderr)

    jax.profiler.start_trace(args.trace_dir)
    outs = []
    for _ in range(args.iters):
        x, y = fn(*operands)
        outs.append(y)
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()

    from tpusgl.utils.trace import find_trace_file, load_events
    import collections
    import re

    evs, pnames = load_events(find_trace_file(args.trace_dir))
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in evs:
        if e.get("ph") != "X" or "TPU" not in pnames.get(e.get("pid"), ""):
            continue
        if e["name"].startswith("jit_"):
            continue
        a = e.get("args") or {}
        base = re.sub(r"[.\d]+$", "", e["name"])
        key = f"{base} {(a.get('shape_with_layout') or '')[:44]}"
        dur[key] += e["dur"]
        cnt[key] += 1
    calls = args.iters * L * (args.window if args.mode == "layer" else 1)
    for k, d in dur.most_common(14):
        print(f"{d/calls:9.2f} us/call x{cnt[k]/calls:6.2f}  {k[:76]}")


if __name__ == "__main__":
    main()
