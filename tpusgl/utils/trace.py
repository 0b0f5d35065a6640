"""Profiler-trace analysis (SURVEY.md §5 observability).

`jax.profiler` traces (bench.py --profile) are written as Chrome-format
JSON; TensorBoard isn't available in every serving environment, so this
module aggregates device-op time directly: per source line / kernel, with
achieved bytes/s from XLA's per-op byte counts. This is the tool the 7B
kernel tuning was driven by (gate_up tile widths, attention block sizes,
operand-staging discovery).

Usage:
    python -m tpusgl.utils.trace /path/to/trace_dir [--top 20] [--by name]

`trace_dir` is the directory passed to jax.profiler.start_trace (the
*.trace.json.gz under plugins/profile/*/ is located automatically).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple


def find_trace_file(trace_dir: str) -> str:
    """Newest *.trace.json.gz under a jax.profiler trace directory."""
    pats = [
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(trace_dir, "*.trace.json.gz"),
    ]
    hits: List[str] = []
    for p in pats:
        hits.extend(glob.glob(p))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return max(hits, key=os.path.getmtime)


def load_events(path: str) -> Tuple[list, Dict[int, str]]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    evs = data["traceEvents"]
    pnames: Dict[int, str] = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
    return evs, pnames


def aggregate(
    trace_dir: str,
    by: str = "source",
    device_substr: str = "TPU",
    program_prefix: Optional[str] = "jit_",
) -> List[dict]:
    """Aggregate device-op durations.

    by: "source" groups by the `source` attribution (file:line) with pallas
    kernels split by output shape; "name" groups by HLO op-name prefix.
    Returns rows sorted by total time: {key, ms, count, gbps, programs_ms}.
    """
    evs, pnames = load_events(find_trace_file(trace_dir))
    dur = collections.Counter()
    cnt = collections.Counter()
    byts = collections.Counter()
    programs_ms = 0.0
    for e in evs:
        if e.get("ph") != "X" or device_substr not in pnames.get(e.get("pid"), ""):
            continue
        a = e.get("args") or {}
        name = e["name"]
        if program_prefix and name.startswith(program_prefix):
            programs_ms += e.get("dur", 0) / 1e3
            continue
        if by == "name":
            key = re.sub(r"[.\d]+$", "", name)
        else:
            key = a.get("source", "")
            if "quant_matmul" in key or "paged_attention" in key:
                key = f"{key} out={a.get('shape_with_layout', '')[:28]}"
            if not key:
                key = "? " + re.sub(r"[.\d]+$", "", name)
        dur[key] += e.get("dur", 0)
        cnt[key] += 1
        byts[key] += int(a.get("raw_bytes_accessed", 0) or 0)
    rows = []
    for k, d in dur.most_common():
        rows.append({
            "key": k,
            "ms": d / 1e3,
            "count": cnt[k],
            "gbps": (byts[k] / (d * 1e-6) / 1e9) if d else 0.0,
            "programs_ms": programs_ms,
        })
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--by", choices=["source", "name"], default="source")
    args = ap.parse_args()
    rows = aggregate(args.trace_dir, by=args.by)
    if rows:
        print(f"program time: {rows[0]['programs_ms']:.1f} ms")
    for r in rows[: args.top]:
        print(
            f"{r['ms']:9.2f} ms x{r['count']:5d} {r['gbps']:8.0f} GB/s  "
            f"{r['key'][:90]}"
        )


if __name__ == "__main__":
    main()
