"""Static-shape bucketing helpers.

XLA compiles one executable per shape; the reference's freely dynamic batch
shapes (/root/reference/scheduler.py:381-507) would recompile every step.
All hot-path shapes are rounded up to a small set of buckets instead.
"""

from __future__ import annotations

from typing import Sequence


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_bucket(x: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= x; buckets must be sorted ascending."""
    if not buckets:
        raise ValueError("empty bucket list")
    for b in buckets:
        if x <= b:
            return b
    raise ValueError(f"value {x} exceeds largest bucket {buckets[-1]}")
