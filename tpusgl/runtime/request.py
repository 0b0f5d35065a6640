"""Per-request host-side state.

Mirrors the reference's Request dataclass (/root/reference/request.py:9-46)
with two deliberate improvements:

- prompt ids are a host list/array (the control plane never needs them on
  device; the reference keeps a device tensor and calls .tolist() on the hot
  path, scheduler.py:265-268),
- retraction preserves generated output: a retracted request re-prefills
  prompt + generated-so-far instead of restarting generation from scratch
  (the reference's Request.reset() at request.py:34-46 discards output_ids,
  losing completed work).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

import numpy as np


@dataclass(eq=False)
class Request:
    input_ids: List[int]
    max_new_tokens: int
    eos_id: int = -1
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    do_sample: bool = False
    repetition_penalty: float = 1.0

    output_ids: List[int] = field(default_factory=list)
    finished: bool = False
    req_pool_idx: Optional[int] = None
    seq_len: int = 0  # current logical length (prompt + committed output + in-flight)
    # Tokens of the mirror row backed by ALLOCATED pages (page-aligned past
    # the sub-page prefix, >= seq_len). Decode only allocates when
    # seq_len + window would exceed it; with prefill-time preallocation
    # (EngineConfig.prealloc_decode_pages) the whole row is one contiguous
    # page run and decode never allocates. Frees (retract / finish) cover
    # [*, alloc_len), not [*, seq_len).
    alloc_len: int = 0

    # Page ids of the radix-cached prefix (page-granular sharing; the token
    # count is num_cached_tokens == len(prefix_pages) * page_size).
    prefix_pages: np.ndarray = field(
        default_factory=lambda: np.empty((0,), np.int32)
    )
    last_node: Optional[Any] = None  # radix TreeNode
    num_cached_tokens: int = 0
    # Sub-page prefix reuse (radix_cache.PagedRadixCache.match_tail): the
    # tree page whose first tail_len rows will be COPIED into this request's
    # first own page, and the tree node locked until the copy is enqueued.
    # num_cached_tokens then includes tail_len (not page-aligned).
    tail_page: Optional[int] = None
    tail_len: int = 0
    tail_node: Optional[Any] = None
    constraint_state: Optional[Any] = None
    arrival_t: Optional[float] = None  # perf_counter at enqueue (TTFT metric)

    is_retracted: bool = False
    # Number of decode results currently in flight on device but not yet
    # committed on host (overlap mode; replaces overlap_next_input_id since
    # next inputs are read from the device-side last_token buffer).
    inflight_steps: int = 0
    # Bumped on retraction; commits of steps submitted under an older epoch
    # are discarded (fixes the reference's sticky is_retracted livelock,
    # scheduler.py:706-707).
    epoch: int = 0

    @property
    def full_ids(self) -> List[int]:
        return self.input_ids + self.output_ids

    def retract(self) -> None:
        """Requeue under memory pressure, keeping generated output
        (cf. request.py:34-46 which discards it)."""
        self.req_pool_idx = None
        self.seq_len = 0
        self.alloc_len = 0
        self.finished = False
        self.is_retracted = True
        self.inflight_steps = 0
        self.epoch += 1
        self.prefix_pages = np.empty((0,), np.int32)
        self.last_node = None
        self.num_cached_tokens = 0
        self.tail_page = None
        self.tail_len = 0
        self.tail_node = None
        # force a fresh radix match on re-selection (the scheduler caches
        # matches per tree generation)
        self._match_gen = None

    def remaining_new_tokens(self) -> int:
        return max(0, self.max_new_tokens - len(self.output_ids))
