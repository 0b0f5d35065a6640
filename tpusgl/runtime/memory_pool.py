"""Host-side memory accounting for the device pools.

TPU-native split of the reference's pools (/root/reference/memory_pool.py):
the *slabs* (KV arrays, page table) live on device inside EngineState and are
only ever written from inside jitted steps; the *free lists* and a host
mirror of the page table live here. The mirror means the host never reads
device memory to learn which KV slots a request occupies (the reference reads
`req_to_token` tensors on the hot path, e.g. scheduler.py:333-336,
radix_cache.py:158-160 — a device sync each time).

Token slots are token-granular with slot 0 reserved as the dummy padding
target, exactly like BaseTokenToKVPool (memory_pool.py:82-84).
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np


class ReqSlotPool:
    """Request slot free list (ReqToTokenPool accounting, memory_pool.py:7-44)
    plus the host mirror of the device page table."""

    def __init__(self, size: int, max_context_len: int):
        self.size = size
        self.max_context_len = max_context_len
        self.free_slots: List[int] = list(range(size))
        # Host mirror of EngineState.req_to_token (without the dummy row).
        self.req_to_token = np.zeros((size, max_context_len), dtype=np.int32)

    def available_size(self) -> int:
        return len(self.free_slots)

    def alloc(self) -> Optional[int]:
        if not self.free_slots:
            return None
        return self.free_slots.pop(0)

    def free(self, idx: Union[int, List[int]]) -> None:
        if isinstance(idx, (int, np.integer)):
            self.free_slots.append(int(idx))
        else:
            self.free_slots.extend(int(i) for i in idx)

    def clear(self) -> None:
        self.free_slots = list(range(self.size))
        self.req_to_token[:] = 0

    def row(self, idx: int, length: int) -> np.ndarray:
        return self.req_to_token[idx, :length]

    def write_row(self, idx: int, values: np.ndarray, start: int = 0) -> None:
        self.req_to_token[idx, start : start + len(values)] = values


class TokenSlotPool:
    """KV slot free list (BaseTokenToKVPool accounting, memory_pool.py:46-102).

    Kept entirely on host as a numpy int32 vector; slot ids are 1..size
    (slot 0 reserved).
    """

    def __init__(self, size: int):
        self.size = size
        self.free_slots = np.arange(1, size + 1, dtype=np.int32)

    def available_size(self) -> int:
        return len(self.free_slots)

    def alloc(self, need: int) -> Optional[np.ndarray]:
        if need > len(self.free_slots):
            return None
        out = self.free_slots[:need]
        self.free_slots = self.free_slots[need:]
        return out

    def free(self, indices: np.ndarray) -> None:
        indices = np.asarray(indices, dtype=np.int32).reshape(-1)
        if indices.size == 0:
            return
        self.free_slots = np.concatenate([self.free_slots, indices])

    def clear(self) -> None:
        self.free_slots = np.arange(1, self.size + 1, dtype=np.int32)
