"""Host-RAM KV offload tier (the reference roadmap's unimplemented
"multi-level cache", /root/reference/README.md:54).

Device HBM holds the hot radix-cached KV pages; when the radix tree LRU-
evicts a node under memory pressure, its KV rows (all layers, plus the int8
per-token scale rows) are gathered into one compact device array
(steps.extract_pages) and copied to host RAM in one batched D2H per node
(scheduler._spill_node — eviction is already the slow path; the gather is
enqueued before any later reuse of the freed pages, so the snapshot is
consistent). On a later prefix match, pages found in the host store are
injected into freshly allocated device pages (steps.inject_pages) and
re-inserted into the radix tree (scheduler._try_inject_host_pages) — the
normal cached-prefix flow then applies unchanged (tree ownership, locks,
dedup-on-finish).

Keying: a page is identified by its page_size-token chunk PLUS the full
token prefix before it (hashed) — two pages holding the same 128 tokens at
different positions/prefixes hold different KV (positions enter RoPE before
the cache; attention over different prefixes differs), so context-free
chunk keys would be wrong.

Economics on one v5e chip (7B int8): re-computing a 128-token page costs
~2 x 7.6e9 x 128 FLOPs of prefill (~10 ms of MXU time at bench load) vs a
~3.7 MB host->device upload. The store is capacity-bounded (LRU, bytes).
"""

from __future__ import annotations

import collections
from typing import Dict, List, Optional, Tuple

import numpy as np


class HostKVCache:
    """Byte-bounded LRU store of spilled KV pages.

    Entries: key -> (kv [L, P, W] storage-dtype numpy array,
                     scales [L, R8, P] f32 numpy array or None)."""

    def __init__(self, capacity_bytes: int):
        self.capacity = int(capacity_bytes)
        self._store: "collections.OrderedDict[tuple, tuple]" = (
            collections.OrderedDict()
        )
        self._bytes = 0
        self.spilled_pages = 0
        self.hit_pages = 0
        # Bumped on every put: lets the scheduler skip re-probing a request
        # whose device-matched length and the store are both unchanged.
        self.generation = 0

    @staticmethod
    def key(prefix_hash: int, chunk: tuple) -> tuple:
        return (prefix_hash, chunk)

    @staticmethod
    def chain_hash(prefix_hash: int, chunk: tuple) -> int:
        """Rolling prefix hash: hash of (everything before this chunk)."""
        return hash((prefix_hash, chunk))

    def _entry_bytes(self, kv, sc) -> int:
        n = kv.nbytes
        if sc is not None:
            n += sc.nbytes
        return n

    def put(self, key: tuple, kv, sc) -> None:
        if self.capacity <= 0:
            return
        nbytes = self._entry_bytes(kv, sc)
        if nbytes > self.capacity:
            return
        old = self._store.pop(key, None)
        if old is not None:
            self._bytes -= self._entry_bytes(old[0], old[1])
        while self._bytes + nbytes > self.capacity and self._store:
            _, (okv, osc) = self._store.popitem(last=False)
            self._bytes -= self._entry_bytes(okv, osc)
        self._store[key] = (kv, sc)
        self._bytes += nbytes
        self.spilled_pages += 1
        self.generation += 1

    def get(self, key: tuple) -> Optional[tuple]:
        e = self._store.get(key)
        if e is None:
            return None
        self._store.move_to_end(key)
        self.hit_pages += 1
        return e

    def __contains__(self, key: tuple) -> bool:
        return key in self._store

    def __len__(self) -> int:
        return len(self._store)

    @property
    def bytes_used(self) -> int:
        return self._bytes

    def clear(self) -> None:
        self._store.clear()
        self._bytes = 0


def match_host_extension(
    host: HostKVCache,
    token_ids,
    matched_tokens: int,
    page_size: int,
    max_pages: Optional[int] = None,
) -> Tuple[List[tuple], int]:
    """Longest run of host-cached pages extending a device-level match of
    `matched_tokens` (page-aligned). Returns (keys in order, num_pages)."""
    P = page_size
    assert matched_tokens % P == 0
    # Rolling hash over the already-matched prefix.
    h = 0
    for j in range(matched_tokens // P):
        h = HostKVCache.chain_hash(h, tuple(token_ids[j * P : (j + 1) * P]))
    keys = []
    pos = matched_tokens
    while pos + P <= len(token_ids):
        chunk = tuple(token_ids[pos : pos + P])
        k = HostKVCache.key(h, chunk)
        if k not in host:
            break
        keys.append(k)
        h = HostKVCache.chain_hash(h, chunk)
        pos += P
        if max_pages is not None and len(keys) >= max_pages:
            break
    return keys, len(keys)


def prefix_hashes(token_ids, n_pages: int, page_size: int) -> List[int]:
    """Rolling prefix hash BEFORE each of the first n_pages chunks
    (hashes[j] covers chunks [0, j))."""
    P = page_size
    out = [0]
    h = 0
    for j in range(n_pages - 1):
        h = HostKVCache.chain_hash(h, tuple(token_ids[j * P : (j + 1) * P]))
        out.append(h)
    return out
