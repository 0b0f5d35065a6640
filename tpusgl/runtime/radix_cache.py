"""Radix-tree prefix cache over KV slot indices.

Same host-side data structure and invariants as the reference
(/root/reference/radix_cache.py:21-272, radix_tree.py:6-18), which is itself
adapted from SGLang — this layer is device-agnostic by design (node values
are int32 slot indices), so a TPU build keeps it on host unchanged in spirit:

- match_prefix walks and splits nodes on partial matches
  (radix_cache.py:40-98),
- insert returns the matched-prefix length so callers can free duplicated KV
  slots (radix_cache.py:100-140),
- LRU eviction pops unlocked leaves by last_access_time with parent cascade
  (radix_cache.py:207-245),
- lock refcounts walk to the root and maintain evictable_size
  (radix_cache.py:247-272).

Values are numpy arrays here instead of torch tensors; a monotonic counter
replaces time.time() for deterministic LRU order (needed for replicated
multi-host scheduling — every host must evict identically).
"""

from __future__ import annotations

import heapq
import itertools
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


class TreeNode:
    __slots__ = ("parent", "children", "key", "value", "lock_ref", "last_access")

    def __init__(self):
        self.parent: Optional[TreeNode] = None
        self.children: Dict[int, TreeNode] = {}  # first token id -> child
        self.key: List[int] = []
        self.value: Optional[np.ndarray] = None  # int32 KV slot indices
        self.lock_ref: int = 0
        self.last_access: int = 0

    def __lt__(self, other: "TreeNode") -> bool:
        return self.last_access < other.last_access


def _key_match(a: List[int], b: List[int]) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


class RadixCache:
    def __init__(self):
        self._clock = itertools.count(1)
        self.reset()

    def reset(self) -> None:
        self.root = TreeNode()
        self.root.value = np.empty((0,), np.int32)
        self.root.lock_ref = 1
        self.evictable_size_ = 0
        # Bumped on every structural change (insert/split/evict/reset):
        # cached match results (node pointers) are valid iff taken at the
        # current generation — the scheduler uses this to skip re-matching
        # the whole waiting queue every selection round.
        self.generation = getattr(self, "generation", 0) + 1

    def _touch(self, node: TreeNode) -> None:
        node.last_access = next(self._clock)

    # -------------------------------------------------------------- matching

    def match_prefix(self, key: List[int]) -> Tuple[np.ndarray, TreeNode]:
        """Longest cached prefix of `key` -> (slot indices, deepest node)."""
        values: List[np.ndarray] = []
        node = self.root
        self._touch(node)
        while key:
            child = node.children.get(key[0])
            if child is None:
                break
            self._touch(child)
            plen = _key_match(child.key, key)
            if plen < len(child.key):
                child = self._split(child, plen)
                values.append(child.value)
                node = child
                break
            values.append(child.value)
            node = child
            key = key[plen:]
        out = np.concatenate(values) if values else np.empty((0,), np.int32)
        return out, node

    def _split(self, child: TreeNode, split_len: int) -> TreeNode:
        """Split `child` so the first split_len tokens become a new parent."""
        self.generation += 1  # structural change: cached matches are stale
        new_node = TreeNode()
        new_node.parent = child.parent
        new_node.lock_ref = child.lock_ref
        new_node.key = child.key[:split_len]
        new_node.value = child.value[:split_len]
        new_node.last_access = child.last_access
        new_node.children = {child.key[split_len]: child}
        new_node.parent.children[new_node.key[0]] = new_node
        child.parent = new_node
        child.key = child.key[split_len:]
        child.value = child.value[split_len:]
        return new_node

    # -------------------------------------------------------------- insertion

    def insert(self, key: List[int], value: np.ndarray) -> int:
        """Insert; returns length of the prefix that was already present."""
        self.generation += 1
        return self._insert(self.root, key, value)

    def _insert(self, node: TreeNode, key: List[int], value: np.ndarray) -> int:
        self._touch(node)
        if not key:
            return 0
        child = node.children.get(key[0])
        if child is None:
            new_node = TreeNode()
            new_node.parent = node
            new_node.key = key
            new_node.value = np.asarray(value, np.int32).copy()
            node.children[key[0]] = new_node
            self._touch(new_node)
            self.evictable_size_ += len(value)
            return 0
        plen = _key_match(child.key, key)
        if plen == len(child.key):
            if plen == len(key):
                self._touch(child)
                return plen
            return plen + self._insert(child, key[plen:], value[plen:])
        new_node = self._split(child, plen)
        return plen + self._insert(new_node, key[plen:], value[plen:])

    # -------------------------------------------------------------- eviction

    def evict(
        self,
        num_tokens: int,
        free_callback: Callable[[np.ndarray], None],
        spill_callback: Optional[Callable[["TreeNode"], None]] = None,
    ):
        """LRU-evict >= num_tokens unlocked leaf tokens (radix_cache.py:207-225).
        `spill_callback(node)` runs BEFORE the node's slots are freed — the
        host KV offload tier's hook (runtime/host_cache.py)."""
        leaves = self._collect_leaves()
        heapq.heapify(leaves)
        evicted = 0
        while evicted < num_tokens and leaves:
            node = heapq.heappop(leaves)
            if node is self.root:
                break
            if node.lock_ref > 0:
                continue
            if spill_callback is not None:
                spill_callback(node)
            free_callback(node.value)
            evicted += len(node.value)
            self._delete_leaf(node)
            if not node.parent.children:
                heapq.heappush(leaves, node.parent)

    def _collect_leaves(self) -> List[TreeNode]:
        out, stack = [], [self.root]
        while stack:
            node = stack.pop()
            if node.children:
                stack.extend(node.children.values())
            else:
                out.append(node)
        return out

    def _delete_leaf(self, node: TreeNode) -> None:
        del node.parent.children[node.key[0]]
        self.evictable_size_ -= len(node.value)
        self.generation += 1

    # -------------------------------------------------------------- locking

    def inc_lock_ref(self, node: Optional[TreeNode]) -> None:
        if node is None:
            return
        while node is not self.root:
            if node.lock_ref == 0:
                self.evictable_size_ -= len(node.value)
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: Optional[TreeNode]) -> None:
        if node is None:
            return
        while node is not self.root:
            if node.lock_ref == 1:
                self.evictable_size_ += len(node.value)
            node.lock_ref -= 1
            node = node.parent

    def evictable_size(self) -> int:
        return self.evictable_size_

    def total_cached_tokens(self) -> int:
        """All tokens held by the tree (locked + evictable) — invariant tests."""
        total, stack = 0, [self.root]
        while stack:
            node = stack.pop()
            total += len(node.value) if node.value is not None else 0
            stack.extend(node.children.values())
        return total


class PagedRadixCache:
    """Page-granular prefix cache: the radix tree over `page_size`-token
    chunks, with page ids as values.

    The TPU build shares KV at page granularity (the Pallas decode kernel and
    the PagePool allocator deal in whole pages), so the tree's key units are
    tuples of page_size token ids and each unit's value is one page id. All
    token-denominated numbers (match lengths, evictable size) are multiples
    of page_size. page_size == 1 reproduces the reference's token-granular
    sharing exactly (/root/reference/radix_cache.py:21-272).
    """

    def __init__(self, page_size: int):
        self.page_size = page_size
        self.tree = RadixCache()

    def reset(self) -> None:
        self.tree.reset()

    @property
    def root(self):
        return self.tree.root

    @property
    def generation(self) -> int:
        return self.tree.generation

    def _chunks(self, token_ids) -> List[tuple]:
        P = self.page_size
        n = len(token_ids) // P
        return [tuple(token_ids[i * P : (i + 1) * P]) for i in range(n)]

    def match_prefix(self, token_ids) -> Tuple[np.ndarray, "TreeNode"]:
        """Longest cached page-aligned prefix -> (page ids, deepest node)."""
        return self.tree.match_prefix(self._chunks(token_ids))

    def match_tail(
        self, node: "TreeNode", token_ids, start: int
    ) -> Optional[Tuple[int, int, "TreeNode"]]:
        """Sub-page prefix reuse (reference radix_cache.py:40-98 is
        token-granular; page-granular sharing alone loses prefixes shorter
        than a page — VERDICT r2 #9): after the page walk stopped at `node`
        with `start` tokens matched, find the child whose FIRST page shares
        the longest token run with token_ids[start:].

        Returns (page_id, tail_len, child_node) or None. The caller COPIES
        those tail_len KV rows into its own first page (the tree page itself
        stays shared and untouched), so tree ownership stays page-granular.
        A full-chunk match is impossible here — the page walk would have
        descended — so tail_len < page_size whenever len(token_ids) - start
        >= page_size."""
        rest = token_ids[start:]
        if not len(rest):
            return None
        best = None
        for child in node.children.values():
            k0 = child.key[0]  # tuple of page_size token ids
            n = min(len(rest), len(k0))
            t = 0
            while t < n and k0[t] == rest[t]:
                t += 1
            if t and (best is None or t > best[1]):
                best = (int(child.value[0]), t, child)
        if best is not None:
            # Feed the LRU signal like whole-page hits do (match_prefix
            # touches every walked node): a repeatedly tail-reused page must
            # not look cold to eviction (ADVICE r3).
            self.tree._touch(best[2])
        return best

    def insert(self, token_ids, page_ids: np.ndarray) -> int:
        """Insert the full pages of token_ids; returns the already-present
        prefix length in TOKENS (multiple of page_size). The partial tail
        (len(token_ids) % page_size tokens) is never inserted — its page
        stays request-private."""
        chunks = self._chunks(token_ids)
        page_ids = np.asarray(page_ids, np.int32)[: len(chunks)]
        return self.tree.insert(chunks, page_ids) * self.page_size

    def evict(
        self,
        num_tokens: int,
        free_pages: Callable[[np.ndarray], None],
        spill_callback: Optional[Callable[["TreeNode"], None]] = None,
    ):
        pages = -(-num_tokens // self.page_size)
        self.tree.evict(pages, free_pages, spill_callback)

    @staticmethod
    def node_chunks(node: "TreeNode") -> Tuple[List[tuple], List[tuple]]:
        """(prefix chunks from the root, the node's own chunks) — each chunk
        is one page's token tuple. The host-cache spill keying needs the full
        path: a page's KV depends on everything before it (host_cache.py)."""
        own = list(node.key)
        prefix: List[tuple] = []
        p = node.parent
        while p is not None and p.key:
            prefix = list(p.key) + prefix
            p = p.parent
        return prefix, own

    def inc_lock_ref(self, node) -> None:
        self.tree.inc_lock_ref(node)

    def dec_lock_ref(self, node) -> None:
        self.tree.dec_lock_ref(node)

    def evictable_size(self) -> int:
        return self.tree.evictable_size() * self.page_size

    def total_cached_tokens(self) -> int:
        return self.tree.total_cached_tokens() * self.page_size
