"""Radix tree invariants (SURVEY.md §4.1): match/insert/split, LRU eviction
with locks, evictable-size conservation (cf. radix_cache.py:247-272)."""

import numpy as np

from tpusgl.runtime.memory_pool import ReqSlotPool
from tpusgl.runtime.radix_cache import RadixCache


def ids(a, b):
    return np.arange(a, b, dtype=np.int32)


def test_insert_and_match():
    t = RadixCache()
    assert t.insert([1, 2, 3, 4], ids(10, 14)) == 0
    v, node = t.match_prefix([1, 2, 3, 4, 5])
    np.testing.assert_array_equal(v, ids(10, 14))
    assert node.key == [4] or node.key == [1, 2, 3, 4]

    # partial match splits the node
    v, node = t.match_prefix([1, 2, 9])
    np.testing.assert_array_equal(v, ids(10, 12))
    assert t.evictable_size() == 4  # conserved across splits


def test_insert_returns_existing_prefix_len():
    t = RadixCache()
    t.insert([1, 2, 3], ids(1, 4))
    assert t.insert([1, 2, 3, 4, 5], np.array([1, 2, 3, 40, 50], np.int32)) == 3
    assert t.evictable_size() == 5


def test_match_empty():
    t = RadixCache()
    v, node = t.match_prefix([7, 8])
    assert len(v) == 0
    assert node is t.root


def test_lock_refs_conserve_evictable():
    t = RadixCache()
    t.insert([1, 2, 3], ids(1, 4))
    _, node = t.match_prefix([1, 2, 3])
    assert t.evictable_size() == 3
    t.inc_lock_ref(node)
    assert t.evictable_size() == 0
    t.inc_lock_ref(node)
    assert t.evictable_size() == 0
    t.dec_lock_ref(node)
    assert t.evictable_size() == 0
    t.dec_lock_ref(node)
    assert t.evictable_size() == 3


def test_evict_lru_and_locked():
    t = RadixCache()
    t.insert([1, 2], ids(1, 3))
    t.insert([3, 4], ids(3, 5))
    t.insert([5, 6], ids(5, 7))
    # touch [1,2] so it is most recent
    _, n12 = t.match_prefix([1, 2])
    _, n34 = t.match_prefix([3, 4])
    _, n12b = t.match_prefix([1, 2])
    t.inc_lock_ref(n34)

    freed = []
    t.evict(2, lambda v: freed.extend(v.tolist()))
    # LRU unlocked leaf is [5,6]
    assert freed == [5, 6]
    assert t.evictable_size() == 2  # [1,2] left; [3,4] locked

    freed2 = []
    t.evict(100, lambda v: freed2.extend(v.tolist()))
    assert set(freed2) == {1, 2}  # locked [3,4] survives
    assert t.evictable_size() == 0
    assert t.total_cached_tokens() == 2


def test_evict_cascades_to_parent():
    t = RadixCache()
    t.insert([1, 2], ids(1, 3))
    t.insert([1, 2, 3, 4], np.array([1, 2, 30, 40], np.int32))
    freed = []
    t.evict(100, lambda v: freed.extend(v.tolist()))
    assert set(freed) == {1, 2, 30, 40}
    assert t.total_cached_tokens() == 0


def test_pools_accounting():
    rp = ReqSlotPool(4, 16)
    a = rp.alloc()
    b = rp.alloc()
    assert rp.available_size() == 2
    rp.free(a)
    rp.free([b])
    assert rp.available_size() == 4


# ----------------------------------------------------- page-granular layer

def test_page_pool_alloc_free():
    from tpusgl.runtime.memory_pool import PagePool

    pool = PagePool(64, 4)  # 16 pages
    assert pool.available_size() == 64
    a = pool.alloc_pages(3)
    assert len(a) == 3 and pool.available_size() == 52
    slots = pool.page_slots(a)
    assert len(slots) == 12
    assert list(slots[:4]) == [a[0] * 4 + i for i in range(4)]
    pool.free_pages(a)
    assert pool.available_size() == 64
    assert pool.alloc_pages(17) is None


def test_paged_radix_match_insert_evict():
    from tpusgl.runtime.radix_cache import PagedRadixCache

    P = 4
    t = PagedRadixCache(P)
    ids = list(range(10))  # 2 full pages + partial tail
    pages = np.array([3, 4], np.int32)
    assert t.insert(ids, pages) == 0
    assert t.evictable_size() == 2 * P

    got, node = t.match_prefix(ids)
    assert list(got) == [3, 4]
    # partial overlap: first page shared, second differs
    other = ids[:4] + [99, 98, 97, 96, 95]
    got2, _ = t.match_prefix(other)
    assert list(got2) == [3]
    # inserting the divergent sequence reports the shared-page prefix
    assert t.insert(other, np.array([3, 7], np.int32)) == P
    assert t.evictable_size() == 3 * P

    freed = []
    t.evict(100, lambda pages: freed.extend(pages.tolist()))
    assert sorted(freed) == [3, 4, 7]
    assert t.evictable_size() == 0


def test_paged_radix_lock_protects_pages():
    from tpusgl.runtime.radix_cache import PagedRadixCache

    t = PagedRadixCache(2)
    t.insert([1, 2, 3, 4], np.array([5, 6], np.int32))
    _, node = t.match_prefix([1, 2, 3, 4])
    t.inc_lock_ref(node)
    assert t.evictable_size() == 0
    freed = []
    t.evict(100, lambda p: freed.extend(p.tolist()))
    assert freed == []
    t.dec_lock_ref(node)
    assert t.evictable_size() == 4
