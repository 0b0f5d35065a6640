"""Host-RAM KV offload tier (reference roadmap "multi-level cache",
/root/reference/README.md:54; tpusgl/runtime/host_cache.py): LRU byte
bounds, prefix-hash keying, and the full spill -> evict -> host-match ->
inject -> token-identical-generation loop through the scheduler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import naive_greedy
from tpusgl.config import EngineConfig, ModelConfig
from tpusgl.models import qwen2
from tpusgl.ops.attention import ref_attention
from tpusgl.runtime.engine import Engine
from tpusgl.runtime.host_cache import (
    HostKVCache,
    match_host_extension,
    prefix_hashes,
)
from tpusgl.runtime.sampling_params import SamplingParams

CFG = ModelConfig(
    hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
    intermediate_size=128, num_hidden_layers=2, vocab_size=256,
    tie_word_embeddings=True, max_position_embeddings=512, rope_theta=10000.0,
)

ECFG = EngineConfig(
    # 32-page pool, max_context_len 64: three 30-token prompt families plus
    # the 24-token shared prefix cannot all stay tree-resident, forcing LRU
    # eviction (and therefore spills) without clamping max_new_tokens.
    max_total_tokens=128,
    max_requests=2,
    page_size=4,
    decode_bs_buckets=(1, 2),
    prefill_len_buckets=(8, 16, 32, 64),
    kv_len_bucket=64,
    host_cache_bytes=64 << 20,
)


@pytest.fixture(scope="module")
def params():
    return qwen2.init_params(CFG, jax.random.PRNGKey(42), jnp.float32)


def make_engine(params, **cfg_overrides):
    return Engine(
        model_cfg=CFG, engine_cfg=ECFG.replace(**cfg_overrides),
        params=params, dtype=jnp.float32, attn_impl=ref_attention,
        sample_k_cap=CFG.vocab_size,
    )


# ----------------------------------------------------------------- unit level


def test_lru_byte_bound():
    cache = HostKVCache(capacity_bytes=10_000)
    kv = np.zeros((2, 4, 16), np.int8)     # 128 B
    sc = np.zeros((2, 2, 4), np.float32)   # 64 B
    per = kv.nbytes + sc.nbytes
    n_fit = 10_000 // per
    for i in range(n_fit + 20):
        cache.put((0, (i,)), kv.copy(), sc.copy())
    assert cache.bytes_used <= 10_000
    assert len(cache) <= n_fit
    # oldest entries evicted, newest retained
    assert (0, (0,)) not in cache
    assert (0, (n_fit + 19,)) in cache


def test_lru_recency_on_get():
    kv = np.zeros((1, 2, 8), np.int8)
    per = kv.nbytes
    cache = HostKVCache(capacity_bytes=3 * per)
    for i in range(3):
        cache.put((0, (i,)), kv.copy(), None)
    assert cache.get((0, (0,))) is not None  # refresh 0
    cache.put((0, (3,)), kv.copy(), None)    # evicts 1, not 0
    assert (0, (0,)) in cache and (0, (1,)) not in cache


def test_match_host_extension_chain():
    P = 4
    ids = list(range(20))
    cache = HostKVCache(capacity_bytes=1 << 20)
    kv = np.zeros((1, P, 8), np.int8)
    hashes = prefix_hashes(ids, 5, P)
    # store pages 1..3 (page 0 "on device", page 4 absent)
    for j in (1, 2, 3):
        chunk = tuple(ids[j * P : (j + 1) * P])
        cache.put(HostKVCache.key(hashes[j], chunk), kv.copy(), None)
    keys, n = match_host_extension(cache, ids, P, P)
    assert n == 3
    # a different PREFIX to the same chunks must not match (context keying)
    other = [99] * 4 + ids[4:]
    keys2, n2 = match_host_extension(cache, other, P, P)
    assert n2 == 0


# ------------------------------------------------------------ scheduler level


def test_spill_reload_token_identity(params):
    """Fill the tree with prefix A, force eviction via prompt family B,
    re-run A: pages must come back from host (host_injected_tokens > 0) and
    greedy output must equal the no-cache oracle."""
    rng = np.random.default_rng(3)
    prefix_a = list(rng.integers(0, CFG.vocab_size, 24))
    a1 = prefix_a + list(rng.integers(0, CFG.vocab_size, 4))
    a2 = prefix_a + list(rng.integers(0, CFG.vocab_size, 5))
    # enough distinct 30-token families that their tree inserts overflow the
    # 32-page pool several times over -> A's whole chain (shared prefix
    # included) LRU-evicts and spills
    bs = [list(rng.integers(0, CFG.vocab_size, 30)) for _ in range(8)]
    sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)

    engine = make_engine(params)
    sched = engine.scheduler

    out_a1 = engine.scheduler.run_batch([a1], sp)[0]
    # B fills the tight pool -> A's tree pages LRU-evict -> spill to host.
    engine.scheduler.run_batch(bs, sp)
    assert sched.metrics["host_spilled_pages"] > 0
    spilled = sched.metrics["host_spilled_pages"]

    out_a2 = engine.scheduler.run_batch([a2], sp)[0]
    assert sched.metrics["host_injected_tokens"] > 0, (
        "host tier never re-injected", spilled, len(sched.host_cache)
    )

    oracle = naive_greedy(params, CFG, a2, 6)
    assert out_a2 == oracle, (out_a2, oracle)
    # and the first run was correct too
    assert out_a1 == naive_greedy(params, CFG, a1, 6)


def test_host_cache_disabled_is_inert(params):
    engine = make_engine(params, host_cache_bytes=0)
    assert engine.scheduler.host_cache is None
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(0, CFG.vocab_size, 20)) for _ in range(3)]
    sp = SamplingParams(max_new_tokens=4, do_sample=False, eos_id=-1)
    outs = engine.scheduler.run_batch(prompts, sp)
    for p, o in zip(prompts, outs):
        assert o == naive_greedy(params, CFG, p, 4)
