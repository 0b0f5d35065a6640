"""End-to-end continuous-batching tests on the tiny model (CPU backend).

The oracle is naive dense greedy decode (itself validated token-identical vs
HF in test_model_golden). These cover the scheduler paths of SURVEY.md §3:
admission, prefix caching, decode batching, overlap pipeline, retraction,
and pool conservation invariants (§4.5).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import naive_greedy
from tpusgl.config import EngineConfig, ModelConfig
from tpusgl.models import qwen2
from tpusgl.ops.attention import ref_attention
from tpusgl.runtime.engine import Engine
from tpusgl.runtime.sampling_params import SamplingParams

CFG = ModelConfig(
    hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
    intermediate_size=128, num_hidden_layers=2, vocab_size=256,
    tie_word_embeddings=True, max_position_embeddings=512, rope_theta=10000.0,
)

ECFG = EngineConfig(
    max_total_tokens=512,
    max_requests=8,
    page_size=4,  # small pages so tiny prompts exercise paging + sharing
    decode_bs_buckets=(1, 2, 4, 8),
    prefill_len_buckets=(8, 16, 32, 64),
    kv_len_bucket=64,
)


@pytest.fixture(scope="module")
def params():
    return qwen2.init_params(CFG, jax.random.PRNGKey(42), jnp.float32)


@pytest.fixture()
def engine(params):
    return Engine(
        model_cfg=CFG, engine_cfg=ECFG, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )


@pytest.fixture(scope="module")
def prompts(params):
    rng = np.random.default_rng(7)
    lens = [5, 11, 3, 17, 9, 6]
    return [list(rng.integers(0, CFG.vocab_size, n)) for n in lens]


@pytest.fixture(scope="module")
def oracle(params, prompts):
    return {tuple(p): naive_greedy(params, CFG, p, 8) for p in prompts}


def _assert_pools_conserved(engine):
    sched = engine.scheduler
    free = sched.page_pool.available_size()
    cached = sched.tree.total_cached_tokens()
    assert free + cached == ECFG.max_total_tokens, (free, cached)
    assert sched.req_pool.available_size() == ECFG.max_requests
    assert sched.tree.evictable_size() == cached  # nothing locked at rest


@pytest.mark.parametrize("overlap", [False, True])
def test_greedy_matches_oracle(engine, prompts, oracle, overlap):
    out = engine.generate(
        prompts,
        SamplingParams(max_new_tokens=8, do_sample=False, eos_id=-1),
        enable_overlap=overlap,
    )
    for p, o in zip(prompts, out):
        assert o == oracle[tuple(p)], (p, o, oracle[tuple(p)])
    _assert_pools_conserved(engine)


@pytest.mark.parametrize("overlap", [False, True])
def test_radix_prefix_reuse(engine, prompts, oracle, overlap):
    sp = SamplingParams(max_new_tokens=8, do_sample=False, eos_id=-1)
    first = engine.generate(prompts[:2], sp, enable_overlap=overlap)
    cached_before = engine.metrics["cached_tokens"]
    second = engine.generate(prompts[:2], sp, enable_overlap=overlap)
    assert first == second
    assert engine.metrics["cached_tokens"] > cached_before
    _assert_pools_conserved(engine)


def test_eos_stops_generation(engine, params, prompts):
    # Find what greedy generates first, then set that token as eos.
    p = prompts[0]
    first = naive_greedy(params, CFG, p, 2)[0]
    out = engine.generate(
        [p], SamplingParams(max_new_tokens=8, do_sample=False, eos_id=first)
    )[0]
    assert out == [first]
    _assert_pools_conserved(engine)


@pytest.mark.parametrize("overlap", [False, True])
def test_retraction_under_memory_pressure(params, prompts, oracle, overlap):
    """A pool too small for all requests forces retraction; with output-
    preserving retraction the final greedy outputs must be unchanged."""
    # 64-token pool, 2 request slots (context rows of 32): decode needs
    # 2 * retract_decode_steps = 40 free tokens, so retraction must fire.
    small = dataclasses.replace(
        ECFG, max_total_tokens=64, max_requests=2,
        decode_bs_buckets=(1, 2), prefill_len_buckets=(8, 16, 32),
        kv_len_bucket=16,
    )
    engine = Engine(
        model_cfg=CFG, engine_cfg=small, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    out = engine.generate(
        prompts,
        SamplingParams(max_new_tokens=8, do_sample=False, eos_id=-1),
        enable_overlap=overlap,
    )
    for p, o in zip(prompts, out):
        assert o == {tuple(k): v for k, v in
                     [(tuple(pp), oracle[tuple(pp)]) for pp in prompts]}[tuple(p)]
    sched = engine.scheduler
    free = sched.page_pool.available_size()
    cached = sched.tree.total_cached_tokens()
    assert free + cached == small.max_total_tokens


def test_static_batching(engine, prompts, oracle):
    out = engine.scheduler.run_batch_static(
        prompts, SamplingParams(max_new_tokens=8, do_sample=False, eos_id=-1)
    )
    for p, o in zip(prompts, out):
        assert o == oracle[tuple(p)]


def test_sampled_decode_reproducible(engine, prompts):
    sp = SamplingParams(
        max_new_tokens=8, do_sample=True, temperature=0.8, top_k=20, top_p=0.9,
        eos_id=-1,
    )
    out1 = engine.generate(prompts[:3], sp)
    assert all(len(o) == 8 for o in out1)
    _assert_pools_conserved(engine)


@pytest.mark.parametrize("overlap", [False, True])
def test_generate_stream_matches_generate(engine, prompts, oracle, overlap):
    """generate_stream yields every token exactly once, in per-request
    order, and the concatenation equals the batch-generate output."""
    sp = SamplingParams(max_new_tokens=8, do_sample=False, eos_id=-1)
    streamed = {i: [] for i in range(len(prompts))}
    finished = set()
    for i, new, fin in engine.generate_stream(
        prompts, sp, enable_overlap=overlap
    ):
        assert i not in finished, "tokens after finish event"
        streamed[i].extend(new)
        if fin:
            finished.add(i)
    assert finished == set(range(len(prompts)))
    for i, p in enumerate(prompts):
        assert streamed[i] == oracle[tuple(p)], (i, streamed[i])
    _assert_pools_conserved(engine)


@pytest.mark.parametrize("window", [1, 4])
def test_context_full_request_under_overlap(params, window):
    """A request whose prompt + max_new_tokens exactly fills max_context_len
    must complete under overlap: while its finishing commit is in flight it
    sits in `decoding` with a full context row and must not be selected for
    another decode step (regression: empty out_loc slice crash)."""
    ecfg = EngineConfig(
        max_total_tokens=8 * 64,
        max_requests=8,  # max_context_len = 64
        page_size=4,
        decode_bs_buckets=(1, 2, 4, 8),
        prefill_len_buckets=(8, 16, 32, 64),
        kv_len_bucket=64,
        decode_window=window,
    )
    eng = Engine(
        model_cfg=CFG, engine_cfg=ecfg, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    C = eng.cfg.max_context_len
    prompt = list(np.random.default_rng(3).integers(0, CFG.vocab_size, 16))
    sp = SamplingParams(max_new_tokens=C - len(prompt), do_sample=False, eos_id=-1)
    out = eng.scheduler.run_batch([prompt], sp, overlap=True)
    assert len(out[0]) == C - len(prompt)
    _assert_pools_conserved_cfg(eng, ecfg)


def _assert_pools_conserved_cfg(engine, ecfg):
    sched = engine.scheduler
    free = sched.page_pool.available_size()
    cached = sched.tree.total_cached_tokens()
    assert free + cached == ecfg.max_total_tokens, (free, cached)
    assert sched.req_pool.available_size() == ecfg.max_requests


# ------------------------------------------------------------ chunked prefill

def _small_chunk_engine(params, **over):
    # prefill_chunk = prefill_len_buckets[-1] = 16, so a 40-token prompt
    # runs as a 3-chunk series.
    ecfg = EngineConfig(
        max_total_tokens=512, max_requests=8, page_size=4,
        decode_bs_buckets=(1, 2, 4, 8), prefill_len_buckets=(8, 16),
        kv_len_bucket=16, **over,
    )
    return Engine(
        model_cfg=CFG, engine_cfg=ecfg, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    ), ecfg


@pytest.mark.parametrize("overlap", [False, True])
def test_chunked_prefill_matches_oracle(params, overlap):
    """A prompt longer than the largest prefill bucket runs as a chunk
    series and must produce the same greedy tokens as the dense oracle."""
    eng, ecfg = _small_chunk_engine(params)
    rng = np.random.default_rng(12)
    prompt = list(rng.integers(0, CFG.vocab_size, 40))
    want = naive_greedy(params, CFG, prompt, 6)
    out = eng.generate(
        [prompt], SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1),
        enable_overlap=overlap,
    )
    assert out[0] == want, (out[0], want)
    _assert_pools_conserved_cfg(eng, ecfg)


def test_chunked_prefill_interleaves_decode(params):
    """While a long prompt prefills chunk by chunk, decode steps for an
    already-running request must execute BETWEEN the chunks (VERDICT r2
    #6: the old implementation ran all chunks inside one submission and
    stalled every decoder)."""
    eng, ecfg = _small_chunk_engine(params)
    sched = eng.scheduler
    rng = np.random.default_rng(13)
    short = list(rng.integers(0, CFG.vocab_size, 5))
    long = list(rng.integers(0, CFG.vocab_size, 48))  # 3 chunks of 16

    log = []
    real_prefill, real_decode = sched.steps.prefill, sched.steps.decode

    def spy_prefill(state, req_idx, ids, seq_len, prefix_len, *a, **k):
        # Distinguish chunk steps (batch of 1, ext pulled from chunk state).
        log.append("chunk" if sched.chunking is not None else "prefill")
        return real_prefill(state, req_idx, ids, seq_len, prefix_len, *a, **k)

    def spy_decode(*a, **k):
        log.append("decode")
        return real_decode(*a, **k)

    sched.steps.prefill = spy_prefill
    sched.steps.decode = spy_decode

    want_short = naive_greedy(params, CFG, short, 24)
    want_long = naive_greedy(params, CFG, long, 6)
    sp = SamplingParams(max_new_tokens=24, do_sample=False, eos_id=-1)
    sp_long = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)
    a = sched.enqueue_requests([short], sp)[0]
    b = sched.enqueue_requests([long], sp_long)[0]
    sched.run_until_done(overlap=True)

    assert a.output_ids == want_short
    assert b.output_ids == want_long
    chunk_idx = [i for i, m in enumerate(log) if m == "chunk"]
    assert len(chunk_idx) >= 2, log  # non-final chunks went through the spy
    interleaved = any(
        any(m == "decode" for m in log[i + 1 : j])
        for i, j in zip(chunk_idx, chunk_idx[1:])
    ) or any(
        m == "decode" for m in log[chunk_idx[-1] + 1 :]
    )
    assert interleaved, f"no decode step ran between prefill chunks: {log}"
    _assert_pools_conserved_cfg(eng, ecfg)


def test_subpage_prefix_reuse(params):
    """A shared prefix SHORTER than a page is reused via the tail copy-in
    (radix match_tail + steps.copy_pages): previously page-granular sharing
    lost every sub-page prefix (VERDICT r2 #9; reference radix_cache.py:40-98
    is token-granular)."""
    ecfg = ECFG.replace(page_size=8)
    eng = Engine(
        model_cfg=CFG, engine_cfg=ecfg, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    rng = np.random.default_rng(21)
    base = list(rng.integers(0, CFG.vocab_size, 6))  # < page_size
    p1 = base + list(rng.integers(0, CFG.vocab_size, 5))
    p2 = base + list(rng.integers(0, CFG.vocab_size, 7))
    sp = SamplingParams(max_new_tokens=8, do_sample=False, eos_id=-1)

    out1 = eng.generate([p1], sp)[0]
    assert eng.metrics["tail_cached_tokens"] == 0
    out2 = eng.generate([p2], sp)[0]
    assert eng.metrics["tail_cached_tokens"] >= len(base) - 1
    assert out1 == naive_greedy(params, CFG, p1, 8)
    assert out2 == naive_greedy(params, CFG, p2, 8)

    sched = eng.scheduler
    free = sched.page_pool.available_size()
    cached = sched.tree.total_cached_tokens()
    assert free + cached == ecfg.max_total_tokens // ecfg.page_size * ecfg.page_size
    assert sched.req_pool.available_size() == ecfg.max_requests


def test_subpage_tail_plus_aligned_pages(params):
    """Tail reuse composes with whole-page reuse: a prefix of 1 page + a
    partial page reuses both (aligned pages shared, tail copied)."""
    ecfg = ECFG.replace(page_size=4)
    eng = Engine(
        model_cfg=CFG, engine_cfg=ecfg, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    rng = np.random.default_rng(22)
    base = list(rng.integers(0, CFG.vocab_size, 7))  # 1 page + 3 tail tokens
    p1 = base + list(rng.integers(0, CFG.vocab_size, 6))
    p2 = base + list(rng.integers(0, CFG.vocab_size, 4))
    sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)

    eng.generate([p1], sp)
    out2 = eng.generate([p2], sp)[0]
    assert eng.metrics["tail_cached_tokens"] >= 3
    assert eng.metrics["cached_tokens"] >= 7
    assert out2 == naive_greedy(params, CFG, p2, 6)


def test_many_tiny_requests_page_granular_admission(params):
    """Admission budgets in whole pages: a flood of tiny prompts (each
    needing a full page despite a handful of tokens) must be throttled and
    served in waves — the old token-denominated estimate over-admitted and
    crashed with 'Prefill OOM' (review finding, round 4)."""
    ecfg = dataclasses.replace(
        ECFG, max_total_tokens=128, max_requests=8, page_size=16,
        prefill_len_buckets=(8, 16), kv_len_bucket=16,
        decode_bs_buckets=(1, 2, 4, 8),
    )
    engine = Engine(
        model_cfg=CFG, engine_cfg=ecfg, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    rng = np.random.default_rng(9)
    prompts = [list(rng.integers(0, CFG.vocab_size, 3)) for _ in range(12)]
    sp = SamplingParams(max_new_tokens=4, do_sample=False, eos_id=-1)
    outs = engine.scheduler.run_batch(prompts, sp)
    from tests.conftest import naive_greedy

    for p, o in zip(prompts, outs):
        assert o == naive_greedy(params, CFG, p, 4)
