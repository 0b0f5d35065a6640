"""Prompt-lookup speculative decoding (the reference's unimplemented
roadmap item, /root/reference/README.md:52): greedy-exactness and
acceptance accounting."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.config import EngineConfig, ModelConfig
from tpusgl.models import qwen2
from tpusgl.ops.attention import ref_attention
from tpusgl.runtime.engine import Engine
from tpusgl.runtime.sampling_params import SamplingParams

CFG = ModelConfig(
    hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
    intermediate_size=128, num_hidden_layers=2, vocab_size=128,
    tie_word_embeddings=True, max_position_embeddings=512, rope_theta=10000.0,
)

BASE = dict(
    max_total_tokens=1024, max_requests=4,
    decode_bs_buckets=(1, 2, 4), prefill_len_buckets=(8, 16, 32, 64),
    kv_len_bucket=64,
)


@pytest.fixture(scope="module")
def params():
    return qwen2.init_params(CFG, jax.random.PRNGKey(7), jnp.float32)


def _prompts():
    rng = np.random.default_rng(3)
    # Repetitive prompts: n-gram lookup finds real continuations, so
    # acceptance is exercised; plus one random prompt (mostly rejected
    # drafts — exercises rollback).
    pat = list(rng.integers(0, CFG.vocab_size, 6))
    return [
        pat * 5,
        list(rng.integers(0, CFG.vocab_size, 17)),
        (pat + [5, 6]) * 3,
    ]


@pytest.mark.parametrize("overlap", [False, True])
def test_spec_greedy_token_identical(params, overlap):
    """Speculation must be EXACT for greedy decode: token-identical output
    vs the plain engine, for every request."""
    sp = SamplingParams(max_new_tokens=24, do_sample=False, eos_id=-1)
    plain = Engine(
        model_cfg=CFG, engine_cfg=EngineConfig(**BASE), params=params,
        dtype=jnp.float32, attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    expected = plain.generate(_prompts(), sp)

    eng = Engine(
        model_cfg=CFG,
        engine_cfg=EngineConfig(**BASE, speculative_tokens=3),
        params=params, dtype=jnp.float32, attn_impl=ref_attention,
        sample_k_cap=CFG.vocab_size,
    )
    got = eng.generate(_prompts(), sp, enable_overlap=overlap)
    assert got == expected
    m = eng.metrics
    assert m.get("spec_steps", 0) > 0
    # Repetitive prompts must actually accept drafts (the speedup).
    assert m.get("spec_accepted", 0) > 0
    # Verify steps replace 1-token decode steps: fewer steps than tokens.
    assert m["decode_steps"] < m["decode_tokens"]


def test_spec_respects_eos_and_max_new(params):
    """A draft beyond eos / max_new_tokens must not be committed."""
    sp = SamplingParams(max_new_tokens=5, do_sample=False, eos_id=-1)
    eng = Engine(
        model_cfg=CFG,
        engine_cfg=EngineConfig(**BASE, speculative_tokens=3),
        params=params, dtype=jnp.float32, attn_impl=ref_attention,
        sample_k_cap=CFG.vocab_size,
    )
    outs = eng.generate(_prompts(), sp)
    assert all(len(o) == 5 for o in outs)


def test_spec_sampling_falls_back(params):
    """do_sample batches run the normal decode path (speculation is
    greedy-only); generation still works."""
    sp = SamplingParams(max_new_tokens=8, do_sample=True, temperature=1.0,
                        eos_id=-1)
    eng = Engine(
        model_cfg=CFG,
        engine_cfg=EngineConfig(**BASE, speculative_tokens=3),
        params=params, dtype=jnp.float32, attn_impl=ref_attention,
        sample_k_cap=CFG.vocab_size,
    )
    outs = eng.generate(_prompts(), sp)
    assert all(len(o) == 8 for o in outs)
    assert eng.metrics.get("spec_steps", 0) == 0


def test_spec_pool_accounting(params):
    """After a spec-heavy run, pool accounting balances: free + tree-held
    pages == total (rejected-draft pages were rolled back)."""
    sp = SamplingParams(max_new_tokens=16, do_sample=False, eos_id=-1)
    eng = Engine(
        model_cfg=CFG,
        engine_cfg=EngineConfig(**BASE, speculative_tokens=3),
        params=params, dtype=jnp.float32, attn_impl=ref_attention,
        sample_k_cap=CFG.vocab_size,
    )
    eng.generate(_prompts(), sp)
    sched = eng.scheduler
    # All requests finished -> every tree node is unlocked; free pool +
    # evictable tree tokens must account for the whole pool.
    assert (
        sched.page_pool.available_size() + sched.tree.evictable_size()
        == eng.cfg.max_total_tokens
    )


def test_spec_auto_disable_fires_and_reprobes(params):
    """VERDICT r4 #4a: a low-value speculation workload must trip the
    rolling gate (acceptance OR tokens/req/step) and turn speculation off
    for speculative_reprobe_interval decode steps — bounding the harm —
    then re-probe. Counts only, so multihost processes decide identically."""
    import dataclasses

    ecfg = EngineConfig(
        **BASE, speculative_tokens=4,
        speculative_probe_steps=4, speculative_reprobe_interval=16,
    )
    engine = Engine(
        model_cfg=CFG, engine_cfg=ecfg, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    rng = np.random.default_rng(9)
    # pure-random prompts: a random-weight greedy model loops quickly, so
    # the few drafts found are accepted, but most rows draft nothing ->
    # the tokens/req/step gate fires even at high acceptance
    prompts = [list(rng.integers(0, CFG.vocab_size, n)) for n in (24, 31, 19)]
    sp = SamplingParams(max_new_tokens=96, do_sample=False, eos_id=-1)
    out = engine.scheduler.run_batch(prompts, sp, overlap=False)
    m = engine.scheduler.metrics
    assert m.get("spec_steps", 0) >= 4, m
    assert m.get("spec_disables", 0) >= 1, (
        "gate never fired", m.get("spec_steps"), m.get("spec_proposed"),
        m.get("spec_accepted"))
    # and the outputs are still exactly greedy (disable/re-probe cannot
    # change committed tokens)
    plain = EngineConfig(**BASE)
    eng2 = Engine(
        model_cfg=CFG, engine_cfg=plain, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    assert out == eng2.scheduler.run_batch(prompts, sp, overlap=False)
