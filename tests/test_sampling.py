"""Fused sampling op vs a numpy re-statement of the reference semantics
(/root/reference/sample.py:19-90)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.ops.sampling import SamplingArrays, sample_tokens


def np_reference_filter(logits, temperature, top_k, top_p, presence, penalty):
    """Numpy port of sample.py's penalty → temperature → top-k → top-p chain,
    returning the filtered logits (−inf where masked)."""
    logits = logits.astype(np.float64).copy()
    if penalty > 1.0:
        for tid in np.nonzero(presence)[0]:
            v = logits[tid]
            logits[tid] = v / penalty if v > 0 else v * penalty
    t = temperature if temperature and temperature > 0 else 1.0
    scaled = logits / t
    if top_k and top_k > 0:
        kth = np.sort(scaled)[::-1][min(top_k, len(scaled)) - 1]
        scaled = np.where(scaled < kth, -np.inf, scaled)
    if top_p and top_p < 1.0:
        order = np.argsort(-scaled)
        probs = np.exp(scaled[order] - np.max(scaled))
        probs = probs / probs.sum()
        cumsum = np.cumsum(probs)
        cutoff = cumsum > top_p
        cutoff[0] = False
        drop = order[cutoff]
        scaled[drop] = -np.inf
    return scaled


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_filtered_support_matches_reference(seed):
    rng = np.random.default_rng(seed)
    V, B = 64, 5
    logits = rng.normal(size=(B, V)).astype(np.float32) * 3
    presence = rng.random((B, V)) < 0.2
    temps = rng.uniform(0.3, 1.5, B).astype(np.float32)
    top_ks = rng.integers(0, 20, B).astype(np.int32)
    top_ps = rng.uniform(0.5, 1.0, B).astype(np.float32)
    penalties = rng.uniform(1.0, 1.5, B).astype(np.float32)

    samp = SamplingArrays(
        temperature=jnp.asarray(temps),
        top_k=jnp.asarray(top_ks),
        top_p=jnp.asarray(top_ps),
        do_sample=jnp.ones((B,), jnp.bool_),
        penalty=jnp.asarray(penalties),
    )
    # Sample many times; every drawn token must be in the reference support.
    draws = []
    for i in range(200):
        ids = sample_tokens(
            jax.random.PRNGKey(seed * 1000 + i), jnp.asarray(logits), samp,
            presence=jnp.asarray(presence), k_cap=V,
        )
        draws.append(np.asarray(ids))
    draws = np.stack(draws)  # [200, B]
    for b in range(B):
        ref = np_reference_filter(
            logits[b], temps[b], int(top_ks[b]), top_ps[b], presence[b], penalties[b]
        )
        support = set(np.nonzero(np.isfinite(ref))[0].tolist())
        assert set(draws[:, b].tolist()) <= support


def test_greedy_is_argmax_after_penalty():
    V = 16
    logits = np.zeros((1, V), np.float32)
    logits[0, 3] = 5.0
    logits[0, 7] = 4.0
    presence = np.zeros((1, V), bool)
    presence[0, 3] = True
    samp = SamplingArrays.full(1, penalty=10.0, do_sample=False)
    ids = sample_tokens(
        jax.random.PRNGKey(0), jnp.asarray(logits), samp,
        presence=jnp.asarray(presence), k_cap=V,
    )
    assert int(ids[0]) == 7  # 5.0/10 < 4.0


def test_top_k_one_is_greedy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 32)).astype(np.float32)
    samp = SamplingArrays.full(4, do_sample=True, top_k=1, temperature=1.0)
    for i in range(20):
        ids = sample_tokens(jax.random.PRNGKey(i), jnp.asarray(logits), samp, k_cap=32)
        np.testing.assert_array_equal(np.asarray(ids), logits.argmax(-1))


def test_temperature_distribution():
    logits = np.array([[0.0, np.log(3.0)]], np.float32)  # p = [0.25, 0.75]
    samp = SamplingArrays.full(1, do_sample=True, temperature=1.0)
    n = 2000
    key = jax.random.PRNGKey(0)
    counts = np.zeros(2)
    keys = jax.random.split(key, n)
    for k in keys:
        counts[int(sample_tokens(k, jnp.asarray(logits), samp, k_cap=2)[0])] += 1
    assert abs(counts[1] / n - 0.75) < 0.04


def test_constraint_mask_restricts_support():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 32)).astype(np.float32)
    cmask = np.full((2, 32), -1e30, np.float32)
    cmask[0, [4, 9]] = 0.0
    cmask[1, [0]] = 0.0
    samp = SamplingArrays.full(2, do_sample=True, temperature=1.0)
    for i in range(30):
        ids = np.asarray(
            sample_tokens(
                jax.random.PRNGKey(i), jnp.asarray(logits), samp,
                constraint_mask=jnp.asarray(cmask), k_cap=32,
            )
        )
        assert ids[0] in (4, 9)
        assert ids[1] == 0
