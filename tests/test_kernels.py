"""Pallas kernels vs jnp reference (interpret mode on CPU, SURVEY.md §4.2)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.ops.attention import AttnMeta, make_kv_pool, ref_attention, write_kv
from tpusgl.ops.paged_attention import paged_decode_attention


@pytest.mark.parametrize("Hq,Hkv,D", [(4, 2, 64), (8, 8, 64), (4, 1, 128)])
def test_paged_decode_matches_ref(Hq, Hkv, D):
    rng = np.random.default_rng(0)
    B, T, block = 4, 256, 128
    slots = 1024

    kv_l = jnp.asarray(rng.normal(size=(slots + 1, Hkv * 2 * D)), jnp.float32)
    seq_lens = np.array([7, 130, 256, 1], np.int32)
    kv_rows = np.zeros((B, T), np.int32)
    for b in range(B):
        kv_rows[b, : seq_lens[b]] = rng.choice(
            np.arange(1, slots + 1), size=seq_lens[b], replace=False
        )
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    out_loc = np.array([[kv_rows[b, seq_lens[b] - 1]] for b in range(B)], np.int32)

    meta = AttnMeta(
        kv_rows=jnp.asarray(kv_rows),
        seq_lens=jnp.asarray(seq_lens),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.asarray(seq_lens - 1)[:, None],
        out_loc=jnp.asarray(out_loc),
    )

    ref_out, kv_after = ref_attention(0, q, k_new, v_new, kv_l, meta)

    kv_written = write_kv(k_new, v_new, kv_l, meta.out_loc)
    pal_out = paged_decode_attention(
        q[:, 0], kv_written, meta.kv_rows, meta.seq_lens,
        num_kv_heads=Hkv, block=block, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pal_out), np.asarray(ref_out[:, 0]), rtol=2e-5, atol=2e-5
    )


def test_paged_decode_in_model():
    """pallas_attention as attn_impl end to end on the tiny model."""
    from tpusgl.config import ModelConfig
    from tpusgl.models import qwen2
    from tpusgl.ops.paged_attention import pallas_attention

    cfg = ModelConfig(
        hidden_size=128, num_attention_heads=2, num_key_value_heads=2,
        intermediate_size=128, num_hidden_layers=2, vocab_size=64,
        tie_word_embeddings=True, max_position_embeddings=256, rope_theta=10000.0,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    kv = make_kv_pool(cfg.num_hidden_layers, 256, 2, 64, jnp.float32)
    B = 2
    rows = np.tile(np.arange(1, 129, dtype=np.int32), (B, 1))
    rows[1] += 128
    meta = AttnMeta(
        kv_rows=jnp.asarray(rows),
        seq_lens=jnp.array([5, 9], jnp.int32),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.array([[4], [8]], jnp.int32),
        out_loc=jnp.asarray(rows[:, 4:5]),
    )
    ids = jnp.array([[3], [7]], jnp.int32)

    h_ref, _ = qwen2.forward(params, cfg, ids, meta, kv, attn_impl=ref_attention)
    pal = functools.partial(pallas_attention, interpret=True)
    h_pal, _ = qwen2.forward(params, cfg, ids, meta, kv, attn_impl=pal)
    np.testing.assert_allclose(
        np.asarray(h_ref), np.asarray(h_pal), rtol=2e-5, atol=2e-5
    )
