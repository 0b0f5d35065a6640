"""Pallas kernels vs jnp reference (interpret mode on CPU, SURVEY.md §4.2)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.ops.attention import (
    AttnMeta,
    make_kv_pool,
    ref_attention,
    rows_from_pages,
    write_kv,
)
from tpusgl.ops.paged_attention import paged_decode_attention, pallas_attention


def _random_tbl(rng, B, pages_per_seq, n_pages):
    tbl = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        tbl[b] = rng.choice(
            np.arange(1, n_pages + 1), size=pages_per_seq, replace=False
        )
    return tbl


@pytest.mark.parametrize(
    "Hq,Hkv,D,P", [(14, 2, 64, 32), (12, 2, 128, 16), (8, 8, 64, 8), (4, 1, 128, 4)]
)
def test_paged_decode_matches_ref(Hq, Hkv, D, P):
    rng = np.random.default_rng(0)
    B, pages_per_seq, n_pages = 4, 8, 64
    T = pages_per_seq * P

    kv_l = jnp.asarray(rng.normal(size=((n_pages + 1) * P, Hkv * 2 * D)), jnp.float32)
    tbl = _random_tbl(rng, B, pages_per_seq, n_pages)
    seq_lens = np.array([1, P + 3, T, 2 * P], np.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)

    out = paged_decode_attention(
        q, kv_l, jnp.asarray(seq_lens), jnp.asarray(tbl),
        num_kv_heads=Hkv, page_size=P, pages_per_block=4, interpret=True,
    )

    rows = rows_from_pages(jnp.asarray(tbl), T, P)
    meta = AttnMeta(
        kv_rows=rows,
        seq_lens=jnp.asarray(seq_lens),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.asarray(seq_lens - 1)[:, None],
        out_loc=jnp.zeros((B, 1), jnp.int32),
    )
    ref, _ = ref_attention(
        0, q[:, None], jnp.zeros((B, 1, Hkv, D), jnp.float32),
        jnp.zeros((B, 1, Hkv, D), jnp.float32), kv_l, meta,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[:, 0]), rtol=2e-5, atol=2e-5
    )


def test_paged_decode_int8_kv_scales():
    rng = np.random.default_rng(1)
    Hq, Hkv, D, P = 4, 2, 64, 8
    B, pages_per_seq, n_pages = 2, 4, 32
    T = pages_per_seq * P
    scale = 0.04
    kv_i8 = rng.integers(-127, 127, ((n_pages + 1) * P, Hkv * 2 * D)).astype(np.int8)
    tbl = _random_tbl(rng, B, pages_per_seq, n_pages)
    seq_lens = np.array([T, P + 1], np.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)

    out = paged_decode_attention(
        q, jnp.asarray(kv_i8), jnp.asarray(seq_lens), jnp.asarray(tbl),
        num_kv_heads=Hkv, page_size=P, pages_per_block=2,
        k_scale=scale, v_scale=scale, interpret=True,
    )
    # reference: dequantized pool through the jnp path
    kv_f = jnp.asarray(kv_i8.astype(np.float32) * scale)
    rows = rows_from_pages(jnp.asarray(tbl), T, P)
    meta = AttnMeta(
        kv_rows=rows, seq_lens=jnp.asarray(seq_lens),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.asarray(seq_lens - 1)[:, None],
        out_loc=jnp.zeros((B, 1), jnp.int32),
    )
    ref, _ = ref_attention(
        0, q[:, None], jnp.zeros((B, 1, Hkv, D), jnp.float32),
        jnp.zeros((B, 1, Hkv, D), jnp.float32), kv_f, meta,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[:, 0]), rtol=2e-4, atol=2e-4
    )


def test_paged_decode_per_token_kv_scales():
    """INT8 KV with per-token per-head scales: write path quantizes, kernel
    dequantizes via the scale pool; compare against the bf16 jnp path."""
    rng = np.random.default_rng(2)
    Hq, Hkv, D, P = 4, 2, 64, 8
    B, pages_per_seq, n_pages = 2, 4, 32
    T = pages_per_seq * P
    rows_total = (n_pages + 1) * P

    kv_f = jnp.asarray(rng.normal(size=(rows_total, Hkv * 2 * D)), jnp.float32)
    # Quantize the full pool through write_kv's per-token path.
    k_all = kv_f.reshape(rows_total, 2, Hkv, D)[:, 0][None]
    v_all = kv_f.reshape(rows_total, 2, Hkv, D)[:, 1][None]
    from tpusgl.ops.attention import scale_rows_per_page

    pair = (
        jnp.zeros((rows_total, Hkv * 2 * D), jnp.int8),
        jnp.zeros(
            ((rows_total // P) * scale_rows_per_page(Hkv), P), jnp.float32
        ),
    )
    pair = write_kv(
        k_all, v_all, pair, jnp.arange(rows_total, dtype=jnp.int32)[None, :]
    )
    buf, sc = pair

    tbl = _random_tbl(rng, B, pages_per_seq, n_pages)
    seq_lens = np.array([T, P + 1], np.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)

    out = paged_decode_attention(
        q, buf, jnp.asarray(seq_lens), jnp.asarray(tbl),
        num_kv_heads=Hkv, page_size=P, pages_per_block=2,
        kv_scale=sc, interpret=True,
    )
    rows = rows_from_pages(jnp.asarray(tbl), T, P)
    meta = AttnMeta(
        kv_rows=rows, seq_lens=jnp.asarray(seq_lens),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.asarray(seq_lens - 1)[:, None],
        out_loc=jnp.zeros((B, 1), jnp.int32),
    )
    ref, _ = ref_attention(
        0, q[:, None], jnp.zeros((B, 1, Hkv, D), jnp.float32),
        jnp.zeros((B, 1, Hkv, D), jnp.float32), kv_f, meta,
    )
    # int8 per-token quantization error bound, not kernel error
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[:, 0]), rtol=0.05, atol=0.05
    )
    # and the kernel must agree tightly with the jnp path over the SAME
    # quantized pool
    ref_q, _ = ref_attention(
        0, q[:, None], jnp.zeros((B, 1, Hkv, D), jnp.float32),
        jnp.zeros((B, 1, Hkv, D), jnp.float32), pair, meta,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_q[:, 0]), rtol=2e-4, atol=2e-4
    )


def test_pallas_attention_in_model():
    """pallas_attention as attn_impl end to end on a tiny model (decode path
    through the kernel, page-table metadata)."""
    from tpusgl.config import ModelConfig
    from tpusgl.models import qwen2

    cfg = ModelConfig(
        hidden_size=128, num_attention_heads=2, num_key_value_heads=2,
        intermediate_size=128, num_hidden_layers=2, vocab_size=64,
        tie_word_embeddings=True, max_position_embeddings=256, rope_theta=10000.0,
    )
    P = 8
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    kv = make_kv_pool(cfg.num_hidden_layers, 256, 2, 64, jnp.float32, page_size=P)
    B, pages_per_seq = 2, 4
    tbl = np.zeros((B, pages_per_seq), np.int32)
    tbl[0] = [1, 2, 3, 4]
    tbl[1] = [5, 6, 7, 8]
    T = pages_per_seq * P
    rows = np.asarray(rows_from_pages(jnp.asarray(tbl), T, P))
    seq_lens = np.array([5, 9], np.int32)
    out_loc = np.array(
        [[rows[0, 4]], [rows[1, 8]]], np.int32
    )
    base = dict(
        seq_lens=jnp.asarray(seq_lens),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.asarray(seq_lens - 1)[:, None],
        out_loc=jnp.asarray(out_loc),
    )
    meta_ref = AttnMeta(kv_rows=jnp.asarray(rows), **base)
    meta_pal = AttnMeta(kv_rows=None, page_tbl=jnp.asarray(tbl), **base)
    ids = jnp.array([[3], [7]], jnp.int32)

    h_ref, _ = qwen2.forward(params, cfg, ids, meta_ref, kv, attn_impl=ref_attention)
    pal = functools.partial(pallas_attention, page_size=P, pages_per_block=2,
                            interpret=True)
    h_pal, _ = qwen2.forward(params, cfg, ids, meta_pal, kv, attn_impl=pal)
    np.testing.assert_allclose(
        np.asarray(h_ref), np.asarray(h_pal), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize(
    "Hq,Hkv,D,P,M", [(14, 2, 64, 32, 2), (8, 8, 64, 8, 2), (4, 1, 128, 4, 2),
                     (14, 2, 64, 32, 4)]
)
def test_paged_decode_grouped_matches_ref(Hq, Hkv, D, P, M):
    """M-sequence merged kernel (block-diagonal compute) vs the jnp path,
    including an empty (padding) member inside a group and skewed lengths."""
    rng = np.random.default_rng(7)
    B, pages_per_seq, n_pages = 8, 8, 64
    T = pages_per_seq * P

    kv_l = jnp.asarray(rng.normal(size=((n_pages + 1) * P, Hkv * 2 * D)), jnp.float32)
    tbl = _random_tbl(rng, B, pages_per_seq, n_pages)
    # pairs: (tiny, huge), (0-length padding, mid), (equal, equal), ...
    seq_lens = np.array([1, T, 0, 2 * P + 3, P, P, T, 3], np.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)

    out = paged_decode_attention(
        q, kv_l, jnp.asarray(seq_lens), jnp.asarray(tbl),
        num_kv_heads=Hkv, page_size=P, pages_per_block=4,
        merge_seqs=M, interpret=True,
    )

    rows = rows_from_pages(jnp.asarray(tbl), T, P)
    meta = AttnMeta(
        kv_rows=rows,
        seq_lens=jnp.asarray(seq_lens),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.asarray(np.maximum(seq_lens - 1, 0))[:, None],
        out_loc=jnp.zeros((B, 1), jnp.int32),
    )
    ref, _ = ref_attention(
        0, q[:, None], jnp.zeros((B, 1, Hkv, D), jnp.float32),
        jnp.zeros((B, 1, Hkv, D), jnp.float32), kv_l, meta,
    )
    live = seq_lens > 0  # empty members produce unused (finite) rows
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref[:, 0])[live], rtol=2e-5, atol=2e-5
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_paged_decode_grouped_per_token_scales():
    """Grouped kernel over the int8 per-token-scale write path."""
    rng = np.random.default_rng(8)
    Hq, Hkv, D, P = 4, 2, 64, 8
    B, pages_per_seq, n_pages = 4, 4, 32
    T = pages_per_seq * P
    rows_total = (n_pages + 1) * P

    kv_f = jnp.asarray(rng.normal(size=(rows_total, Hkv * 2 * D)), jnp.float32)
    k_all = kv_f.reshape(rows_total, 2, Hkv, D)[:, 0][None]
    v_all = kv_f.reshape(rows_total, 2, Hkv, D)[:, 1][None]
    from tpusgl.ops.attention import scale_rows_per_page

    pair = (
        jnp.zeros((rows_total, Hkv * 2 * D), jnp.int8),
        jnp.zeros(
            ((rows_total // P) * scale_rows_per_page(Hkv), P), jnp.float32
        ),
    )
    pair = write_kv(
        k_all, v_all, pair, jnp.arange(rows_total, dtype=jnp.int32)[None, :]
    )
    buf, sc = pair

    tbl = _random_tbl(rng, B, pages_per_seq, n_pages)
    seq_lens = np.array([T, P + 1, 2 * P, 5], np.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)

    out = paged_decode_attention(
        q, buf, jnp.asarray(seq_lens), jnp.asarray(tbl),
        num_kv_heads=Hkv, page_size=P, pages_per_block=2,
        kv_scale=sc, merge_seqs=2, interpret=True,
    )
    rows = rows_from_pages(jnp.asarray(tbl), T, P)
    meta = AttnMeta(
        kv_rows=rows, seq_lens=jnp.asarray(seq_lens),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.asarray(seq_lens - 1)[:, None],
        out_loc=jnp.zeros((B, 1), jnp.int32),
    )
    ref_q, _ = ref_attention(
        0, q[:, None], jnp.zeros((B, 1, Hkv, D), jnp.float32),
        jnp.zeros((B, 1, Hkv, D), jnp.float32), pair, meta,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_q[:, 0]), rtol=2e-4, atol=2e-4
    )


def test_paged_decode_grouped_int8_static_scales():
    """Grouped kernel with static per-layer k/v scales (int8 KV)."""
    rng = np.random.default_rng(9)
    Hq, Hkv, D, P = 4, 2, 64, 8
    B, pages_per_seq, n_pages = 2, 4, 32
    T = pages_per_seq * P
    scale = 0.04
    kv_i8 = rng.integers(-127, 127, ((n_pages + 1) * P, Hkv * 2 * D)).astype(np.int8)
    tbl = _random_tbl(rng, B, pages_per_seq, n_pages)
    seq_lens = np.array([T, P + 1], np.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)

    out = paged_decode_attention(
        q, jnp.asarray(kv_i8), jnp.asarray(seq_lens), jnp.asarray(tbl),
        num_kv_heads=Hkv, page_size=P, pages_per_block=2,
        k_scale=scale, v_scale=scale, merge_seqs=2, interpret=True,
    )
    kv_f = jnp.asarray(kv_i8.astype(np.float32) * scale)
    rows = rows_from_pages(jnp.asarray(tbl), T, P)
    meta = AttnMeta(
        kv_rows=rows, seq_lens=jnp.asarray(seq_lens),
        ext_lens=jnp.ones((B,), jnp.int32),
        positions=jnp.asarray(seq_lens - 1)[:, None],
        out_loc=jnp.zeros((B, 1), jnp.int32),
    )
    ref, _ = ref_attention(
        0, q[:, None], jnp.zeros((B, 1, Hkv, D), jnp.float32),
        jnp.zeros((B, 1, Hkv, D), jnp.float32), kv_f, meta,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[:, 0]), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("M", [1, 8, 100])
def test_quant_matmul_int8(M):
    from tpusgl.ops.linear import dequantize_weight, init_linear, quantize_linear_int8
    from tpusgl.ops.quant_matmul import quant_matmul_any

    lin = init_linear(jax.random.PRNGKey(0), None, 256, 384, jnp.float32, bias=True)
    q = quantize_linear_int8(lin)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, 256), jnp.float32)
    y = quant_matmul_any(x, q, interpret=True)
    y_ref = x @ dequantize_weight(q, jnp.float32) + q["b"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_quant_matmul_int4_groupwise():
    from tpusgl.ops.linear import dequantize_weight, init_linear, quantize_linear_int4
    from tpusgl.ops.quant_matmul import quant_matmul_any

    lin = init_linear(jax.random.PRNGKey(2), None, 512, 256, jnp.float32, bias=False)
    q = quantize_linear_int4(lin, group_size=128)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 512), jnp.float32)
    y = quant_matmul_any(x, q, interpret=True)
    y_ref = x @ dequantize_weight(q, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_quant_matmul_int4_group64_multigroup_block():
    """Group 64 (the production int4 group): narrower than the 128-lane
    block minimum, so the kernel packs 2 groups per k step with a
    transposed-x layout — must match the jnp dequant reference exactly."""
    from tpusgl.ops.linear import dequantize_weight, init_linear, quantize_linear_int4
    from tpusgl.ops.quant_matmul import quant_matmul_any

    lin = init_linear(jax.random.PRNGKey(6), None, 512, 256, jnp.float32, bias=False)
    q = quantize_linear_int4(lin, group_size=64)
    for M in (1, 16, 100):
        x = jax.random.normal(jax.random.PRNGKey(M), (M, 512), jnp.float32)
        y = quant_matmul_any(x, q, interpret=True)
        y_ref = x @ dequantize_weight(q, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4
        )


def test_quant_matmul_leading_dims_and_fallback():
    from tpusgl.ops.linear import init_linear, quantize_linear_int8
    from tpusgl.ops.quant_matmul import quant_matmul_any

    lin = init_linear(jax.random.PRNGKey(4), None, 256, 384, jnp.float32, bias=False)
    q = quantize_linear_int8(lin)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 256), jnp.float32)
    y = quant_matmul_any(x, q, interpret=True)
    assert y.shape == (2, 3, 384)
    # untileable N -> ValueError for the apply_linear fallback
    bad = {"w": jnp.zeros((256, 100), jnp.int8), "s": jnp.ones((100,), jnp.float32)}
    with pytest.raises(ValueError):
        quant_matmul_any(jnp.zeros((4, 256)), bad, interpret=True)
