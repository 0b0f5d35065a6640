"""Pallas flash prefill/extend kernel vs the jnp extend_attention reference
(interpret mode on CPU, SURVEY.md §4.2; the kernel replaces the reference's
prefix+causal-mask prefill at /root/reference/attn_backend.py:34-110)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.ops.attention import (
    AttnMeta,
    extend_attention,
    scale_rows_per_page,
    write_kv,
)
from tpusgl.ops.prefill_attention import pallas_prefill


def _build_case(rng, B, S, Hq, Hkv, D, P, with_prefix, int8):
    """Random extend batch: per-row ext lens (incl. a padding row), optional
    per-row cached prefix written into a paged pool."""
    num_pages = 64
    pool = jnp.zeros(
        ((num_pages + 1) * P, Hkv * 2 * D), jnp.int8 if int8 else jnp.float32
    )
    if int8:
        R8 = scale_rows_per_page(Hkv)
        kv_l = (pool, jnp.zeros(((num_pages + 1) * R8, P), jnp.float32))
    else:
        kv_l = pool

    ext = rng.integers(1, S + 1, B).astype(np.int32)
    ext[0] = S
    if B > 2:
        ext[-1] = 0  # padding row

    Tp = 4 * P
    if with_prefix:
        plen = rng.integers(0, Tp + 1, B).astype(np.int32)
        plen[ext == 0] = 0
        prefix_rows = np.zeros((B, Tp), np.int32)
        nxt = 1
        for b in range(B):
            for j in range(-(-int(plen[b]) // P)):
                prefix_rows[b, j * P : (j + 1) * P] = nxt * P + np.arange(P)
                nxt += 1
        kp = rng.standard_normal((B, Tp, Hkv, D)).astype(np.float32)
        vp = rng.standard_normal((B, Tp, Hkv, D)).astype(np.float32)
        loc = np.where(np.arange(Tp)[None, :] < plen[:, None], prefix_rows, 0)
        kv_l = write_kv(jnp.asarray(kp), jnp.asarray(vp), kv_l, jnp.asarray(loc))
        prefix_rows_j = jnp.asarray(prefix_rows)
        plen_j = jnp.asarray(plen)
    else:
        plen = np.zeros((B,), np.int32)
        prefix_rows_j, plen_j = None, None

    out_loc = np.zeros((B, S), np.int32)
    base = 40
    for b in range(B):
        slots = []
        for _ in range(-(-int(ext[b]) // P)):
            slots.extend(range(base * P, base * P + P))
            base += 1
        out_loc[b, : ext[b]] = slots[: ext[b]]

    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    meta = AttnMeta(
        kv_rows=None,
        seq_lens=jnp.asarray(plen + ext),
        ext_lens=jnp.asarray(ext),
        positions=jnp.asarray(
            plen[:, None] + np.arange(S)[None, :]
        ).astype(jnp.int32),
        out_loc=jnp.asarray(out_loc),
        prefix_rows=prefix_rows_j,
        prefix_lens=plen_j,
    )
    return q, kn, vn, kv_l, meta, ext


@pytest.mark.parametrize(
    "B,S,Hq,Hkv,D,P,with_prefix,int8",
    [
        (2, 16, 4, 2, 16, 8, False, False),
        (4, 16, 4, 2, 16, 8, True, False),
        (4, 32, 6, 2, 16, 8, True, False),   # multiple q blocks
        (4, 16, 4, 2, 16, 8, True, True),    # int8 pool + per-token scales
        (3, 16, 4, 4, 16, 8, True, True),    # G = 1
    ],
)
def test_prefill_kernel_matches_extend(B, S, Hq, Hkv, D, P, with_prefix, int8):
    rng = np.random.default_rng(0)
    q, kn, vn, kv_l, meta, ext = _build_case(
        rng, B, S, Hq, Hkv, D, P, with_prefix, int8
    )
    ref_out, ref_kv = extend_attention(0, q, kn, vn, kv_l, meta)
    got_out, got_kv = pallas_prefill(
        0, q, kn, vn, kv_l, meta,
        page_size=P, pages_per_block=2, q_block=16, self_block=16,
        interpret=True,
    )
    ro, go = np.asarray(ref_out), np.asarray(got_out)
    tol = 2e-2 if int8 else 2e-4
    for b in range(B):
        e = int(ext[b])
        if e:
            np.testing.assert_allclose(go[b, :e], ro[b, :e], atol=tol, rtol=tol)
    # identical pool updates (write_kv runs in both paths)
    rb = ref_kv[0] if isinstance(ref_kv, tuple) else ref_kv
    gb = got_kv[0] if isinstance(got_kv, tuple) else got_kv
    assert np.array_equal(np.asarray(rb), np.asarray(gb))


def test_prefill_kernel_padding_rows_zero():
    """Fully-padded q blocks skip all DMA/compute and emit zeros."""
    rng = np.random.default_rng(3)
    q, kn, vn, kv_l, meta, ext = _build_case(
        rng, 3, 32, 4, 2, 16, 8, False, False
    )
    ext2 = np.asarray(meta.ext_lens).copy()
    ext2[1] = 4  # q block 1 (rows 16..31) is fully padding for this row
    meta = meta._replace(ext_lens=jnp.asarray(ext2))
    out, _ = pallas_prefill(
        0, q, kn, vn, kv_l, meta,
        page_size=8, pages_per_block=2, q_block=16, self_block=16,
        interpret=True,
    )
    assert np.all(np.asarray(out)[1, 16:] == 0)
