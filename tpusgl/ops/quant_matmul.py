"""Pallas fused dequant+matmul for INT8/INT4 weight-only quantization.

The reference has no quantized matmul at all (fp16 weights; SURVEY.md §2
"Qwen2 model" row calls for INT8/INT4 dequant+matmul kernels in the build).
XLA's jnp path (ops/linear.apply_linear) expresses dequant as
`x @ (w_int8 -> bf16)`; whether the convert stays fused or materializes a
bf16 weight copy is up to the compiler. This kernel makes the contract
explicit: the weight tile is DMA'd from HBM in its quantized storage dtype
(half / quarter the bytes of bf16 — the whole point of weight-only quant for
memory-bound decode), converted in VMEM, and fed to the MXU.

Blocked matmul, grid (nm, nn, nk), f32 accumulator in VMEM scratch:

- INT8 per-output-channel: out = (x @ w_q) * s, scales applied once on the
  final k step.
- INT4 group-wise (group size G along K): requires BK == G so each k step
  has ONE scale row — out = sum_k gs[k] * (x_k @ wq_k), scale folded into
  the accumulate. Weights arrive PACKED two values per byte (ops/linear.py
  layout: low nibble = row r, high nibble = row r + G//2 of the group), so
  the weight DMA moves K*N/2 bytes — a quarter of bf16. The in-kernel
  unpack is two nibble sign-extends and a sublane concat (no interleave).

Enable via `tpusgl.ops.linear.apply_linear` (engine flag
EngineConfig.use_quant_matmul); falls back to the jnp path off-TPU or for
shapes the kernel does not cover.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_int8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Dequantized weights go to the MXU in the ACTIVATION dtype: int8
    # values are exact in bf16 (8 significand bits cover [-127, 127]), and
    # bf16 x bf16 -> f32 runs the MXU at ~4x its f32 x f32 rate — measured
    # to flip the 7B decode step from MXU-bound back to HBM-bound.
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        w_ref[...].astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _qmm_int8_manual_kernel(
    x_ref, w_hbm, s_ref, o_ref, acc_ref, wbufs, sems, *,
    nm: int, nn: int, nk: int, bk: int, bn: int,
):
    """int8 kernel with MANUALLY double-buffered weight DMA (w arrives as a
    raw HBM ref, not an XLA-pipelined block operand). Kept as a measured
    round-5 EXPERIMENT (off by default):

    Motivation: bench decode traces show XLA staging the 68 MB down-proj
    weight through `slice-done s8[4736,3584]` copies around EVERY call —
    ~1.9 GB / ~1.9 ms of DMA-active time per decode iteration (the round-4
    "MSA S(1) staging" line, finally attributed). Hypothesis was that an
    ANY-space operand + in-kernel DMA removes the staging.

    Measured result: the staging copies PERSIST bit-for-bit with this
    kernel (they attach to the parameter buffer, not the operand pipeline
    — isolated probes show every quant-matmul weight gets a per-call S(1)
    copy regardless of size or operand spec), and the end-to-end bench is
    ~1.7% SLOWER (3320 vs 3377 tok/s: the all-"arbitrary" grid serializes
    dimensions the XLA pipeline overlaps). Together with round 3's aliased
    pass-through (worse) and inline=True (fixed the pjit-boundary copies
    only), this closes the staging investigation client-side: the copies
    are memory-space-assignment behavior reachable only via libtpu flags
    the remote-compile service does not forward — and their trace duration
    largely OVERLAPS compute (removing the kernel-side difference changed
    throughput by <2% despite identical staging).

    The double buffer is carried ACROSS grid steps via the linear step
    index t = (m*nn + n)*nk + k (all grid dims must therefore be
    "arbitrary": the slot parity is cross-iteration state)."""
    m, n, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    t = (m * nn + n) * nk + k
    total = nm * nn * nk
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def copy_for(tt, slot):
        kk = jax.lax.rem(tt, nk)
        nb = jax.lax.rem(tt // nk, nn)
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(kk * bk, bk), pl.ds(nb * bn, bn)],
            wbufs.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _bootstrap():
        copy_for(0, slot).start()

    @pl.when(t + 1 < total)
    def _prefetch():
        copy_for(t + 1, nxt).start()

    copy_for(t, slot).wait()

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        wbufs[slot].astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _qmm_int4_kernel(x_ref, w_ref, gs_ref, o_ref, acc_ref, *, nk: int,
                     gpb: int = 1):
    """gpb == 1: x block [BM, BK], one group (BK == G) per k step.
    gpb > 1 (groups narrower than the 128-lane block minimum, e.g. the
    production group 64): x arrives TRANSPOSED ([BK, BM] — the k segments
    are then 8-aligned SUBLANE slices, which Mosaic supports, where 64-lane
    slices are rejected); each of the gpb groups is dotted against its own
    K segment and scaled by its own gs row on the f32 accumulator, so
    precision is identical to the single-group path."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Unpack the [BK//2, BN] byte tile per group: nibble sign-extend via
    # (v ^ 8) - 8, halves stacked along sublanes (the packer put a group's
    # rows [0, G/2) in low nibbles and [G/2, G) in high nibbles).
    wi = w_ref[...].astype(jnp.int32)
    half = wi.shape[0] // gpb  # packed rows per group (= G // 2)
    for j in range(gpb):
        seg = wi[j * half : (j + 1) * half]
        lo = ((seg & 0xF) ^ 8) - 8
        hi = (((seg >> 4) & 0xF) ^ 8) - 8
        # Activation-dtype weights feed the MXU's fast path (int4 values
        # are exact in bf16); accumulate in f32 (see _qmm_int8_kernel).
        wt = jnp.concatenate([lo, hi], axis=0).astype(x_ref.dtype)  # [G, BN]
        if gpb == 1:
            part = jax.lax.dot_general(
                x_ref[...],
                wt,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            G = 2 * half
            xseg = x_ref[j * G : (j + 1) * G, :]  # [G, BM] (transposed x)
            part = jax.lax.dot_general(
                xseg,
                wt,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BM, BN]
        # The group scale is constant over its K segment, so it distributes
        # over the partial product. gs_ref holds ALL nk*gpb scale rows (a
        # (1, BN) block would violate TPU block-shape rules); pick this
        # group's row dynamically.
        acc_ref[...] += part * gs_ref[pl.ds(k * gpb + j, 1), :]

    @pl.when(k == nk - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def quant_matmul(
    x: jnp.ndarray,            # [M, K] bf16/f32
    w: jnp.ndarray,            # [K, N] int8 per-channel, or [K//2, N] packed int4
    s: Optional[jnp.ndarray] = None,   # [N] f32 — int8 per-channel scales
    gs: Optional[jnp.ndarray] = None,  # [K//G, N] f32 — int4 group scales
    *,
    out_dtype=None,
    bm: int = 128,
    bn: int = 512,
    bk: int = 512,
    manual_w: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[M, N] = x @ dequant(w). Exactly one of s / gs must be given; with
    gs, `w` is the PACKED int4 byte array (two values per byte along K)."""
    assert (s is None) != (gs is None), "exactly one of s/gs"
    M, K = x.shape
    packed = gs is not None
    K2, N = w.shape
    assert K == (2 * K2 if packed else K2), (x.shape, w.shape)
    out_dtype = out_dtype or x.dtype

    gpb = 1
    if packed:
        G = K // gs.shape[0]
        # One packed byte block per k step, at least 128 lanes of x per
        # block (Mosaic block-shape rule): groups narrower than 128 pack
        # several groups per step (gpb), each dotted against its own K
        # segment and scaled by its own gs row in the kernel.
        bk = G
        while bk < 128 and K % (bk * 2) == 0:
            bk *= 2
        gpb = bk // G
    bm = min(bm, max(8, M))
    bn = min(bn, N)
    bk = min(bk, K)
    # Grid must tile exactly; callers pad M (N/K are model dims, already
    # multiples of the tile sizes for every supported config).
    if M % bm or N % bn or K % bk:
        raise ValueError(f"untileable {M}x{K}x{N} with ({bm},{bn},{bk})")
    nm, nn, nk = M // bm, N // bn, K // bk

    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    semantics = ("parallel", "parallel", "arbitrary")
    if s is not None:
        scale_op = s.reshape(1, N).astype(jnp.float32)
        scale_spec = pl.BlockSpec((1, bn), lambda m, n, k: (0, n))
        w_bytes = K * N
        if manual_w:
            kernel = functools.partial(
                _qmm_int8_manual_kernel,
                nm=nm, nn=nn, nk=nk, bk=bk, bn=bn,
            )
            w_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch += [
                pltpu.VMEM((2, bk, bn), w.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            # the double-buffer slot parity is cross-iteration state over
            # the LINEAR step index, so every grid dim must run in order
            semantics = ("arbitrary", "arbitrary", "arbitrary")
        else:
            kernel = functools.partial(_qmm_int8_kernel, nk=nk)
            w_spec = pl.BlockSpec((bk, bn), lambda m, n, k: (k, n))
    else:
        kernel = functools.partial(_qmm_int4_kernel, nk=nk, gpb=gpb)
        scale_op = gs.astype(jnp.float32)
        scale_spec = pl.BlockSpec((nk * gpb, bn), lambda m, n, k: (0, n))
        w_spec = pl.BlockSpec((bk // 2, bn), lambda m, n, k: (k, n))
        w_bytes = K * N // 2

    if gpb > 1:  # transposed-x layout (see _qmm_int4_kernel docstring)
        x_op = x.T
        x_spec = pl.BlockSpec((bk, bm), lambda m, n, k: (k, m))
    else:
        x_op = x
        x_spec = pl.BlockSpec((bm, bk), lambda m, n, k: (m, k))

    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=[
            x_spec,
            w_spec,
            scale_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + w_bytes + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_op, w, scale_op)


def _pick_tile(dim: int, cap: int) -> Optional[int]:
    """Largest 128-lane-multiple tile <= cap that divides dim."""
    best = None
    for c in range(128, cap + 1, 128):
        if dim % c == 0:
            best = c
    return best


@functools.lru_cache(maxsize=None)
def _jitted_qmm(kind: str, out_dtype: str, bm: int, bn: int, bk: int,
                interpret: bool):
    """Cached jitted wrapper: the layer stack hits this kernel at
    4 linears x L layers (x window) call sites; one pjit per static config
    makes jax trace/lower the kernel once (see ops/paged_attention.py
    _jitted_paged_decode for the measured effect)."""
    dt = jnp.dtype(out_dtype)
    if kind == "int8":
        def call(x, w, s):
            return quant_matmul(
                x, w, s=s, out_dtype=dt, bm=bm, bn=bn, bk=bk,
                interpret=interpret,
            )
    else:
        def call(x, w, gs):
            return quant_matmul(
                x, w, gs=gs, out_dtype=dt, bm=bm, bn=bn, bk=bk,
                interpret=interpret,
            )
    # inline=True: the cached trace is reused across the layer stack's
    # call sites, but the jaxpr is spliced into the caller — a real call
    # boundary made XLA copy each site's weight operand into the shared
    # callee's argument slot (measured ~1.9 GB/iter of pure copies).
    return jax.jit(call, inline=True)


def quant_matmul_any(x: jnp.ndarray, lin, *, out_dtype=None,
                     interpret: bool = False):
    """apply_linear-compatible wrapper: flattens leading dims, pads M to the
    tile multiple, picks lane-aligned tiles, dispatches int8/int4, adds
    bias. Raises ValueError for shapes the kernel does not cover (caller
    falls back to the jnp path).

    `out_dtype` overrides the output dtype (default: x.dtype). The kernel
    accumulates f32 and applies the per-channel scale on the f32
    accumulator, so out_dtype=float32 yields full-precision scaled outputs
    with no intermediate downcast — used by the int8 LM head, where a bf16
    round-trip would truncate logits to 8 mantissa bits and could flip
    near-tie argmax decisions."""
    w = lin["w4"] if "w4" in lin else lin["w"]
    *lead, K = x.shape
    _, N = w.shape
    M = 1
    for d in lead:
        M *= d
    # Wide output tiles keep the weight-block DMAs large (the decode-step
    # gate_up matmul measured 52% of HBM peak at bn=512). Decode (small M)
    # can afford very wide tiles — the f32 accumulator is only M rows — so
    # it takes the whole output dim when it divides into <= 4736 lanes
    # (w block 512 x 4736 int8 = 2.4 MB x 2 buffers, well inside ~16 MB
    # VMEM); prefill (large M) caps at 1024 to bound the accumulator.
    bn = _pick_tile(N, 1024 if M > 256 else 4736)
    gs = lin.get("gs")
    bk = K // gs.shape[0] if gs is not None else _pick_tile(K, 512)
    if bn is None or bk is None or K % bk:
        raise ValueError(f"unsupported quant_matmul shape {K}x{N}")
    xf = x.reshape(M, K)
    # Large-M (prefill) tiles: the weight streams from HBM once per m-block
    # (grid (m, n, k)), so small bm re-reads the whole weight matrix M/bm
    # times — at [4096, 3584] x [3584, 37888] that re-streaming alone
    # matched the MXU time (measured 50-60% MXU). bm=512 keeps the weight
    # traffic 4x lower while x/w/acc tiles stay ~4 MB of VMEM.
    bm = min(512, max(8, M))
    pad = (-M) % bm
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    odt = jnp.dtype(out_dtype or x.dtype).name
    if gs is not None:
        y = _jitted_qmm("int4", odt, bm, bn, bk, interpret)(xf, w, gs)
    else:
        y = _jitted_qmm("int8", odt, bm, bn, bk, interpret)(xf, w, lin["s"])
    if pad:
        y = y[:M]
    y = y.reshape(*lead, N)
    if "b" in lin:
        y = y + lin["b"].astype(y.dtype)
    return y
