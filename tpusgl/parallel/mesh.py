"""Device mesh + sharding specs.

TPU-native replacement for the reference's dead NCCL TP runtime
(/root/reference/tp_runtime.py:10-51): no explicit collectives — a
(dp, tp) `jax.sharding.Mesh` plus NamedSharding annotations on weights and
KV pages, and XLA/GSPMD inserts and schedules the all-reduces (overlapping
them with compute, which also subsumes part of overlap_worker.py's job).

Layout (Megatron-style, SURVEY.md §7):
- qkv / gate_up: column-sharded on the fused output axis,
- o / down: row-sharded on the input axis (XLA adds the tp all-reduce),
- embedding & lm head: vocab-sharded,
- KV pool: sharded on the kv-head axis (each tp shard owns whole heads),
- page table / last_token / presence / host-derived batch arrays: replicated
  (the control plane is deterministic and identical on every host).

dp is data parallelism over independent batch rows; weights and KV are
replicated across dp (full dp serving uses one engine per replica; the
in-graph dp axis exists for the multi-chip dry run and batch scaling).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusgl.config import ModelConfig


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    if jax.process_count() > 1 and dp * tp != len(devices):
        # A device-SUBSET mesh is fine single-process (tests carve small
        # meshes out of the 8 virtual devices), but multi-process it would
        # silently exclude whole hosts' chips — their processes then jit
        # programs over a mesh containing none of their addressable devices
        # and hang/crash far from the cause. Fail loudly here instead.
        raise ValueError(
            f"multi-process mesh must cover every global device: "
            f"dp*tp = {dp * tp} vs {len(devices)} devices"
        )
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def fused_out_perm(sizes, tp: int) -> np.ndarray:
    """Column permutation that makes a contiguous tp-shard of a FUSED output
    axis own matching blocks of every segment.

    A fused weight (qkv: [q | k | v], gate_up: [gate | up]) column-sharded
    naively gives shard s an arbitrary slice crossing segment boundaries.
    Reordering columns to [seg0_0, seg1_0, ..., seg0_1, seg1_1, ...] makes
    shard s's contiguous block exactly [q_s | k_s | v_s] — what the
    shard_map'd layer body slices locally (models/qwen2._layer)."""
    offs = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    idx = []
    for s in range(tp):
        for o, sz in zip(offs, sizes):
            assert sz % tp == 0, (sizes, tp)
            c = sz // tp
            idx.extend(range(o + s * c, o + (s + 1) * c))
    return np.asarray(idx, np.int32)


def _permute_linear_out(lin: Dict[str, Any], perm: np.ndarray) -> Dict[str, Any]:
    """Apply an output-axis permutation to every leaf of a linear (the out
    axis is last for w/w4/s/gs/b). Works on numpy or jax arrays; quantization
    scales are per-output-column, so permuting after quantization equals
    quantizing the permuted weight."""
    out = {}
    for k, v in lin.items():
        if isinstance(v, np.ndarray):
            out[k] = np.take(v, perm, axis=-1)
        else:
            import jax.numpy as jnp

            out[k] = jnp.take(v, perm, axis=-1)
    return out


def permute_layer_for_tp(
    layer: Dict[str, Any], cfg: ModelConfig, tp: int
) -> Dict[str, Any]:
    """tp-interleave the fused qkv / gate_up output columns of one layer
    (identity when tp == 1). o/down need no permutation: their input axes
    (q-head-major / intermediate) are already contiguous per shard."""
    if tp == 1:
        return layer
    out = dict(layer)
    out["qkv"] = _permute_linear_out(
        layer["qkv"],
        fused_out_perm((cfg.q_size, cfg.kv_size, cfg.kv_size), tp),
    )
    out["gate_up"] = _permute_linear_out(
        layer["gate_up"],
        fused_out_perm(
            (cfg.intermediate_size, cfg.intermediate_size), tp
        ),
    )
    return out


def layer_shardings(layer: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Sharding pytree for ONE layer's weight tree (leaves may be arrays or
    ShapeDtypeStructs — shapes are not consulted)."""
    def lin_shard(col: bool):
        # col: shard output axis; row: shard input axis.
        def shard_leaf(name, leaf):
            if name in ("w", "w4"):
                # "w4" packs two in-rows per byte within a group, so a tp
                # shard of the (packed) in axis still owns whole groups.
                return _ns(mesh, None, "tp") if col else _ns(mesh, "tp", None)
            if name == "b":
                return _ns(mesh, "tp") if col else _ns(mesh)
            if name == "s":  # int8 scales [out]
                return _ns(mesh, "tp") if col else _ns(mesh)
            if name == "gs":  # int4 scales [in//G, out]
                return _ns(mesh, None, "tp") if col else _ns(mesh, "tp", None)
            return _ns(mesh)
        return shard_leaf

    def map_linear(lin: Dict[str, Any], col: bool):
        f = lin_shard(col)
        return {k: f(k, v) for k, v in lin.items()}

    out = {
        "input_norm": _ns(mesh),
        "post_norm": _ns(mesh),
        "qkv": map_linear(layer["qkv"], col=True),
        "o": map_linear(layer["o"], col=False),
        "gate_up": map_linear(layer["gate_up"], col=True),
        "down": map_linear(layer["down"], col=False),
    }
    for extra in ("q_norm", "k_norm"):  # qwen3 per-head norms: replicated
        if extra in layer:
            out[extra] = _ns(mesh)
    return out


def param_shardings(cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh):
    """Sharding pytree matching the params structure (layers are a tuple of
    per-layer trees)."""
    out: Dict[str, Any] = {
        "embed": _ns(mesh, "tp", None),
        "final_norm": _ns(mesh),
        "rope_cos": _ns(mesh),
        "rope_sin": _ns(mesh),
        "layers": tuple(
            layer_shardings(layer, mesh) for layer in params["layers"]
        ),
    }
    if "lm_head" in params:
        if isinstance(params["lm_head"], dict):
            # int8 head Linear {"w": [H, V], "s": [V]}: vocab-sharded.
            out["lm_head"] = {
                "w": _ns(mesh, None, "tp"), "s": _ns(mesh, "tp")
            }
        else:
            out["lm_head"] = _ns(mesh, "tp", None)
    return out


def state_shardings(mesh: Mesh, state) -> Any:
    """EngineState sharding: KV pool split on the kv-head axis over tp."""
    from tpusgl.runtime.state import EngineState

    kv = _ns(mesh, None, "tp")  # per-layer [slots, Hkv*2*D]: whole heads/shard
    L = len(state.kv)
    # Scale pool [(pages+1)*R8_local*tp, P]: ROW-sharded — each shard's
    # contiguous block is its own per-page scale pool (ops/attention.scale_row).
    scale = _ns(mesh, "tp", None)
    return EngineState(
        kv=tuple(kv for _ in range(L)),
        kv_scale=None if state.kv_scale is None
        else tuple(scale for _ in range(L)),
        last_token=_ns(mesh),
        presence=_ns(mesh),
        rng=_ns(mesh),
    )


def shard_params(cfg: ModelConfig, params, mesh: Mesh):
    """Permute fused layouts for tp and place every leaf at its sharding."""
    tp = mesh.shape["tp"]
    params = dict(params)
    params["layers"] = tuple(
        permute_layer_for_tp(layer, cfg, tp) for layer in params["layers"]
    )
    shardings = param_shardings(cfg, params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_state(state, mesh: Mesh):
    shardings = state_shardings(mesh, state)
    return jax.tree.map(jax.device_put, state, shardings)
