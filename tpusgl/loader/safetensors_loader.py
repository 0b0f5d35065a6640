"""Checkpoint loading: stream safetensors shards, fuse, quantize, device_put.

The reference loads the *entire* HF model into host RAM via
AutoModelForCausalLM and then copies tensor-by-tensor
(/root/reference/model_loader.py:96-121) — O(model size) host memory and a
full fp materialization. Here loading is truly streaming and shard-aware:

- shards are memory-mapped (safetensors random access), and tensors are read
  layer by layer in OUR order, not shard order;
- each layer is fused into the QKV / GateUp layouts (same slicing semantics
  as model_loader.py:174-249) and quantized to INT8/INT4 *on the host* in
  numpy, so the full bf16 weights never exist on any device;
- the quantized layer is `jax.device_put` directly to its per-layer
  NamedSharding (when a mesh is given); layers stay UNSTACKED (a tuple of
  per-layer weight trees) so the matmul kernels read each weight buffer in
  place — no [L, ...] slicing temps in the compiled programs.

Peak host memory is one layer's worth of fp32 (plus the mmap, which the OS
pages); peak device memory is the final (quantized, sharded) model plus one
layer. That is what makes Qwen2.5-7B INT8 fit a single 16 GB v5e chip and
72B INT4 fit a TP-sharded slice.

Also provides save_params/quantize_params used by tests and by the synthetic
benchmark path (no network access in this environment).
"""

from __future__ import annotations

import functools
import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpusgl.config import ModelConfig, QuantConfig
from tpusgl.models import get_model
from tpusgl.ops.linear import quantize_linear_int4, quantize_linear_int8

logger = logging.getLogger(__name__)


class _ShardIndex:
    """Random access to an HF safetensors checkpoint: name -> fp32 ndarray.

    Keeps one mmap-backed handle per shard file; `get` reads a single tensor
    (the reference's loader pulls the whole state dict up front,
    /root/reference/model_loader.py:96-105)."""

    def __init__(self, ckpt_dir: str):
        from safetensors import safe_open

        self._dir = ckpt_dir
        index_path = os.path.join(ckpt_dir, "model.safetensors.index.json")
        if os.path.exists(index_path):
            with open(index_path) as f:
                weight_map = json.load(f)["weight_map"]
            shard_files = sorted(set(weight_map.values()))
        else:
            shard_files = [
                f for f in sorted(os.listdir(ckpt_dir))
                if f.endswith(".safetensors")
            ]
        self._handles = {}
        self._name_to_file: Dict[str, str] = {}
        for fname in shard_files:
            h = safe_open(os.path.join(ckpt_dir, fname), framework="np")
            self._handles[fname] = h
            for name in h.keys():
                self._name_to_file[name] = fname

    def __contains__(self, name: str) -> bool:
        return name in self._name_to_file

    def get(self, name: str) -> np.ndarray:
        fname = self._name_to_file.get(name)
        if fname is None:
            raise KeyError(f"tensor {name!r} not found in {self._dir}")
        return _to_np_fp32(self._handles[fname].get_tensor(name))


def _to_np_fp32(t) -> np.ndarray:
    arr = np.asarray(t)
    if arr.dtype == np.uint16:  # bf16 stored raw
        arr = arr.astype(np.uint32) << 16
        arr = arr.view(np.float32)
    return arr.astype(np.float32)


# --------------------------------------------------------------------------
# Host-side quantization (numpy mirrors of ops/linear.quantize_linear_*,
# same formulas and byte layout — verified leaf-identical in
# tests/test_loader.py) so a layer can be quantized before it ever touches
# a device.
# --------------------------------------------------------------------------


def _np_quantize_int8(w: np.ndarray):
    """[in, out] fp32 -> (int8 [in, out], scale f32 [out])."""
    absmax = np.abs(w).max(axis=0)
    s = (absmax / 127.0) + 1e-12
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def _np_quantize_int4(w: np.ndarray, group_size: int):
    """[in, out] fp32 -> (packed int8 [in//2, out], scales f32 [in//G, out]);
    byte layout and MSE clip-ratio search identical to
    ops/linear.quantize_linear_int4."""
    from tpusgl.ops.linear import INT4_CLIP_CANDIDATES, INT4_LO, INT4_QMAX

    in_dim, out_dim = w.shape
    assert in_dim % group_size == 0, (in_dim, group_size)
    g = in_dim // group_size
    wg = w.reshape(g, group_size, out_dim)
    absmax = np.abs(wg).max(axis=1, keepdims=True)

    best_err = None
    gs = q = None
    for c in INT4_CLIP_CANDIDATES:
        s = (absmax * (c / INT4_QMAX)) + 1e-12
        qc = np.clip(np.round(wg / s), INT4_LO, 7)
        err = ((qc * s - wg) ** 2).sum(axis=1, keepdims=True)
        if best_err is None:
            best_err, gs, q = err, s, qc
        else:
            better = err < best_err
            best_err = np.where(better, err, best_err)
            gs = np.where(better, s, gs)
            q = np.where(better, qc, q)
    q = q.astype(np.int32)
    half = group_size // 2
    packed = ((q[:, :half] & 0xF) | ((q[:, half:] & 0xF) << 4)).astype(np.uint8)
    return (
        packed.view(np.int8).reshape(in_dim // 2, out_dim),
        gs[:, 0].astype(np.float32),
    )


def _np_cast(a: np.ndarray, dtype) -> np.ndarray:
    # np.dtype(jnp.bfloat16) is ml_dtypes.bfloat16: casting on host halves
    # the host->device transfer vs shipping fp32.
    return np.ascontiguousarray(a.astype(np.dtype(dtype)))


def int4_compatible(
    in_dim: int, group_size: int, tp: int, row_parallel: bool = True
) -> bool:
    """INT4 group quantization needs every tp shard of the in-axis to hold
    whole groups (a row-sharded `gs` must split evenly). E.g. Qwen2.5-72B's
    intermediate 29568 = 231 groups of 128 cannot row-shard over tp=8 — the
    down projection falls back to INT8 per-channel (mixed precision).

    Only ROW-parallel linears (o, down) shard their in-axis; column-parallel
    qkv/gate_up shard the OUT axis, where group alignment is irrelevant —
    applying the tp divisor to them needlessly demoted the largest matmuls
    (gate_up) to int8 whenever hidden %% (G*tp) != 0 (e.g. 7B at tp=8)."""
    if not row_parallel:
        tp = 1
    return in_dim % (group_size * tp) == 0


def int4_effective_dtype(
    name: str, in_dim: int, quant: QuantConfig, tp: int, row_parallel: bool
) -> str:
    """Storage dtype for a linear under weight_dtype="int4": the
    PPL-sensitive matrices (quant.int4_keep_int8 — measured recipe, see
    QuantConfig) and tp-incompatible group shardings store INT8."""
    if name in (quant.int4_keep_int8 or ()):
        return "int8"
    if not int4_compatible(in_dim, quant.group_size, tp, row_parallel):
        return "int8"
    return "int4"


def _quantize_linear_np(
    w: np.ndarray, quant: Optional[QuantConfig], dtype,
    b: Optional[np.ndarray] = None, tp: int = 1, row_parallel: bool = True,
    name: str = "",
) -> Dict[str, np.ndarray]:
    wd = quant.weight_dtype if quant is not None else "bf16"
    if wd == "int4":
        wd = int4_effective_dtype(name, w.shape[0], quant, tp, row_parallel)
    if wd == "int8":
        q, s = _np_quantize_int8(w)
        out = {"w": q, "s": s}
    elif wd == "int4":
        q, gs = _np_quantize_int4(w, quant.group_size)
        out = {"w4": q, "gs": gs}
    else:
        out = {"w": _np_cast(w, dtype)}
    if b is not None:
        out["b"] = _np_cast(b, dtype)
    return out


# --------------------------------------------------------------------------
# Per-layer streaming
# --------------------------------------------------------------------------


def layer_struct(
    cfg: ModelConfig, quant: Optional[QuantConfig], dtype, tp: int = 1
) -> Dict[str, Any]:
    """ShapeDtypeStruct tree for ONE layer's params, in the final (possibly
    quantized) storage layout (int4 linears whose in-axis cannot row-shard
    into whole groups over tp store int8 — see int4_compatible)."""
    H, I = cfg.hidden_size, cfg.intermediate_size
    qkv_out = cfg.q_size + 2 * cfg.kv_size
    base_wd = quant.weight_dtype if quant is not None else "bf16"
    G = quant.group_size if quant is not None else 128

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(shape, jnp.dtype(dt))

    def lin(name, in_dim, out_dim, bias=False, row_parallel=True):
        wd = base_wd
        if wd == "int4":
            wd = int4_effective_dtype(name, in_dim, quant, tp, row_parallel)
        if wd == "int8":
            d = {"w": sds((in_dim, out_dim), jnp.int8),
                 "s": sds((out_dim,), jnp.float32)}
        elif wd == "int4":
            d = {"w4": sds((in_dim // 2, out_dim), jnp.int8),
                 "gs": sds((in_dim // G, out_dim), jnp.float32)}
        else:
            d = {"w": sds((in_dim, out_dim), dtype)}
        if bias:
            d["b"] = sds((out_dim,), dtype)
        return d

    layer = {
        "input_norm": sds((H,), dtype),
        "post_norm": sds((H,), dtype),
        "qkv": lin("qkv", H, qkv_out, bias=cfg.attention_bias,
                   row_parallel=False),
        "o": lin("o", cfg.q_size, H),
        "gate_up": lin("gate_up", H, 2 * I, row_parallel=False),
        "down": lin("down", I, H),
    }
    if cfg.qk_norm:
        layer["q_norm"] = sds((cfg.head_dim,), dtype)
        layer["k_norm"] = sds((cfg.head_dim,), dtype)
    return layer


class LayerStreamer:
    """Places one layer's weights at a time: each weight becomes its own
    device buffer at its per-layer NamedSharding (when a mesh is given).
    Layers stay UNSTACKED (params['layers'] is a tuple of per-layer trees) so
    the matmul kernels read the buffers in place — a stacked [L, ...] layout
    made XLA materialize every layer's slice as an HLO temp feeding the
    Pallas kernels (~GBs of copies at 7B)."""

    def __init__(self, cfg: ModelConfig, quant: Optional[QuantConfig], dtype,
                 mesh=None):
        self.L = cfg.num_hidden_layers
        self.cfg = cfg
        self.tp = 1 if mesh is None else int(mesh.shape["tp"])
        self.layer_shardings = None
        if mesh is not None:
            from tpusgl.parallel.mesh import layer_shardings

            self.layer_shardings = layer_shardings(
                layer_struct(cfg, quant, dtype, tp=self.tp), mesh
            )
        self.bufs: list = []

    def set_layer(self, l: int, layer_host: Dict[str, Any]) -> None:
        """layer_host: numpy tree matching layer_struct (already quantized)."""
        assert l == len(self.bufs), (l, len(self.bufs))
        if self.layer_shardings is not None:
            from tpusgl.parallel.mesh import permute_layer_for_tp

            layer_host = permute_layer_for_tp(layer_host, self.cfg, self.tp)
            layer_dev = jax.tree.map(
                jax.device_put, layer_host, self.layer_shardings
            )
        else:
            layer_dev = jax.tree.map(jnp.asarray, layer_host)
        self.bufs.append(layer_dev)


def _read_layer_np(
    reader: _ShardIndex, cfg: ModelConfig, l: int,
    quant: Optional[QuantConfig], dtype, tp: int = 1,
) -> Dict[str, Any]:
    """Read + fuse + host-quantize ONE layer. HF name mapping mirrors
    model_loader.py:123-264: q/k/v fuse into qkv slices [0:q), [q:q+kv),
    [q+kv:); gate/up fuse into gate_up [0:I), [I:2I); weights transpose to
    input-major."""
    H, I = cfg.hidden_size, cfg.intermediate_size
    q, kv = cfg.q_size, cfg.kv_size
    p = f"model.layers.{l}."

    qkv_w = np.empty((H, q + 2 * kv), np.float32)
    qkv_w[:, :q] = reader.get(p + "self_attn.q_proj.weight").T
    qkv_w[:, q : q + kv] = reader.get(p + "self_attn.k_proj.weight").T
    qkv_w[:, q + kv :] = reader.get(p + "self_attn.v_proj.weight").T
    qkv_b = None
    if cfg.attention_bias:
        qkv_b = np.empty((q + 2 * kv,), np.float32)
        qkv_b[:q] = reader.get(p + "self_attn.q_proj.bias")
        qkv_b[q : q + kv] = reader.get(p + "self_attn.k_proj.bias")
        qkv_b[q + kv :] = reader.get(p + "self_attn.v_proj.bias")
    gate_up = np.empty((H, 2 * I), np.float32)
    gate_up[:, :I] = reader.get(p + "mlp.gate_proj.weight").T
    gate_up[:, I:] = reader.get(p + "mlp.up_proj.weight").T

    layer = {
        "input_norm": _np_cast(reader.get(p + "input_layernorm.weight"), dtype),
        "post_norm": _np_cast(
            reader.get(p + "post_attention_layernorm.weight"), dtype
        ),
        "qkv": _quantize_linear_np(
            qkv_w, quant, dtype, b=qkv_b, tp=tp, row_parallel=False,
            name="qkv",
        ),
        "o": _quantize_linear_np(
            np.ascontiguousarray(reader.get(p + "self_attn.o_proj.weight").T),
            quant, dtype, tp=tp, name="o",
        ),
        "gate_up": _quantize_linear_np(
            gate_up, quant, dtype, tp=tp, row_parallel=False, name="gate_up",
        ),
        "down": _quantize_linear_np(
            np.ascontiguousarray(reader.get(p + "mlp.down_proj.weight").T),
            quant, dtype, tp=tp, name="down",
        ),
    }
    if cfg.qk_norm:
        layer["q_norm"] = _np_cast(reader.get(p + "self_attn.q_norm.weight"), dtype)
        layer["k_norm"] = _np_cast(reader.get(p + "self_attn.k_norm.weight"), dtype)
    return layer


def load_params(
    ckpt_dir: str,
    cfg: ModelConfig,
    quant: Optional[QuantConfig] = None,
    dtype=jnp.bfloat16,
    mesh=None,
) -> Dict[str, Any]:
    """Load HF-layout safetensors into the params pytree, streaming layer by
    layer (see module docstring): host-quantize each layer, place it at its
    per-layer NamedSharding (when `mesh` is given)."""
    if quant is not None and quant.weight_dtype == "bf16":
        quant = None
    reader = _ShardIndex(ckpt_dir)
    streamer = LayerStreamer(cfg, quant, dtype, mesh=mesh)
    for l in range(cfg.num_hidden_layers):
        streamer.set_layer(
            l, _read_layer_np(reader, cfg, l, quant, dtype, tp=streamer.tp)
        )
    logger.info(
        "streamed %d layers from %s (%s weights)",
        cfg.num_hidden_layers, ckpt_dir,
        quant.weight_dtype if quant else "bf16",
    )

    if mesh is not None:
        from tpusgl.parallel.mesh import _ns

        put_vocab = lambda a: jax.device_put(a, _ns(mesh, "tp", None))
        put_rep = lambda a: jax.device_put(a, _ns(mesh))
    else:
        put_vocab = put_rep = jnp.asarray

    params: Dict[str, Any] = {
        "embed": put_vocab(_np_cast(reader.get("model.embed_tokens.weight"), dtype)),
        "final_norm": put_rep(_np_cast(reader.get("model.norm.weight"), dtype)),
        "layers": tuple(streamer.bufs),
    }
    if not cfg.tie_word_embeddings:
        # Some checkpoints omit lm_head.weight when it duplicates the
        # embedding; fall back to the embedding in that case.
        name = (
            "lm_head.weight" if "lm_head.weight" in reader
            else "model.embed_tokens.weight"
        )
        params["lm_head"] = put_vocab(_np_cast(reader.get(name), dtype))
    cos, sin = get_model(cfg.architecture).precompute_rope(cfg)
    params["rope_cos"] = put_rep(cos)
    params["rope_sin"] = put_rep(sin)
    return quantize_lm_head(params, quant, _lm_head_sharding(mesh))


def _lm_head_sharding(mesh):
    if mesh is None:
        return None
    from tpusgl.parallel.mesh import _ns

    return {"w": _ns(mesh, None, "tp"), "s": _ns(mesh, "tp")}


def init_params_streamed(
    cfg: ModelConfig,
    key: jax.Array,
    dtype=jnp.bfloat16,
    quant: Optional[QuantConfig] = None,
    mesh=None,
) -> Dict[str, Any]:
    """Random-init params layer by layer on device: generate one layer in
    bf16 and quantize it in one jitted program placed directly at the layer's
    shardings — peak device memory is the final (quantized, sharded) model
    plus one bf16 layer, vs init_params + quantize_params which needs the
    full bf16 model resident first (OOM for 7B on a 16 GB chip). Used by the
    synthetic bench path."""
    import math

    head_quant = quant  # lm_head_dtype applies even with bf16 body weights
    if quant is not None and quant.weight_dtype == "bf16":
        quant = None
    streamer = LayerStreamer(cfg, quant, dtype, mesh=mesh)
    H, I = cfg.hidden_size, cfg.intermediate_size
    qkv_out = cfg.q_size + 2 * cfg.kv_size
    wd = quant.weight_dtype if quant is not None else "bf16"

    def init_layer(k):
        ks = jax.random.split(k, 4)

        def lin(name, kk, in_dim, out_dim, bias, row_parallel=True):
            w = (
                jax.random.normal(kk, (in_dim, out_dim), jnp.float32)
                / math.sqrt(in_dim)
            ).astype(dtype)
            d = {"w": w}
            lwd = wd
            if lwd == "int4":
                lwd = int4_effective_dtype(
                    name, in_dim, quant, streamer.tp, row_parallel
                )
            if lwd == "int8":
                d = quantize_linear_int8(d)
            elif lwd == "int4":
                d = quantize_linear_int4(d, quant.group_size)
            if bias:
                d["b"] = jnp.zeros((out_dim,), dtype)
            return d

        layer = {
            "input_norm": jnp.ones((H,), dtype),
            "post_norm": jnp.ones((H,), dtype),
            "qkv": lin("qkv", ks[0], H, qkv_out, cfg.attention_bias,
                       row_parallel=False),
            "o": lin("o", ks[1], cfg.q_size, H, False),
            "gate_up": lin("gate_up", ks[2], H, 2 * I, False,
                           row_parallel=False),
            "down": lin("down", ks[3], I, H, False),
        }
        if streamer.tp > 1:
            from tpusgl.parallel.mesh import permute_layer_for_tp

            layer = permute_layer_for_tp(layer, cfg, streamer.tp)
        return layer

    step = jax.jit(init_layer, out_shardings=streamer.layer_shardings)
    layers = tuple(
        step(jax.random.fold_in(key, l)) for l in range(cfg.num_hidden_layers)
    )

    if mesh is not None:
        from tpusgl.parallel.mesh import _ns

        vocab_sh, rep_sh = _ns(mesh, "tp", None), _ns(mesh)
    else:
        vocab_sh = rep_sh = None

    def vocab_init(k):
        return (
            jax.random.normal(k, (cfg.vocab_size, H), jnp.float32)
            / math.sqrt(H)
        ).astype(dtype)

    vkey = jax.random.fold_in(key, cfg.num_hidden_layers)
    params: Dict[str, Any] = {
        "embed": jax.jit(vocab_init, out_shardings=vocab_sh)(vkey),
        "final_norm": jax.jit(
            lambda: jnp.ones((H,), dtype), out_shardings=rep_sh
        )(),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jax.jit(vocab_init, out_shardings=vocab_sh)(
            jax.random.fold_in(vkey, 1)
        )
    cos, sin = get_model(cfg.architecture).precompute_rope(cfg)
    if rep_sh is not None:
        cos, sin = jax.device_put(cos, rep_sh), jax.device_put(sin, rep_sh)
    params["rope_cos"] = cos
    params["rope_sin"] = sin
    return quantize_lm_head(params, head_quant, _lm_head_sharding(mesh))


def quantize_lm_head(
    params: Dict[str, Any], quant: Optional[QuantConfig], out_sharding=None
) -> Dict[str, Any]:
    """Replace an untied [V, H] lm_head with an int8 Linear {"w": [H, V],
    "s": [V]} when quant.lm_head_dtype == "int8" (no-op otherwise, incl.
    tied-embedding models — the fp embedding stays authoritative there).
    Halves the head's per-iteration HBM read; quality is gated by
    eval/ppl_gate (run with lm_head int8 before enabling in production)."""
    if (
        quant is None
        or quant.lm_head_dtype != "int8"
        or "lm_head" not in params
        or isinstance(params["lm_head"], dict)
    ):
        return params
    out = dict(params)

    def q(w):
        return quantize_linear_int8({"w": w.T.astype(jnp.float32)})

    fn = jax.jit(q, out_shardings=out_sharding)
    out["lm_head"] = fn(params["lm_head"])
    return out


def quantize_params(
    params: Dict[str, Any], quant: QuantConfig, tp: int = 1
) -> Dict[str, Any]:
    """Quantize the matmul weights (embed / norms / lm_head stay fp — the
    LM head dominates PPL sensitivity and embed gather is bandwidth-trivial).
    int4 linears incompatible with (group, tp) sharding store int8."""
    out = dict(params)
    q8 = jax.jit(quantize_linear_int8)
    q4 = jax.jit(lambda lin: quantize_linear_int4(lin, quant.group_size))
    new_layers = []
    for layer in params["layers"]:
        layer = dict(layer)
        for name in ("qkv", "o", "gate_up", "down"):
            lin = layer[name]
            wd = quant.weight_dtype
            if wd == "int4":
                wd = int4_effective_dtype(
                    name, lin["w"].shape[0], quant, tp,
                    row_parallel=name in ("o", "down"),
                )
            layer[name] = q4(lin) if wd == "int4" else q8(lin)
        new_layers.append(layer)
    out["layers"] = tuple(new_layers)
    return quantize_lm_head(out, quant)


def save_params_hf_layout(
    params: Dict[str, Any], cfg: ModelConfig, out_dir: str
) -> None:
    """Write params as an HF-layout safetensors checkpoint (tests use this to
    round-trip the loader without network access). Full-precision trees
    only: quantized params would serialize raw int codes as weights
    (dropping scales) — a checkpoint that loads cleanly elsewhere and
    produces nonsense."""
    from safetensors.numpy import save_file

    head = params.get("lm_head")
    for lin in list(params["layers"][0].values()) + ([head] if head is not None else []):
        if isinstance(lin, dict) and ("s" in lin or "w4" in lin or "gs" in lin):
            raise ValueError(
                "save_params_hf_layout writes full-precision checkpoints; "
                "got quantized params (int8/int4) — save the source weights"
            )
    os.makedirs(out_dir, exist_ok=True)
    q, kv, inter = cfg.q_size, cfg.kv_size, cfg.intermediate_size
    tensors: Dict[str, np.ndarray] = {}

    def put(name, arr):
        # ascontiguousarray matters: safetensors' numpy save_file serializes
        # the raw buffer without honoring strides, so a transposed VIEW would
        # be written with its pre-transpose byte order (wrong data under the
        # declared shape).
        tensors[name] = np.ascontiguousarray(np.asarray(arr, np.float32))

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["final_norm"])
    if not cfg.tie_word_embeddings:
        put("lm_head.weight", params["lm_head"])
    for l, layer in enumerate(params["layers"]):
        p = f"model.layers.{l}."
        put(p + "input_layernorm.weight", layer["input_norm"])
        put(p + "post_attention_layernorm.weight", layer["post_norm"])
        w = np.asarray(layer["qkv"]["w"], np.float32)
        put(p + "self_attn.q_proj.weight", w[:, :q].T)
        put(p + "self_attn.k_proj.weight", w[:, q : q + kv].T)
        put(p + "self_attn.v_proj.weight", w[:, q + kv :].T)
        if "b" in layer["qkv"]:
            b = np.asarray(layer["qkv"]["b"], np.float32)
            put(p + "self_attn.q_proj.bias", b[:q])
            put(p + "self_attn.k_proj.bias", b[q : q + kv])
            put(p + "self_attn.v_proj.bias", b[q + kv :])
        if "q_norm" in layer:
            put(p + "self_attn.q_norm.weight", layer["q_norm"])
            put(p + "self_attn.k_norm.weight", layer["k_norm"])
        put(p + "self_attn.o_proj.weight", np.asarray(layer["o"]["w"]).T)
        gu = np.asarray(layer["gate_up"]["w"], np.float32)
        put(p + "mlp.gate_proj.weight", gu[:, :inter].T)
        put(p + "mlp.up_proj.weight", gu[:, inter:].T)
        put(p + "mlp.down_proj.weight", np.asarray(layer["down"]["w"]).T)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(
            {
                "architectures": [
                    {"qwen2": "Qwen2ForCausalLM", "llama": "LlamaForCausalLM",
                     "qwen3": "Qwen3ForCausalLM"}[cfg.architecture]
                ],
                "head_dim": cfg.head_dim,
                "hidden_size": cfg.hidden_size,
                "num_attention_heads": cfg.num_attention_heads,
                "num_key_value_heads": cfg.num_key_value_heads,
                "intermediate_size": cfg.intermediate_size,
                "num_hidden_layers": cfg.num_hidden_layers,
                "vocab_size": cfg.vocab_size,
                "rms_norm_eps": cfg.rms_norm_eps,
                "rope_theta": cfg.rope_theta,
                "max_position_embeddings": cfg.max_position_embeddings,
                "tie_word_embeddings": cfg.tie_word_embeddings,
                "attention_bias": cfg.attention_bias,
            },
            f,
        )
