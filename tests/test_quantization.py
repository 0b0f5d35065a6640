"""Weight-only quantization: numeric fidelity of the INT8/INT4 reference
path, loader round-trip, and the PPL-delta machinery (SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.config import ModelConfig
from tpusgl.eval.ppl import compute_ppl
from tpusgl.loader.safetensors_loader import quantize_params
from tpusgl.models import qwen2
from tpusgl.ops.linear import (
    apply_linear,
    dequantize_weight,
    init_linear,
    quantize_linear_int4,
    quantize_linear_int8,
)
from tpusgl.config import QuantConfig

CFG = ModelConfig(
    hidden_size=128, num_attention_heads=4, num_key_value_heads=2,
    intermediate_size=256, num_hidden_layers=2, vocab_size=256,
    tie_word_embeddings=True, max_position_embeddings=512, rope_theta=10000.0,
)


def test_int8_roundtrip_error():
    lin = init_linear(jax.random.PRNGKey(0), None, 256, 128, jnp.float32, bias=False)
    q = quantize_linear_int8(lin)
    w = np.asarray(lin["w"])
    wq = np.asarray(dequantize_weight(q, jnp.float32))
    # symmetric per-channel int8: max error <= scale/2 per channel
    scales = np.asarray(q["s"])
    assert np.all(np.abs(w - wq) <= scales[None, :] * 0.51 + 1e-8)


def test_int4_roundtrip_error():
    """The MSE clip-ratio search must beat (or match) plain absmax scaling
    per group, and unclipped elements stay within half a step."""
    lin = init_linear(jax.random.PRNGKey(1), None, 256, 128, jnp.float32, bias=False)
    q = quantize_linear_int4(lin, group_size=64)
    w = np.asarray(lin["w"]).reshape(4, 64, 128)
    wq = np.asarray(dequantize_weight(q, jnp.float32)).reshape(4, 64, 128)
    gs = np.asarray(q["gs"])  # [in//G, out]

    # absmax-only reference reconstruction
    absmax = np.abs(w).max(axis=1, keepdims=True)
    s0 = absmax / 7.0 + 1e-12
    wq0 = np.clip(np.round(w / s0), -7, 7) * s0
    mse = ((w - wq) ** 2).sum(axis=1)
    mse0 = ((w - wq0) ** 2).sum(axis=1)
    # Relative slack: the device search and this numpy recomputation can
    # rank near-tie candidates differently by float rounding.
    assert np.all(mse <= mse0 * 1.001 + 1e-9)
    # any element's error is bounded by half a step OR it was clipped
    # (|w| beyond 7 * scale)
    err = np.abs(w - wq)
    step = gs[:, None, :]
    clipped = np.abs(w) > 7 * step
    assert np.all((err <= step * 0.51 + 1e-8) | clipped)


def test_apply_linear_int8_matches_dequant():
    lin = init_linear(jax.random.PRNGKey(2), 3, 64, 32, jnp.float32, bias=True)
    q = quantize_linear_int8(lin)
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 64), jnp.float32)
    sliced = jax.tree.map(lambda a: a[1], q)
    y_fused = apply_linear(x, sliced)
    wq = dequantize_weight(sliced, jnp.float32)
    y_ref = x @ wq + sliced["b"]
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("wd,rel_tol", [("int8", 0.005), ("int4", 0.05)])
def test_ppl_delta_small(wd, rel_tol):
    """PPL-delta machinery: quantized model perplexity on random text stays
    relatively close to bf16 (a random tiny model is inherently noisy; the
    real gates — <=0.1 INT8 / <=0.3 INT4 on a full-size model — run in the
    benchmark harness, eval/ppl.py)."""
    params = qwen2.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(0)
    windows = rng.integers(0, CFG.vocab_size, (4, 64)).astype(np.int32)

    ppl_fp = compute_ppl(params, CFG, windows, batch_size=2)
    qparams = quantize_params(params, QuantConfig(weight_dtype=wd, group_size=64))
    ppl_q = compute_ppl(qparams, CFG, windows, batch_size=2)
    assert abs(ppl_q - ppl_fp) / ppl_fp < rel_tol, (ppl_fp, ppl_q)


def test_quantized_engine_generates():
    from tpusgl.config import EngineConfig
    from tpusgl.runtime.engine import Engine
    from tpusgl.runtime.sampling_params import SamplingParams

    params = qwen2.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    qparams = quantize_params(params, QuantConfig(weight_dtype="int8"))
    ecfg = EngineConfig(
        max_total_tokens=512, max_requests=4,
        decode_bs_buckets=(1, 2, 4), prefill_len_buckets=(8, 16, 32),
        kv_len_bucket=64,
    )
    eng = Engine(model_cfg=CFG, engine_cfg=ecfg, params=qparams, dtype=jnp.float32)
    out = eng.generate(
        [[1, 2, 3, 4, 5]], SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)
    )[0]
    assert len(out) == 6


def test_int8_kv_cache_greedy_matches_bf16():
    """End-to-end INT8 KV cache (per-token scales quantized at write,
    dequantized at gather — replacing the reference's NotImplementedError fp8
    stubs, /root/reference/memory_pool.py:55-59): greedy decode through the
    scheduler stays token-identical to the fp path on a tiny model with
    well-separated logits."""
    from tpusgl.config import EngineConfig
    from tpusgl.runtime.engine import Engine
    from tpusgl.runtime.sampling_params import SamplingParams

    params = qwen2.init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    base = dict(
        max_total_tokens=512, max_requests=4,
        decode_bs_buckets=(1, 2, 4), prefill_len_buckets=(8, 16, 32),
        kv_len_bucket=64,
    )
    sp = SamplingParams(max_new_tokens=16, do_sample=False, eos_id=-1)
    prompts = [[1, 2, 3, 4, 5, 6, 7], [9, 8, 7]]

    eng_fp = Engine(
        model_cfg=CFG, engine_cfg=EngineConfig(**base), params=params,
        dtype=jnp.float32,
    )
    out_fp = eng_fp.generate(prompts, sp)

    eng_q = Engine(
        model_cfg=CFG,
        engine_cfg=EngineConfig(**base, quant=QuantConfig(kv_dtype="int8")),
        params=params, dtype=jnp.float32,
    )
    assert eng_q.scheduler.state.kv[0].dtype == jnp.int8
    assert eng_q.scheduler.state.kv_scale is not None
    out_q = eng_q.generate(prompts, sp)

    # Random weights give near-tie logits, and one flipped near-tie diverges
    # the rest of the sequence — so require high (not bitwise) agreement; the
    # old truncation-cast bug this test guards against gives ~0% agreement.
    agree = sum(
        a == b for fp, q in zip(out_fp, out_q) for a, b in zip(fp, q)
    )
    total = sum(len(o) for o in out_fp)
    assert agree >= 0.8 * total, (agree, total, out_fp, out_q)
    for fp, q in zip(out_fp, out_q):
        assert fp[:4] == q[:4], (fp, q)


def test_int4_packing_layout():
    """Byte layout contract: low nibble = group row r, high nibble = group
    row r + G//2; unpack_int4 inverts exactly."""
    from tpusgl.ops.linear import unpack_int4

    rng = np.random.default_rng(7)
    vals = rng.integers(-7, 8, (256, 128)).astype(np.float32)
    gs_scale = 1.0  # values already integral in [-7, 7] -> scale 1 roundtrip
    lin = {"w": jnp.asarray(vals * gs_scale)}
    q = quantize_linear_int4(lin, group_size=64)
    assert q["w4"].shape == (128, 128) and q["w4"].dtype == jnp.int8
    unpacked = np.asarray(unpack_int4(q["w4"], 64))
    gs = np.asarray(q["gs"])  # [4, 128]
    recon = unpacked.reshape(4, 64, 128) * gs[:, None, :]
    np.testing.assert_allclose(recon.reshape(256, 128), vals, atol=1e-5)


def test_int8_lm_head_logits_close_and_gated_shape():
    """quantize_lm_head replaces an untied [V, H] head with an int8 Linear
    {"w": [H, V], "s": [V]}; lm_head_logits routes the dict through the
    fused dequant matmul with near-bf16 logits (the PPL gate's int8+lm8
    line owns the quality bound; this is the mechanical contract)."""
    import dataclasses

    import jax

    from tpusgl.config import QuantConfig, resolve_model_config
    from tpusgl.loader.safetensors_loader import quantize_lm_head
    from tpusgl.models import get_model

    cfg = resolve_model_config("qwen2.5-0.5b")
    cfg = dataclasses.replace(
        cfg, num_hidden_layers=2, vocab_size=512, tie_word_embeddings=False
    )
    model = get_model(cfg.architecture)
    params = model.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    qp = quantize_lm_head(params, QuantConfig(lm_head_dtype="int8"))
    assert qp["lm_head"]["w"].dtype == jnp.int8
    assert qp["lm_head"]["w"].shape == (cfg.hidden_size, cfg.vocab_size)
    assert qp["lm_head"]["s"].shape == (cfg.vocab_size,)
    # no-op cases: tied models and bf16 setting return params unchanged
    assert quantize_lm_head(params, QuantConfig()) is params
    tied = dict(params)
    tied.pop("lm_head")
    assert quantize_lm_head(tied, QuantConfig(lm_head_dtype="int8")) is tied

    h = jax.random.normal(
        jax.random.PRNGKey(1), (4, cfg.hidden_size), jnp.bfloat16
    )
    lg = np.asarray(model.lm_head_logits(params, cfg, h))
    lq = np.asarray(model.lm_head_logits(qp, cfg, h))
    assert lq.dtype == np.float32
    rel = np.abs(lq - lg).max() / np.abs(lg).max()
    assert rel < 0.03, rel
    assert (lg.argmax(-1) == lq.argmax(-1)).mean() >= 0.75
