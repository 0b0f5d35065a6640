"""Tensor/data-parallel sharding on the 8-virtual-device CPU mesh
(SURVEY.md §4.3): the sharded engine must produce token-identical output,
with weights/KV actually partitioned and XLA inserting the collectives."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.config import EngineConfig, ModelConfig
from tpusgl.models import qwen2
from tpusgl.ops.attention import ref_attention
from tpusgl.parallel.mesh import make_mesh, param_shardings, shard_params
from tpusgl.runtime.engine import Engine
from tpusgl.runtime.sampling_params import SamplingParams

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

# 8 q-heads / 8 kv-heads so tp=4 divides both.
CFG = ModelConfig(
    hidden_size=128, num_attention_heads=8, num_key_value_heads=8,
    intermediate_size=256, num_hidden_layers=2, vocab_size=256,
    tie_word_embeddings=False, max_position_embeddings=512, rope_theta=10000.0,
)

ECFG = EngineConfig(
    max_total_tokens=512, max_requests=8,
    decode_bs_buckets=(1, 2, 4, 8), prefill_len_buckets=(8, 16, 32, 64),
    kv_len_bucket=64,
)


@pytest.fixture(scope="module")
def params():
    return qwen2.init_params(CFG, jax.random.PRNGKey(11), jnp.float32)


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.default_rng(5)
    return [list(rng.integers(0, CFG.vocab_size, n)) for n in (6, 13, 4, 9)]


def test_params_actually_sharded(params):
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(CFG, params, mesh)
    qkv_w = sharded["layers"][0]["qkv"]["w"]
    # column-sharded over tp: each shard holds out/4 columns
    shard_shapes = {s.data.shape for s in qkv_w.addressable_shards}
    full = qkv_w.shape
    assert shard_shapes == {(full[0], full[1] // 4)}
    down_w = sharded["layers"][0]["down"]["w"]
    shard_shapes = {s.data.shape for s in down_w.addressable_shards}
    assert shard_shapes == {(down_w.shape[0] // 4, down_w.shape[1])}


@pytest.mark.parametrize("dp,tp", [(1, 8), (2, 4), (1, 2)])
def test_sharded_engine_token_identical(params, prompts, dp, tp):
    sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)

    base = Engine(
        model_cfg=CFG, engine_cfg=ECFG, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    expected = base.generate(prompts, sp)

    sharded = Engine(
        model_cfg=CFG, engine_cfg=ECFG.replace(dp=dp, tp=tp), params=params,
        dtype=jnp.float32, attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    got = sharded.generate(prompts, sp)
    assert got == expected


def test_sharded_overlap(params, prompts):
    sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)
    eng = Engine(
        model_cfg=CFG, engine_cfg=ECFG.replace(dp=2, tp=4), params=params,
        dtype=jnp.float32, attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    out1 = eng.generate(prompts, sp, enable_overlap=True)
    out2 = eng.generate(prompts, sp, enable_overlap=False)
    assert out1 == out2


# ---------------------------------------------------------------------------
# Production-configuration TP: the Pallas kernels themselves under shard_map
# (VERDICT r1 item 3 — GSPMD cannot partition a pallas_call; the shard_map'd
# layer body runs each kernel on its local kv-heads / weight blocks).
# ---------------------------------------------------------------------------

# Dims chosen so the quant_matmul tile picker covers every LOCAL shape at
# tp=2 (bn/bk from {128, 256, 384, 512}).
KCFG = ModelConfig(
    hidden_size=256, num_attention_heads=8, num_key_value_heads=4,
    intermediate_size=256, num_hidden_layers=2, vocab_size=256,
    tie_word_embeddings=False, max_position_embeddings=512, rope_theta=10000.0,
)

KECFG = EngineConfig(
    max_total_tokens=512, max_requests=8, page_size=32, pages_per_block=2,
    decode_bs_buckets=(1, 2, 4, 8), prefill_len_buckets=(8, 16, 32, 64),
    kv_len_bucket=64,
)


def _paged_engine(ecfg, params, quant_kernel=False):
    import functools

    from tpusgl.ops.paged_attention import pallas_attention
    from tpusgl.ops.prefill_attention import pallas_prefill

    attn = functools.partial(
        pallas_attention, page_size=ecfg.page_size,
        pages_per_block=ecfg.pages_per_block, interpret=True,
    )
    prefill = functools.partial(
        pallas_prefill, page_size=ecfg.page_size,
        pages_per_block=ecfg.pages_per_block, interpret=True,
    )
    return Engine(
        model_cfg=KCFG, engine_cfg=ecfg, params=params, dtype=jnp.float32,
        attn_impl=attn, sample_k_cap=KCFG.vocab_size, paged_kernel=True,
        prefill_impl=prefill,
    )


def test_tp_paged_kernel_token_identical(prompts):
    """Pallas paged decode attention (interpret) under shard_map tp=2 ==
    the same kernel single-device."""
    params = qwen2.init_params(KCFG, jax.random.PRNGKey(21), jnp.float32)
    sp = SamplingParams(max_new_tokens=8, do_sample=False, eos_id=-1)

    expected = _paged_engine(KECFG, params).generate(prompts, sp)
    got = _paged_engine(KECFG.replace(tp=2), params).generate(prompts, sp)
    assert got == expected


def test_tp_full_production_config_token_identical(prompts):
    """The flagship serving configuration, all kernels live, under TP:
    INT8 weights through the Pallas fused dequant+matmul (interpret) +
    INT8 KV through the Pallas paged decode kernel (interpret), shard_map
    tp=2 — token-identical to the same kernels single-device."""
    from tpusgl.config import QuantConfig
    from tpusgl.loader.safetensors_loader import quantize_params
    from tpusgl.ops.linear import enable_quant_matmul

    params = qwen2.init_params(KCFG, jax.random.PRNGKey(22), jnp.float32)
    qparams = quantize_params(params, QuantConfig(weight_dtype="int8"))
    quant = QuantConfig(weight_dtype="int8", kv_dtype="int8")
    sp = SamplingParams(max_new_tokens=8, do_sample=False, eos_id=-1)

    enable_quant_matmul(True, interpret=True)
    try:
        base = _paged_engine(KECFG.replace(quant=quant), qparams)
        # Engine.__init__ resets the switch (TPU-only); re-arm for tracing.
        enable_quant_matmul(True, interpret=True)
        assert base.scheduler.state.kv[0].dtype == jnp.int8
        expected = base.generate(prompts, sp)

        eng = _paged_engine(KECFG.replace(tp=2, quant=quant), qparams)
        enable_quant_matmul(True, interpret=True)
        got = eng.generate(prompts, sp)
    finally:
        enable_quant_matmul(False)
    assert got == expected


def test_tp_quant_matmul_shard_map_unit():
    """quant_matmul (interpret) inside shard_map, row-parallel pattern:
    x K-split x w row-sharded -> psum == full x @ dequant(w)."""
    from jax.sharding import PartitionSpec as P

    from tpusgl.ops.linear import dequantize_weight, quantize_linear_int8
    from tpusgl.ops.quant_matmul import quant_matmul_any

    mesh = make_mesh(dp=1, tp=4)
    lin = quantize_linear_int8(
        {"w": jax.random.normal(jax.random.PRNGKey(3), (512, 512), jnp.float32)}
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 512), jnp.float32)

    def body(x, w, s):
        y = quant_matmul_any(x, {"w": w, "s": s}, interpret=True)
        return jax.lax.psum(y, "tp")

    got = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None, "tp"), P("tp", None), P()),
            out_specs=P(), check_vma=False,
        )
    )(x, lin["w"], lin["s"])
    want = x @ dequantize_weight(lin, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_data_parallel_engine_token_identical(params, prompts):
    """Real DP serving (replica engines over disjoint device groups): same
    greedy tokens as a single engine, requests load-balanced across dp=2
    replicas each tp=2."""
    from tpusgl.parallel.dp_engine import DataParallelEngine

    sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)
    base = Engine(
        model_cfg=CFG, engine_cfg=ECFG, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    expected = base.generate(prompts, sp)

    dpe = DataParallelEngine(
        dp=2, engine_cfg=ECFG.replace(tp=2), model_cfg=CFG, params=params,
        dtype=jnp.float32, attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    got = dpe.generate(prompts, sp)
    assert got == expected


def test_72b_int4_tp8_program_lowers():
    """SURVEY.md M5 geometry check: the Qwen2.5-72B INT4 decode program at
    tp=8 traces and lowers with abstract weights on an 8-device mesh — the
    full production stack (shard_map TP, int8 KV, paged kernel page tables)
    at flagship scale, no memory needed (AOT on avatars)."""
    from tpusgl.config import EngineConfig, QuantConfig, resolve_model_config
    from tpusgl.loader.safetensors_loader import layer_struct
    from tpusgl.ops.sampling import SamplingArrays
    from tpusgl.runtime.state import EngineState
    from tpusgl.runtime.steps import StepFunctions
    from tpusgl.ops.attention import make_kv_pool
    from tpusgl.runtime.state import scale_pool_rows_per_page

    cfg = resolve_model_config("qwen2.5-72b")
    quant = QuantConfig(weight_dtype="int4", kv_dtype="int8")
    R, ctx, P = 64, 2048, 128
    ecfg = EngineConfig(
        max_requests=R, max_total_tokens=R * ctx, page_size=P,
        pages_per_block=4, tp=8, dp=1, quant=quant,
        decode_bs_buckets=(R,), prefill_len_buckets=(1024,),
        decode_window=2,
    )
    mesh = make_mesh(dp=1, tp=8)

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(shape, jnp.dtype(dt))

    H = cfg.hidden_size
    # tp-aware storage layout: 72B's down projection falls back to int8
    # (29568 = 231 int4 groups cannot row-shard over tp=8).
    layer_av = layer_struct(cfg, quant, jnp.bfloat16, tp=8)
    assert "w4" in layer_av["gate_up"] and "w" in layer_av["down"]
    params_av = {
        "embed": sds((cfg.vocab_size, H), jnp.bfloat16),
        "final_norm": sds((H,), jnp.bfloat16),
        "lm_head": sds((cfg.vocab_size, H), jnp.bfloat16),
        "rope_cos": sds((cfg.max_position_embeddings, cfg.head_dim // 2), jnp.float32),
        "rope_sin": sds((cfg.max_position_embeddings, cfg.head_dim // 2), jnp.float32),
        "layers": tuple(layer_av for _ in range(cfg.num_hidden_layers)),
    }
    slots = ecfg.max_total_tokens
    Hkv, D, L = cfg.num_key_value_heads, cfg.head_dim, cfg.num_hidden_layers
    rows = slots + P
    # tp-sharded scale-pool geometry — the ONE convention (state.py).
    r8 = scale_pool_rows_per_page(Hkv, tp=8)
    state_av = EngineState(
        kv=tuple(sds((rows, Hkv * 2 * D), jnp.int8) for _ in range(L)),
        kv_scale=tuple(sds(((rows // P) * r8, P), jnp.float32) for _ in range(L)),
        last_token=sds((R + 1,), jnp.int32),
        presence=sds((R + 1, cfg.vocab_size), jnp.bool_),
        rng=jax.eval_shape(lambda: jax.random.PRNGKey(0)),
    )
    steps = StepFunctions(params_av, cfg, ecfg, mesh=mesh, paged_kernel=False)
    fn = steps.get_decode_jit(R, ctx, ecfg.decode_window, False, True)

    def i32(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.int32)

    lowered = fn.lower(
        params_av, state_av, i32(R), i32(R), i32(R, ecfg.decode_window),
        i32(R, ecfg.pages_per_seq),
        jax.eval_shape(lambda: SamplingArrays.full(R)), None,
    )
    hlo = lowered.as_text()
    assert "mhlo.num_partitions = 8" in hlo
    # Full partitioner + backend compile on the 8 virtual CPU devices:
    # proves the flagship geometry's collectives, layouts, and shardings
    # are all consistent, without 8 real chips or any weight memory.
    lowered.compile()


@pytest.mark.skipif(
    not os.environ.get("TPUSGL_SLOW_TESTS"),
    reason="~45 min in interpret mode; set TPUSGL_SLOW_TESTS=1 "
    "(passed 2026-08-21, see STATUS.md)",
)
def test_72b_geometry_int4_tp8_executes():
    """VERDICT r3 #8: EXECUTE (not just lower) the 72B-geometry INT4 tp=8
    decode path on the 8-virtual-device mesh. Exact Qwen2.5-72B per-layer
    dims (hidden 8192, intermediate 29568 -> down-proj int8 fallback, 64 q /
    8 kv heads, head_dim 128) with 2 layers and a cut vocab so random
    weights fit host RAM; real int4-quantized weights, int8 KV, the Pallas
    decode kernel (interpret mode) under shard_map tp=8. One prefill and two
    decode windows run end to end; outputs must be valid token ids and
    bit-identical across a re-run (deterministic SPMD program)."""
    import functools

    from tpusgl.config import QuantConfig
    from tpusgl.loader.safetensors_loader import init_params_streamed
    from tpusgl.ops.paged_attention import pallas_attention
    from tpusgl.ops.sampling import SamplingArrays
    from tpusgl.runtime.state import check_scale_geometry, init_state
    from tpusgl.runtime.steps import StepFunctions

    cfg = ModelConfig(
        hidden_size=8192, num_attention_heads=64, num_key_value_heads=8,
        intermediate_size=29568, num_hidden_layers=2, vocab_size=4096,
        rms_norm_eps=1e-5, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    quant = QuantConfig(weight_dtype="int4", kv_dtype="int8")
    P = 8
    ecfg = EngineConfig(
        max_total_tokens=256, max_requests=4, tp=8, dp=1, page_size=P,
        pages_per_block=2, quant=quant,
        decode_bs_buckets=(4,), prefill_len_buckets=(8,), kv_len_bucket=32,
        decode_window=2,
    )
    mesh = make_mesh(dp=1, tp=8)
    params = init_params_streamed(
        cfg, jax.random.PRNGKey(7), jnp.bfloat16, quant=quant, mesh=mesh
    )
    # int4 where compatible, int8 fallback for the 29568-in down projection
    assert "w4" in params["layers"][0]["gate_up"]
    assert "w" in params["layers"][0]["down"]
    assert params["layers"][0]["down"]["w"].dtype == jnp.int8

    state = init_state(cfg, ecfg, kv_dtype=jnp.bfloat16, mesh=mesh)
    check_scale_geometry(state, cfg, ecfg)
    attn = functools.partial(
        pallas_attention, page_size=P, pages_per_block=2, interpret=True,
    )
    steps = StepFunctions(
        params, cfg, ecfg, attn_impl=attn, paged_kernel=True, mesh=mesh,
    )

    def run():
        st = init_state(cfg, ecfg, kv_dtype=jnp.bfloat16, mesh=mesh)
        S = 8
        kv_rows = (np.arange(P, dtype=np.int32) + P)[None, :]
        st, first = steps.prefill(
            st, np.array([0], np.int32),
            (np.arange(1, S + 1, dtype=np.int32) % cfg.vocab_size)[None, :],
            np.array([S], np.int32), np.array([0], np.int32),
            kv_rows[:, :S].copy(), None, SamplingArrays.full(1),
            np.full((1, 64), cfg.vocab_size, np.int32), None,
            simple=True,
        )
        B = 4
        req_indices = np.full((B,), ecfg.max_requests, np.int32)
        req_indices[0] = 0
        seq_lens = np.ones((B,), np.int32)
        seq_lens[0] = S + 1
        out_loc = np.zeros((B, 2), np.int32)
        out_loc[0] = [2 * P, 2 * P + 1]
        page_tbl = np.zeros((B, ecfg.pages_per_seq), np.int32)
        page_tbl[0, :3] = [1, 2, 2]
        st, ids = steps.decode(
            ecfg.max_context_len, 2, st, req_indices, seq_lens, out_loc,
            page_tbl, SamplingArrays.full(B), None, simple=True,
        )
        return int(np.asarray(first)[0]), np.asarray(ids)[:, 0].tolist()

    first1, ids1 = run()
    first2, ids2 = run()
    assert 0 <= first1 < cfg.vocab_size
    assert all(0 <= t < cfg.vocab_size for t in ids1)
    assert (first1, ids1) == (first2, ids2), "non-deterministic tp=8 int4 run"


def test_72b_dims_int4_tp8_fast_ci():
    """Default-CI guard for the 72B multi-chip flagship path (VERDICT r4
    #8): SAME per-layer dims and tp geometry as the slow 45-min test
    (hidden 8192, intermediate 29568, 64 q / 8 kv heads, int4 weights with
    the int8 keep-mix and the 29568 down-proj fallback, int8 KV, Pallas
    decode kernel in interpret mode under shard_map tp=8) but ONE layer,
    one clip candidate for the int4 init search, a single decode step, and
    the jnp dequant-matmul path for the linears (the packed int4 weights
    and tp sharding are identical; interpret-mode quant matmuls at these
    dims alone cost ~20 min on CPU and are covered at smaller geometry by
    test_kernels / the int4 tp tests — the 45-min TPUSGL_SLOW_TESTS test
    keeps full kernel-interpret coverage). f32 activations: CPU bf16
    matmuls are emulated and ~2x slower; the int4/int8 storage and
    sharding under test are dtype-independent."""
    import functools

    import tpusgl.ops.linear as linear_mod
    from tpusgl.ops.linear import enable_quant_matmul

    enable_quant_matmul(False)  # jnp dequant path for the linears (speed)
    from tpusgl.config import QuantConfig
    from tpusgl.loader.safetensors_loader import init_params_streamed
    from tpusgl.ops.paged_attention import pallas_attention
    from tpusgl.ops.sampling import SamplingArrays
    from tpusgl.runtime.state import check_scale_geometry, init_state
    from tpusgl.runtime.steps import StepFunctions

    cfg = ModelConfig(
        hidden_size=8192, num_attention_heads=64, num_key_value_heads=8,
        intermediate_size=29568, num_hidden_layers=1, vocab_size=2048,
        rms_norm_eps=1e-5, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    quant = QuantConfig(weight_dtype="int4", kv_dtype="int8")
    P = 8
    ecfg = EngineConfig(
        max_total_tokens=128, max_requests=2, tp=8, dp=1, page_size=P,
        pages_per_block=2, quant=quant,
        decode_bs_buckets=(2,), prefill_len_buckets=(8,), kv_len_bucket=32,
        decode_window=1,
    )
    mesh = make_mesh(dp=1, tp=8)
    saved = linear_mod.INT4_CLIP_CANDIDATES
    linear_mod.INT4_CLIP_CANDIDATES = (1.0,)  # init-time speed only
    try:
        params = init_params_streamed(
            cfg, jax.random.PRNGKey(7), jnp.float32, quant=quant, mesh=mesh
        )
    finally:
        linear_mod.INT4_CLIP_CANDIDATES = saved
    # gate_up stays int4; qkv/o int8 via the keep-mix; down int8 via the
    # 29568 % (64*8) != 0 group fallback
    assert "w4" in params["layers"][0]["gate_up"]
    assert params["layers"][0]["down"]["w"].dtype == jnp.int8
    assert params["layers"][0]["qkv"]["w"].dtype == jnp.int8

    state = init_state(cfg, ecfg, kv_dtype=jnp.float32, mesh=mesh)
    check_scale_geometry(state, cfg, ecfg)
    attn = functools.partial(
        pallas_attention, page_size=P, pages_per_block=2, interpret=True,
    )
    steps = StepFunctions(
        params, cfg, ecfg, attn_impl=attn, paged_kernel=True, mesh=mesh,
    )

    S = 8
    kv_rows = (np.arange(P, dtype=np.int32) + P)[None, :]
    state, first = steps.prefill(
        state, np.array([0], np.int32),
        (np.arange(1, S + 1, dtype=np.int32) % cfg.vocab_size)[None, :],
        np.array([S], np.int32), np.array([0], np.int32),
        kv_rows[:, :S].copy(), None, SamplingArrays.full(1),
        np.full((1, 64), cfg.vocab_size, np.int32), None,
        simple=True,
    )
    B = 2
    req_indices = np.full((B,), ecfg.max_requests, np.int32)
    req_indices[0] = 0
    seq_lens = np.ones((B,), np.int32)
    seq_lens[0] = S + 1
    out_loc = np.zeros((B, 1), np.int32)
    out_loc[0] = [2 * P]
    page_tbl = np.zeros((B, ecfg.pages_per_seq), np.int32)
    page_tbl[0, :3] = [1, 2, 2]
    state, ids = steps.decode(
        ecfg.max_context_len, 1, state, req_indices, seq_lens, out_loc,
        page_tbl, SamplingArrays.full(B), None, simple=True,
    )
    f = int(np.asarray(first)[0])
    toks = np.asarray(ids)[:, 0].tolist()
    assert 0 <= f < cfg.vocab_size
    assert all(0 <= t < cfg.vocab_size for t in toks)
