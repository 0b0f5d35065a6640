"""M0 golden tests: our functional Qwen2 vs HuggingFace transformers.

No network: a randomly-initialized HF Qwen2ForCausalLM provides the ground
truth (the architecture code ships with transformers). Weights are exported
to safetensors and loaded through our streaming loader, so this also covers
the fused-QKV/GateUp name mapping (loader/safetensors_loader.py vs
/root/reference/model_loader.py:123-264).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusgl.config import ModelConfig
from tpusgl.models import qwen2
from tpusgl.ops.attention import AttnMeta, chunked_attention, ref_attention
from tpusgl.loader.safetensors_loader import load_params, save_params_hf_layout


TINY = ModelConfig(
    hidden_size=64,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    num_hidden_layers=2,
    vocab_size=256,
    tie_word_embeddings=False,
    max_position_embeddings=128,
    rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def hf_model_and_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        hidden_size=TINY.hidden_size,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        vocab_size=TINY.vocab_size,
        max_position_embeddings=TINY.max_position_embeddings,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=TINY.tie_word_embeddings,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval().float()
    out_dir = tmp_path_factory.mktemp("ckpt")
    model.save_pretrained(out_dir, safe_serialization=True)
    return model, str(out_dir)


def _dense_forward(params, cfg, ids_np, attn_impl=ref_attention):
    """Run our model on a dense batch with a fresh identity-page-table cache."""
    B, S = ids_np.shape
    L, Hkv, D = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    slots = B * S
    from tpusgl.ops.attention import make_kv_pool
    kv = make_kv_pool(L, slots, Hkv, D, jnp.float32)
    # Row b occupies slots [1 + b*S, 1 + (b+1)*S).
    rows = 1 + np.arange(B)[:, None] * S + np.arange(S)[None, :]
    meta = AttnMeta(
        kv_rows=jnp.asarray(rows, jnp.int32),
        seq_lens=jnp.full((B,), S, jnp.int32),
        ext_lens=jnp.full((B,), S, jnp.int32),
        positions=jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1)),
        out_loc=jnp.asarray(rows, jnp.int32),
    )
    hidden, kv = qwen2.forward(
        params, cfg, jnp.asarray(ids_np, jnp.int32), meta, kv,
        attn_impl=attn_impl,
    )
    return hidden, kv, meta


def test_logits_match_hf(hf_model_and_dir):
    import torch

    model, ckpt = hf_model_and_dir
    params = load_params(ckpt, TINY, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 12))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()  # [B, S, V]

    hidden, _, _ = _dense_forward(params, TINY, ids)
    ours_last = np.asarray(qwen2.lm_head_logits(params, TINY, hidden))
    np.testing.assert_allclose(ours_last, hf_logits[:, -1, :], rtol=2e-4, atol=2e-4)


def test_greedy_decode_matches_hf(hf_model_and_dir):
    """Token-identical greedy decode vs HF (BASELINE.md correctness gate),
    exercising the incremental KV-cache path step by step."""
    import torch

    model, ckpt = hf_model_and_dir
    params = load_params(ckpt, TINY, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    prompt = rng.integers(0, TINY.vocab_size, size=(1, 8))
    n_new = 16

    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(prompt),
            max_new_tokens=n_new,
            do_sample=False,
            num_beams=1,
            pad_token_id=0,
        ).numpy()[0, prompt.shape[1]:]

    # Ours: prefill then single-token decode steps against the paged cache.
    from tpusgl.ops.attention import make_kv_pool
    L, Hkv, D = TINY.num_hidden_layers, TINY.num_key_value_heads, TINY.head_dim
    total = prompt.shape[1] + n_new
    kv = make_kv_pool(L, total, Hkv, D, jnp.float32)
    row = np.zeros((1, total), np.int32)
    row[0, :] = 1 + np.arange(total)

    S = prompt.shape[1]
    meta = AttnMeta(
        kv_rows=jnp.asarray(row, jnp.int32),
        seq_lens=jnp.array([S], jnp.int32),
        ext_lens=jnp.array([S], jnp.int32),
        positions=jnp.arange(S, dtype=jnp.int32)[None],
        out_loc=jnp.asarray(row[:, :S], jnp.int32),
    )
    hidden, kv = qwen2.forward(
        params, TINY, jnp.asarray(prompt, jnp.int32), meta, kv
    )
    ours = []
    cur = int(np.argmax(np.asarray(qwen2.lm_head_logits(params, TINY, hidden))[0]))
    ours.append(cur)
    for step in range(n_new - 1):
        pos = S + step
        meta = AttnMeta(
            kv_rows=jnp.asarray(row, jnp.int32),
            seq_lens=jnp.array([pos + 1], jnp.int32),
            ext_lens=jnp.array([1], jnp.int32),
            positions=jnp.array([[pos]], jnp.int32),
            out_loc=jnp.asarray(row[:, pos : pos + 1], jnp.int32),
        )
        hidden, kv = qwen2.forward(
            params, TINY, jnp.array([[cur]], jnp.int32), meta, kv
        )
        cur = int(np.argmax(np.asarray(qwen2.lm_head_logits(params, TINY, hidden))[0]))
        ours.append(cur)

    np.testing.assert_array_equal(np.array(ours), hf_out)


def test_chunked_attention_matches_ref(hf_model_and_dir):
    _, ckpt = hf_model_and_dir
    params = load_params(ckpt, TINY, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 64))

    h_ref, _, _ = _dense_forward(params, TINY, ids, attn_impl=ref_attention)
    import functools

    chunked = functools.partial(chunked_attention, q_chunk=16)
    h_chk, _, _ = _dense_forward(params, TINY, ids, attn_impl=chunked)
    np.testing.assert_allclose(
        np.asarray(h_ref), np.asarray(h_chk), rtol=1e-5, atol=1e-5
    )


def test_prefix_cache_equivalence(hf_model_and_dir):
    """Prefill with a cached prefix must equal full prefill (the radix-cache
    correctness contract, cf. attn_backend.py:74-92 prefix mask)."""
    _, ckpt = hf_model_and_dir
    params = load_params(ckpt, TINY, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    full = rng.integers(0, TINY.vocab_size, size=16)
    split = 10

    # Full prefill.
    hidden_full, _, _ = _dense_forward(params, TINY, full[None, :])

    # Prefix prefill then suffix prefill against the cached prefix.
    from tpusgl.ops.attention import make_kv_pool
    L, Hkv, D = TINY.num_hidden_layers, TINY.num_key_value_heads, TINY.head_dim
    kv2 = make_kv_pool(L, 16, Hkv, D, jnp.float32)
    row = 1 + np.arange(16, dtype=np.int32)

    meta_a = AttnMeta(
        kv_rows=jnp.asarray(row[None, :], jnp.int32),
        seq_lens=jnp.array([split], jnp.int32),
        ext_lens=jnp.array([split], jnp.int32),
        positions=jnp.arange(split, dtype=jnp.int32)[None],
        out_loc=jnp.asarray(row[None, :split], jnp.int32),
    )
    _, kv2 = qwen2.forward(
        params, TINY, jnp.asarray(full[None, :split], jnp.int32), meta_a, kv2
    )
    ext = 16 - split
    meta_b = AttnMeta(
        kv_rows=jnp.asarray(row[None, :], jnp.int32),
        seq_lens=jnp.array([16], jnp.int32),
        ext_lens=jnp.array([ext], jnp.int32),
        positions=(split + jnp.arange(ext, dtype=jnp.int32))[None],
        out_loc=jnp.asarray(row[None, split:], jnp.int32),
    )
    hidden_split, _ = qwen2.forward(
        params, TINY, jnp.asarray(full[None, split:], jnp.int32), meta_b, kv2
    )
    np.testing.assert_allclose(
        np.asarray(hidden_full), np.asarray(hidden_split), rtol=1e-5, atol=1e-5
    )


def test_llama_logits_match_hf(tmp_path):
    """The registry's 'llama' entry is real: a tiny HF LlamaForCausalLM
    (attention_bias=False, untied head — the two deltas vs Qwen2 that
    ModelConfig carries) loads through the same path and matches logits."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from tpusgl.config import ModelConfig
    from tpusgl.models import get_model

    cfg = ModelConfig(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, num_hidden_layers=2, vocab_size=256,
        max_position_embeddings=128, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
        architecture="llama",
    )
    hf_cfg = LlamaConfig(
        hidden_size=cfg.hidden_size,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        vocab_size=cfg.vocab_size,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False,
        attention_bias=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    model.save_pretrained(tmp_path, safe_serialization=True)

    # The saved config.json round-trips to the same ModelConfig.
    parsed = ModelConfig.from_json(str(tmp_path / "config.json"))
    assert parsed.architecture == "llama"
    assert not parsed.attention_bias

    params = load_params(str(tmp_path), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    impl = get_model(cfg.architecture)
    hidden, _, _ = _dense_forward(params, cfg, ids)
    ours_last = np.asarray(impl.lm_head_logits(params, cfg, hidden))
    np.testing.assert_allclose(ours_last, hf_logits[:, -1, :], rtol=2e-4, atol=2e-4)


def test_qwen3_logits_match_hf(tmp_path):
    """Qwen3 support: per-head q/k RMSNorm before RoPE, explicit head_dim
    (!= hidden/heads), no qkv bias. Loads a tiny HF Qwen3ForCausalLM through
    the streaming loader and matches logits."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from tpusgl.config import ModelConfig
    from tpusgl.models import get_model

    cfg = ModelConfig(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, num_hidden_layers=2, vocab_size=256,
        max_position_embeddings=128, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
        architecture="qwen3", head_dim_override=32, qk_norm=True,
    )
    assert cfg.head_dim == 32 and cfg.q_size == 128  # override exercised
    hf_cfg = Qwen3Config(
        hidden_size=cfg.hidden_size,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        vocab_size=cfg.vocab_size,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        head_dim=32,
        tie_word_embeddings=False,
        attention_bias=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf_cfg).eval().float()
    model.save_pretrained(tmp_path, safe_serialization=True)

    parsed = ModelConfig.from_json(str(tmp_path / "config.json"))
    assert parsed.architecture == "qwen3"
    assert parsed.qk_norm and parsed.head_dim == 32

    params = load_params(str(tmp_path), cfg, dtype=jnp.float32)
    assert "q_norm" in params["layers"][0]
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    impl = get_model(cfg.architecture)
    hidden, _, _ = _dense_forward(params, cfg, ids)
    ours_last = np.asarray(impl.lm_head_logits(params, cfg, hidden))
    np.testing.assert_allclose(ours_last, hf_logits[:, -1, :], rtol=2e-4, atol=2e-4)


def test_linear_rope_scaling_matches_hf(tmp_path):
    """rope_scaling type 'linear' must be TRUE position scaling (HF
    LinearScalingRotaryEmbedding divides t by the factor). A theta fold —
    what the reference attempts at /root/reference/qwen2.py:241-243, and
    what this repo shipped through round 3 — leaves the highest-frequency
    dim unscaled and diverges from the checkpoint's training semantics."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    factor = 4.0
    hf_cfg = Qwen2Config(
        hidden_size=TINY.hidden_size,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        vocab_size=TINY.vocab_size,
        max_position_embeddings=TINY.max_position_embeddings,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False,
        attention_dropout=0.0,
        rope_scaling={"type": "linear", "factor": factor},
    )
    torch.manual_seed(1)
    model = Qwen2ForCausalLM(hf_cfg).eval().float()
    out_dir = str(tmp_path / "ckpt_scaled")
    model.save_pretrained(out_dir, safe_serialization=True)

    import dataclasses

    cfg = dataclasses.replace(
        TINY, rope_scaling_type="linear", rope_scaling_factor=factor
    )
    assert cfg.rope_table_rows == int(TINY.max_position_embeddings * factor)
    params = load_params(out_dir, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 24))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    hidden, _, _ = _dense_forward(params, cfg, ids)
    ours_last = np.asarray(qwen2.lm_head_logits(params, cfg, hidden))
    np.testing.assert_allclose(
        ours_last, hf_logits[:, -1, :], rtol=2e-4, atol=2e-4
    )


def test_llama3_rope_scaling_matches_hf(tmp_path):
    """HF rope_scaling {'rope_type': 'llama3'} (Llama-3.1 checkpoints):
    frequency-dependent scaling — low-frequency dims fully interpolated,
    high-frequency dims untouched, smooth band between. Must match HF's
    LlamaForCausalLM logits; the modern 'rope_type' key (not legacy 'type')
    must parse."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    rs = {
        "rope_type": "llama3",
        "factor": 4.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 64,
    }
    hf_cfg = LlamaConfig(
        hidden_size=TINY.hidden_size,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        vocab_size=TINY.vocab_size,
        max_position_embeddings=256,  # llama3 configs state the EXTENDED len
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False,
        attention_bias=False,
        attention_dropout=0.0,
        rope_scaling=rs,
        mlp_bias=False,
    )
    torch.manual_seed(2)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    out_dir = str(tmp_path / "ckpt_llama3")
    model.save_pretrained(out_dir, safe_serialization=True)

    from tpusgl.config import ModelConfig

    cfg = ModelConfig.from_json(out_dir + "/config.json")
    assert cfg.architecture == "llama"
    assert cfg.rope_scaling_type == "llama3"
    assert cfg.rope_table_rows == 256
    params = load_params(out_dir, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 96))  # past orig 64
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    hidden, _, _ = _dense_forward(params, cfg, ids)
    ours_last = np.asarray(qwen2.lm_head_logits(params, cfg, hidden))
    np.testing.assert_allclose(
        ours_last, hf_logits[:, -1, :], rtol=3e-4, atol=3e-4
    )


def test_unsupported_rope_type_raises():
    from tpusgl.config import ModelConfig

    with pytest.raises(ValueError, match="rope_scaling"):
        ModelConfig.from_hf_dict({
            "hidden_size": 64, "num_attention_heads": 4,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "vocab_size": 256,
            "rope_scaling": {"rope_type": "yarn", "factor": 2.0},
        })
