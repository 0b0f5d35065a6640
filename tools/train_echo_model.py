"""Train a tiny copy/induction model so prompt-lookup speculation has an
honest WINNING workload (VERDICT r4 #4b).

Random-weight models give prompt-lookup ~15% acceptance (BENCH_SPEC r4 —
an honest 3.5x LOSS). Speculation's home turf is models that echo their
context (extraction, quoting, templated output). Zero egress blocks real
checkpoints, so this trains one from scratch on a pure copy task: every
training sequence is a random token span repeated (A A A ...), which a
2-layer attention model learns to continue via induction — at inference it
repeats the prompt, prompt-lookup drafts match at high acceptance, and the
verify step commits several tokens per pass.

Saves an HF-layout checkpoint (config.json + model.safetensors) loadable by
the normal loader: `python bench.py --mode spec --model tests/assets/tiny_echo`.

Deterministic (seeded); CPU-trainable in minutes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "assets",
                   "tiny_echo")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tpusgl.config import ModelConfig
    from tpusgl.models import qwen2

    cfg = ModelConfig(
        hidden_size=128, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=256, num_hidden_layers=2, vocab_size=512,
        tie_word_embeddings=True, max_position_embeddings=2048,
        rope_theta=10000.0, rms_norm_eps=1e-6,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)

    B, S = 32, 192
    PERIOD = 32  # fixed copy period: learnable as a relative-offset
    # attention pattern (RoPE makes position i-32 directly addressable);
    # variable-period spans plateaued at ~random loss in 600 steps
    rng = np.random.default_rng(0)

    def batch():
        x = np.zeros((B, S), np.int64)
        for b in range(B):
            span = rng.integers(0, cfg.vocab_size, PERIOD)
            x[b] = np.tile(span, S // PERIOD + 1)[:S]
        return jnp.asarray(x, jnp.int32)

    def loss_fn(p, ids):
        from tpusgl.ops.attention import AttnMeta, make_kv_pool, ref_attention

        Bb, Ss = ids.shape
        kv = make_kv_pool(cfg.num_hidden_layers, Bb * Ss,
                          cfg.num_key_value_heads, cfg.head_dim, jnp.float32)
        rows = 1 + (
            jnp.arange(Bb, dtype=jnp.int32)[:, None] * Ss
            + jnp.arange(Ss, dtype=jnp.int32)[None, :]
        )
        meta = AttnMeta(
            kv_rows=rows,
            seq_lens=jnp.full((Bb,), Ss, jnp.int32),
            ext_lens=jnp.full((Bb,), Ss, jnp.int32),
            positions=jnp.tile(jnp.arange(Ss, dtype=jnp.int32)[None], (Bb, 1)),
            out_loc=rows,
        )
        hidden, _ = qwen2.forward_hidden(p, cfg, ids, meta, kv,
                                         attn_impl=ref_attention)
        logits = qwen2.lm_head_logits(p, cfg, hidden)  # [B, S, V]
        tgt = ids[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1])
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    steps_total = int(os.environ.get("ECHO_STEPS", "1500"))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 8e-3, warmup_steps=100, decay_steps=steps_total
    )
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, ids):
        l, g = jax.value_and_grad(loss_fn)(p, ids)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    for i in range(steps_total):
        params, opt_state, l = step(params, opt_state, batch())
        if i % 100 == 0 or i == steps_total - 1:
            print(f"step {i}: loss {float(l):.4f}", flush=True)

    # quick induction check: greedy continuation of a repeated span
    span = rng.integers(0, cfg.vocab_size, PERIOD)
    prompt = np.tile(span, 3)[: 2 * PERIOD + 12].tolist()
    from tpusgl.config import EngineConfig
    from tpusgl.runtime.engine import Engine
    from tpusgl.runtime.sampling_params import SamplingParams

    eng = Engine(
        model_cfg=cfg,
        engine_cfg=EngineConfig(
            max_total_tokens=2048, max_requests=2,
            decode_bs_buckets=(1, 2), prefill_len_buckets=(16, 32, 64, 128),
            kv_len_bucket=128),
        params=jax.tree.map(lambda a: jnp.asarray(a), params),
        dtype=jnp.float32, tokenizer=None,
    )
    out = eng.scheduler.run_batch(
        [prompt], SamplingParams(max_new_tokens=48, do_sample=False, eos_id=-1)
    )[0]
    start = len(prompt)
    expect = [int(span[(start + i) % PERIOD]) for i in range(48)]
    acc = float(np.mean(np.asarray(out) == np.asarray(expect)))
    print(f"induction continuation accuracy: {acc:.1%}")

    # save HF layout
    os.makedirs(OUT, exist_ok=True)
    from safetensors.numpy import save_file

    sd = {}
    sd["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
    sd["model.norm.weight"] = np.asarray(params["final_norm"], np.float32)
    for li, layer in enumerate(params["layers"]):
        p = f"model.layers.{li}."
        qkv = np.asarray(layer["qkv"]["w"], np.float32)  # [H, q+2kv]
        qs, kvs = cfg.q_size, cfg.kv_size
        sd[p + "self_attn.q_proj.weight"] = qkv[:, :qs].T.copy()
        sd[p + "self_attn.k_proj.weight"] = qkv[:, qs:qs + kvs].T.copy()
        sd[p + "self_attn.v_proj.weight"] = qkv[:, qs + kvs:].T.copy()
        if "b" in layer["qkv"]:
            qb = np.asarray(layer["qkv"]["b"], np.float32)
            sd[p + "self_attn.q_proj.bias"] = qb[:qs].copy()
            sd[p + "self_attn.k_proj.bias"] = qb[qs:qs + kvs].copy()
            sd[p + "self_attn.v_proj.bias"] = qb[qs + kvs:].copy()
        sd[p + "self_attn.o_proj.weight"] = np.asarray(
            layer["o"]["w"], np.float32).T.copy()
        gu = np.asarray(layer["gate_up"]["w"], np.float32)
        I = cfg.intermediate_size
        sd[p + "mlp.gate_proj.weight"] = gu[:, :I].T.copy()
        sd[p + "mlp.up_proj.weight"] = gu[:, I:].T.copy()
        sd[p + "mlp.down_proj.weight"] = np.asarray(
            layer["down"]["w"], np.float32).T.copy()
        sd[p + "input_layernorm.weight"] = np.asarray(
            layer["input_norm"], np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.asarray(
            layer["post_norm"], np.float32)
    save_file(sd, os.path.join(OUT, "model.safetensors"))
    with open(os.path.join(OUT, "config.json"), "w") as f:
        json.dump({
            "architectures": ["Qwen2ForCausalLM"],
            "hidden_size": cfg.hidden_size,
            "num_attention_heads": cfg.num_attention_heads,
            "num_key_value_heads": cfg.num_key_value_heads,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_hidden_layers,
            "vocab_size": cfg.vocab_size,
            "rms_norm_eps": cfg.rms_norm_eps,
            "rope_theta": cfg.rope_theta,
            "max_position_embeddings": cfg.max_position_embeddings,
            "tie_word_embeddings": True,
            "attention_bias": True,
        }, f, indent=1)
    print(f"saved {OUT}")


if __name__ == "__main__":
    main()
