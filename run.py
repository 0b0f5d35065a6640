"""Interactive single-prompt generation CLI (reference run.py:11-68).

Without network access there are no pretrained checkpoints; pass a local HF
checkpoint directory as --model-id to get real text, or a preset name
(e.g. qwen2.5-0.5b) to exercise the engine with random weights (token ids in,
token ids out)."""

from __future__ import annotations

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-id", default="qwen2.5-0.5b")
    p.add_argument("--prompt", default="Give me a short introduction to large language models.")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--do-sample", action="store_true")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-k", type=int, default=20)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--weight-dtype", default="bf16", choices=["bf16", "int8", "int4"])
    p.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"])
    p.add_argument("--lm-head-dtype", default="bf16", choices=["bf16", "int8"])
    p.add_argument("--enable-overlap", action="store_true")
    p.add_argument("--json-schema", default=None, help="path to a JSON schema file")
    p.add_argument("--json-whitespace", action="store_true",
                   help="tolerate inter-token whitespace in constrained output")
    p.add_argument("--device", default=None, choices=["tpu", "cpu"],
                   help="force a jax backend (reference run.py:24)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel shards (shard_map over the mesh)")
    p.add_argument("--stream", action="store_true",
                   help="print tokens as they are committed (generate_stream)")
    p.add_argument("--speculative-tokens", type=int, default=0,
                   help="prompt-lookup speculative decoding drafts per step "
                   "(greedy only; 0 disables)")
    return p.parse_args()


def main():
    args = parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.device == "cpu":
        # The TPU tunnel plugin forces its own jax_platforms; the config
        # update (not the env var) is what selects the backend.
        jax.config.update("jax_platforms", "cpu")

    from tpusgl.config import EngineConfig, QuantConfig
    from tpusgl.runtime.engine import Engine
    from tpusgl.runtime.sampling_params import SamplingParams

    overrides = {}
    if args.kv_dtype == "int8":
        overrides.update(page_size=128, pages_per_block=8)
    from tpusgl.config import resolve_model_config

    mcfg = resolve_model_config(args.model_id)
    ecfg = EngineConfig.from_env(
        quant=QuantConfig(weight_dtype=args.weight_dtype,
                          kv_dtype=args.kv_dtype,
                          lm_head_dtype=args.lm_head_dtype),
        enable_overlap=args.enable_overlap,
        tp=args.tp,
        speculative_tokens=args.speculative_tokens,
        **overrides,
    )
    if ecfg.max_context_len > mcfg.rope_table_rows:
        # Default pool geometry (131072 / 32 = 4096-token rows, the
        # reference's scheduler.py:43-47) can exceed a small model's RoPE
        # table; clamp the per-request context to the usable range instead
        # of failing the loud Engine check.
        import dataclasses

        per = (mcfg.rope_table_rows // ecfg.page_size) * ecfg.page_size
        ecfg = dataclasses.replace(
            ecfg, max_total_tokens=per * ecfg.max_requests
        )
    engine = Engine(args.model_id, model_cfg=mcfg, engine_cfg=ecfg)

    schema = None
    if args.json_schema:
        import json

        with open(args.json_schema) as f:
            schema = json.load(f)

    sp = SamplingParams(
        max_new_tokens=args.max_new_tokens,
        do_sample=args.do_sample,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        json_schema=schema,
        json_whitespace=args.json_whitespace,
    )

    if engine.tokenizer is not None:
        tmpl = getattr(engine.tokenizer, "apply_chat_template", None)
        if tmpl is not None:
            prompt = tmpl(
                [{"role": "user", "content": args.prompt}],
                tokenize=False, add_generation_prompt=True,
            )
        else:
            prompt = args.prompt
        request = prompt
    else:
        # no tokenizer: treat the prompt as bytes -> token ids mod vocab
        request = [b % engine.model_cfg.vocab_size for b in args.prompt.encode()]

    t0 = time.perf_counter()
    if args.stream:
        n = 0
        for _, new_ids, finished in engine.generate_stream(
            [request], sp, enable_overlap=args.enable_overlap
        ):
            n += len(new_ids)
            if engine.tokenizer is not None:
                print(engine.tokenizer.decode(new_ids), end="", flush=True)
            else:
                print(*new_ids, end=" ", flush=True)
        print()
        dt = time.perf_counter() - t0
    else:
        out = engine.generate([request], sp, enable_overlap=args.enable_overlap)[0]
        dt = time.perf_counter() - t0
        print(out)
        n = len(out) if isinstance(out, list) else len(out.split())
    print(f"latency={dt:.2f}s ({n} units)")


if __name__ == "__main__":
    main()
