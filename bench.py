"""Throughput benchmark — the reference protocol (/root/reference/bench.py:
12-59: 256 random-token sequences, input len U(100,1024), 1024 output tokens,
temperature 0.6, eos disabled, one warmup run, timed overlap-schedule
run_batch, throughput = generated tokens / wall time), extended with TTFT
percentiles and per-phase breakdown.

Prints exactly one JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
(vs_baseline is 1.0: the reference publishes no numbers, BASELINE.md.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    # Defaults are the BASELINE.md north-star config (Qwen2.5-7B INT8
    # weights + INT8 KV, reference workload protocol): a bare
    # `python bench.py` measures and prints the flagship number.
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="qwen2.5-7b")
    parser.add_argument("--num-seqs", type=int, default=256)
    parser.add_argument("--min-input", type=int, default=100)
    parser.add_argument("--max-input", type=int, default=1024)
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--temperature", type=float, default=0.6)
    parser.add_argument("--weight-dtype", default="int8",
                        choices=["bf16", "int8", "int4"])
    parser.add_argument("--kv-dtype", default="int8", choices=["bf16", "int8"])
    parser.add_argument("--no-overlap", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-requests", type=int, default=96,
                        help="concurrent request slots (96 fits the 7B INT8 "
                        "weights + INT8 KV pool in one 16 GB chip)")
    parser.add_argument("--decode-window", type=int, default=8)
    parser.add_argument("--prefill-budget", type=int, default=4096,
                        help="max tokens per batched prefill step (lower for "
                        "big models to bound activation memory)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the timed run "
                        "into DIR (SURVEY.md §5 observability)")
    parser.add_argument("--device", default=None, choices=["tpu", "cpu"],
                        help="force a jax backend (reference run.py:24)")
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.device == "cpu":
        # The TPU tunnel plugin forces its own jax_platforms; the config
        # update (not the env var) is what actually selects the backend.
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpusgl.config import EngineConfig, QuantConfig
    from tpusgl.runtime.engine import Engine
    from tpusgl.runtime.sampling_params import SamplingParams

    # Context must hold prompt + all new tokens; pool sized for every request
    # resident at once (continuous batching still kicks in if it can't be).
    max_requests = args.max_requests or min(args.num_seqs, 256)
    ctx = 1 << (args.max_input + args.max_new_tokens - 1).bit_length()
    # Per-token-scale INT8 KV needs 128-token pages on the compiled kernel
    # (Mosaic lane-slice tiling, ops/paged_attention.py). 1024-token DMA
    # blocks (pages_per_block x page_size) amortize per-block kernel
    # overhead: measured 190 us -> 160 us per decode-attention call at the
    # 7B bench geometry vs 512-token blocks (the kernel is DMA-issue bound,
    # not bandwidth bound, at short-to-mid context).
    page_size, ppb = (128, 8) if args.kv_dtype == "int8" else (32, 16)
    ecfg = EngineConfig.from_env(
        quant=QuantConfig(weight_dtype=args.weight_dtype, kv_dtype=args.kv_dtype),
        enable_overlap=not args.no_overlap,
        kv_len_bucket=512,
        max_requests=max_requests,
        max_total_tokens=max_requests * ctx,
        page_size=page_size,
        pages_per_block=ppb,
        decode_bs_buckets=(max_requests,),
        prefill_token_budget=args.prefill_budget,
        prefill_len_buckets=(128, 256, 512, 1024, 2048, 4096),
        decode_window=args.decode_window,
    )
    print(f"building engine: {args.model} on {jax.devices()[0].platform} "
          f"(weights {args.weight_dtype}, kv {args.kv_dtype})", file=sys.stderr)
    engine = Engine(args.model, engine_cfg=ecfg, seed=args.seed)

    vocab = engine.model_cfg.vocab_size
    rng = np.random.default_rng(args.seed)
    prompts = [
        rng.integers(0, vocab, rng.integers(args.min_input, args.max_input + 1))
        .tolist()
        for _ in range(args.num_seqs)
    ]
    sp = SamplingParams(
        max_new_tokens=args.max_new_tokens, temperature=args.temperature,
        do_sample=True, eos_id=-1,
    )

    # Warmup: precompile every bucket the run will hit, then one real request
    # (the reference warms with one request only, bench.py:46-47).
    print("warmup...", file=sys.stderr)
    t0 = time.perf_counter()
    engine.warmup(simple=True)
    engine.scheduler.run_batch([prompts[-1]], sp, overlap=not args.no_overlap)
    engine.reset()
    print(f"warmup done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    outs = engine.scheduler.run_batch(prompts, sp, overlap=not args.no_overlap)
    elapsed = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}", file=sys.stderr)

    total_out = sum(len(o) for o in outs)
    tput = total_out / elapsed
    m = engine.metrics
    ttft = sorted(m["ttft_s"])
    pct = lambda p: round(ttft[min(len(ttft) - 1, int(p * len(ttft)))], 3) if ttft else None

    # ---- HBM roofline (SURVEY.md §6): model-derived bytes moved / wall time.
    # Decode is bandwidth-bound: each decode iteration streams every weight
    # byte except the embedding gather (the LM head matmul reads its full
    # table; a tied table is read as the LM head), plus the KV cache of every
    # active sequence. Prefill re-reads the weights per step and gathers the
    # cached-prefix KV. KV writes are one token each.
    mc = engine.model_cfg
    param_bytes = sum(
        x.nbytes for x in jax.tree.leaves(engine.params)
    )
    embed_bytes = engine.params["embed"].nbytes
    weight_stream = param_bytes - (0 if mc.tie_word_embeddings else embed_bytes)
    kv_tok = mc.num_hidden_layers * mc.num_key_value_heads * 2 * mc.head_dim
    kv_tok_bytes = kv_tok * (1 if args.kv_dtype == "int8" else 2)
    if args.kv_dtype == "int8":  # per-token f32 scales, one per (head, k/v)
        kv_tok_bytes += mc.num_hidden_layers * mc.num_key_value_heads * 2 * 4
    decode_bytes = (
        m["decode_iters"] * weight_stream
        + m["decode_kv_token_reads"] * kv_tok_bytes
        + m["decode_tokens"] * kv_tok_bytes  # writes
    )
    prefill_bytes = (
        m["prefill_steps"] * weight_stream
        + m["cached_tokens"] * kv_tok_bytes  # prefix gather
        + m["prefill_tokens"] * kv_tok_bytes  # writes
    )
    hbm_gbps = (decode_bytes + prefill_bytes) / elapsed / 1e9
    peak = {
        # chip HBM bandwidth by jax device_kind, GB/s
        "TPU v4": 1228.0, "TPU v5 lite": 819.0, "TPU v5": 2765.0,
        "TPU v5p": 2765.0, "TPU v6 lite": 1638.0, "TPU v6e": 1638.0,
    }.get(jax.devices()[0].device_kind)
    # Speed-of-light decode throughput implied by the measured byte mix:
    # peak_bw / (decode bytes per generated token).
    sol_tok_s = (
        peak * 1e9 / (decode_bytes / max(1, m["decode_tokens"]))
        if peak and m["decode_tokens"] else None
    )
    dbs = m["decode_batch_sizes"]
    print(
        json.dumps(
            {
                "total_output_tokens": total_out,
                "elapsed_s": round(elapsed, 2),
                "ttft_p50_s": pct(0.50),
                "ttft_p95_s": pct(0.95),
                "ttft_p99_s": pct(0.99),
                "prefill_steps": m["prefill_steps"],
                "decode_steps": m["decode_steps"],
                "decode_iters": m["decode_iters"],
                "prefill_tokens": m["prefill_tokens"],
                "cached_tokens": m["cached_tokens"],
                "retractions": m["retractions"],
                "decode_tokens_per_step": round(
                    m["decode_tokens"] / max(1, m["decode_steps"]), 1
                ),
                "decode_batch_fill": round(
                    sum(dbs) / max(1, len(dbs)) / max_requests, 3
                ) if dbs else None,
                "prefill_wait_s": round(m["prefill_wait_s"], 2),
                "decode_wait_s": round(m["decode_wait_s"], 2),
                "weight_stream_gb": round(weight_stream / 1e9, 3),
                "kv_bytes_per_token": kv_tok_bytes,
                "model_hbm_gb_moved": round(
                    (decode_bytes + prefill_bytes) / 1e9, 1
                ),
                "achieved_hbm_gbps": round(hbm_gbps, 1),
                "peak_hbm_gbps": peak,
                "pct_of_hbm_peak": round(100 * hbm_gbps / peak, 1) if peak else None,
                "decode_sol_tokens_per_s": round(sol_tok_s, 1) if sol_tok_s else None,
            }
        ),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"e2e throughput {args.model} "
                f"w{args.weight_dtype}/kv{args.kv_dtype}",
                "value": round(tput, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": 1.0,
                "achieved_hbm_gbps": round(hbm_gbps, 1),
                "pct_of_hbm_peak": round(100 * hbm_gbps / peak, 1) if peak else None,
            }
        )
    )


if __name__ == "__main__":
    main()
