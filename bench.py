"""Throughput benchmark — the reference protocol (/root/reference/bench.py:
12-59: 256 random-token sequences, input len U(100,1024), 1024 output tokens,
temperature 0.6, eos disabled, one warmup run, timed overlap-schedule
run_batch, throughput = generated tokens / wall time), extended with TTFT
percentiles, per-phase breakdown, and a measurement-integrity guard.

Measurement protocol (VERDICT r3 #1 — the round-3 driver run measured 3.2x
slower decode than the committed claim because first-dispatch stalls landed
inside the timed region on a cold compilation cache):

1. warmup() AOT-compiles every program the workload can hit IN PARALLEL and
   then executes each once on padding rows, so the timed region contains no
   compile, no re-trace, and no cache-deserialize.
2. The timed run happens `--passes` times (default 2) with an engine reset
   between; every pass is reported.
3. A jax.monitoring listener counts backend-compile events; any compile that
   lands inside a timed pass is reported per pass (`compiles`,
   `compile_s`), and the biggest single host-blocked step per pass is
   reported (`max_step_wait_s`) so a stall is visible AND localizable.
4. The headline (final JSON line) is the LAST pass — by then the programs
   have demonstrably executed at least once, so the number reproduces on any
   fresh host that runs this same command.

Prints exactly one JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
(vs_baseline is 1.0: the reference publishes no numbers, BASELINE.md.)

Modes:
    --mode flagship  (default) the reference workload above
    --mode prefix    radix-cache measurement (VERDICT r3 #3): N groups of
                     requests sharing a long system prompt, then a
                     multi-turn replay wave reusing generated KV; reports
                     cached_tokens and per-wave TTFT/throughput. Compare
                     against --no-radix for the reuse win.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    # Defaults are the BASELINE.md north-star config (Qwen2.5-7B INT8
    # weights + INT8 KV, reference workload protocol): a bare
    # `python bench.py` measures and prints the flagship number.
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="flagship",
                        choices=["flagship", "prefix", "spec", "latency"])
    parser.add_argument("--latency-batches", default="1,4,8",
                        help="latency mode: comma list of batch sizes")
    parser.add_argument("--latency-prompts", default="512,2048",
                        help="latency mode: comma list of prompt lengths")
    parser.add_argument("--speculative-tokens", type=int, default=None,
                        help="prompt-lookup draft tokens per verify step "
                        "(default: 4 in spec mode, 0 otherwise)")
    parser.add_argument("--spec-workload", default="random",
                        choices=["random", "echo"],
                        help="spec mode prompt structure: echo = periodic "
                        "32-token spans (copy-style workload; pair with "
                        "--model tests/assets/tiny_echo, the committed "
                        "checkpoint TRAINED to continue the period, where "
                        "prompt-lookup drafts are accepted at high rate)")
    parser.add_argument("--model", default="qwen2.5-7b")
    parser.add_argument("--num-seqs", type=int, default=256)
    parser.add_argument("--min-input", type=int, default=100)
    parser.add_argument("--max-input", type=int, default=1024)
    parser.add_argument("--max-new-tokens", type=int, default=None,
                        help="default: 1024 (flagship), 128 (prefix)")
    parser.add_argument("--temperature", type=float, default=0.6)
    parser.add_argument("--weight-dtype", default="int8",
                        choices=["bf16", "int8", "int4"])
    parser.add_argument("--kv-dtype", default="int8", choices=["bf16", "int8"])
    # int8 LM head: halves the head's ~1.1 GB/iter bf16 read at 7B; gated
    # by tpusgl.eval.ppl_gate (int8+lm8 line in PPL_GATE.json).
    parser.add_argument("--lm-head-dtype", default="int8",
                        choices=["bf16", "int8"])
    parser.add_argument("--no-overlap", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-requests", type=int, default=90,
                        help="concurrent request slots (90 x 2176-token rows "
                        "fits the 7B INT8 weights + INT8 KV pool in one "
                        "16 GB chip; 96 x 2176 OOMs by ~145 MB)")
    parser.add_argument("--decode-window", type=int, default=8)
    parser.add_argument("--prefill-budget", type=int, default=4096,
                        help="max tokens per batched prefill step (lower for "
                        "big models to bound activation memory)")
    parser.add_argument("--passes", type=int, default=2,
                        help="timed measurement passes; headline = last")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the timed run "
                        "into DIR (SURVEY.md §5 observability)")
    parser.add_argument("--device", default=None, choices=["tpu", "cpu"],
                        help="force a jax backend (reference run.py:24)")
    # prefix mode
    parser.add_argument("--prefix-groups", type=int, default=8)
    parser.add_argument("--shared-prefix-len", type=int, default=512)
    parser.add_argument("--no-radix", action="store_true",
                        help="disable radix prefix matching (reuse baseline)")
    parser.add_argument("--no-replay", action="store_true",
                        help="prefix mode: skip the multi-turn replay wave")
    parser.add_argument("--host-cache-mb", type=int, default=0,
                        help="host-RAM KV offload tier capacity (0 = off); "
                        "pair with a small --max-requests pool so evictions "
                        "spill (runtime/host_cache.py)")
    return parser


def main() -> None:
    args = build_parser().parse_args()
    if args.max_new_tokens is None:
        args.max_new_tokens = {"prefix": 128, "latency": 256}.get(
            args.mode, 1024)
    if args.speculative_tokens is None:
        args.speculative_tokens = 4 if args.mode == "spec" else 0
    lat_batches = [int(x) for x in args.latency_batches.split(",")]
    lat_lens = [int(x) for x in args.latency_prompts.split(",")]
    if args.mode == "latency" and args.max_requests == 90:
        # small-batch latency protocol (VERDICT r4 #7): the request pool
        # only needs the largest measured batch; a 90-slot pool would just
        # stretch context rows and warmup for nothing
        args.max_requests = max(lat_batches)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.device == "cpu":
        # The TPU tunnel plugin forces its own jax_platforms; the config
        # update (not the env var) is what actually selects the backend.
        jax.config.update("jax_platforms", "cpu")

    # ---- measurement-integrity listener: timestamped backend-compile events.
    compile_log = []  # (t, event, duration_s)

    def _on_event(event: str, duration: float, **kw) -> None:
        # Real XLA compiles only — jaxpr re-traces of cached programs are
        # microseconds and fire on every first dispatch per python callable.
        if "backend_compile" in event:
            compile_log.append((time.perf_counter(), event, duration))

    jax.monitoring.register_event_duration_secs_listener(_on_event)

    import numpy as np

    from tpusgl.config import EngineConfig, QuantConfig
    from tpusgl.runtime.engine import Engine
    from tpusgl.runtime.sampling_params import SamplingParams
    from tpusgl.utils.bucketing import pick_bucket, round_up

    # Context must hold prompt + all new tokens, PLUS one decode window of
    # slack: without it, requests nearing a context-row boundary truncate the
    # whole batch's decode window (avg window 5.5/8 on the round-3 run —
    # more dispatches and more programs for no benefit).
    if args.prefill_budget < 128:
        parser_error = "--prefill-budget must be >= 128 (smallest bucket)"
        raise SystemExit(parser_error)
    if args.max_requests < 1:
        raise SystemExit("--max-requests must be >= 1")
    max_requests = args.max_requests
    # Per-token-scale INT8 KV needs 128-token pages on the compiled kernel
    # (Mosaic lane-slice tiling, ops/paged_attention.py). 1024-token DMA
    # blocks (pages_per_block x page_size) amortize per-block kernel
    # overhead: measured 190 us -> 160 us per decode-attention call at the
    # 7B bench geometry vs 512-token blocks (the kernel is DMA-issue bound,
    # not bandwidth bound, at short-to-mid context).
    page_size, ppb = (128, 8) if args.kv_dtype == "int8" else (32, 16)
    if args.mode == "prefix":
        # longest prompt = shared prefix + suffix, and the replay wave
        # extends it by the generated output + a 32-token user turn
        max_prompt = (args.shared_prefix_len + min(256, args.max_input)
                      + args.max_new_tokens + 32)
    elif args.mode == "latency":
        max_prompt = max(lat_lens)
    else:
        max_prompt = args.max_input
    ctx = round_up(
        max_prompt + args.max_new_tokens + args.decode_window, page_size
    )
    ecfg = EngineConfig.from_env(
        quant=QuantConfig(weight_dtype=args.weight_dtype, kv_dtype=args.kv_dtype,
                          lm_head_dtype=args.lm_head_dtype),
        enable_overlap=not args.no_overlap,
        kv_len_bucket=512,
        max_requests=max_requests,
        max_total_tokens=max_requests * ctx,
        page_size=page_size,
        pages_per_block=ppb,
        # Decode batch bucket = the pool size. (A 96-padded bucket that
        # keeps seqs_per_block=16 for the merge-group kernel was measured
        # at -1% throughput with merging off — padding rows and the f32
        # logits aren't free — so the round-up only applies if the merged
        # kernel is ever enabled.)
        decode_bs_buckets=(max_requests,),
        prefill_token_budget=args.prefill_budget,
        prefill_len_buckets=tuple(
            b for b in (128, 256, 512, 1024, 2048, 4096)
            if b <= args.prefill_budget
        ),
        decode_window=args.decode_window,
        radix_enabled=not args.no_radix,
        # Pool is sized for full residency (max_total_tokens above), so
        # whole-row preallocation costs nothing and makes every decode KV
        # block one contiguous DMA (paged_attention.block_contig).
        prealloc_decode_pages=True,
        speculative_tokens=args.speculative_tokens,
        host_cache_bytes=args.host_cache_mb << 20,
    )
    print(f"building engine: {args.model} on {jax.devices()[0].platform} "
          f"(weights {args.weight_dtype}, kv {args.kv_dtype})", file=sys.stderr)
    engine = Engine(args.model, engine_cfg=ecfg, seed=args.seed)

    vocab = engine.model_cfg.vocab_size
    rng = np.random.default_rng(args.seed)
    if args.mode == "prefix":
        sys_prompts = [
            rng.integers(0, vocab, args.shared_prefix_len).tolist()
            for _ in range(args.prefix_groups)
        ]
        hi = min(256, args.max_input)
        prompts = [
            sys_prompts[i % args.prefix_groups]
            + rng.integers(0, vocab, rng.integers(
                min(16, hi), hi + 1)).tolist()
            for i in range(args.num_seqs)
        ]
    elif args.mode == "latency":
        # one prompt per measured length (warmup derives its bucket set
        # from these) padded out to the largest batch at the longest length
        prompts = [
            rng.integers(0, vocab, n).tolist()
            for n in sorted(lat_lens)
            for _ in range(max(lat_batches))
        ]
    elif args.mode == "spec" and args.spec_workload == "echo":
        # periodic prompts: each is a random 32-token span tiled to its
        # length; the tiny_echo model continues the period, so every
        # n-gram draft from the request's own history matches
        prompts = []
        for _ in range(args.num_seqs):
            n = int(rng.integers(args.min_input, args.max_input + 1))
            span = rng.integers(0, vocab, 32)
            prompts.append(np.tile(span, n // 32 + 1)[:n].tolist())
    else:
        prompts = [
            rng.integers(0, vocab, rng.integers(args.min_input, args.max_input + 1))
            .tolist()
            for _ in range(args.num_seqs)
        ]
    # spec mode: GREEDY decoding (prompt-lookup speculation is exact for
    # greedy only; a greedy model's natural repetition loops are what the
    # n-gram drafts hit).
    sp = SamplingParams(
        max_new_tokens=args.max_new_tokens, temperature=args.temperature,
        do_sample=args.mode != "spec", eos_id=-1,
    )

    # ---- Warmup: AOT-compile + pre-dispatch exactly the program set this
    # workload can reach (bench.py docstring stage 1; VERDICT r3 #4).
    max_ext = max(len(p) for p in prompts)
    chunked_prompts = max_ext > ecfg.prefill_chunk
    if args.mode == "prefix":
        # radix hits shrink extensions to anywhere in [1, prompt_len];
        # longer-than-largest-bucket extensions run chunked, so cap there
        need = max_ext + 32 + args.max_new_tokens
        top = pick_bucket(min(need, ecfg.prefill_len_buckets[-1]),
                          ecfg.prefill_len_buckets)
        buckets = [b for b in ecfg.prefill_len_buckets if b <= top]
    else:
        # cap at the chunk size: longer prompts run as chunked [1, chunk]
        # series (no hard length cap — the scheduler chunks them)
        buckets = sorted({
            pick_bucket(min(n, ecfg.prefill_chunk), ecfg.prefill_len_buckets)
            for n in range(min(len(p) for p in prompts), max_ext + 1)
        })
    # Chunked continuations run the has_prefix prefill variant; warm the
    # prefix-length buckets their growing computed prefix will hit.
    prefix_buckets = None
    want_prefix = args.mode == "prefix" or chunked_prompts
    if want_prefix:
        max_prefix = min(ecfg.max_context_len,
                         max_ext + 32 + args.max_new_tokens)
        prefix_buckets, b = [], ecfg.kv_len_bucket
        while b < max_prefix:
            prefix_buckets.append(b)
            b <<= 1
        prefix_buckets.append(min(b, ecfg.max_context_len))
    print(f"warmup (prefill buckets {buckets})...", file=sys.stderr)
    t0 = time.perf_counter()
    engine.warmup(
        simple=True,  # greedy (spec mode) and plain sampling both qualify
        prefill_buckets=buckets,
        # Prefix programs are reachable via radix hits (prefix mode) and via
        # chunked-prefill continuations (prompts longer than the chunk);
        # page-copy programs only via sub-page radix reuse. The flagship
        # workload (random tokens, chunk-sized prompts) hits neither.
        prefix=want_prefix,
        prefix_buckets=prefix_buckets,
        copy=(args.mode == "prefix"),
    )
    # Mini real run: absorbs the one-time first-real-execution stall the
    # environment exhibits even with every program compiled AND pre-executed
    # (observed 44-196 s once per process, zero XLA compiles — program-load /
    # tunnel warm-in, not compilation). The reference warms up the same way
    # (bench.py:46-47).
    mini = SamplingParams(
        max_new_tokens=32, temperature=args.temperature,
        do_sample=sp.do_sample, eos_id=-1,
    )
    engine.scheduler.run_batch(prompts[:8], mini, overlap=not args.no_overlap)
    engine.reset()
    warmup_s = time.perf_counter() - t0
    print(f"warmup done in {warmup_s:.1f}s", file=sys.stderr)

    # ---- HBM roofline constants (SURVEY.md §6): model-derived bytes.
    mc = engine.model_cfg
    param_bytes = sum(x.nbytes for x in jax.tree.leaves(engine.params))
    embed_bytes = engine.params["embed"].nbytes
    weight_stream = param_bytes - (0 if mc.tie_word_embeddings else embed_bytes)
    kv_tok = mc.num_hidden_layers * mc.num_key_value_heads * 2 * mc.head_dim
    kv_tok_bytes = kv_tok * (1 if args.kv_dtype == "int8" else 2)
    if args.kv_dtype == "int8":  # per-token f32 scales, one per (head, k/v)
        kv_tok_bytes += mc.num_hidden_layers * mc.num_key_value_heads * 2 * 4
    peak = {
        # chip HBM bandwidth by jax device_kind, GB/s
        "TPU v4": 1228.0, "TPU v5 lite": 819.0, "TPU v5": 2765.0,
        "TPU v5p": 2765.0, "TPU v6 lite": 1638.0, "TPU v6e": 1638.0,
    }.get(jax.devices()[0].device_kind)

    def run_pass(pass_prompts, profile_dir=None):
        """One timed run; returns the per-pass report dict."""
        n_compiles_before = len(compile_log)
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        t0 = time.perf_counter()
        outs = engine.scheduler.run_batch(
            pass_prompts, sp, overlap=not args.no_overlap
        )
        elapsed = time.perf_counter() - t0
        if profile_dir:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {profile_dir}", file=sys.stderr)

        total_out = sum(len(o) for o in outs)
        m = engine.metrics
        ttft = sorted(m["ttft_s"])
        pct = lambda p: round(
            ttft[min(len(ttft) - 1, int(p * len(ttft)))], 3
        ) if ttft else None
        in_pass = compile_log[n_compiles_before:]
        waits = m["step_waits"]

        # Decode is bandwidth-bound: each decode iteration streams every
        # weight byte except the embedding gather (the LM head matmul reads
        # its full table; a tied table is read as the LM head), plus the KV
        # cache of every active sequence. Prefill re-reads the weights per
        # step and gathers the cached-prefix KV. KV writes are one token each.
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
        sol_tok_s = (
            peak * 1e9 / (decode_bytes / max(1, m["decode_tokens"]))
            if peak and m["decode_tokens"] else None
        )
        dbs = m["decode_batch_sizes"]
        spec = {}
        if m.get("spec_steps"):
            proposed = m.get("spec_proposed", 0)
            accepted = m.get("spec_accepted", 0)
            spec = {
                "spec_steps": m["spec_steps"],
                "spec_disables": m.get("spec_disables", 0),
                "spec_proposed": proposed,
                "spec_accepted": accepted,
                "spec_acceptance": round(accepted / max(1, proposed), 3),
                # tokens committed per verify step (1.0 = plain decode)
                "spec_tokens_per_step": round(
                    m["decode_tokens"] / max(1, m["decode_steps"]), 2
                ),
            }
        return {
            "outs": outs,
            "report": {
                **spec,
                "total_output_tokens": total_out,
                "elapsed_s": round(elapsed, 2),
                "tokens_per_s": round(total_out / elapsed, 1),
                "compiles": len(in_pass),
                "compile_s": round(sum(d for _, _, d in in_pass), 2),
                "max_step_wait_s": round(
                    max((w for _, w in waits), default=0.0), 3
                ),
                "ttft_p50_s": pct(0.50),
                "ttft_p95_s": pct(0.95),
                "ttft_p99_s": pct(0.99),
                "prefill_steps": m["prefill_steps"],
                "decode_steps": m["decode_steps"],
                "decode_iters": m["decode_iters"],
                "prefill_tokens": m["prefill_tokens"],
                "cached_tokens": m["cached_tokens"],
                "tail_cached_tokens": m["tail_cached_tokens"],
                "host_spilled_pages": m.get("host_spilled_pages", 0),
                "host_injected_tokens": m.get("host_injected_tokens", 0),
                "retractions": m["retractions"],
                "decode_tokens_per_step": round(
                    m["decode_tokens"] / max(1, m["decode_steps"]), 1
                ),
                "decode_batch_fill": round(
                    sum(dbs) / max(1, len(dbs)) / max_requests, 3
                ) if dbs else None,
                "prefill_wait_s": round(m["prefill_wait_s"], 2),
                "decode_wait_s": round(m["decode_wait_s"], 2),
                "achieved_hbm_gbps": round(hbm_gbps, 1),
                "pct_of_hbm_peak": round(100 * hbm_gbps / peak, 1)
                if peak else None,
                "decode_sol_tokens_per_s": round(sol_tok_s, 1)
                if sol_tok_s else None,
            },
        }

    if args.mode == "latency":
        # Small-batch latency protocol (VERDICT r4 #7; the reference's
        # second metric is run.py's single-prompt latency print,
        # /root/reference/run.py:63-68): per (prompt_len, batch), measured
        # TTFT p50 and steady-state per-token decode latency, --passes
        # passes each (headline = last pass, same integrity rules as the
        # throughput protocol).
        lat_rows = []
        for L in lat_lens:
            for B in lat_batches:
                pp = [rng.integers(0, vocab, L).tolist() for _ in range(B)]
                row = None
                for p in range(args.passes):
                    engine.reset()
                    n0 = len(compile_log)
                    t0 = time.perf_counter()
                    outs = engine.scheduler.run_batch(
                        pp, sp, overlap=not args.no_overlap
                    )
                    elapsed = time.perf_counter() - t0
                    m = engine.metrics
                    ttft = sorted(m["ttft_s"])
                    p50 = ttft[len(ttft) // 2] if ttft else 0.0
                    toks = sum(len(o) for o in outs)
                    dec_ms = ((elapsed - p50)
                              / max(1, args.max_new_tokens - 1) * 1e3)
                    row = {
                        "prompt_len": L, "batch": B,
                        "ttft_p50_s": round(p50, 4),
                        "decode_ms_per_token": round(dec_ms, 3),
                        "tokens_per_s": round(toks / elapsed, 1),
                        "elapsed_s": round(elapsed, 3),
                        "compiles": len(compile_log) - n0,
                        "pass": p + 1,
                    }
                    print(json.dumps(row), file=sys.stderr)
                lat_rows.append(row)
        b1 = min(lat_rows, key=lambda r: (r["batch"], r["prompt_len"]))
        print(json.dumps({
            "metric": f"decode latency {args.model} "
            f"w{args.weight_dtype}/kv{args.kv_dtype} "
            f"[latency b{b1['batch']} p{b1['prompt_len']}]",
            "value": b1["decode_ms_per_token"],
            "unit": "ms/token",
            "vs_baseline": 1.0,
            "warmup_s": round(warmup_s, 1),
            "rows": lat_rows,
        }))
        return

    reports = []
    last_outs = None
    for p in range(args.passes):
        engine.reset()
        profile = args.profile if p == args.passes - 1 else None
        r = run_pass(prompts, profile_dir=profile)
        r["report"]["pass"] = p + 1
        reports.append(r["report"])
        last_outs = r["outs"]
        print(json.dumps(r["report"]), file=sys.stderr)

    replay_report = None
    if args.mode == "prefix" and not args.no_replay:
        # Multi-turn replay: wave-2 prompts extend wave-1 conversations
        # (prompt + generated output + a fresh user turn) — radix reuse of
        # GENERATED KV, not just shared system prompts. No reset: the tree
        # still holds the final timed pass's pages and ITS outputs seed the
        # wave (no extra regeneration run).
        wave2 = [
            p + o + rng.integers(0, vocab, 32).tolist()
            for p, o in zip(prompts, last_outs)
        ]
        engine.scheduler.clear_metrics()
        r2 = run_pass(wave2)
        replay_report = r2["report"]
        replay_report["pass"] = "replay"
        print(json.dumps(replay_report), file=sys.stderr)

    final = reports[-1]
    headline = {
        "metric": f"e2e throughput {args.model} "
        f"w{args.weight_dtype}/kv{args.kv_dtype}"
        + ("" if args.mode == "flagship" else f" [{args.mode}]"),
        "value": final["tokens_per_s"],
        "unit": "tokens/s/chip",
        "vs_baseline": 1.0,
        "achieved_hbm_gbps": final["achieved_hbm_gbps"],
        "pct_of_hbm_peak": final["pct_of_hbm_peak"],
        "warmup_s": round(warmup_s, 1),
        "passes": [r["tokens_per_s"] for r in reports],
        "timed_compiles": final["compiles"],
    }
    if replay_report is not None:
        headline["replay_tokens_per_s"] = replay_report["tokens_per_s"]
        headline["replay_cached_tokens"] = replay_report["cached_tokens"]
        headline["replay_ttft_p50_s"] = replay_report["ttft_p50_s"]
    if final.get("spec_steps"):
        headline["spec_acceptance"] = final["spec_acceptance"]
        headline["spec_tokens_per_step"] = final["spec_tokens_per_step"]
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
