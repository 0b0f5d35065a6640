"""PPL acceptance-gate runner (BASELINE.md: PPL delta vs bf16 <= 0.1 at
INT8, <= 0.3 at INT4; SURVEY.md §4.4).

Usage:
    python -m tpusgl.eval.ppl_gate --model qwen2.5-0.5b \
        [--corpus /path/to/wikitext2.txt --tokenizer /path/to/hf_dir] \
        [--windows 16] [--window 512] [--device cpu|tpu] [--out PPL_GATE.json]

WikiText-2 cannot be downloaded in this zero-egress environment; without
--corpus the harness evaluates MODEL-GENERATED text (sampled from the bf16
model itself, which has model-typical token statistics — quantization damage
measured on it is representative, see eval/ppl.py). The moment a local
WikiText-2 file exists, --corpus/--tokenizer runs the real gate unchanged.

Quantized evaluation reuses the SAME bf16 random weights quantized in place
(loader/safetensors_loader.quantize_params), so the deltas isolate
quantization error exactly.
"""

from __future__ import annotations

import argparse
import json
import sys


GATES = {"int8": 0.1, "int4": 0.3}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-0.5b")
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--corpus", default=None,
                    help="local text file (e.g. WikiText-2 test split)")
    ap.add_argument("--tokenizer", default=None,
                    help="HF dir with tokenizer.json (required with --corpus)")
    ap.add_argument("--device", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tpusgl.config import QuantConfig, resolve_model_config
    from tpusgl.eval.ppl import compute_ppl, load_corpus, synthetic_corpus
    from tpusgl.loader.safetensors_loader import quantize_params
    from tpusgl.models import get_model

    cfg = resolve_model_config(args.model)
    model = get_model(cfg.architecture)
    params = model.init_params(cfg, jax.random.PRNGKey(args.seed), jnp.bfloat16)

    if args.corpus:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer)
        windows = load_corpus(args.corpus, tok, window=args.window,
                              limit=args.windows)
        corpus_kind = f"file:{args.corpus}"
    else:
        from tpusgl.config import EngineConfig
        from tpusgl.runtime.engine import Engine

        eng = Engine(
            args.model, params=params, model_cfg=cfg,
            engine_cfg=EngineConfig.from_env(
                max_requests=args.windows,
                max_total_tokens=args.windows
                * (1 << (args.window - 1).bit_length()),
                decode_bs_buckets=(args.windows,),
                prefill_len_buckets=(16,),
            ),
            seed=args.seed,
        )
        windows = synthetic_corpus(
            eng, num_windows=args.windows, window=args.window, seed=args.seed
        )
        del eng
        corpus_kind = "synthetic (bf16-model-generated)"
    print(f"corpus: {corpus_kind}, {windows.shape[0]} x {windows.shape[1]} "
          "tokens", file=sys.stderr)

    results = {"model": args.model, "corpus": corpus_kind,
               "windows": int(windows.shape[0]), "window": int(windows.shape[1])}
    ppl_bf16 = compute_ppl(params, cfg, windows, batch_size=args.batch_size)
    results["ppl_bf16"] = round(ppl_bf16, 4)
    print(f"bf16   ppl = {ppl_bf16:.4f}", file=sys.stderr)

    all_pass = True
    for wd, gate in GATES.items():
        qp = quantize_params(params, QuantConfig(weight_dtype=wd))
        ppl_q = compute_ppl(qp, cfg, windows, batch_size=args.batch_size)
        delta = ppl_q - ppl_bf16
        ok = abs(delta) <= gate
        all_pass &= ok
        results[f"ppl_{wd}"] = round(ppl_q, 4)
        results[f"delta_{wd}"] = round(delta, 4)
        results[f"gate_{wd}"] = gate
        results[f"pass_{wd}"] = bool(ok)
        print(f"{wd:5s}  ppl = {ppl_q:.4f}  delta = {delta:+.4f} "
              f"(gate {gate})  {'PASS' if ok else 'FAIL'}", file=sys.stderr)
        del qp

    results["all_pass"] = bool(all_pass)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
