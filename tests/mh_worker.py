"""Worker process for the multi-process multi-host serving tests
(tests/test_multihost.py).

Each process brings up jax.distributed over a local coordinator with a
configurable number of virtual CPU devices, builds the SAME sharded engine,
and runs the scheduler loop. Only process 0 holds the real request list —
run_batch broadcasts it (parallel/multihost.broadcast_from_host0), so all
processes enqueue identical SPMD programs; schedule digests are
all-gather-cross-checked every step (Scheduler.check_sched is automatically
on multi-process).

Scenarios (VERDICT r4 #6 — determinism where it can actually break):
  basic     4 short prompts, plain decode (the round-3 test)
  pressure  a pool sized to force decode RETRACTION and radix eviction on
            every process mid-run; determinism must survive the retract/
            re-admit cycle (outputs still token-identical everywhere)
  diverge   process 1 deliberately sees a different queue (broadcast
            disabled); every process must exit with a clean scheduler-
            divergence RuntimeError — no hang (allgather digest check)

Usage: python mh_worker.py <pid> <nprocs> <port> <out> <scenario> <ndev> <dp> <tp>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    process_id, num_processes, port = map(int, sys.argv[1:4])
    out_path = sys.argv[4]
    scenario = sys.argv[5] if len(sys.argv) > 5 else "basic"
    ndev = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    dp = int(sys.argv[7]) if len(sys.argv) > 7 else 4
    tp = int(sys.argv[8]) if len(sys.argv) > 8 else 2

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert jax.device_count() == ndev * num_processes

    import jax.numpy as jnp
    import numpy as np

    from tpusgl.config import EngineConfig, ModelConfig
    from tpusgl.models import qwen2
    from tpusgl.ops.attention import ref_attention
    from tpusgl.runtime.engine import Engine
    from tpusgl.runtime.sampling_params import SamplingParams

    cfg = ModelConfig(
        hidden_size=128, num_attention_heads=8, num_key_value_heads=8,
        intermediate_size=256, num_hidden_layers=2, vocab_size=256,
        tie_word_embeddings=False, max_position_embeddings=512,
        rope_theta=10000.0,
    )
    if scenario == "pressure":
        # 18 pages of 16 tokens for 6 requests each needing ~3 pages:
        # admission overcommits (est ratio 0.5), decode exhausts the pool,
        # and retraction + radix eviction fire on every process mid-run.
        ecfg = EngineConfig(
            max_total_tokens=128, max_requests=4, dp=dp, tp=tp,
            page_size=16, tail_min_tokens=4,
            decode_bs_buckets=(1, 2, 4), prefill_len_buckets=(8, 16, 32),
            kv_len_bucket=32,
        )
    else:
        ecfg = EngineConfig(
            max_total_tokens=512, max_requests=8, dp=dp, tp=tp,
            decode_bs_buckets=(1, 2, 4, 8), prefill_len_buckets=(8, 16, 32, 64),
            kv_len_bucket=64,
            check_multihost_schedule=True,
        )
    # Identical on every process (same seed, host-side numpy).
    params = jax.tree.map(
        np.asarray, qwen2.init_params(cfg, jax.random.PRNGKey(11), jnp.float32)
    )
    eng = Engine(
        model_cfg=cfg, engine_cfg=ecfg, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=cfg.vocab_size,
    )

    rng = np.random.default_rng(5)

    if scenario == "diverge":
        # Disable the request broadcast so each process enqueues ITS OWN
        # queue — process 1's differs, so the first schedule digest must
        # mismatch and EVERY process must raise cleanly (no hang).
        eng.scheduler._multihost = False
        assert eng.scheduler.check_sched
        prompts = [[7, 8, 9, 10]] if process_id != 1 else [[1, 2, 3]]
        sp = SamplingParams(max_new_tokens=4, do_sample=False, eos_id=-1)
        try:
            eng.scheduler.run_batch(prompts, sp)
        except RuntimeError as e:
            assert "divergence" in str(e), e
            with open(out_path, "w") as f:
                json.dump({"diverged": True, "process": process_id}, f)
            print(f"process {process_id} saw clean divergence error", flush=True)
            return
        raise SystemExit("divergence was not detected")

    if scenario == "pressure":
        # shared 12-token prefix seeds the radix tree; long outputs force
        # page exhaustion -> retraction; re-admission hits the tree
        shared = list(map(int, rng.integers(0, cfg.vocab_size, 12)))
        prompts = [
            shared + list(map(int, rng.integers(0, cfg.vocab_size, 4 + i)))
            for i in range(4)
        ]
        sp = SamplingParams(max_new_tokens=12, do_sample=False, eos_id=-1)
    else:
        prompts = [list(map(int, rng.integers(0, cfg.vocab_size, n)))
                   for n in (6, 13, 4, 9)]
        sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)

    # Only process 0 "receives" the requests; run_batch broadcasts them.
    if scenario == "pressure":
        # Force a deterministic retraction mid-run on EVERY process (same
        # step, same victim): organic retraction is structurally
        # unreachable here — the pool is exactly max_requests *
        # max_context_len and admission is page-aware (round 4), so the
        # active set always fits — but the retract/re-admit path (page
        # frees, radix unlock, epoch bump, prefix re-match on re-admission)
        # must still be cross-process deterministic if it ever runs.
        order = eng.scheduler.enqueue_requests(
            prompts if process_id == 0 else [], sp
        )
        step = 0
        forced = 0
        for _ in eng.scheduler.step_events(overlap=False):
            step += 1
            if step == 3 and eng.scheduler.decoding and forced == 0:
                victim = eng.scheduler.decoding.pop()
                eng.scheduler._retract(victim)
                forced += 1
        outs = [r.output_ids for r in order]
        m = eng.scheduler.metrics
        result = {"outs": outs, "retractions": m["retractions"],
                  "forced": forced, "decode_steps": m["decode_steps"],
                  "cached_tokens": m["cached_tokens"]}
    else:
        outs = eng.scheduler.run_batch(prompts if process_id == 0 else [], sp)
        result = {"outs": outs}
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"process {process_id} ok", flush=True)


if __name__ == "__main__":
    main()
