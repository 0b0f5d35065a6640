"""Worker process for the 2-process multi-host serving test
(tests/test_multihost.py::test_two_process_serving_token_identical).

Each process brings up jax.distributed over a local coordinator, gets 4
virtual CPU devices (8 global), builds the SAME sharded engine, and runs the
scheduler loop. Only process 0 holds the real request list — run_batch
broadcasts it (parallel/multihost.broadcast_from_host0), so both processes
enqueue identical SPMD programs; schedule digests are cross-checked every
step (Scheduler.check_sched is automatically on multi-process).

Usage: python mh_worker.py <process_id> <num_processes> <port> <out_path>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    process_id, num_processes, port = map(int, sys.argv[1:4])
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert jax.device_count() == 4 * num_processes

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
    ecfg = EngineConfig(
        max_total_tokens=512, max_requests=8, dp=4, tp=2,
        decode_bs_buckets=(1, 2, 4, 8), prefill_len_buckets=(8, 16, 32, 64),
        kv_len_bucket=64,
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
    prompts = [list(map(int, rng.integers(0, cfg.vocab_size, n)))
               for n in (6, 13, 4, 9)]
    sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)

    # Only process 0 "receives" the requests; run_batch broadcasts them.
    outs = eng.scheduler.run_batch(prompts if process_id == 0 else [], sp)
    with open(out_path, "w") as f:
        json.dump(outs, f)
    print(f"process {process_id} ok", flush=True)


if __name__ == "__main__":
    main()
