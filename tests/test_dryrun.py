"""Regression test for the driver's multichip dryrun path.

Round-2 regression: __graft_entry__.dryrun_multichip built the engine state
WITHOUT the mesh, so the int8-KV scale pool got the tp=1 geometry and the
Pallas decode kernel's local-shard assert fired at tp=4 — while all engine
tests passed, because Engine always passed the mesh. This test calls the
EXACT driver entry (same module, same function) on the 8-virtual-device CPU
topology, so any divergence between the dryrun path and the engine path
fails in CI before the driver sees it.
"""

import sys

import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_dryrun_multichip_exact_driver_path():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__
    finally:
        sys.path.pop(0)
    # conftest already forces JAX_PLATFORMS=cpu with 8 virtual devices, so
    # the dryrun's own env setup is a no-op and it runs in-process.
    __graft_entry__.dryrun_multichip(8)


def test_scale_geometry_check_catches_tp1_state():
    """init_state(tp=1 cfg) sharded over tp>1 is exactly the round-2 bug;
    check_scale_geometry must reject it."""
    import jax.numpy as jnp

    from tpusgl.config import EngineConfig, ModelConfig, QuantConfig
    from tpusgl.runtime.state import check_scale_geometry, init_state

    cfg = ModelConfig(
        hidden_size=64, num_attention_heads=8, num_key_value_heads=8,
        intermediate_size=128, num_hidden_layers=1, vocab_size=64,
        max_position_embeddings=64, rope_theta=10000.0,
    )
    e1 = EngineConfig(
        max_total_tokens=64, max_requests=4, page_size=8, tp=1,
        quant=QuantConfig(kv_dtype="int8"),
    )
    e4 = e1.replace(tp=4)
    state_tp1 = init_state(cfg, e1, kv_dtype=jnp.float32)
    check_scale_geometry(state_tp1, cfg, e1)  # consistent: fine
    with pytest.raises(AssertionError):
        check_scale_geometry(state_tp1, cfg, e4)  # the round-2 mismatch
    state_tp4 = init_state(cfg, e4, kv_dtype=jnp.float32)
    check_scale_geometry(state_tp4, cfg, e4)
