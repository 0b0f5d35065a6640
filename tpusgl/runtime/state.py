"""On-device engine state.

All mutable device-side serving state lives in one donated pytree:

- the paged KV pool (reference: MHATokenToKVPool slabs,
  /root/reference/memory_pool.py:104-171) as per-layer
  [(num_pages+1)*page_size, Hkv*2*D] arrays with page 0 reserved as the dummy
  write target for padding (generalizing slot 0, memory_pool.py:82-84),
- `last_token`: the on-device future-token buffer that replaces the
  reference's negative-future-id map + second CUDA stream
  (overlap_worker.py:40-44, 73-96): step N writes its sampled token here and
  step N+1's decode gathers its input from it, so the host never has to see a
  token before scheduling the next step,
- `presence`: per-request generated-token presence matrix driving the
  repetition penalty on device (sample.py:19-37 does this on host),
- the sampling PRNG key.

The request->token page table (ReqToTokenPool, memory_pool.py:7-44) lives
host-side only (runtime/memory_pool.ReqSlotPool); each step receives the
small int32 page-table rows it needs as inputs, so there is no device table
to keep in sync. Free lists and the radix tree are host-side too.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpusgl.config import EngineConfig, ModelConfig
from tpusgl.ops.attention import make_kv_pool


def scale_pool_rows_per_page(Hkv: int, tp: int = 1) -> int:
    """Global int8-KV scale-pool rows per page for a tp-sharded engine.

    The scale pool is ROW-sharded over tp (parallel/mesh.state_shardings),
    so each page's block must be 8-row sublane-aligned PER LOCAL SHARD:
    scale_rows_per_page(Hkv // tp) rows per shard, stacked tp times. Every
    allocator / test / avatar must use THIS function — the decode kernel
    asserts the local-shard layout (ops/paged_attention.py)."""
    from tpusgl.ops.attention import scale_rows_per_page

    return scale_rows_per_page(Hkv // tp) * tp


def check_scale_geometry(state: "EngineState", model_cfg, engine_cfg) -> None:
    """Assert the state's int8-KV scale pool matches the engine geometry
    (catches mismatched init/shard paths before the kernel's opaque assert)."""
    if state.kv_scale is None:
        return
    P = engine_cfg.page_size
    pages = state.kv[0].shape[0] // P
    want = pages * scale_pool_rows_per_page(
        model_cfg.num_key_value_heads, int(engine_cfg.tp)
    )
    got = state.kv_scale[0].shape
    assert got == (want, P), (
        "int8-KV scale pool geometry mismatch: ", got, (want, P),
        dict(Hkv=model_cfg.num_key_value_heads, tp=engine_cfg.tp, page=P),
    )


class EngineState(NamedTuple):
    kv: tuple                  # L x [(num_pages+1)*P, Hkv*2*D] ([K heads | V heads] halves)
    # Per-token scales when kv is int8: 8-row-aligned per-page blocks, one
    # [P]-lane row per (head, k/v) — ops/attention.scale_row. The decode
    # kernel DMAs a page's [R8, P] block and reads [1, P] rows per head;
    # Mosaic's tiling rules reject every narrower layout tried (row-per-
    # token [*, Hkv*2], page-major [*, Hkv*2*P] with in-kernel reshape or
    # sub-128 lane slices, single-row DMAs).
    kv_scale: Optional[tuple]  # L x [(num_pages+1)*R8, P] f32
    last_token: jnp.ndarray    # [max_requests+1] int32
    presence: jnp.ndarray      # [max_requests+1, vocab] bool
    rng: jax.Array


def init_state(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    kv_dtype: jnp.dtype = jnp.bfloat16,
    seed: int = 0,
    mesh=None,
) -> EngineState:
    """Allocate the engine state. With a mesh, every buffer is created
    directly AT its NamedSharding inside one jitted program — no
    single-device allocation + reshard copy of the multi-GB pool, and the
    collective allocation also works across processes (multi-host)."""
    L = model_cfg.num_hidden_layers
    Hkv = model_cfg.num_key_value_heads
    D = model_cfg.head_dim
    slots = engine_cfg.max_total_tokens
    R = engine_cfg.max_requests
    P = engine_cfg.page_size

    quant_kv = engine_cfg.quant.kv_dtype == "int8"
    store_dtype = jnp.int8 if quant_kv else kv_dtype

    # SINGLE source of truth for the scale-pool geometry: engine_cfg.tp.
    # (Round-2 regression: deriving tp from the optional `mesh` arg meant a
    # caller that sharded a tp=1-geometry state got per-shard scale blocks
    # the kernel rejects. The mesh now only controls placement.)
    tp = int(engine_cfg.tp)
    if mesh is not None:
        assert int(mesh.shape["tp"]) == tp, (
            "mesh tp must match engine_cfg.tp", dict(mesh.shape), tp
        )
    assert Hkv % tp == 0, ("tp must divide kv heads", Hkv, tp)
    r8 = scale_pool_rows_per_page(Hkv, tp)

    def alloc():
        kv = make_kv_pool(L, slots, Hkv, D, store_dtype, page_size=P)
        return EngineState(
            kv=kv,
            kv_scale=tuple(
                jnp.zeros(((kv[0].shape[0] // P) * r8, P), jnp.float32)
                for _ in range(L)
            )
            if quant_kv else None,
            last_token=jnp.zeros((R + 1,), jnp.int32),
            presence=jnp.zeros((R + 1, model_cfg.vocab_size), jnp.bool_),
            rng=jax.random.PRNGKey(seed),
        )

    if mesh is None:
        return alloc()
    from tpusgl.parallel.mesh import state_shardings

    shardings = state_shardings(mesh, jax.eval_shape(alloc))
    return jax.jit(alloc, out_shardings=shardings)()
