"""Multi-host serving support (SURVEY.md §7 M5).

TPU-native replacement for the reference's env-var/NCCL process bootstrap
(/root/reference/tp_runtime.py:10-25, dead code there): `jax.distributed`
for process rendezvous, one global (dp, tp) mesh over every chip in the pod
slice (tp inside a host rides ICI; dp across hosts rides DCN), and XLA-
compiled collectives — no hand-written all-reduce/all-gather/broadcast
(tp_runtime.py:28-51).

Cross-host continuous batching works because the control plane is
deterministic (SURVEY.md §5 "Distributed communication backend"): every host
must enqueue byte-identical XLA programs each step. Two mechanisms:

- `broadcast_from_host0` ships the request stream (token ids + sampling
  params) from host 0 to all hosts over DCN, so every scheduler sees the
  same queue in the same order;
- `assert_same_schedule` cheaply cross-checks a digest of each host's batch
  decision in debug runs — a divergent scheduler deadlocks SPMD programs,
  which is far harder to diagnose than this assert.

Single-process runs (tests, the 1-chip bench) pass through every helper
unchanged, so the engine code is identical on 1 chip and N hosts.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


_initialized = False


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Explicit args win; otherwise standard cluster env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a TPU
    pod's own metadata, which jax.distributed.initialize auto-detects).
    Returns True when a multi-process runtime is active.

    ORDERING MATTERS: jax.distributed.initialize must run before anything
    initializes the XLA backend — including jax.process_count(). When the
    caller opts in (explicit args or env), this function therefore calls
    initialize FIRST and only queries process state afterwards. (An earlier
    version probed jax.process_count() up front, which itself initialized
    the backend and made every real multi-process bootstrap raise.)
    """
    global _initialized
    # Opt-in only: explicit rendezvous args or the standard env rendezvous
    # (cf. the reference's RANK/WORLD_SIZE bootstrap, tp_runtime.py:11-13).
    # Pod auto-detection is deliberately NOT attempted here — single-host
    # environments can carry TPU metadata env vars.
    want = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or "JAX_COORDINATOR_ADDRESS" in os.environ
    )
    if not want:
        # Safe to touch the backend on the opt-out path; reflects whatever
        # the caller may have bootstrapped directly.
        return jax.process_count() > 1
    if not _initialized:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            # Either the caller already ran initialize themselves (fine) or
            # the backend was touched first (fatal) — distinguish below.
            logger.info("jax.distributed.initialize: %s", e)
        _initialized = True
    if num_processes is not None and jax.process_count() != num_processes:
        raise RuntimeError(
            f"multi-host bootstrap failed: expected {num_processes} "
            f"processes, runtime has {jax.process_count()}. "
            "init_multihost (or jax.distributed.initialize) must run before "
            "ANY other JAX API call in the process."
        )
    logger.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_count() > 1


def make_global_mesh(dp: int = 1, tp: int = 1):
    """(dp, tp) mesh over all global devices.

    Device order: jax.devices() enumerates process-major, so with
    tp == local_device_count each tp group is one host's chips (all-reduces
    ride ICI) and the dp axis crosses hosts (DCN) — the layout SURVEY.md §7
    calls for. For tp spanning hosts, ICI still connects chips within a pod
    slice; XLA routes per the slice topology.
    """
    from tpusgl.parallel.mesh import make_mesh

    return make_mesh(dp=dp, tp=tp, devices=jax.devices())


def broadcast_from_host0(obj: Any) -> Any:
    """Broadcast a small host-side python object (request token ids,
    sampling params) from process 0 to all processes over DCN. Identity in
    single-process runs.

    This is the scheduler-input fan-out that keeps every host's continuous-
    batching decisions identical (all hosts run the same deterministic
    policy over the same queue)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        json.dumps(obj).encode("utf-8"), dtype=np.uint8
    )
    # Fixed-size length header first (broadcast needs same-shape arrays).
    n = multihost_utils.broadcast_one_to_all(
        np.array([payload.size], np.int64)
    )
    buf = np.zeros((int(n[0]),), np.uint8)
    if jax.process_index() == 0:
        buf[: payload.size] = payload
    buf = multihost_utils.broadcast_one_to_all(buf)
    return json.loads(bytes(buf).decode("utf-8"))


def schedule_digest(mode: str, req_indices, seq_lens) -> bytes:
    """Stable digest of one step's batch decision."""
    h = hashlib.sha256()
    h.update(mode.encode())
    h.update(np.ascontiguousarray(req_indices, np.int32).tobytes())
    h.update(np.ascontiguousarray(seq_lens, np.int32).tobytes())
    return h.digest()


def assert_same_schedule(digest: bytes) -> None:
    """Cross-check that all hosts made the same batch decision this step
    (divergence would hang the SPMD programs). No-op single-process.

    ALL-gather, not broadcast-and-compare: with a host-0 broadcast only the
    divergent NON-zero ranks would raise while host 0 sailed into the next
    SPMD program and hung in its collectives — the exact failure mode this
    check exists to prevent. With the allgather every process sees every
    digest and every process raises, so a divergence surfaces as a clean
    synchronized error on all ranks (tests/test_multihost.py::
    test_divergence_raises_cleanly_on_all_ranks)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    arr = np.frombuffer(digest, dtype=np.uint8)
    all_digests = multihost_utils.process_allgather(arr)  # [P, 32]
    if not (all_digests == all_digests[0]).all():
        bad = [
            p for p in range(all_digests.shape[0])
            if not np.array_equal(all_digests[p], all_digests[0])
        ]
        raise RuntimeError(
            f"scheduler divergence detected on process {jax.process_index()}"
            f": processes {bad} disagree with process 0 on this step's batch"
        )
