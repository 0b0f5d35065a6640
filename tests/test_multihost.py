"""Multi-host helpers (single-process pass-through + digest determinism).

Real multi-process runs need a pod; these verify the single-process
contract that makes the same engine code run on 1 chip and N hosts
(tpusgl/parallel/multihost.py), plus mesh construction on the virtual
8-device CPU topology from conftest.
"""

import numpy as np

from tpusgl.parallel.multihost import (
    assert_same_schedule,
    broadcast_from_host0,
    init_multihost,
    make_global_mesh,
    schedule_digest,
)


def test_single_process_passthrough():
    assert init_multihost() is False
    obj = {"ids": [[1, 2, 3], [4]], "temp": 0.7}
    assert broadcast_from_host0(obj) == obj
    assert_same_schedule(b"\x00" * 32)  # no-op, must not raise


def test_schedule_digest_deterministic():
    a = schedule_digest("decode", np.array([0, 1, 2]), np.array([5, 6, 7]))
    b = schedule_digest("decode", np.array([0, 1, 2]), np.array([5, 6, 7]))
    c = schedule_digest("decode", np.array([0, 1, 3]), np.array([5, 6, 7]))
    d = schedule_digest("prefill", np.array([0, 1, 2]), np.array([5, 6, 7]))
    assert a == b and a != c and a != d


def test_global_mesh_axes():
    mesh = make_global_mesh(dp=2, tp=4)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (2, 4)
