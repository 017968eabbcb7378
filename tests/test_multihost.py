"""Multi-host (DCN) index sharding: two REAL processes, 4 virtual CPU
devices each, joined by jax.distributed over loopback into one 8-device
global mesh (SURVEY §2.3/#34 — round 1 only had an init wrapper).

The workers build a row-sharded index where no process holds the full
matrix (make_array_from_single_device_arrays over local shards), run the
cross-shard top-k merge, and the test checks the merged global result
against a single-process exact oracle.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_sharded_search(tmp_path):
    out = tmp_path / "result.npz"
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {"PYTHONPATH": str(Path(__file__).resolve().parents[1])}
    import os

    env = {**os.environ, **env}
    env.pop("JAX_PLATFORMS", None)  # workers set their own
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), coordinator, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for proc in procs:
        stdout, _ = proc.communicate(timeout=240)
        outputs.append(stdout)
        assert proc.returncode == 0, stdout[-2000:]
    assert "WORKER0 OK" in outputs[0]
    assert "WORKER1 OK" in outputs[1]
    data = np.load(out)
    # The DCN-merged top-k must equal the exact single-host oracle.
    np.testing.assert_array_equal(np.sort(data["ids"], axis=1),
                                  np.sort(data["oracle_ids"], axis=1))
    # Scores descending per query.
    assert (np.diff(data["scores"], axis=1) <= 1e-6).all()
