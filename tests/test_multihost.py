"""Multi-controller entry (SURVEY §5.8): env gate + degenerate 1-process
cluster bring-up.

A real N-host pod is not available in this environment (BASELINE.md); what
IS testable is that the entry point exists, is a strict no-op without the
env gate, and that a degenerate 1-process "cluster" initializes and
reports the expected topology — the same code path a launcher would run on
every host of a pod slice.
"""

import os
import socket
import subprocess
import sys

from omp_amg_tpu.parallel.multihost import maybe_initialize


def test_noop_without_gate():
    assert maybe_initialize(env={}) is False


def test_degenerate_single_process_cluster():
    """1-process jax.distributed cluster via the env gate (subprocess: the
    runtime is global state we must not leak into this test process)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (
        "from omp_amg_tpu.parallel.multihost import maybe_initialize\n"
        "import jax\n"
        "assert maybe_initialize() is True\n"
        "assert jax.process_count() == 1 and jax.process_index() == 0\n"
        "assert maybe_initialize() is True  # idempotent re-entry\n"
        "print('MULTIHOST_OK', jax.device_count())\n"
    )
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               OMP_AMG_COORDINATOR=f"127.0.0.1:{port}",
               OMP_AMG_NUM_PROCS="1",
               OMP_AMG_PROC_ID="0")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MULTIHOST_OK" in out.stdout
