"""Multi-controller (multi-host) entry — SURVEY.md §5.8.

The reference is shared-memory only (OpenMP threads); the TPU-native
framework scales across hosts with JAX's multi-controller runtime: every
host runs the SAME program, ``jax.distributed.initialize()`` wires the
processes into one cluster, and the 1D "rows" mesh then spans all chips of
the pod slice (ICI within a host's chips, DCN across hosts) — the
``shard_map`` collectives in :mod:`.dist` and :mod:`.slab` are untouched.

How the single-process emulation maps onto a real N-host run
------------------------------------------------------------

The per-shard setups (:mod:`.dist_setup`, :mod:`.dist_pmis_setup`) are
written as loops over shard index ``s`` with *explicit ghost exchanges*
between iterations: every step either uses shard-local rows only or
consumes a bounded ghost strip assembled from neighbouring shards'
boundary rows. On one controller the loop runs serially; on N controllers
each process executes only its own ``s = jax.process_index()``-owned
iterations and the ghost strips travel as the pre-computed halo arrays
that ``place_hierarchy`` shards over the mesh. Because PMIS weights are
``hash(global_row_id)`` and every tie-break is lexicographic in GLOBAL row
ids (SURVEY §3.2 determinism contract), the resulting hierarchy is
bit-identical no matter how many processes participate — the property the
8-device virtual-mesh tests pin (tests/test_dist_pmis_setup.py).

Environment gate (set by the launcher on every host):

- ``OMP_AMG_COORDINATOR``  "host:port" of process 0 (required)
- ``OMP_AMG_NUM_PROCS``    total process count (required)
- ``OMP_AMG_PROC_ID``      this process's rank (required)

On managed clusters (GKE/Cloud TPU pods) where JAX auto-detects the
cluster, set ``OMP_AMG_DIST=1`` instead and the no-arg initialize is used.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize(env=None) -> bool:
    """Initialize the JAX multi-controller runtime when env-gated.

    Returns True when ``jax.distributed.initialize`` was called (or the
    runtime was already initialized), False when the gate is absent —
    single-process runs are completely unaffected.
    """
    env = os.environ if env is None else env
    coord = env.get("OMP_AMG_COORDINATOR")
    auto = env.get("OMP_AMG_DIST") == "1"
    if not coord and not auto:
        return False
    if jax.distributed.is_initialized():
        return True  # already initialized (idempotent entry)
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(env["OMP_AMG_NUM_PROCS"]),
            process_id=int(env["OMP_AMG_PROC_ID"]),
        )
    else:
        jax.distributed.initialize()
    return True


def global_mesh(axis: str = "rows"):
    """1D mesh over every chip of every participating process."""
    return jax.make_mesh((jax.device_count(),), (axis,))
