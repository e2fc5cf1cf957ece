"""Analytic weak-scaling model: per-level comm/flop accounting + predicted
multi-chip efficiency.

Parity: the reference's "parallel scaling efficiency" metric (BASELINE
north-star "≥80% weak-scaling efficiency at ≥2 hosts"). Real multi-chip
hardware is not attachable in this environment (BASELINE.md), so the
framework ships the quantitative substitute the gate needs: an explicit,
assumption-visible performance model fed by the hierarchy's actual
per-level operator metadata (rows, nnz, format bytes, halo planes), plus
the bit-identity/iteration-parity tests that validate the machinery itself
(tests/test_dist*.py, __graft_entry__.dryrun_multichip).

Model (stated in the emitted report):

- compute: every solve-path op is HBM-bandwidth-bound (measured streaming
  ~390 GB/s on this chip; datasheet 819); T_comp = bytes_moved / hbm_bw.
- halo exchange (z-slab): each sharded-level SpMV exchanges 2 boundary
  planes of x (plane_bytes each way over ICI); the interior/boundary
  overlap split (parallel/dist.py) hides the exchange behind interior
  compute, so T_level = max(T_interior, T_halo) + T_boundary.
- collectives: 1D-ring psums of scalars, latency-dominated:
  t = log2(ndev) · ici_latency. PCG does 3 scalar reductions per
  iteration (2 dots + norm check; the pipelined variant does 1).
- weak scaling: the global problem grows with ndev (z-extent × ndev);
  per-device level sizes, halo bytes, and flops are constant, so
  efficiency(ndev) = T_cycle(1) / T_cycle(ndev).
- levels below the agglomeration threshold replicate: their compute is a
  serial fraction (same on every chip, no comm) — the classic Amdahl term
  that bounds deep-hierarchy weak scaling.
"""

from __future__ import annotations

import math
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class MachineModel:
    """Explicit machine assumptions (single TPU v5e chip + 1D ICI ring)."""

    hbm_gbps: float = 390.0      # measured streaming bandwidth (BASELINE.md)
    ici_gbps: float = 90.0       # effective per-direction neighbor bandwidth
    ici_latency_us: float = 1.0  # per-hop collective/exchange latency
    stage_latency_us: float = 2.0  # per-stage dispatch floor on attached HW
                                   # (the axon relay's 500 µs floor is a
                                   # remote-tunnel artifact, excluded)


def _op_bytes_per_nnz(op) -> float:
    """Streamed operator bytes per nonzero for the solve-path SpMV."""
    name = type(op).__name__
    if name == "ConstDia":
        return 0.2     # matrix-free masked-constant stencil (masks only)
    if name == "PlaneDia":
        import jax.numpy as jnp

        return 2.1 if op.data4.dtype == jnp.bfloat16 else 4.1
    if name == "Dia":
        return 4.1
    if name == "RoutedEll":
        # compact-chunk plan stream: 4 B val + 1 B packed lane + soff per
        # PADDED slot, divided by the plan's own packing efficiency (the
        # kernel walks padded chunks; K-dependence enters through eff)
        nc_chunks = int(op.val4.shape[0])
        padded = nc_chunks * 16 * 1024
        eff = max(op.nnz, 1) / padded if op.nnz else 0.3
        return 5.3 / max(eff, 0.05)
    return 8.2         # ELL: col + val


def _nnz_of(op) -> int:
    import numpy as np

    if hasattr(op, "nnz"):
        n = op.nnz
        return int(n) if not callable(n) else int(n())
    if hasattr(op, "val"):
        return int(np.prod(op.val.shape))
    if hasattr(op, "data"):
        return int(np.prod(op.data.shape))
    if hasattr(op, "offsets"):
        # banded forms without stored planes (ConstDia) or with plane-major
        # storage (PlaneDia): band length per diagonal
        n = int(op.shape[0])
        return sum(n - abs(int(o)) for o in op.offsets)
    return 0


def scaling_report(hier, grid=None, ndev_list=(1, 2, 4, 8, 16),
                   machine: MachineModel = MachineModel(),
                   agg_rows_per_dev: int = 2048,
                   measured_t_cycle_ms: float | None = None,
                   family: str = "auto") -> dict:
    """Per-level accounting + predicted weak-scaling efficiency.

    ``hier`` is a single-device Hierarchy; the model shards it the way
    the distributed setups do — ``family="slab"`` (z-plane slabs, plane
    halo exchanges; structured grids) or ``family="pmis"`` (row-block
    shards with routed-window strip halos; the classical pipeline) — at
    each device count, with the weak-scaled problem (per-device work
    constant). ``family="auto"`` picks pmis when any level operator is
    routed/ELL or no grid is given. ``measured_t_cycle_ms`` (single-chip
    V-cycle) calibrates the absolute scale when available; efficiencies
    are scale-free either way. The prediction carries a ±2× ICI
    sensitivity band (``weak_efficiency_lo/hi``): the ICI constants are
    stated assumptions, not measurements (no multi-chip hardware here),
    and the band shows how far they can be wrong before the 80% gate
    flips.
    """
    params = hier.params
    nu = params.nu_pre + params.nu_post
    # per level per V-cycle: nu smoothing SpMVs + 1 residual SpMV, plus
    # the grid-transfer traffic (2·nnz_P each direction)
    spmv_per_cycle = nu + 1
    if family == "auto":
        routedish = any(type(lv.a).__name__ in ("RoutedEll", "Ell")
                        for lv in hier.levels)
        family = "pmis" if (routedish or grid is None) else "slab"

    levels = []
    for lv in hier.levels:
        n = int(lv.a.shape[0])
        nnz = _nnz_of(lv.a)
        nnz_p = _nnz_of(lv.p)
        opb = _op_bytes_per_nnz(lv.a)
        # bytes per cycle at this level (vectors: x + y per op, f32)
        level_bytes = (spmv_per_cycle * (nnz * opb + 2 * 4 * n)
                       + 2 * (nnz_p * 8.2 + 4 * n)      # restrict+prolong
                       + nu * 3 * 4 * n)                # jacobi axpy traffic
        zdim = None
        plane_rows = n
        if family == "slab" and grid is not None and len(grid) == 3:
            # plane size from the level's row count assuming isotropic
            # coarsening of the initial grid shape
            frac = (n / (grid[0] * grid[1] * grid[2])) ** (1.0 / 3.0)
            nz = max(int(round(grid[0] * frac)), 1)
            plane_rows = n // max(nz, 1)
            zdim = nz
            halo_bytes = 2 * plane_rows * 4      # two boundary x planes
        else:
            # row-block shard: halo strips are bounded by the operator's
            # column window. RoutedEll carries the window size (span
            # chunks of 128 columns); half a window each side is the
            # strip a shard requests from each neighbor. ELL/other: the
            # distance-1 graph bandwidth of a ~7-pt-lineage coarse
            # operator, approximated as n^(2/3) rows (one grid plane).
            if type(lv.a).__name__ == "RoutedEll":
                halo_rows = min(n, int(lv.a.span) * 64)
            else:
                halo_rows = min(n, int(max(n, 1) ** (2.0 / 3.0)))
            halo_bytes = 2 * halo_rows * 4
        flops = 2 * nnz * spmv_per_cycle + 4 * nnz_p
        levels.append(dict(n=n, nnz=nnz, nnz_p=nnz_p, zdim=zdim,
                           op_format=type(lv.a).__name__,
                           bytes_per_cycle=level_bytes,
                           halo_bytes_per_exchange=halo_bytes,
                           exchanges_per_cycle=spmv_per_cycle + 2,
                           flops_per_cycle=flops))

    def _predict(machine):
        return _predict_family(levels, hier, machine, ndev_list, family,
                               agg_rows_per_dev)

    predictions = _predict(machine)
    import dataclasses as _dc

    pess = _dc.replace(machine, ici_gbps=machine.ici_gbps / 2,
                       ici_latency_us=machine.ici_latency_us * 2)
    opti = _dc.replace(machine, ici_gbps=machine.ici_gbps * 2,
                       ici_latency_us=machine.ici_latency_us / 2)
    pred_lo = _predict(pess)
    pred_hi = _predict(opti)

    t1 = predictions[ndev_list[0]]["t_cycle_ms"]
    calib = (measured_t_cycle_ms / t1) if measured_t_cycle_ms else 1.0
    for ndev, p in predictions.items():
        p["t_cycle_ms"] = round(p["t_cycle_ms"] * calib, 4)
        p["weak_efficiency"] = round(t1 * calib / p["t_cycle_ms"], 4)
        for tag, alt in (("weak_efficiency_lo", pred_lo),
                         ("weak_efficiency_hi", pred_hi)):
            p[tag] = round(alt[ndev_list[0]]["t_cycle_ms"]
                           / alt[ndev]["t_cycle_ms"], 4)

    lat = machine.ici_latency_us * 1e-6
    # PCG collective cost per iteration (latency-bound scalar psums)
    pcg = {ndev: dict(
        psum_per_iter=3,
        t_collectives_us=round(3 * math.log2(max(ndev, 2)) * lat * 1e6, 3))
        for ndev in ndev_list}

    return dict(
        family=family,
        model=asdict(machine),
        model_notes=(
            "weak scaling: per-device level sizes constant (problem grows "
            "with ndev); T_level = max(T_interior, T_halo) + T_boundary on "
            "sharded levels (interior/boundary overlap split of "
            "parallel/dist.py); replicated levels are the Amdahl serial "
            "fraction; scalar psums latency-bound at log2(ndev) hops; "
            "pmis family: row-block shards, halo strips bounded by the "
            "routed column windows, plan-stream bytes scaled by each "
            "operator's measured packing efficiency; the _lo/_hi "
            "efficiency band = ICI bandwidth ±2× with latency ∓2× "
            "(stated assumption, not a measurement)"),
        levels=levels,
        predicted=predictions,
        pcg_collectives=pcg,
        calibrated_to_measured=measured_t_cycle_ms is not None,
    )


def _predict_family(levels, hier, machine, ndev_list, family,
                    agg_rows_per_dev):
    hbm = machine.hbm_gbps * 1e9
    ici = machine.ici_gbps * 1e9
    lat = machine.ici_latency_us * 1e-6
    stage = machine.stage_latency_us * 1e-6

    predictions = {}
    for ndev in ndev_list:
        # weak scaling: the GLOBAL problem is ndev × the single-chip one
        # (z-extent × ndev); each level's global size scales with ndev.
        # A level shards while its per-device rows clear the agglomeration
        # threshold — below that it replicates and its (global-sized)
        # work lands on every device: the Amdahl serial fraction.
        t_cycle = 0.0
        t_halo_exposed = 0.0
        n_sharded = n_replicated = 0
        for lv in levels:
            n_global = lv["n"] * ndev
            sharded = ndev > 1 and lv["n"] >= agg_rows_per_dev
            if lv["zdim"] is not None:
                sharded = sharded and lv["zdim"] >= 2
            if ndev == 1:
                sharded = False
            t_comp = lv["bytes_per_cycle"] / hbm + 2 * stage
            if ndev == 1:
                t_cycle += t_comp       # single chip: no halo exchange
            elif sharded:
                # per-device work = the single-chip level (weak scaling)
                n_sharded += ndev > 1
                boundary_frac = (min(2.0 / max(lv["zdim"] or 8, 2), 0.5)
                                 if lv["zdim"] else 0.1)
                t_halo = lv["exchanges_per_cycle"] * (
                    lv["halo_bytes_per_exchange"] / ici + lat)
                t_int = t_comp * (1 - boundary_frac)
                t_bnd = t_comp * boundary_frac
                t_cycle += max(t_int, t_halo) + t_bnd
                t_halo_exposed += max(0.0, t_halo - t_int)
            else:
                # replicated: every device does the GLOBAL level's work
                n_replicated += 1
                t_cycle += lv["bytes_per_cycle"] * ndev / hbm + 2 * stage
        # coarse tail: the scaled hierarchy deepens ~log2(ndev) more
        # levels to keep the dense coarse solve bounded
        nc = int(hier.coarse_chol.shape[0])
        t_coarse = 2 * (nc * nc * 4) / hbm + 2 * stage
        t_cycle += t_coarse * (1 + math.log2(ndev) if ndev > 1 else 1)
        # PCG collectives per preconditioned iteration (3 scalar psums)
        t_cycle += 3 * math.log2(max(ndev, 2)) * lat if ndev > 1 else 0.0
        predictions[ndev] = dict(t_cycle_ms=t_cycle * 1e3,
                                 halo_exposed_ms=round(t_halo_exposed * 1e3,
                                                       5),
                                 sharded_levels=n_sharded,
                                 replicated_levels=int(n_replicated))
    return predictions
