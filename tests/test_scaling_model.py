"""Weak-scaling model sanity (SURVEY §2 #22 / north-star ≥80% gate)."""

import numpy as np

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.parallel.scaling_model import MachineModel, scaling_report


def test_scaling_report_structure_and_monotonicity():
    N = 32
    hier = amg_setup(amg.poisson3d_7pt(N), grid=(N, N, N))
    rep = scaling_report(hier, grid=(N, N, N), agg_rows_per_dev=2048,
                         measured_t_cycle_ms=3.0)
    assert rep["model"]["hbm_gbps"] > 0
    assert len(rep["levels"]) == len(hier.levels)
    for lv in rep["levels"]:
        assert lv["bytes_per_cycle"] > 0
        assert lv["halo_bytes_per_exchange"] > 0
    eff = [rep["predicted"][nd]["weak_efficiency"]
           for nd in sorted(rep["predicted"])]
    # efficiency starts at 1 and decays monotonically with device count
    assert eff[0] == 1.0
    assert all(a >= b - 1e-9 for a, b in zip(eff, eff[1:]))
    assert eff[-1] > 0.3    # the model must not predict collapse
    # calibration anchors the single-chip cycle
    assert abs(rep["predicted"][1]["t_cycle_ms"] - 3.0) < 1e-6


def test_scaling_report_two_host_gate():
    """The north-star gate is ≥80% at 2 hosts: the model, fed by a real
    hierarchy, must predict the slab path clears it."""
    N = 64
    hier = amg_setup(amg.poisson3d_7pt(N), grid=(N, N, N))
    rep = scaling_report(hier, grid=(N, N, N))
    assert rep["predicted"][2]["weak_efficiency"] >= 0.8


def test_scaling_report_tpu_operator_forms():
    """On chip, levels hold PlaneDia/ConstDia forms — the model must
    account them (regression: PlaneDia has data4, not data; ConstDia has
    no stored planes at all — both used to crash or count nnz=0)."""
    import dataclasses

    from omp_amg_tpu.parallel.scaling_model import _nnz_of, _op_bytes_per_nnz
    from omp_amg_tpu.sparse.formats import to_const_dia, to_plane_dia

    N = 16
    hier = amg_setup(amg.poisson3d_7pt(N), grid=(N, N, N))
    lv0 = hier.levels[0]
    cd = to_const_dia(lv0.a) if not type(lv0.a).__name__ == "ConstDia" \
        else lv0.a
    pd = to_plane_dia(amg.poisson3d_7pt(N), dtype="auto")
    n = N ** 3
    band = sum(n - abs(o) for o in amg.poisson3d_7pt(N).offsets)
    for op in (cd, pd):
        if op is None:
            continue
        assert _op_bytes_per_nnz(op) >= 0.0
        assert _nnz_of(op) == band
    # a hierarchy whose L0 was swapped for the TPU forms must not crash
    for op in (cd, pd):
        if op is None:
            continue
        lv = dataclasses.replace(lv0, a=op)
        h2 = dataclasses.replace(hier, levels=(lv,) + hier.levels[1:])
        rep = scaling_report(h2, grid=(N, N, N))
        assert rep["levels"][0]["nnz"] == band


def test_scaling_report_pmis_family_and_band():
    """PMIS/routed family report (VERDICT r2 #6): routed-window halo
    accounting, packing-efficiency plan bytes, ±2× ICI sensitivity band."""
    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.hierarchy import amg_setup
    from omp_amg_tpu.amg.params import AMGParams

    a = amg.poisson3d_7pt(20)
    hier = amg_setup(a, AMGParams(coarsening="pmis"))
    rep = scaling_report(hier, family="pmis", measured_t_cycle_ms=5.0)
    assert rep["family"] == "pmis"
    for ndev, p in rep["predicted"].items():
        assert p["weak_efficiency_lo"] <= p["weak_efficiency_hi"]
        if ndev > 1:
            # the band genuinely brackets the point estimate
            assert p["weak_efficiency_lo"] <= p["weak_efficiency"] + 1e-9
            assert p["weak_efficiency"] <= p["weak_efficiency_hi"] + 1e-9
    # auto-detection: hierarchy without a grid is the pmis family
    rep2 = scaling_report(hier)
    assert rep2["family"] == "pmis"
