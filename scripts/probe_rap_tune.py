"""Probe-RAP engine tuning at PMIS 96³ L0: v1 vs v2 widths, stage split.

One TPU process. Prints per-variant fused-loop times so the selection
model's constants can be validated against reality.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.ops.probe_rap import build_rap_probe, rap_probe_numeric
from omp_amg_tpu.ops.rap import galerkin_product
from omp_amg_tpu.sparse.formats import ell_to_scipy
from omp_amg_tpu.utils.timers import timeit_fused


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    print("backend:", jax.devices()[0], flush=True)
    a = amg.poisson3d_7pt(n)
    h, hops = amg_setup(a, AMGParams(coarsening="pmis", routed="off",
                                     rap="host"), keep_host=True,
                        flavor="host")
    a0 = sp.csr_matrix(hops[0])
    p0 = sp.csr_matrix(ell_to_scipy(h.levels[0].p))
    t0 = time.time()
    ac = galerkin_product(a0, p0)
    t_host = time.time() - t0
    print(f"host Gustavson: {t_host*1e3:.0f} ms "
          f"({a0.nnz/t_host/1e9:.4f} Gnnz/s)", flush=True)

    probe, _ = build_rap_probe(a0, p0, ac_sp=ac)
    print(f"selected: c_panel={probe.c_panel} roll_ring={probe.r_roll_ring} "
          f"c_roll={probe.r_c_roll} "
          f"r_v2={'yes' if probe.r_v2 is not None else 'no'} "
          f"dia={'yes' if probe.a_dia is not None else 'no'} "
          f"colors={probe.n_colors}", flush=True)
    if probe.r_v2 is not None:
        r2 = probe.r_v2
        print(f"  r_v2: nsteps={r2.sbases.shape[0]} s_win={r2.s_win} "
              f"r_g={r2.r_g}", flush=True)
    print(f"  r_plan: nb={probe.r_plan.val.shape[0]} "
          f"span={probe.r_plan.span} K={probe.r_plan.val.shape[1]}",
          flush=True)

    def step(pr, y):
        pr2 = dataclasses.replace(pr, p_val=pr.p_val + y[0, 0] * 1e-30)
        return rap_probe_numeric(pr2, engine="pallas")

    y0 = jnp.zeros((probe.n_coarse, probe.kc), jnp.float32)
    s_sel = timeit_fused(step, probe, y0, iters=5)
    print(f"selected engine: {s_sel*1e3:.1f} ms "
          f"({a0.nnz/s_sel/1e9:.4f} Gnnz/s) [{t_host/s_sel:.1f}x host]",
          flush=True)

    # forced v1 (no v2/roll plans)
    pr_v1 = dataclasses.replace(probe, a_v2=None, r_v2=None, c_panel=0,
                                r_roll_ring=0, r_roll_hi=None)
    s_v1 = timeit_fused(step, pr_v1, y0, iters=5)
    print(f"forced v1:     {s_v1*1e3:.1f} ms", flush=True)

    # forced v2 at several widths
    from omp_amg_tpu.ops.pallas_spmm import schedule_plan_v2
    from omp_amg_tpu.sparse.panels import plan_panel_spmm

    r_dict = plan_panel_spmm(p0.T.tocsr(), dtype=np.float64)
    for C in (96, 64, 48, 32, 24, 16):
        r2 = schedule_plan_v2(r_dict, C)
        if r2 is None:
            print(f"v2 C={C}: infeasible", flush=True)
            continue
        pr2 = dataclasses.replace(probe, a_v2=None, r_v2=r2, c_panel=C,
                                  r_roll_ring=0, r_roll_hi=None)
        s2 = timeit_fused(step, pr2, y0, iters=5)
        print(f"forced v2 C={C}: {s2*1e3:.1f} ms  "
              f"[nsteps={r2.sbases.shape[0]} s_win={r2.s_win} "
              f"r_g={r2.r_g}]", flush=True)


if __name__ == "__main__":
    main()
