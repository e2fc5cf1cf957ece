"""Offline study: W-shared windows for the routed-ELL kernel (CPU-only).

The round-3 ceiling proof showed the routed kernel is slot-compute-bound,
and the per-slot cost is dominated by the 8 dynamic sublane slices that
build each slot's (8,128) window stack. If W consecutive slots of a
sublane-group share ONE x-chunk (planner packs each (group, chunk) slot
run W-aligned), the kernel hoists window construction out of a W-slot
inner loop: per-slot cost ≈ (8 slices)/W + take + fma. The price is slot
inflation F(W) = Σ ceil(m/W)·W / Σ m over (group, chunk) multiplicities
(+ the usual block-max padding).

This script computes F(W) and the projected speedup for PMIS operators.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python scripts/analyze_wshare.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

LANES = 128
BLOCK = 1024
KC = 16


def group_chunk_mults(m):
    """multiplicity m_gj per (sublane-group, x-chunk) + group ids."""
    m = sp.csr_matrix(m)
    coo = m.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    g = (rows // BLOCK) * 8 + (rows // LANES) % 8
    j = cols // LANES
    nj = int(j.max()) + 2
    # count per (row, j)
    rk = rows * nj + j
    _, rk_inv, rk_cnt = np.unique(rk, return_inverse=True, return_counts=True)
    gj = g * nj + j
    order = np.argsort(gj, kind="stable")
    gj_o = gj[order]
    cnt_o = rk_cnt[rk_inv][order]
    new = np.r_[True, gj_o[1:] != gj_o[:-1]]
    gid = np.cumsum(new) - 1
    mx = np.zeros(gid[-1] + 1, np.int64)
    np.maximum.at(mx, gid, cnt_o)
    g_of = gj_o[new] // nj
    return mx, g_of, int(g.max()) + 1, len(rows)


def study(name, m):
    mx, g_of, ng, nnz = group_chunk_mults(m)
    nb = -(-ng // 8)
    print(f"{name}: n={m.shape[0]} nnz={nnz/1e6:.2f}M")
    base = None
    for W in (1, 2, 4, 8, 16):
        dem_g = np.zeros(nb * 8, np.int64)
        np.add.at(dem_g, g_of, -(-mx // W) * W)
        bk = dem_g.reshape(nb, 8).max(axis=1)          # block max over groups
        kch = np.maximum(-(-bk // KC), 1)              # chunk padding
        slots = int(kch.sum()) * KC
        if base is None:
            base = slots
        eff = nnz / (slots * BLOCK)
        # cost model: per-slot = 8/W slices + take + unpack + fma (+loop oh)
        # constants (chip-probed separately): slice=s, rest=r in "units"
        print(f"  W={W:2d}: slots {slots:8d}  x{slots/base:.3f}  "
              f"eff {eff:.3f}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    from omp_amg_tpu.amg.hierarchy import amg_setup
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.problems.poisson import poisson3d_7pt
    from omp_amg_tpu.sparse.formats import ell_to_scipy

    a = poisson3d_7pt(n)
    hier, ops = amg_setup(a, AMGParams(coarsening="pmis", routed="off"),
                          keep_host=True, flavor="host")
    for li in (1, 2):
        if li < len(ops):
            study(f"A[{li}]", ops[li])
    lv = hier.levels[0]
    study("P[0]", ell_to_scipy(lv.p))
    study("R[0]", ell_to_scipy(lv.r))


def study_block_window(name, m):
    """Slot demand when one window row serves the WHOLE 1024-row block
    (1 slice + sublane broadcast per slot instead of 8 slices): demand =
    Σ_j max-multiplicity over the block's rows, slots hold (8,128) rows."""
    m = sp.csr_matrix(m)
    coo = m.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    nnz = len(rows)
    b = rows // BLOCK
    j = cols // LANES
    nj = int(j.max()) + 2
    rk = rows * nj + j
    _, rk_inv, rk_cnt = np.unique(rk, return_inverse=True, return_counts=True)
    bj = b * nj + j
    order = np.argsort(bj, kind="stable")
    bj_o = bj[order]
    cnt_o = rk_cnt[rk_inv][order]
    new = np.r_[True, bj_o[1:] != bj_o[:-1]]
    gid = np.cumsum(new) - 1
    mx = np.zeros(gid[-1] + 1, np.int64)
    np.maximum.at(mx, gid, cnt_o)
    b_of = bj_o[new] // nj
    nb = int(b.max()) + 1
    for W in (1, 2, 4):
        dem_b = np.zeros(nb, np.int64)
        np.add.at(dem_b, b_of, -(-mx // W) * W)
        kch = np.maximum(-(-dem_b // KC), 1)
        slots = int(kch.sum()) * KC
        eff = nnz / (slots * BLOCK)
        print(f"  block-window W={W}: slots {slots:8d}  eff {eff:.3f}")


def main_block():
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    from omp_amg_tpu.amg.hierarchy import amg_setup
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.problems.poisson import poisson3d_7pt
    from omp_amg_tpu.sparse.formats import ell_to_scipy

    a = poisson3d_7pt(n)
    hier, ops = amg_setup(a, AMGParams(coarsening="pmis", routed="off"),
                          keep_host=True, flavor="host")
    for li in (1, 2):
        if li < len(ops):
            print(f"A[{li}]:")
            study_block_window(f"A[{li}]", ops[li])
    lv = hier.levels[0]
    print("P[0]:")
    study_block_window("P[0]", ell_to_scipy(lv.p))
    print("R[0]:")
    study_block_window("R[0]", ell_to_scipy(lv.r))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "block":
        main_block()
    else:
        main()
