"""Packing-structure analysis for routed-ELL plans (CPU-only).

Questions (round-3 kernel work): where does the padded-slot waste on PMIS
coarse operators come from, and which layout lever pays?

- per-(block, sublane-group) demand variance → would per-group kch help?
- aligned-chunk splitting of column clusters → would shifted-x windows
  (windows at 32/64-offset granularity) help?
- lane occupancy per (group, chunk) → the hard ceiling of the primitive.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python scripts/analyze_routed_packing.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.problems.poisson import poisson3d_7pt

LANES = 128
BLOCK = 1024


def analyze(name, m):
    m = sp.csr_matrix(m)
    m.sort_indices()
    coo = m.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    nnz = len(rows)
    if nnz == 0:
        return
    b = rows // BLOCK
    s = (rows // LANES) % 8
    g = b * 8 + s

    def demand(chunk_of_col):
        """slot demand per group under a chunking of the columns:
        Σ_j max-multiplicity(group, chunk j)."""
        j = chunk_of_col
        key = g * (j.max() + 2) + j
        # multiplicity of (row, j) then max per (g, j), summed per g
        rk = rows * (j.max() + 2) + j
        _, rk_inv, rk_cnt = np.unique(rk, return_inverse=True,
                                      return_counts=True)
        # per (g,j): max over rows of count
        gj = key
        order = np.argsort(gj, kind="stable")
        gj_o = gj[order]
        cnt_o = rk_cnt[rk_inv][order]
        new = np.r_[True, gj_o[1:] != gj_o[:-1]]
        gid = np.cumsum(new) - 1
        mx = np.zeros(gid[-1] + 1, np.int64)
        np.maximum.at(mx, gid, cnt_o)
        g_of = gj_o[new] // (j.max() + 2)
        dem = np.zeros(int(g.max()) + 1, np.int64)
        np.add.at(dem, g_of, mx)
        return dem

    dem = demand(cols // LANES)
    nb = int(b.max()) + 1
    dem_full = np.zeros(nb * 8, np.int64)
    dem_full[: len(dem)] = dem
    dem2 = dem_full.reshape(nb, 8)
    bk = dem2.max(axis=1)
    print(f"{name}: n={m.shape[0]} nnz={nnz/1e6:.2f}M "
          f"nnz/row={nnz/m.shape[0]:.1f}")
    print(f"  per-block demand bk: mean {bk.mean():.1f} max {bk.max()}")
    print(f"  per-group demand:   mean {dem2.mean():.1f} "
          f"(block-max/group-mean = {bk.mean()/max(dem2.mean(),1e-9):.2f} "
          f"→ per-group-kch gain)")
    used = dem2.sum()
    print(f"  lane occupancy (nnz / used-slot-lanes): "
          f"{nnz / (used * LANES):.3f}")
    # shifted windows: chunk the columns at finer alignments and take the
    # best per-(g, cluster) — approximate by evaluating demand at shifted
    # chunkings and taking the elementwise min per group (a lower bound on
    # a per-slot optimal shift chooser, but indicative)
    for nshift in (2, 4):
        dems = [demand((cols + LANES * k // nshift) // LANES)
                for k in range(nshift)]
        best = min(d.sum() for d in dems)
        # true per-group min across shifts (each group picks one shift)
        L = max(len(d) for d in dems)
        dpad = np.stack([np.pad(d, (0, L - len(d))) for d in dems])
        per_g = dpad.min(axis=0).sum()
        print(f"  {nshift}-shift windows: global {best/used:.2f}× "
              f"per-group {per_g/used:.2f}× of used slots")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    a = poisson3d_7pt(n)
    hier, ops = amg_setup(a, AMGParams(coarsening="pmis", routed="off"),
                          keep_host=True, flavor="host")
    for li in range(min(3, len(ops))):
        analyze(f"A[{li}]", ops[li])
    lv = hier.levels[0]
    from omp_amg_tpu.sparse.formats import ell_to_scipy
    analyze("P[0]", ell_to_scipy(lv.p))
    analyze("R[0]", ell_to_scipy(lv.r))


if __name__ == "__main__":
    main()
