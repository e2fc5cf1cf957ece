"""Block-fill statistics for a micro-block BSR SpMV primitive (VERDICT r4
weak-#1 / next-#6): would trading the routed kernel's ~0.33 slot occupancy
for DENSE block compute pay?

For each PMIS coarse operator and each candidate block shape (r, c), the
fill f = nnz / (occupied_blocks · r · c). A dense-block kernel does
r·c·occupied_blocks MACs at near-VPU/MXU speed; the routed kernel does
nnz/occupancy slot-ops at its measured ceiling. The go/no-go arithmetic
(BASELINE.md round-5): the block path wins iff

    f  >  occupancy · (dense-slot rate / routed-slot rate)⁻¹  ≈ 0.33·β

with β ≈ 1 for VPU-rate 8×128 blocks against the same take/FMA budget
(both stream 4 B/value; the block path reads no lidx and does no
per-slot slice, so β < 1 in its favor on bandwidth — but every stored
zero costs a full MAC slot AND 4 B of HBM stream, so fill is also the
bandwidth ratio vs the routed format's ~12 B/nnz).

CPU-only, host-side statistics (no TPU claim):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/measure_blockfill.py [n=96] [n2...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def block_fill(m, r, c):
    coo = m.tocoo()
    br = coo.row // r
    bc = coo.col // c
    blocks = np.unique(br * ((m.shape[1] + c - 1) // c) + bc)
    return m.nnz / (len(blocks) * r * c), len(blocks)


def main():
    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.hierarchy import amg_setup
    from omp_amg_tpu.amg.params import AMGParams

    sizes = [int(x) for x in sys.argv[1:]] or [96]
    for n in sizes:
        a = amg.poisson3d_7pt(n, backend="numpy")
        h, ops = amg_setup(a, AMGParams(coarsening="pmis"), keep_host=True)
        del h
        for li in (1, 2):
            if li >= len(ops):
                continue
            m = ops[li].tocsr()
            print(f"n={n} A[{li}]: rows {m.shape[0]} nnz {m.nnz} "
                  f"(avg row {m.nnz/m.shape[0]:.1f})", flush=True)
            for (r, c) in [(8, 8), (4, 4), (8, 16), (8, 128), (1, 128),
                           (8, 4)]:
                f, nb = block_fill(m, r, c)
                # bytes per nnz streamed by a dense-block kernel (f32
                # values, no index stream inside a block; block coords
                # amortized) vs routed ~12 B/nnz effective
                bpn = 4.0 / f
                print(f"  {r}x{c}: fill {f:.4f} blocks {nb} "
                      f"-> {bpn:.1f} B/nnz dense-stream "
                      f"({'GO' if f >= 0.25 else 'no-go'} vs 0.25 bar)",
                      flush=True)


if __name__ == "__main__":
    main()
