"""Stats: window requirements of the routed-window ELL SpMV plan.

For each operator (PMIS hierarchy A levels, P, R) measure, per 1024-row
block (8 sublane groups x 128 lanes):

- W1      = #distinct (col//128 - row//128) values  -> stride-1 slab windows
- Wsig    = #distinct (col//128 - sigma*(row//128)) for the operator's natural
            stride sigma (restriction has sigma = coarsening ratio)
- K       = max row degree (ELL width) and padding efficiency nnz/(K*n)

Runs on CPU; host-flavor PMIS setup.
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/stats_routed_plan.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.problems.poisson import poisson2d_5pt, poisson3d_7pt, poisson3d_27pt, aniso2d_9pt
from omp_amg_tpu.sparse.formats import ell_to_scipy, dia_to_scipy


def block_window_stats(m, name, strides=(1,)):
    """m: scipy CSR. Windows give dest sublane s chunk base + sigma*s."""
    m = m.tocsr()
    n = m.shape[0]
    coo = m.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    blk = rows // 1024
    nb = int(blk.max()) + 1 if len(rows) else 0
    deg = np.diff(m.indptr)
    K = int(deg.max(initial=0))
    eff = m.nnz / max(K * n, 1)
    out = [f"{name}: shape={m.shape} nnz={m.nnz} K={K} eff={eff:.2f}"]
    for sig in strides:
        # window (base) covers: dest sublane s reads chunk base + sig*s
        # element needs col//128 == base + sig*(row//128 - 8*blk) + ... base
        # is arbitrary per block, so #windows = #distinct (col//128 - sig*srel)
        srel = (rows // 128) % 8
        key = cols // 128 - sig * srel
        # count distinct keys per block
        order = np.lexsort((key, blk))
        b_s, k_s = blk[order], key[order]
        newblk = np.r_[True, b_s[1:] != b_s[:-1]]
        newkey = newblk | np.r_[True, k_s[1:] != k_s[:-1]]
        wcounts = np.bincount(b_s[newkey], minlength=nb)
        w = wcounts[wcounts > 0]
        if len(w) == 0:
            continue
        out.append(
            f"  sigma={sig}: W max={w.max()} p99={int(np.percentile(w, 99))} "
            f"p50={int(np.percentile(w, 50))} mean={w.mean():.1f}"
        )
        # coverage if capped at W=8/12/16 (drop least-popular windows per blk)
        for cap in (8, 12, 16):
            cnt_per = {}
            # count nnz per (blk, key)
            uniq, inv, counts = np.unique(
                np.stack([blk, key]), axis=1, return_inverse=True, return_counts=True
            )
            # per block keep top-cap keys by count
            ub, uk = uniq
            order2 = np.lexsort((-counts, ub))
            rank = np.empty(len(ub), np.int64)
            prev = -1
            r = 0
            for idx in order2:
                if ub[idx] != prev:
                    prev = ub[idx]
                    r = 0
                rank[idx] = r
                r += 1
            kept = rank[inv] < cap
            out.append(f"    cap W={cap}: coverage {kept.sum() / len(rows) * 100:.2f}%")
    print("\n".join(out), flush=True)


def span_slot_stats(m, name):
    """Option-H stats: per 1024-row block,
    span S_b = max(chunk - srel) - min(chunk - srel) + 8  (contiguous x slab)
    K_tot_b = sum over distinct offsets o of max-per-row multiplicity.
    """
    m = m.tocsr()
    n = m.shape[0]
    coo = m.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    if len(rows) == 0:
        return
    blk = rows // 1024
    nb_arr = int(blk.max()) + 1
    srel = (rows // 128) % 8
    o_abs = cols // 128 - srel  # span row = o_abs - base_b + srel
    # per block: base = min(o_abs), S = max(o_abs) - base + 8
    base = np.full(nb_arr, np.iinfo(np.int64).max)
    np.minimum.at(base, blk, o_abs)
    top = np.full(nb_arr, np.iinfo(np.int64).min)
    np.maximum.at(top, blk, o_abs)
    live = top >= base
    S = (top - base + 8)[live]
    # K_tot per block: sum_o max_row cnt(row, o)
    key_ro = (blk << 40) | ((o_abs - base[blk] + 8) << 20) | (rows % 1024)
    _, cnt = np.unique(key_ro, return_counts=True)
    u = np.unique(key_ro)
    bo = u >> 20  # (blk, o) key
    # max over rows within (blk, o)
    order = np.argsort(bo, kind="stable")
    bo_s, cnt_s = bo[order], cnt[order]
    newgrp = np.r_[True, bo_s[1:] != bo_s[:-1]]
    gid = np.cumsum(newgrp) - 1
    gmax = np.zeros(gid[-1] + 1, np.int64)
    np.maximum.at(gmax, gid, cnt_s)
    gblk = (bo_s[newgrp] >> 20).astype(np.int64)
    ktot = np.bincount(gblk, weights=gmax, minlength=nb_arr)[np.unique(gblk)]
    nnz_blk = np.bincount(blk, minlength=nb_arr)
    eff = m.nnz / (ktot.max() * nb_arr * 1024)
    print(
        f"{name}: S max={S.max()} p50={int(np.percentile(S, 50))} | "
        f"K_tot max={int(ktot.max())} p99={int(np.percentile(ktot, 99))} "
        f"p50={int(np.percentile(ktot, 50))} mean={ktot.mean():.0f} | "
        f"eff={eff:.3f} (ELL-K={int(np.diff(m.indptr).max(initial=0))})",
        flush=True,
    )


def to_scipy(a):
    from omp_amg_tpu.sparse.formats import Ell, Dia, PlaneDia, plane_to_dia

    if isinstance(a, PlaneDia):
        a = plane_to_dia(a)
    if isinstance(a, Dia):
        return dia_to_scipy(a)
    return ell_to_scipy(a)


def main():
    probs = [
        ("7pt-64^3", poisson3d_7pt(64)),
        ("27pt-32^3", poisson3d_27pt(32)),
        ("aniso9pt-256^2", aniso2d_9pt(256, eps=1e-3)),
        ("5pt-256^2", poisson2d_5pt(256)),
    ]
    for pname, prob in probs:
        a = prob[0] if isinstance(prob, tuple) else prob
        h = amg_setup(a, AMGParams(coarsening="pmis"), flavor="host")
        print(f"\n==== {pname}: {len(h.levels)} levels ====", flush=True)
        for li, lev in enumerate(h.levels):
            if "--spanslot" in sys.argv:
                span_slot_stats(to_scipy(lev.a), f"A[{li}]")
                span_slot_stats(to_scipy(lev.p), f"P[{li}]")
                span_slot_stats(to_scipy(lev.r), f"R[{li}]")
                continue
            block_window_stats(to_scipy(lev.a), f"A[{li}]")
            block_window_stats(to_scipy(lev.p), f"P[{li}]")
            # restriction: natural stride = coarsening ratio
            rm = to_scipy(lev.r)
            ratio = max(1, int(round(rm.shape[1] / max(rm.shape[0], 1))))
            sigs = sorted({1, min(ratio, 16)})
            block_window_stats(rm, f"R[{li}] (ratio~{ratio})", strides=sigs)


if __name__ == "__main__":
    main()
