"""Experiment: does centroid relabeling of aggregate ids make AMG
coarse/transfer operators WELL-packable?

Background (round 4): the AMG V-cycle on chip is ~0.855 s/iter at 1M rows
because every level except the fine one runs the ELL/XLA-gather path; WELL
packing of the default (matching-order) aggregate numbering measured
8-25%% occupancy and K inflation to the 128 cap. Hypothesis: relabeling
each shard's aggregates by their mean fine-row index (centroid order)
propagates the fine level's banded locality down the hierarchy.

Run on CPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_amg_relabel.py
"""
import os
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import spmv_tpu as st
from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.formats.well import well_occupancy
from spmv_tpu.parallel.dist_matrix import build_dist_matrix
from spmv_tpu.solvers import amg


def relabel_centroid(aggs, ncs):
    """Per-shard: relabel aggregate ids by mean fine index order."""
    out = []
    for agg, nc in zip(aggs, ncs):
        if len(agg) == 0:
            out.append(agg)
            continue
        sums = np.bincount(agg, weights=np.arange(len(agg), dtype=np.float64),
                           minlength=nc)
        cnts = np.bincount(agg, minlength=nc)
        mean = np.divide(sums, cnts, out=np.full(nc, np.inf), where=cnts > 0)
        order = np.argsort(mean, kind="stable")  # new id -> old id
        inv = np.empty(nc, np.int64)
        inv[order] = np.arange(nc)
        out.append(inv[agg])
    return out


def relabel_rcm(cur, aggs, ncs, ncs_max):
    """Per-shard: relabel aggregate ids by RCM order of the shard-local
    unsmoothed coarse graph (built cheaply per shard from the local block)."""
    from spmv_tpu.reorder import reverse_cuthill_mckee
    nd = len(aggs)
    from spmv_tpu.parallel.partition import owner_ranges
    ranges = owner_ranges(cur.nrows, nd)
    lens = cur.row_nnz()
    rows_g = np.repeat(np.arange(cur.nrows, dtype=np.int64), lens)
    cols_g = cur.colind.astype(np.int64)
    out = []
    for s in range(nd):
        r0, r1 = int(ranges[s]), int(ranges[s + 1])
        lo, hi = cur.rowptr[r0], cur.rowptr[r1]
        rs, cs = rows_g[lo:hi], cols_g[lo:hi]
        keep = (cs >= r0) & (cs < r1)
        agg = aggs[s]
        cr = agg[(rs[keep] - r0)]
        cc = agg[(cs[keep] - r0)]
        cg = CSRHost.from_coo(cr, cc, np.ones(len(cr), np.float32),
                              ncs[s], ncs[s])
        order = reverse_cuthill_mckee(cg)  # new id -> old id
        inv = np.empty(ncs[s], np.int64)
        inv[order] = np.arange(ncs[s])
        out.append(inv[agg])
    return out


def stats(name, csr):
    occ = well_occupancy(csr, tile_groups=16)
    lens = csr.row_nnz()
    print(f"  {name}: {csr.nrows}x{csr.ncols} nnz={csr.nnz} "
          f"nnz/row={csr.nnz/max(csr.nrows,1):.1f} max_row={lens.max() if len(lens) else 0} "
          f"well_occ(tg16)={occ:.3f}")


def main():
    nx = 1024
    a = st.create_laplace_2d(nx, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=1, local_format="ell", dtype=np.float32)

    cur = a
    cur_A = A
    for lev in range(4):
        t0 = time.time()
        agg_g, ncg, aggs, ncs, ncs_max = amg._level_tables(cur, cur_A, 1, 7919 * lev)
        diag, lmax = amg._level_diag(cur)
        dinv_h = np.divide(1.0, diag, out=np.zeros_like(diag), where=diag != 0)

        for mode in ("matching-order", "rcm"):
            if mode == "centroid":
                aggs2 = relabel_centroid(aggs, ncs)
                agg2 = np.concatenate(
                    [s * ncs_max + aggs2[s] for s in range(len(aggs2))])
            elif mode == "rcm":
                aggs2 = relabel_rcm(cur, aggs, ncs, ncs_max)
                agg2 = np.concatenate(
                    [s * ncs_max + aggs2[s] for s in range(len(aggs2))])
            else:
                agg2 = agg_g
            p_host = amg._smoothed_prolongator(cur, agg2, ncg, dinv_h, lmax,
                                               theta=0.05)
            coarse = amg._spgemm(p_host.transpose(), amg._spgemm(cur, p_host))
            print(f"level {lev} [{mode}]:")
            stats("P", p_host)
            stats("A_c", coarse)
            if mode != "matching-order":
                cur_next = coarse
        print(f"  ({time.time()-t0:.1f} s)")
        cur = cur_next
        cur_A = build_dist_matrix(cur, n_devices=1, local_format="ell",
                                  dtype=np.float32)


if __name__ == "__main__":
    main()
