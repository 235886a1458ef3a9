#!/usr/bin/env python
"""Structurally diverse matrix corpus on chip (VERDICT r3 item 2).

For each corpus operator (spmv_tpu.corpus — unstructured FEM 2-D/3-D,
power-law graph, circuit network, anisotropic stencil, 27-point stencil):
user workflow end-to-end — generate -> (fem2d: Matrix Market round-trip)
-> RCM -> build_dist_matrix(local_format="auto") -> sustained SpMV loop ->
CG — recording per matrix: chosen format, WELL occupancy, stored-roofline
fraction, ms/apply, CG iters + wall. The general-sparsity claim tested on
matrices nobody tuned for (the reference's real-file workflow,
reference demos/cg.cpp:47).

One process; the axon d2h warmup (~4 min, measured) is paid once up front.
"""
import argparse
import json
import statistics
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_SPEC = {"TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v5": 2765.0,
            "TPU v5p": 2765.0, "TPU v4": 1228.0, "TPU v6 lite": 1640.0}


def timed(fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    return out, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-list of corpus keys")
    ap.add_argument("--applies", type=int, default=100)
    ap.add_argument("--kmax", type=int, default=1500)
    ap.add_argument("--rtol", type=float, default=1e-6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spmv_tpu.corpus import CORPUS
    from spmv_tpu.gen import gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.reorder import bandwidth, rcm_reorder
    from spmv_tpu.solvers.cg import cg

    kind = jax.devices()[0].device_kind
    roof = HBM_SPEC.get(kind, 819.0) * 1e9
    print(f"device: {kind} (roofline {roof/1e9:.0f} GB/s)", flush=True)
    _, dt = timed(lambda: float(jax.device_put(jnp.float32(1.0)) + 1))
    print(f"d2h warmup: {dt:.1f}s (excluded)", flush=True)

    keys = args.only.split(",") if args.only else list(CORPUS)
    out = []
    for key in keys:
        fn, kw, _solver = CORPUS[key]
        rec = {"tag": key}
        a, dt = timed(fn, **kw)
        rec.update(n=a.nrows, nnz=a.nnz, gen_s=round(dt, 1))
        print(f"== {key}: n={a.nrows} nnz={a.nnz} gen={dt:.1f}s", flush=True)

        if key.startswith("fem2d"):
            # Matrix Market round-trip: the reference's real-file workflow
            from spmv_tpu.io.matrix_market import (
                read_matrix_market,
                write_matrix_market,
            )

            _, dtw = timed(write_matrix_market, "/tmp/corpus_fem2d.mtx", a)
            a2, dtr = timed(read_matrix_market, "/tmp/corpus_fem2d.mtx",
                            np.float32)
            assert a2.nnz == a.nnz and a2.nrows == a.nrows
            err = np.abs(a2.values - a.values).max()
            rec["mtx_roundtrip_s"] = round(dtw + dtr, 1)
            print(f"  mtx round-trip: write {dtw:.1f}s read {dtr:.1f}s "
                  f"maxdiff {err:.1e}", flush=True)
            a = a2

        # global scale ||A||_inf -> 0.9 so the chained SpMV loop stays
        # bounded without a per-apply epilogue (bench.py methodology);
        # relative residuals and Jacobi-PCG are scale-invariant
        row_sums = np.zeros(a.nrows)
        np.add.at(row_sums, np.repeat(np.arange(a.nrows), a.row_nnz()),
                  np.abs(a.values))
        a.values *= np.float32(0.9 / max(row_sums.max(), 1e-30))

        bw0 = bandwidth(a)
        (a, order), dt = timed(rcm_reorder, a, keep_best=True)
        rec.update(bw_before=int(bw0), bw_after=int(bandwidth(a)),
                   rcm_s=round(dt, 1))
        print(f"  rcm: bandwidth {bw0} -> {rec['bw_after']} ({dt:.1f}s)",
              flush=True)

        A, dt = timed(build_dist_matrix, a, n_devices=1,
                      local_format="auto", dtype=np.float32)
        rec["format"] = A.local_format
        rec["assemble_s"] = round(dt, 1)
        rec["format_mb"] = round(A.format_size_bytes() / 1e6, 1)
        occ = None
        if A.local_format.startswith("well"):
            from spmv_tpu.formats.well import well_occupancy

            occ = round(float(well_occupancy(a, tile_groups=8)), 3)
        rec["occupancy"] = occ
        print(f"  format={A.local_format} bytes={rec['format_mb']}MB "
              f"occ={occ} assemble={dt:.1f}s", flush=True)

        b = A.to_dist(gaussian_bump(a.nrows, dtype=np.float32))
        k = args.applies
        ks = max(k // 5, 1)

        def make_loop(kk):
            @jax.jit
            def loop(A_, v):
                mv_ = A_.as_linear_operator()
                return jax.lax.fori_loop(0, kk, lambda i, u: mv_(u), v)
            return loop

        loop, loop_s = make_loop(k), make_loop(ks)

        def pull(fn, v):
            # sync by PULLING a device scalar (block_until_ready does not
            # truly sync on the axon tunnel) and PERTURB inputs per call
            # (identical (executable, args) pairs can be served from the
            # tunnel's execution cache)
            t0 = time.perf_counter()
            out = fn(A, v)
            _ = float(out.reshape(-1)[7])
            return time.perf_counter() - t0

        pull(loop, b)
        pull(loop_s, b)
        ts = []
        for t in range(3):
            bt = b * np.float32(1.0 + 1e-6 * (t + 1))
            t_long = pull(loop, bt)
            t_short = pull(loop_s, bt)
            # two-length slope: cancels the per-call dispatch constant
            ts.append(max(t_long - t_short, 1e-9) / (k - ks))
        sec = statistics.median(ts)
        # stored traffic per apply: format bytes + x/y vector streams
        traffic = rec["format_mb"] * 1e6 + 2 * a.nrows * 4
        gbs = traffic / sec / 1e9
        rec["ms_per_apply"] = round(sec * 1e3, 3)
        rec["stored_gbs"] = round(gbs, 1)
        rec["stored_roofline_frac"] = round(gbs * 1e9 / roof, 4)
        rec["gflops"] = round(2 * a.nnz / sec / 1e9, 1)
        print(f"  spmv: {rec['ms_per_apply']} ms/apply, {gbs:.0f} GB/s "
              f"stored ({rec['stored_roofline_frac']*100:.1f}% roofline), "
              f"{rec['gflops']} GFLOP/s", flush=True)

        # Jacobi PCG (scale-invariant): host diagonal -> dist 1/d vector
        rows_h = np.repeat(np.arange(a.nrows, dtype=np.int64), a.row_nnz())
        on_d = a.colind == rows_h
        diag = np.zeros(a.nrows, np.float32)
        np.add.at(diag, rows_h[on_d], a.values[on_d])
        dinv = A.to_dist(np.where(diag != 0, 1.0 / np.maximum(
            np.abs(diag), 1e-30) * np.sign(diag), 1.0).astype(np.float32))

        solve = jax.jit(lambda A_, bb, di: cg(
            A_.as_linear_operator(), bb, kmax=args.kmax, rtol=args.rtol,
            preconditioner=lambda r_: r_ * di))

        def run_solve(bb):
            t0 = time.perf_counter()
            r_ = solve(A, bb, dinv)
            _ = float(r_.rnorm)  # true sync: pull a scalar
            return r_, time.perf_counter() - t0

        run_solve(b)  # compile round
        r, dt = run_solve(b * np.float32(1.0 + 1e-6))
        rec.update(cg_iters=int(r.iterations), cg_s=round(dt, 2),
                   cg_converged=bool(r.converged),
                   cg_rel=float(r.rnorm / r.rnorm0))
        print(f"  jacobi-cg: {dt:.2f}s iters={rec['cg_iters']} "
              f"conv={rec['cg_converged']} rel={rec['cg_rel']:.2e}",
              flush=True)
        out.append(rec)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
