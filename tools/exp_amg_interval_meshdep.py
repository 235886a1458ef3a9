#!/usr/bin/env python
"""Reproduce the round-4 AMG failure (VERDICT r5 item 3): interval-mode
(1-D semicoarsening) PCG iteration counts vs mesh size on the 2-D
Laplacian — the bench config (interval_size=4, local_format='dia').
CPU-only; iteration counts are hardware-independent.

Usage: python tools/exp_amg_interval_meshdep.py [--sizes 256,512,1024]
       [--mode interval|interval2d|match] [--interval 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512,1024")
    ap.add_argument("--mode", default="interval")
    ap.add_argument("--interval", type=int, default=4)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--kmax", type=int, default=200)
    ap.add_argument("--fmt", default="dia")
    ap.add_argument("--budget", type=float, default=12.0)
    ap.add_argument("--cycle", type=int, default=1)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--band", type=float, default=4.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from spmv_tpu.gen import create_laplace_2d, gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.amg import amg_setup
    from spmv_tpu.solvers.cg import cg

    dtype = np.float32
    rows = []
    for nx in map(int, args.sizes.split(",")):
        a = create_laplace_2d(nx, nx, dtype=dtype)
        bh = gaussian_bump(a.nrows, dtype=dtype)
        A = build_dist_matrix(a, n_devices=1, local_format=args.fmt,
                              dtype=dtype)
        b = A.to_dist(bh)
        t0 = time.perf_counter()
        kw = dict(local_format=args.fmt, galerkin_budget=args.budget,
                  cycle=args.cycle, degree=args.degree, band=args.band)
        if args.mode.startswith("interval"):
            kw.update(aggregate=args.mode, interval_size=args.interval)
        h = amg_setup(a, A, **kw)
        setup_s = time.perf_counter() - t0
        levels = [lvl.A.nrows_global for lvl in h.levels] + [
            h.coarse_A.nrows_global]
        t0 = time.perf_counter()
        solve = jax.jit(lambda A_, bb, h_: cg(
            A_.as_linear_operator(), bb, kmax=args.kmax, rtol=args.rtol,
            preconditioner=h_.as_preconditioner()))
        r = solve(A, b, h)
        it = int(r.iterations)
        conv = bool(r.converged)
        solve_s = time.perf_counter() - t0
        row = dict(nx=nx, iters=it, converged=conv,
                   setup_s=round(setup_s, 1), solve_s=round(solve_s, 1),
                   levels=levels, gc=round(h.grid_complexity(), 2))
        rows.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
