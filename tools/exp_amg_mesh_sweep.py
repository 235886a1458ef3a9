#!/usr/bin/env python
"""AMG-PCG iteration counts vs device count at scale (VERDICT r3 item 5):
the shard-local (decoupled) aggregation and the interval aggregation both
change the hierarchy when the mesh grows — this measures how much, at a
size 16-64x beyond the existing test coverage (tests/test_amg.py <=512^2).

CPU-only (8 virtual devices); iteration counts are mesh-exact regardless
of hardware, and that is the quantity under test.

Usage: python tools/exp_amg_mesh_sweep.py [--nx 2048] [--devices 1,2,4,8]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=2048)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--modes", default="match,interval")
    args = ap.parse_args()

    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

    from spmv_tpu.gen import create_laplace_2d, gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.amg import amg_setup
    from spmv_tpu.solvers.cg import cg

    dtype = np.float32
    a = create_laplace_2d(args.nx, args.nx, dtype=dtype)
    print(f"lap2d {args.nx}^2: n={a.nrows} nnz={a.nnz}", flush=True)
    bh = gaussian_bump(a.nrows, dtype=dtype)

    out = []
    for mode in args.modes.split(","):
        kw = (dict(aggregate=mode, interval_size=4)
              if mode.startswith("interval") else dict(aggregate="match"))
        if mode == "interval2d":
            kw["cycle"] = 2  # the bench config
        for nd in map(int, args.devices.split(",")):
            t0 = time.perf_counter()
            A = build_dist_matrix(a, n_devices=nd, local_format="ell",
                                  dtype=dtype)
            b = A.to_dist(bh)
            h = amg_setup(a, A, local_format="ell", **kw)
            setup_s = time.perf_counter() - t0
            solve = jax.jit(lambda A_, bb, h_: cg(
                A_.as_linear_operator(), bb, kmax=200, rtol=args.rtol,
                preconditioner=h_.as_preconditioner()))
            t0 = time.perf_counter()
            r = jax.block_until_ready(solve(A, b, h))
            rec = dict(mode=mode, n_devices=nd, iters=int(r.iterations),
                       converged=bool(r.converged),
                       rel=float(r.rnorm / r.rnorm0),
                       levels=h.n_levels,
                       grid_cx=round(h.grid_complexity(), 3),
                       setup_s=round(setup_s, 1),
                       solve_s=round(time.perf_counter() - t0, 1))
            print(json.dumps(rec), flush=True)
            out.append(rec)

    iters = {m: [r["iters"] for r in out if r["mode"] == m]
             for m in args.modes.split(",")}
    print("iteration counts by device count:", iters, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
