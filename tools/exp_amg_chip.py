#!/usr/bin/env python
"""AMG at scale on chip (VERDICT r3 item 5): 10M-row 2-D and 3-D Laplacians,
AMG-PCG vs plain CG vs Chebyshev-PCG — setup cost, solve wall-clock,
iteration counts, iterations/sec. One process for the whole suite: the axon
tunnel charges a one-time ~4 min penalty on the FIRST device->host transfer
of a process (measured 2026-08-19: 4 B pull 169-254 s, then ~13-20 MB/s),
so the warmup pull is paid once up front and excluded from every number.

Results land in BENCH_NOTES.md ("AMG at scale"); bench.py carries the
driver-visible subset (cg_iters_per_s, amg_pcg_*).

Usage: python tools/exp_amg_chip.py [--nx 3200] [--n3 216] [--skip-3d]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    return out, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=3200)
    ap.add_argument("--n3", type=int, default=216)
    ap.add_argument("--skip-3d", action="store_true")
    ap.add_argument("--skip-2d", action="store_true")
    ap.add_argument("--rtol", type=float, default=1e-6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spmv_tpu.gen import create_laplace_2d, create_laplace_3d, gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.amg import amg_setup
    from spmv_tpu.solvers.cg import cg
    from spmv_tpu.solvers.chebyshev import (
        chebyshev_bounds,
        chebyshev_preconditioner,
    )

    dtype = np.float32
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    _, dt = timed(lambda: float(jax.device_put(jnp.float32(1.0)) + 1))
    print(f"d2h warmup pull: {dt:.1f}s (excluded from all numbers)",
          flush=True)

    problems = []
    if not args.skip_2d:
        problems.append(("lap2d_" + str(args.nx),
                         lambda: create_laplace_2d(args.nx, args.nx,
                                                   dtype=dtype)))
    if not args.skip_3d:
        problems.append(("lap3d_" + str(args.n3),
                         lambda: create_laplace_3d(args.n3, dtype=dtype)))

    out = []
    for tag, gen in problems:
        rec = {"tag": tag}
        a, dt = timed(gen)
        rec["n"], rec["nnz"], rec["gen_s"] = a.nrows, a.nnz, round(dt, 2)
        print(f"== {tag}: n={a.nrows} nnz={a.nnz} gen={dt:.1f}s", flush=True)

        (A), dt = timed(lambda: build_dist_matrix(
            a, n_devices=1, local_format="dia", dtype=dtype))
        rec["assemble_s"] = round(dt, 2)
        b = A.to_dist(gaussian_bump(a.nrows, dtype=dtype))
        b.block_until_ready()
        print(f"  assemble(dia): {dt:.1f}s", flush=True)

        # ---- plain CG: iterations/sec (fixed 100 iters) + full solve ----
        op = lambda A_: A_.as_linear_operator()
        rate = jax.jit(lambda A_, bb: cg(op(A_), bb, kmax=100, rtol=0.0))
        r0, dt = timed(lambda: jax.block_until_ready(rate(A, b)))
        print(f"  plain cg 100-iter compile+run: {dt:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            r0, dt = timed(lambda: jax.block_until_ready(rate(A, b)))
            ts.append(dt)
        rec["cg_iters_per_s"] = round(100 / min(ts), 1)
        rec["cg_ms_per_iter"] = round(min(ts) / 100 * 1e3, 3)
        print(f"  plain cg: {rec['cg_iters_per_s']} iters/s "
              f"({rec['cg_ms_per_iter']} ms/iter)", flush=True)

        solve_plain = jax.jit(lambda A_, bb: cg(
            op(A_), bb, kmax=kmax_for(tag), rtol=args.rtol))
        rp, dt0 = timed(lambda: jax.block_until_ready(solve_plain(A, b)))
        rp, dt = timed(lambda: jax.block_until_ready(solve_plain(A, b)))
        rec["cg_solve_s"] = round(dt, 2)
        rec["cg_iters"] = int(rp.iterations)
        rec["cg_converged"] = bool(rp.converged)
        rec["cg_rel"] = float(rp.rnorm / rp.rnorm0)
        print(f"  plain cg solve rtol={args.rtol}: {dt:.2f}s "
              f"iters={rec['cg_iters']} conv={rec['cg_converged']} "
              f"rel={rec['cg_rel']:.2e}", flush=True)

        # ---- Chebyshev-PCG ----
        t0 = time.perf_counter()
        lmin, lmax = chebyshev_bounds(op(A), b, m=32)
        lmin, lmax = float(lmin), float(lmax)
        cheb_setup = time.perf_counter() - t0
        deg = 16
        solve_cheb = jax.jit(lambda A_, bb, lo, hi: cg(
            op(A_), bb, kmax=2000, rtol=args.rtol,
            preconditioner=chebyshev_preconditioner(op(A_), lo, hi,
                                                    degree=deg)))
        rc, _ = timed(lambda: jax.block_until_ready(
            solve_cheb(A, b, lmin, lmax)))
        rc, dt = timed(lambda: jax.block_until_ready(
            solve_cheb(A, b, lmin, lmax)))
        rec["cheb_setup_s"] = round(cheb_setup, 2)
        rec["cheb_solve_s"] = round(dt, 2)
        rec["cheb_iters"] = int(rc.iterations)
        rec["cheb_converged"] = bool(rc.converged)
        print(f"  cheb-pcg(deg{deg}) solve: {dt:.2f}s "
              f"iters={rec['cheb_iters']} conv={rec['cheb_converged']} "
              f"(bounds [{lmin:.2e},{lmax:.2e}], setup {cheb_setup:.1f}s)",
              flush=True)

        # ---- AMG-PCG (interval aggregation, DIA/banded coarse grids) ----
        h, dt = timed(lambda: amg_setup(a, A, aggregate="interval",
                                        interval_size=4, local_format="dia"))
        rec["amg_setup_s"] = round(dt, 2)
        rec["amg_levels"] = h.n_levels
        rec["amg_grid_cx"] = round(h.grid_complexity(), 3)
        print(f"  amg setup: {dt:.1f}s levels={h.n_levels} "
              f"cx={rec['amg_grid_cx']}", flush=True)
        solve_amg = jax.jit(lambda A_, bb, h_: cg(
            op(A_), bb, kmax=200, rtol=args.rtol,
            preconditioner=h_.as_preconditioner()))
        ra, dtc = timed(lambda: jax.block_until_ready(solve_amg(A, b, h)))
        print(f"  amg-pcg compile+first: {dtc:.1f}s", flush=True)
        ra, dt = timed(lambda: jax.block_until_ready(solve_amg(A, b, h)))
        rec["amg_solve_s"] = round(dt, 2)
        rec["amg_iters"] = int(ra.iterations)
        rec["amg_converged"] = bool(ra.converged)
        rec["amg_rel"] = float(ra.rnorm / ra.rnorm0)
        rec["amg_speedup_vs_cg"] = round(
            rec["cg_solve_s"] / (rec["amg_solve_s"] + rec["amg_setup_s"]), 2)
        rec["amg_solve_speedup_vs_cg"] = round(
            rec["cg_solve_s"] / rec["amg_solve_s"], 2)
        print(f"  amg-pcg solve: {dt:.2f}s iters={rec['amg_iters']} "
              f"conv={rec['amg_converged']} rel={rec['amg_rel']:.2e} | "
              f"speedup vs plain cg: solve-only "
              f"{rec['amg_solve_speedup_vs_cg']}x, incl-setup "
              f"{rec['amg_speedup_vs_cg']}x", flush=True)

        # cross-check: AMG and plain CG solutions agree (device-side norm)
        diff = float(jnp.linalg.norm(ra.x - rp.x) / jnp.linalg.norm(rp.x))
        rec["amg_vs_cg_xdiff"] = diff
        print(f"  |x_amg - x_cg|/|x_cg| = {diff:.2e}", flush=True)
        out.append(rec)

    print(json.dumps(out))
    return 0


def kmax_for(tag: str) -> int:
    # plain CG needs O(nx) iterations on a Laplacian: 2-D 3200^2 needs
    # several thousand; 3-D 216^3 a few hundred
    return 12000 if "2d" in tag else 2000


if __name__ == "__main__":
    sys.exit(main())
