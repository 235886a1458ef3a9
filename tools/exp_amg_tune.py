#!/usr/bin/env python
"""AMG configuration tuning at the 10M-row headline scale (follow-up to
exp_amg_chip.py, VERDICT r3 item 5).

exp_amg_chip measured the default interval config (interval_size=4,
smooth_levels=None) at 213 ms/V-cycle — far above the ~8 ms a cycle's
matvec count implies. Hypothesis (solvers/amg.py level-loop comment):
interval-mode smoothed prolongators densify deep coarse stencils
(measured ndiag 19 -> 71 -> 163 -> 297 on 1024^2); without a
``smooth_levels`` cutoff every Galerkin level densifies, so coarse
matvecs + compile dominate.

This script assembles the 10M-row 2-D Laplacian ONCE, then for each
config: setup time, per-level ndiag/size table, ONE preconditioner
apply timed sustained (K chained applies), PCG iterations + solve wall.

Usage: python tools/exp_amg_tune.py [--nx 3200]
"""
import argparse
import statistics
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=3200)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--configs", default=None,
                    help="comma list of config names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spmv_tpu.gen import create_laplace_2d, gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.amg import amg_setup
    from spmv_tpu.solvers.cg import cg

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.perf_counter()
    float(jax.device_put(jnp.float32(1.0)) + 1)
    print(f"d2h warmup: {time.perf_counter()-t0:.1f}s (excluded)", flush=True)

    a = create_laplace_2d(args.nx, args.nx, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=1, local_format="dia",
                          dtype=np.float32)
    b = A.to_dist(gaussian_bump(a.nrows, dtype=np.float32))
    b.block_until_ready()
    print(f"n={a.nrows} nnz={a.nnz} assembled", flush=True)

    CONFIGS = {
        # name: amg_setup kwargs beyond (a, A, local_format="dia")
        "i4_guard": dict(aggregate="interval", interval_size=4),
        "i4_b6": dict(aggregate="interval", interval_size=4,
                      galerkin_budget=6.0),
        "i4_sl2": dict(aggregate="interval", interval_size=4,
                       smooth_levels=2),
        "i4_sl1": dict(aggregate="interval", interval_size=4,
                       smooth_levels=1),
        "i8_guard": dict(aggregate="interval", interval_size=8),
        "i4_unsmoothed": dict(aggregate="interval", interval_size=4,
                              smooth=False, omega=1.7),
    }
    names = (args.configs.split(",") if args.configs
             else ["i4_guard", "i4_b6", "i4_sl1", "i4_unsmoothed"])

    for name in names:
        kw = CONFIGS[name]
        print(f"== {name}: {kw}", flush=True)
        t0 = time.perf_counter()
        h = amg_setup(a, A, local_format="dia", **kw)
        dt = time.perf_counter() - t0
        sizes = []
        for lvl in h.levels:
            Al = lvl.A
            nd_l = (len(Al.dia_offsets) if Al.dia_offsets
                    else f"{Al.local_format}:{Al.format_size_bytes()//2**20}MB")
            sizes.append(f"{Al.nrows_global}({nd_l}d)")
        sizes.append(f"{h.coarse_A.nrows_global}(coarse)")
        print(f"  setup {dt:.1f}s levels={h.n_levels} cx="
              f"{h.grid_complexity():.3f} | " + " -> ".join(sizes),
              flush=True)

        # sustained preconditioner apply cost
        @jax.jit
        def mloop(A_, h_, v, k=args.k):
            pre = h_.as_preconditioner()
            return jax.lax.fori_loop(
                0, k, lambda i, u: pre(u) * jnp.float32(0.5), v)

        t0 = time.perf_counter()
        float(mloop(A, h, b).reshape(-1)[7])
        print(f"  apply compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for t in range(3):
            bt = b * np.float32(1.0 + 1e-6 * (t + 1))
            t0 = time.perf_counter()
            float(mloop(A, h, bt).reshape(-1)[7])
            ts.append((time.perf_counter() - t0) / args.k)
        ms = statistics.median(ts) * 1e3
        print(f"  V-cycle apply: {ms:.2f} ms", flush=True)

        solve = jax.jit(lambda A_, bb, h_: cg(
            A_.as_linear_operator(), bb, kmax=300, rtol=args.rtol,
            preconditioner=h_.as_preconditioner()))
        t0 = time.perf_counter()
        float(solve(A, b, h).rnorm)
        print(f"  pcg compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        ws = []
        for t in range(2):
            bt = b * np.float32(1.0 + 1e-6 * (t + 1))
            t0 = time.perf_counter()
            r = solve(A, bt, h)
            rel = float(r.rnorm / r.rnorm0)
            ws.append(time.perf_counter() - t0)
        print(f"  pcg: {statistics.median(ws):.2f}s iters="
              f"{int(r.iterations)} conv={bool(r.converged)} rel={rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
