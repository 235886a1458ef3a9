#!/usr/bin/env python
"""Quick chip probe: interval-AMG PCG vs plain CG at moderate size,
to gauge setup wall-clock and convergence on the real TPU before the
full 10M-row experiment (tools/exp_amg_chip.py)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from spmv_tpu.gen import create_laplace_2d, gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.amg import amg_setup
    from spmv_tpu.solvers.cg import cg

    dtype = np.float32
    print(f"device: {jax.devices()[0].device_kind}")
    t0 = time.perf_counter()
    a = create_laplace_2d(n, n, dtype=dtype)
    print(f"gen {n}x{n}: {time.perf_counter()-t0:.2f}s nnz={a.nnz}")

    t0 = time.perf_counter()
    A = build_dist_matrix(a, n_devices=1, local_format="dia", dtype=dtype)
    b = A.to_dist(gaussian_bump(a.nrows, dtype=dtype))
    print(f"assemble dia: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    h = amg_setup(a, A, aggregate="interval", interval_size=4,
                  local_format="dia", cycle=1)
    print(f"amg_setup interval: {time.perf_counter()-t0:.2f}s "
          f"levels={h.n_levels} cx={h.grid_complexity():.2f}")

    solve = jax.jit(lambda A_, bb, h_: cg(
        A_.as_linear_operator(), bb, kmax=200, rtol=1e-6,
        preconditioner=h_.as_preconditioner()))
    t0 = time.perf_counter()
    res = solve(A, b, h)
    res.x.block_until_ready()
    print(f"amg-pcg compile+solve: {time.perf_counter()-t0:.2f}s "
          f"iters={int(res.iterations)} conv={bool(res.converged)} "
          f"rnorm/r0={float(res.rnorm/res.rnorm0):.2e}")
    t0 = time.perf_counter()
    res = solve(A, b, h)
    res.x.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"amg-pcg warm: {dt:.3f}s ({dt/max(int(res.iterations),1)*1e3:.2f} "
          f"ms/iter)")

    plain = jax.jit(lambda A_, bb: cg(A_.as_linear_operator(), bb,
                                      kmax=200, rtol=1e-6))
    r2 = plain(A, b)
    r2.x.block_until_ready()
    t0 = time.perf_counter()
    r2 = plain(A, b)
    r2.x.block_until_ready()
    dt2 = time.perf_counter() - t0
    print(f"plain cg warm: {dt2:.3f}s iters={int(r2.iterations)} "
          f"conv={bool(r2.converged)} rel={float(r2.rnorm/r2.rnorm0):.2e} "
          f"({dt2/max(int(r2.iterations),1)*1e3:.3f} ms/iter)")


if __name__ == "__main__":
    main()
