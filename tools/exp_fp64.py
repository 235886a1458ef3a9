#!/usr/bin/env python
"""fp64 on TPU: measure the XLA DIA path (the fp64 fallback — Pallas/Mosaic
has no f64 vectors, the MXU no f64) vs the fp32 Pallas kernel, and check
end-to-end fp64 CG correctness on chip. Documents the fp64 story
(VERDICT round-1 item: 'measure and document')."""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

K = 10


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out.reshape(-1)[7])
    return (time.perf_counter() - t0) / K


def main():
    from spmv_tpu.formats.dia import csr_to_dia
    from spmv_tpu.gen import create_laplace_2d, gaussian_bump
    from spmv_tpu.ops.spmv_dia import spmv_dia
    from spmv_tpu.ops.spmv_dia_pallas import dia_to_2d, spmv_dia_pallas_2d
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.cg import cg

    print("platform:", jax.devices()[0].platform,
          "x64:", jax.config.jax_enable_x64, flush=True)
    nx = 1600  # 2.56M rows (f64 arrays are heavy through the tunnel)
    a = create_laplace_2d(nx, nx)  # float64

    # correctness: XLA DIA path in f64 on chip
    d64 = csr_to_dia(a, row_align=1024)
    x = np.random.default_rng(0).standard_normal(a.nrows)
    xp = jnp.asarray(np.pad(x, (0, d64.nrows_pad - a.nrows)))
    f64_apply = jax.jit(lambda dd, v: spmv_dia(dd, v, method="xla"))
    y = np.asarray(f64_apply(d64, xp))[: a.nrows]
    err64 = np.linalg.norm(y - a.matvec(x)) / np.linalg.norm(a.matvec(x))
    print(f"XLA DIA fp64 on chip: rel err {err64:.2e}", flush=True)

    # throughput: f64 XLA vs f32 Pallas, same operator
    @jax.jit
    def loop64(dd, v):
        return jax.lax.fori_loop(
            0, K, lambda i, u: spmv_dia(dd, u, method="xla") * 0.125, v)

    d32 = csr_to_dia(a, row_align=1024, dtype=np.float32)
    x232 = dia_to_2d(d32, jnp.full((d32.nrows_pad,), 1e-3, jnp.float32))

    # Mosaic lowering of the fp32 kernel recurses infinitely under x64
    # (jax-internal canonicalization loop; SKILL.md gotcha) — scope it off
    jax.config.update("jax_enable_x64", False)

    @jax.jit
    def loop32(dd, v):
        return jax.lax.fori_loop(
            0, K, lambda i, u: spmv_dia_pallas_2d(dd, u) * jnp.float32(0.125), v)

    t32 = 1e9
    for _ in range(3):
        t32 = min(t32, timed(loop32, (d32, x232)))
    jax.config.update("jax_enable_x64", True)

    t64 = 1e9
    for _ in range(3):
        t64 = min(t64, timed(loop64, (d64, xp)))
    tr64 = (d64.data.size + 2 * d64.nrows_pad) * 8
    tr32 = (d32.data.size + 2 * d32.nrows_pad) * 4
    print(f"fp64 XLA:   {t64*1e3:.3f} ms/apply = {tr64/t64/1e9:.0f} GB/s", flush=True)
    print(f"fp32 Pallas:{t32*1e3:.3f} ms/apply = {tr32/t32/1e9:.0f} GB/s", flush=True)

    # end-to-end fp64 distributed CG on chip (1-dev mesh)
    A = build_dist_matrix(a, n_devices=1, symmetric=True)
    b = A.to_dist(gaussian_bump(a.nrows))
    res = jax.jit(lambda A_, bb: cg(A_.as_linear_operator(), bb,
                                    kmax=50, rtol=1e-12))(A, b)
    xh = A.from_dist(res.x)
    r = a.matvec(xh) - gaussian_bump(a.nrows)
    print(f"fp64 dist CG on chip: 50 its, |r| consistency "
          f"{abs(np.linalg.norm(r) - float(res.rnorm)) / float(res.rnorm):.2e}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
