#!/usr/bin/env python
"""Double-single DIA kernel on chip: correctness vs f64 oracle + throughput
vs the XLA f64 path (same operator, same-run comparisons)."""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp

K = 10
LANES = 128


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    _ = float(leaf.reshape(-1)[7])
    return (time.perf_counter() - t0) / K


def main():
    from spmv_tpu.ds import ds_from_f64, ds_to_f64
    from spmv_tpu.formats.dia import csr_to_dia
    from spmv_tpu.gen import create_laplace_2d
    from spmv_tpu.ops.spmv_dia import spmv_dia
    from spmv_tpu.ops.spmv_dia_ds_pallas import (
        csr_to_dia_ds,
        spmv_dia_ds,
        spmv_dia_ds_pallas_2d,
    )

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)

    # correctness on chip
    a = create_laplace_2d(300, 300)
    a.values[:] = a.values * (1 + 1e-9 * rng.standard_normal(a.nnz))
    d = csr_to_dia_ds(a, row_align=1024)
    x = rng.standard_normal(a.nrows) * 1e3
    y = spmv_dia_ds(d, x)[: a.nrows]
    want = a.matvec(x)
    err = np.linalg.norm(y - want) / np.linalg.norm(want)
    print(f"on-chip DS correctness: rel err {err:.2e}", flush=True)
    if err > 1e-12:
        print("WARN-DS: on-chip error above f64-class threshold", flush=True)

    # throughput at 2.56M rows (same config as the f64 XLA measurement)
    nx = 1600
    a = create_laplace_2d(nx, nx)
    d = csr_to_dia_ds(a, row_align=1024)
    xh, xl = ds_from_f64(np.full(d.nrows_pad, 1e-3))
    xh2 = jnp.asarray(xh.reshape(-1, LANES))
    xl2 = jnp.asarray(xl.reshape(-1, LANES))

    @jax.jit
    def ds_loop(dd, uh, ul):
        def body(i, c):
            uh, ul = c
            yh, yl = spmv_dia_ds_pallas_2d(dd, uh, ul)
            return (yh * jnp.float32(0.125), yl * jnp.float32(0.125))
        return jax.lax.fori_loop(0, K, body, (uh, ul))

    # f64 XLA reference loop (x64 scoped on just for it)
    n = 32 * 1024 * 1024

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(0, K, lambda i, u: u * jnp.float32(1.0000001), v)

    t_ds = t_c = 1e9
    for _ in range(3):
        t_c = min(t_c, timed(copy_loop, (jnp.ones((n // 128, 128), jnp.float32),)))
        out = None
        t0 = time.perf_counter()
        out = ds_loop(d, xh2, xl2)
        _ = float(out[0].reshape(-1)[7])
        t_ds = min(t_ds, (time.perf_counter() - t0) / K)
    roof32 = 2 * n * 4 / t_c / 1e9
    traffic = (2 * d.data_hi.size + 4 * d.nrows_pad) * 4
    print(f"f32 roofline {roof32:.0f} GB/s", flush=True)
    print(f"DS kernel: {t_ds*1e3:.3f} ms/apply = {traffic/t_ds/1e9:.0f} GB/s "
          f"({100*traffic/t_ds/1e9/roof32:.1f}% of f32 roofline) | "
          f"{2*a.nnz/t_ds/1e9:.1f} GFLOP/s-equivalent", flush=True)

    # SAME-RUN f64 XLA comparison (x64 scoped on for it)
    jax.config.update("jax_enable_x64", True)
    d64 = csr_to_dia(a, row_align=1024)
    xp = jnp.asarray(np.full(d64.nrows_pad, 1e-3, np.float64))

    @jax.jit
    def loop64(dd, v):
        return jax.lax.fori_loop(
            0, K, lambda i, u: spmv_dia(dd, u, method="xla") * 0.125, v)

    t64 = 1e9
    for _ in range(3):
        t64 = min(t64, timed(loop64, (d64, xp)))
    print(f"f64 XLA same-run: {t64*1e3:.3f} ms/apply -> DS speedup "
          f"{t64/t_ds:.1f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
