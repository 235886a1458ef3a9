#!/usr/bin/env python
"""Same-run: symmetric (3-diagonal lower-tri) vs vanilla (5-diagonal) DIA
kernel at 10.24M rows with the interleaved layout."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 30


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out[7, 5])
    return (time.perf_counter() - t0) / K


def main():
    from spmv_tpu.formats.dia import csr_to_dia
    from spmv_tpu.gen import create_laplace_2d
    from spmv_tpu.ops.spmv_dia_pallas import dia_to_2d, spmv_dia_pallas_2d

    print("platform:", jax.devices()[0].platform, flush=True)
    nx = 3200
    a = create_laplace_2d(nx, nx, dtype=np.float32)
    dv = csr_to_dia(a, row_align=1024, dtype=np.float32)
    ds = csr_to_dia(a, row_align=1024, dtype=np.float32, symmetric=True)
    x2 = dia_to_2d(dv, jnp.full((dv.nrows_pad,), 1e-3, jnp.float32))
    scale = jnp.float32(0.125)

    def loop(d):
        @jax.jit
        def f(dd, u):
            return jax.lax.fori_loop(
                0, K, lambda i, u: spmv_dia_pallas_2d(dd, u) * scale, u)
        return f

    fv, fs = loop(dv), loop(ds)
    tv = ts = 1e9
    for _ in range(4):
        tv = min(tv, timed(fv, (dv, x2)))
        ts = min(ts, timed(fs, (ds, x2)))
    print(f"vanilla  (5 diags): {tv*1e3:.3f} ms/apply", flush=True)
    print(f"symmetric(3 diags): {ts*1e3:.3f} ms/apply "
          f"({tv/ts:.2f}x vanilla, {100*(1-ts/tv):.0f}% faster)", flush=True)
    # correctness cross-check on chip
    yv = np.asarray(fv(dv, x2))
    ys = np.asarray(fs(ds, x2))
    rel = np.linalg.norm(yv - ys) / np.linalg.norm(yv)
    print(f"sym-vs-vanilla rel diff: {rel:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
