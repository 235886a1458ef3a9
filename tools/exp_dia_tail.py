#!/usr/bin/env python
"""DIA kernel perf tail: sweep tile sizes / VMEM budgets on the 10M-row
bench config to push 87% -> 92%+ of roofline (NEXT.md section 4)."""
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
    import spmv_tpu.ops.spmv_dia_pallas as dp
    from spmv_tpu.formats.dia import csr_to_dia
    from spmv_tpu.gen import create_laplace_2d

    print("platform:", jax.devices()[0].platform, flush=True)
    nx = 3200
    a = create_laplace_2d(nx, nx, dtype=np.float32)
    d = csr_to_dia(a, row_align=1024, dtype=np.float32)
    nrows = d.nrows_pad // 128
    hr = dp.dia_halo_rows(d)
    k = len(d.offsets)
    print(f"nrows(lane)={nrows} hr={hr} k={k}", flush=True)

    n = 64 * 1024 * 1024

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(0, K, lambda i, u: u * jnp.float32(1.0000001), v)

    x2 = dp.dia_to_2d(d, jnp.full((d.nrows_pad,), 1e-3, jnp.float32))
    scale = jnp.float32(0.125)

    # candidate tiles: actual divisors of nrows, multiples of 8, >= hr,
    # VMEM-feasible under ~100 MB
    def fits(tr):
        return (2 * (tr + 2 * hr) + 2 * k * tr + 2 * tr) * 128 * 4 < 100e6
    cands = sorted({t for t in range(8, nrows + 1, 8)
                    if nrows % t == 0 and t >= hr and fits(t)})[-8:]
    print("candidates:", cands, flush=True)

    copy_best = None
    for tr in cands:
        @jax.jit
        def spmv_loop(dd_data, u, tr=tr):
            def body(i, u):
                return dp._spmv_dia_pallas_2d(
                    dd_data, u, d.offsets, tr, hr
                ) * scale
            return jax.lax.fori_loop(0, K, body, u)

        try:
            t_c = timed(copy_loop, (jnp.ones((n // 128, 128), jnp.float32),))
            t_s = timed(spmv_loop, (d.data, x2))
            for _ in range(2):
                t_c = min(t_c, timed(copy_loop, (jnp.ones((n // 128, 128), jnp.float32),)))
                t_s = min(t_s, timed(spmv_loop, (d.data, x2)))
            roof = 2 * n * 4 / t_c / 1e9
            traffic = d.data.size * 4 + 2 * d.nrows_pad * 4
            gbs = traffic / t_s / 1e9
            print(f"tr={tr}: {t_s*1e3:.3f} ms | {gbs:.0f} GB/s "
                  f"({100*gbs/roof:.1f}% of {roof:.0f})", flush=True)
        except Exception as e:
            print(f"tr={tr}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
