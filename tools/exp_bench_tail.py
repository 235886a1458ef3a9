#!/usr/bin/env python
"""Same-run A/B on the bench geometry (row_align=1024, nrows=80000 lane
rows): does the per-iteration scale epilogue, the start-vector content, or
the symmetric tile size explain the vanilla 78.9%-vs-63.6% and symmetric
65.6%-vs-54.2% stored-fraction spread seen across bench/exp runs?"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spmv_tpu.formats.dia import csr_to_dia  # noqa: E402
from spmv_tpu.gen import create_laplace_2d  # noqa: E402
from spmv_tpu.ops.spmv_dia_pallas import (  # noqa: E402
    LANES,
    _spmv_dia_pallas_2d,
    _spmv_dia_sym_pallas_2d,
    dia_halo_rows,
    _pick_tile_rows,
)

K = 30


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out[7, 5])
    return (time.perf_counter() - t0) / K


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    a = create_laplace_2d(3200, dtype=np.float32)
    d = csr_to_dia(a, row_align=1024, dtype=np.float32)
    ds = csr_to_dia(a, row_align=1024, dtype=np.float32, symmetric=True)
    nrows = d.nrows_pad // LANES
    hr = dia_halo_rows(d)
    tr_v = _pick_tile_rows(nrows, len(d.offsets), hr, 4)
    tr_s = _pick_tile_rows(nrows, len(ds.offsets), hr, 4, sym=True)
    print(f"nrows={nrows} tr_v={tr_v} tr_s={tr_s}", flush=True)

    scale = jnp.float32(0.125)

    def loop_van(t, with_scale):
        @jax.jit
        def loop(dd, u):
            def body(i, u):
                y = _spmv_dia_pallas_2d(dd, u, d.offsets, t, hr)
                return y * scale if with_scale else y
            return jax.lax.fori_loop(0, K, body, u)
        return loop

    def loop_sym(t):
        @jax.jit
        def loop(dd, u):
            return jax.lax.fori_loop(
                0, K,
                lambda i, u: _spmv_dia_sym_pallas_2d(dd, u, ds.offsets, t, hr),
                u)
        return loop

    x_const = jnp.full((nrows, LANES), 1e-3, jnp.float32)
    x_rand = jnp.asarray(
        np.random.default_rng(0).standard_normal((nrows, LANES))
        .astype(np.float32))

    variants = {
        "van_noscale_rand": (loop_van(tr_v, False), (d.data, x_rand)),
        "van_noscale_const": (loop_van(tr_v, False), (d.data, x_const)),
        "van_scale_rand": (loop_van(tr_v, True), (d.data, x_rand)),
        f"sym_tr{tr_s}_rand": (loop_sym(tr_s), (ds.data, x_rand)),
    }
    for t_alt in (800, 1000, 1264 if nrows % 1264 == 0 else 1600):
        if nrows % t_alt == 0 and t_alt != tr_s:
            variants[f"sym_tr{t_alt}_rand"] = (
                loop_sym(t_alt), (ds.data, x_rand))

    n = 64 * 1024 * 1024

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(
            0, K, lambda i, u: u * jnp.float32(1.0000001), v)

    cbuf = jnp.ones((n // 128, 128), jnp.float32)
    best = {k: 1e9 for k in variants}
    t_c = 1e9
    for trial in range(5):
        t_c = min(t_c, timed(copy_loop, (cbuf,)))
        for name, (f, args) in variants.items():
            dt = timed(f, args)
            if trial:
                best[name] = min(best[name], dt)
    roof = 2 * n * 4 / t_c / 1e9
    print(f"copy roofline {roof:.0f} GB/s", flush=True)
    vb = (len(d.offsets) + 2) * nrows * LANES * 4
    sb = (len(ds.offsets) + 2) * nrows * LANES * 4
    for name, t in best.items():
        stored = sb if name.startswith("sym") else vb
        print(f"{name:20}: {t*1e3:.3f} ms  stored {100*stored/t/1e9/roof:5.1f}%"
              f"  effective {100*vb/t/1e9/roof:5.1f}%", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
