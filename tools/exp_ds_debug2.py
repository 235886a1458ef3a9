#!/usr/bin/env python
"""Isolate which lo-plane the compiled DS kernel drops: inject large values
into data_lo / x_lo separately and check whether the output responds."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spmv_tpu.gen import create_laplace_2d
from spmv_tpu.ops.spmv_dia_ds_pallas import (
    csr_to_dia_ds, spmv_dia_ds_pallas_2d,
)
from spmv_tpu.ds import ds_from_f64

LANES = 128


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    a = create_laplace_2d(300, 300)
    d = csr_to_dia_ds(a, row_align=1024)
    rng = np.random.default_rng(0)
    xh, xl = ds_from_f64(rng.standard_normal(d.nrows_pad))
    xh2, xl2 = jnp.asarray(xh.reshape(-1, LANES)), jnp.asarray(xl.reshape(-1, LANES))

    import dataclasses
    y0h, y0l = spmv_dia_ds_pallas_2d(d, xh2, xl2)
    base = np.asarray(y0h, np.float64) + np.asarray(y0l, np.float64)

    # inject BIG data_lo
    d_big = dataclasses.replace(d, data_lo=jnp.ones_like(d.data_lo))
    y1h, y1l = spmv_dia_ds_pallas_2d(d_big, xh2, xl2)
    v1 = np.asarray(y1h, np.float64) + np.asarray(y1l, np.float64)
    print("data_lo responds:", not np.allclose(v1, base), flush=True)

    # inject BIG x_lo
    y2h, y2l = spmv_dia_ds_pallas_2d(d, xh2, jnp.ones_like(xl2))
    v2 = np.asarray(y2h, np.float64) + np.asarray(y2l, np.float64)
    print("x_lo responds:", not np.allclose(v2, base), flush=True)

    # interpret-mode references for the same injections
    y1i = spmv_dia_ds_pallas_2d(d_big, xh2, xl2, interpret=True)
    v1i = np.asarray(y1i[0], np.float64) + np.asarray(y1i[1], np.float64)
    print("data_lo injected matches interpret:",
          float(np.abs(v1 - v1i).max()), flush=True)
    y2i = spmv_dia_ds_pallas_2d(d, xh2, jnp.ones_like(xl2), interpret=True)
    v2i = np.asarray(y2i[0], np.float64) + np.asarray(y2i[1], np.float64)
    print("x_lo injected matches interpret:",
          float(np.abs(v2 - v2i).max()), flush=True)

    # baseline vs interpret
    yb = spmv_dia_ds_pallas_2d(d, xh2, xl2, interpret=True)
    vb = np.asarray(yb[0], np.float64) + np.asarray(yb[1], np.float64)
    print("baseline compiled-vs-interpret max abs diff:",
          float(np.abs(base - vb).max()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
