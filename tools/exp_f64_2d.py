#!/usr/bin/env python
"""fp64 DIA SpMV on TPU: current 1-D XLA formulation vs a 2-D lane-layout
XLA formulation (shifts decomposed into row-shifts + lane roll/select, like
the Pallas kernel but in pure jnp — XLA TPU emulates f64 elementwise)."""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

K = 10
LANES = 128


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out.reshape(-1)[7])
    return (time.perf_counter() - t0) / K


def spmv_dia_2d_xla(data2, offsets, x2):
    """data2 (R, K*128) interleaved f64, x2 (R,128) -> y2 (R,128).
    Shift by offset o = q rows + r lanes: row-shift via pad/slice on the
    row axis, lane shift via two rolls + select (vectorized over rows)."""
    r_rows = x2.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_rows, LANES), 1)
    acc = None
    k = data2.shape[1] // LANES
    for kk, off in enumerate(offsets):
        q, rr = divmod(off, LANES)

        def row_shift(a, q):
            if q == 0:
                return a
            if q > 0:
                return jnp.concatenate(
                    [a[q:], jnp.zeros((q, LANES), a.dtype)], axis=0)
            return jnp.concatenate(
                [jnp.zeros((-q, LANES), a.dtype), a[:q]], axis=0)

        if rr == 0:
            v = row_shift(x2, q)
        else:
            a0 = row_shift(x2, q)
            a1 = row_shift(x2, q + 1)
            r0 = jnp.roll(a0, LANES - rr, axis=1)
            r1 = jnp.roll(a1, LANES - rr, axis=1)
            v = jnp.where(lane < LANES - rr, r0, r1)
        term = data2[:, kk * LANES:(kk + 1) * LANES] * v
        acc = term if acc is None else acc + term
    return acc


def main():
    from spmv_tpu.formats.dia import csr_to_dia
    from spmv_tpu.gen import create_laplace_2d
    from spmv_tpu.ops.spmv_dia import spmv_dia

    print("platform:", jax.devices()[0].platform, flush=True)
    nx = 1600
    a = create_laplace_2d(nx, nx)  # f64, 2.56M rows
    d = csr_to_dia(a, row_align=1024)
    x = np.random.default_rng(0).standard_normal(a.nrows)
    xp = jnp.asarray(np.pad(x, (0, d.nrows_pad - a.nrows)))
    x2 = xp.reshape(-1, LANES)

    # correctness of the 2-D formulation
    y2 = np.asarray(jax.jit(spmv_dia_2d_xla, static_argnames="offsets")(
        d.data, d.offsets, x2)).reshape(-1)
    want = a.matvec(x)
    err = np.linalg.norm(y2[: a.nrows] - want) / np.linalg.norm(want)
    print(f"2-D f64 formulation rel err: {err:.2e}", flush=True)
    assert err < 1e-14

    @jax.jit
    def loop1d(dd, v):
        return jax.lax.fori_loop(
            0, K, lambda i, u: spmv_dia(dd, u, method="xla") * 0.125, v)

    @jax.jit
    def loop2d(dd, v):
        return jax.lax.fori_loop(
            0, K,
            lambda i, u: spmv_dia_2d_xla(dd, d.offsets, u) * 0.125, v)

    n = 32 * 1024 * 1024

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(0, K, lambda i, u: u * 1.0000001, v)

    t1 = t2 = tc = 1e9
    for _ in range(3):
        tc = min(tc, timed(copy_loop, (jnp.ones((n // 128, 128)),)))
        t1 = min(t1, timed(loop1d, (d, xp)))
        t2 = min(t2, timed(loop2d, (d.data, x2)))
    roof = 2 * n * 8 / tc / 1e9
    traffic = (d.data.size + 2 * d.nrows_pad) * 8
    print(f"f64 roofline (copy): {roof:.0f} GB/s", flush=True)
    print(f"1-D XLA: {t1*1e3:.3f} ms = {traffic/t1/1e9:.0f} GB/s "
          f"({100*traffic/t1/1e9/roof:.1f}%)", flush=True)
    print(f"2-D XLA: {t2*1e3:.3f} ms = {traffic/t2/1e9:.0f} GB/s "
          f"({100*traffic/t2/1e9/roof:.1f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
