#!/usr/bin/env python
"""Does a REVERSED grid order (descending HBM block addresses) cost
bandwidth? Same-run A/B of the vanilla DIA kernel with forward vs reversed
d/y index maps (the symmetric carry kernel processes tiles last-to-first;
if reversal alone explains its stored-fraction gap, the fix is a
forward-order carry variant with delayed y writes)."""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spmv_tpu.formats.dia import csr_to_dia  # noqa: E402
from spmv_tpu.gen import create_laplace_2d  # noqa: E402
from spmv_tpu.ops.spmv_dia_pallas import (  # noqa: E402
    LANES,
    _dia_kernel,
    dia_halo_rows,
    _pick_tile_rows,
)

K = 30


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out[7, 5])
    return (time.perf_counter() - t0) / K


def _rev_dia_kernel(d_ref, x_hbm, y_ref, xwin, xsem, *, offsets, tr, hr,
                    n_tiles, sub):
    """The vanilla kernel body with tile = n_tiles-1-i (matching reversed
    index maps)."""
    i = pl.program_id(0)
    tile = n_tiles - 1 - i
    wrows = tr + 2 * hr

    def dma_mid(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(t * tr - hr, sub), wrows), :],
            xwin.at[slot], xsem.at[slot])

    def dma_first(slot):
        rows = min(tr + hr, n_tiles * tr)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, rows), :],
            xwin.at[slot, pl.ds(hr, rows), :], xsem.at[slot])

    def dma_last(slot):
        rows = min(tr + hr, n_tiles * tr)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(n_tiles * tr - rows, rows), :],
            xwin.at[slot, pl.ds(0, rows), :], xsem.at[slot])

    def start(slot, t):
        @pl.when(t == 0)
        def _():
            dma_first(slot).start()

        @pl.when(t == n_tiles - 1)
        def _():
            dma_last(slot).start()

        @pl.when((t > 0) & (t < n_tiles - 1))
        def _():
            dma_mid(slot, t).start()

    def wait(slot, t):
        @pl.when(t == 0)
        def _():
            dma_first(slot).wait()

        @pl.when(t == n_tiles - 1)
        def _():
            dma_last(slot).wait()

        @pl.when((t > 0) & (t < n_tiles - 1))
        def _():
            dma_mid(slot, t).wait()

    @pl.when(i == 0)
    def _():
        start(0, n_tiles - 1)

    @pl.when(i + 1 < n_tiles)
    def _():
        start((i + 1) % 2, tile - 1)

    wait(i % 2, tile)

    @pl.when(tile == 0)
    def _():
        xwin[i % 2, 0:hr, :] = jnp.zeros((hr, LANES), xwin.dtype)

    @pl.when(tile == n_tiles - 1)
    def _():
        xwin[i % 2, tr + hr: wrows, :] = jnp.zeros((hr, LANES), xwin.dtype)

    xw = xwin[i % 2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)
    acc = jnp.zeros((tr, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        t = hr * LANES + off
        q, r = divmod(t, LANES)
        if r == 0:
            v = xw[q: q + tr, :].astype(jnp.float32)
        else:
            r0 = pltpu.roll(xw[q: q + tr, :].astype(jnp.float32),
                            LANES - r, 1)
            r1 = pltpu.roll(xw[q + 1: q + tr + 1, :].astype(jnp.float32),
                            LANES - r, 1)
            v = jnp.where(lane < LANES - r, r0, r1)
        acc = acc + d_ref[:, k * LANES:(k + 1) * LANES].astype(jnp.float32) * v
    y_ref[:, :] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "tr", "hr", "rev"))
def _van(data, x2, offsets, tr, hr, rev):
    nrows, klanes = data.shape
    k = klanes // LANES
    n_tiles = nrows // tr
    sub = 16 if tr % 16 == 0 else 8
    kern = functools.partial(
        _rev_dia_kernel if rev else _dia_kernel,
        offsets=offsets, tr=tr, hr=hr, n_tiles=n_tiles, sub=sub)
    imap = (lambda i: (n_tiles - 1 - i, 0)) if rev else (lambda i: (i, 0))
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tr, k * LANES), imap,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tr, LANES), imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * hr, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(data, x2)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    a = create_laplace_2d(3200, dtype=np.float32)
    d = csr_to_dia(a, row_align=1024, dtype=np.float32)
    nrows = d.nrows_pad // LANES
    hr = dia_halo_rows(d)
    tr = _pick_tile_rows(nrows, len(d.offsets), hr, 4)
    print(f"nrows={nrows} tr={tr}", flush=True)

    x_rand = jnp.asarray(
        np.random.default_rng(0).standard_normal((nrows, LANES))
        .astype(np.float32))

    def loop(rev):
        @jax.jit
        def f(dd, u):
            return jax.lax.fori_loop(
                0, K, lambda i, u: _van(dd, u, d.offsets, tr, hr, rev), u)
        return f

    fwd, rev = loop(False), loop(True)
    # correctness cross-check
    yf = fwd(d.data, x_rand)
    yr = rev(d.data, x_rand)
    print("fwd-vs-rev max diff:",
          float(jnp.max(jnp.abs(yf - yr))), flush=True)

    n = 64 * 1024 * 1024

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(
            0, K, lambda i, u: u * jnp.float32(1.0000001), v)

    cbuf = jnp.ones((n // 128, 128), jnp.float32)
    best = {"fwd": 1e9, "rev": 1e9}
    t_c = 1e9
    for trial in range(5):
        t_c = min(t_c, timed(copy_loop, (cbuf,)))
        for name, f in (("fwd", fwd), ("rev", rev)):
            dt = timed(f, (d.data, x_rand))
            if trial:
                best[name] = min(best[name], dt)
    roof = 2 * n * 4 / t_c / 1e9
    vb = (len(d.offsets) + 2) * nrows * LANES * 4
    print(f"copy roofline {roof:.0f} GB/s", flush=True)
    for name, t in best.items():
        print(f"{name}: {t*1e3:.3f} ms  stored {100*vb/t/1e9/roof:5.1f}%",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
