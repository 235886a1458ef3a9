#!/usr/bin/env python
"""Ablations of the forward delayed-write symmetric DIA kernel on a fast
chip: is the residual stored-fraction gap (59%% vs vanilla 80%%) compute
(transpose scatter chain) or structure?"""
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
    _spmv_dia_pallas_2d,
    dia_halo_rows,
    _pick_tile_rows,
)

K = 30


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out[7, 5])
    return (time.perf_counter() - t0) / K


def _fwd_kernel(
    d_ref,      # (TR, K*128) VMEM — interleaved lower-tri diagonals
                #   (grid-pipelined: ONE contiguous HBM chunk per step)
    x_hbm,      # (nrows, 128) ANY — unframed x, windows DMA'd manually
    y_ref,      # (TR, 128) VMEM — output tile (pipelined)
    xwin,       # (2, TR + HR, 128) VMEM scratch (LOWER halo only)
    carry,      # (HR, 128) f32 scratch — transpose spill into the next tile
    xsem,       # (2,) DMA semaphores
    *,
    offsets: tuple[int, ...],
    tr: int,
    hr: int,
    n_tiles: int,
    sub: int,
    mode: str = "full",
):
    """Symmetric DIA SpMV: A = L + D + L^T with only offsets <= 0 stored.

    The transpose of a stored entry A[r, r+o] (o < 0) contributes
    y[r+o] += d_o[r] * x[r] — a BACKWARD scatter. Instead of gathering it
    from haloed d/x windows (measured ~60%% of the copy roofline: the extra
    manual haloed DMA stream breaks the pipelining that gives the vanilla
    kernel ~80%%), this kernel scatters each tile's aligned product
    d_o[r]*x[r] backward and DELAYS the y write by one grid step: step i
    computes tile i's accumulator into persistent scratch and finalizes
    tile i-1's output block as saved_acc + this tile's spill (the grid is
    sequential under "arbitrary" semantics; the grid has n_tiles+1 steps
    and the y index map revisits block 0 at step 0). Grid order stays
    ASCENDING — a reversed grid measured ~9%% slower (descending HBM
    streams defeat prefetch, tools/exp_reverse_order.py). d pipelines
    exactly like the vanilla kernel (no halo at all) and x needs only a
    lower halo — no scatter primitives, no atomics, ~40%% less matrix
    traffic than full storage for a 5-point stencil.
    """
    i = pl.program_id(0)  # step i processes tile i, writes y block i-1
    wrows = tr + hr

    # x window for tile t covers rows [t*tr - hr, t*tr + tr); tile 0 clamps
    # to the domain and zeros the out-of-domain top (zero Dirichlet halo).
    def x_start(slot, t):
        @pl.when(t == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr), :],
                xwin.at[slot, pl.ds(hr, tr), :], xsem.at[slot],
            ).start()

        if n_tiles > 1:
            @pl.when(t > 0)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of(t * tr - hr, sub), wrows), :],
                    xwin.at[slot], xsem.at[slot],
                ).start()

    def x_wait(slot, t):
        @pl.when(t == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr), :],
                xwin.at[slot, pl.ds(hr, tr), :], xsem.at[slot],
            ).wait()

        if n_tiles > 1:
            @pl.when(t > 0)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of(t * tr - hr, sub), wrows), :],
                    xwin.at[slot], xsem.at[slot],
                ).wait()

    @pl.when(i == 0)
    def _():
        x_start(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        x_start((i + 1) % 2, i + 1)

    @pl.when(i < n_tiles)
    def _():
        x_wait(i % 2, i)

    @pl.when(i == 0)
    def _():
        xwin[i % 2, 0:hr, :] = jnp.zeros((hr, LANES), xwin.dtype)

    xw = xwin[i % 2]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)

    def gather_shift(t):
        """x window rows viewed at flat element offset t in [0, hr*128]
        (y-row r reads xw flat element r*128 + t; f32 result — sub-32-bit
        windows upcast before the lane rotate, which Mosaic only implements
        for 32-bit data)."""
        q, rr = divmod(t, LANES)
        if rr == 0:
            return xw[q : q + tr, :].astype(jnp.float32)
        r0 = pltpu.roll(xw[q : q + tr, :].astype(jnp.float32), LANES - rr, 1)
        r1 = pltpu.roll(
            xw[q + 1 : q + tr + 1, :].astype(jnp.float32), LANES - rr, 1
        )
        return jnp.where(lane < LANES - rr, r0, r1)

    def scatter_shift(prod, t):
        """prod (tr, 128) placed at flat element offset t of an extended
        (hr + tr, 128) array whose row 0 is tile row -hr (zero-filled
        elsewhere); t in [0, hr*128). The shift is a permutation, so the
        backward scatter is a static relayout: one lane-roll + zero-row
        concats."""
        q, rr = divmod(t, LANES)

        def cat(*parts):
            # Mosaic rejects zero-row vectors; drop empty padding pieces
            parts = [p for p in parts if p.shape[0] > 0]
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

        if rr == 0:
            return cat(
                jnp.zeros((q, LANES), jnp.float32),
                prod,
                jnp.zeros((hr - q, LANES), jnp.float32),
            )
        # extended row q+w: lanes >= rr hold prod row w (rolled), lanes < rr
        # the lane-wrap of prod row w-1
        r0 = pltpu.roll(prod, rr, 1)
        r0a = cat(r0, jnp.zeros((1, LANES), jnp.float32))
        r0b = cat(jnp.zeros((1, LANES), jnp.float32), r0)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (tr + 1, LANES), 1)
        mid = jnp.where(lane1 >= rr, r0a, r0b)
        return cat(
            jnp.zeros((q, LANES), jnp.float32),
            mid,
            jnp.zeros((hr - q - 1, LANES), jnp.float32),
        )

    xa = xw[hr : hr + tr, :].astype(jnp.float32)  # aligned x rows of the tile
    acc = jnp.zeros((tr, LANES), jnp.float32)
    spill = jnp.zeros((hr, LANES), jnp.float32)
    for kk, off in enumerate(offsets):
        dk = d_ref[:, kk * LANES : (kk + 1) * LANES]  # free lane-slice view
        # forward: y[j] += d_o[j] * x[j + o]  (o <= 0: lower window)
        acc = acc + dk.astype(jnp.float32) * gather_shift(hr * LANES + off)
        if off < 0 and mode != "noT":
            # transpose: y[j+o] += d_o[j] * x[j] — the ALIGNED product
            # scattered backward; the head spills into the PREVIOUS tile's
            # output block, finalized this step
            ext = scatter_shift(dk.astype(jnp.float32) * xa, hr * LANES + off)
            acc = acc + ext[hr : hr + tr, :]
            spill = spill + ext[0:hr, :]
    # (at step n_tiles d_ref/xw hold stale data and acc/spill are garbage,
    # but only ``prev`` is written then — the final tile receives no spill)
    prev = carry[...]

    @pl.when((i > 0) & (i < n_tiles))
    def _():
        y_ref[:, :] = jnp.concatenate(
            [prev[0 : tr - hr, :], prev[tr - hr : tr, :] + spill]
        ).astype(y_ref.dtype)

    @pl.when(i == n_tiles)
    def _():
        y_ref[:, :] = prev.astype(y_ref.dtype)

    @pl.when(i < n_tiles)
    def _():
        carry[...] = acc




@functools.partial(jax.jit, static_argnames=("offsets", "tr", "hr", "mode"))
def _sym_fwd(data, x2, offsets, tr, hr, mode):
    nrows, klanes = data.shape
    k = klanes // LANES
    n_tiles = nrows // tr
    sub = 16 if tr % 16 == 0 else 8
    kern = functools.partial(_fwd_kernel, offsets=offsets, tr=tr, hr=hr,
                             n_tiles=n_tiles, sub=sub, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(n_tiles + 1,),
        in_specs=[
            pl.BlockSpec((tr, k * LANES),
                         lambda i: (jnp.minimum(i, n_tiles - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tr, LANES),
                               lambda i: (jnp.maximum(i - 1, 0), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tr + hr, LANES), x2.dtype),
            pltpu.VMEM((tr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(data, x2)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    a = create_laplace_2d(3200, dtype=np.float32)
    d = csr_to_dia(a, row_align=1024, dtype=np.float32)
    ds = csr_to_dia(a, row_align=1024, dtype=np.float32, symmetric=True)
    nrows = ds.nrows_pad // LANES
    hr = dia_halo_rows(ds)
    tr_v = _pick_tile_rows(nrows, len(d.offsets), hr, 4)
    tr_s = _pick_tile_rows(nrows, len(ds.offsets), hr, 4, sym=True)
    print(f"nrows={nrows} tr_v={tr_v} tr_s={tr_s} hr={hr}", flush=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (nrows, LANES)).astype(np.float32))

    def loop_v():
        @jax.jit
        def f(dd, u):
            return jax.lax.fori_loop(
                0, K, lambda i, u: _spmv_dia_pallas_2d(
                    dd, u, d.offsets, tr_v, hr), u)
        return f

    def loop_s(t, mode):
        @jax.jit
        def f(dd, u):
            return jax.lax.fori_loop(
                0, K, lambda i, u: _sym_fwd(dd, u, ds.offsets, t, hr, mode),
                u)
        return f

    variants = {
        "van": (loop_v(), d.data),
        "sym_full": (loop_s(tr_s, "full"), ds.data),
        "sym_noT": (loop_s(tr_s, "noT"), ds.data),
        "sym_tr632": (loop_s(632, "full"), ds.data),
    }

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
        for name, (f, dd) in variants.items():
            dt = timed(f, (dd, x))
            if trial:
                best[name] = min(best[name], dt)
    roof = 2 * n * 4 / t_c / 1e9
    vb = (len(d.offsets) + 2) * nrows * LANES * 4
    sb = (len(ds.offsets) + 2) * nrows * LANES * 4
    print(f"copy roofline {roof:.0f} GB/s", flush=True)
    for name, t in best.items():
        stored = vb if name == "van" else sb
        print(f"{name:10}: {t*1e3:.3f} ms  stored {100*stored/t/1e9/roof:5.1f}%"
              f"  effective {100*vb/t/1e9/roof:5.1f}%", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
