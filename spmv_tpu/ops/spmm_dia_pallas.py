"""Multi-RHS DIA SpMM — Y = A X for a block of vectors, matrix streamed ONCE.

SpMV is bandwidth-bound with the matrix dominating the traffic (k of the
k+2 streams for a k-diagonal operator). Applying A to nrhs vectors one at a
time re-reads the matrix nrhs times; this kernel reads it once:

    bytes(separate applies) / bytes(spmm) = nrhs (k + 2) / (k + 2 nrhs)

(2.3x for the 5-point Laplacian at nrhs=4). That block apply is the
foundation for multiple right-hand sides and block-Krylov methods — absent
from the reference (one vector everywhere, reference spmv/cg.cpp).

Layout: X and Y live in (nrows, nrhs*128) lane layout — per lane-row, the
nrhs vectors' 128-lane groups are concatenated, so element
(i, r*128 + j) is flat element i*128+j of RHS r. The per-tile x-window DMA
stays ONE contiguous chunk, and each RHS's lane rolls act on its own
128-lane slice with the same flat-offset arithmetic as the single-RHS
kernel (spmv_dia_pallas). jax.vmap over the single-RHS kernel is not an
option: the Pallas TPU lowering cannot batch ANY-space operands (measured),
and it would re-stream the matrix anyway.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.formats.dia import DiaMatrix
from spmv_tpu.ops.spmv_dia_pallas import (
    LANES,
    _mod2,
    _pick_tile_rows,
    _spmv_dia_sym_pallas_2d,
    _x_window_dma,
    dia_halo_rows,
)


def _dia_mrhs_kernel(
    data_ref,   # (TR, K*128) VMEM — interleaved diagonal data (pipelined)
    x_hbm,      # (nrows, NRHS*128) ANY — x block, windows DMA'd manually
    y_ref,      # (TR, NRHS*128) VMEM — output tile (pipelined)
    xwin,       # (2, TR + 2*HR, NRHS*128) VMEM scratch
    xsem,       # (2,) DMA semaphores
    *,
    offsets: tuple[int, ...],
    tr: int,
    hr: int,
    n_tiles: int,
    sub: int,
    nrhs: int,
):
    i = pl.program_id(0)
    wrows = tr + 2 * hr
    lanes_all = nrhs * LANES
    # f32 accumulation on TPU dtypes; f64 data (CPU/interpret — the oracle
    # path, spmm_dia_supported gates TPU to f32/bf16) accumulates in f64
    cdt = jnp.float64 if data_ref.dtype == jnp.float64 else jnp.float32

    start, wait = _x_window_dma(x_hbm, xwin, xsem, tr, hr, n_tiles, sub)

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        start(_mod2(i + 1), i + 1)

    wait(_mod2(i), i)

    @pl.when(i == 0)
    def _():
        xwin[_mod2(i), 0:hr, :] = jnp.zeros((hr, lanes_all), xwin.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        xwin[_mod2(i), tr + hr : wrows, :] = jnp.zeros(
            (hr, lanes_all), xwin.dtype
        )

    xw = xwin[_mod2(i)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)

    def shifted(r, t):
        """RHS r's window viewed at flat element offset t (same roll trick
        as the single-RHS kernel, on this RHS's 128-lane slice)."""
        sl = slice(r * LANES, (r + 1) * LANES)
        q, rr = divmod(t, LANES)
        if rr == 0:
            return xw[q : q + tr, sl].astype(cdt)
        r0 = pltpu.roll(xw[q : q + tr, sl].astype(cdt), np.int32(LANES - rr), 1)
        r1 = pltpu.roll(
            xw[q + 1 : q + tr + 1, sl].astype(cdt), np.int32(LANES - rr), 1
        )
        return jnp.where(lane < LANES - rr, r0, r1)

    accs = [jnp.zeros((tr, LANES), cdt) for _ in range(nrhs)]
    for kk, off in enumerate(offsets):
        dk = data_ref[:, kk * LANES : (kk + 1) * LANES].astype(cdt)
        for r in range(nrhs):
            accs[r] = accs[r] + dk * shifted(r, hr * LANES + off)
    y_ref[:, :] = jnp.concatenate(accs, axis=1).astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile_rows", "hr", "nrhs",
                              "interpret")
)
def _spmm_dia_pallas_2d(
    data, x2, offsets: tuple[int, ...], tile_rows: int, hr: int, nrhs: int,
    interpret: bool = False,
):
    nrows, klanes = data.shape
    k = klanes // LANES
    tr = tile_rows
    n_tiles = nrows // tr
    sub = 16 if tr % 16 == 0 else (8 if data.dtype.itemsize >= 4 else 16)
    kernel = functools.partial(
        _dia_mrhs_kernel, offsets=offsets, tr=tr, hr=hr, n_tiles=n_tiles,
        sub=sub, nrhs=nrhs,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tr, k * LANES), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tr, nrhs * LANES), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, nrhs * LANES), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * hr, nrhs * LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * nrows * LANES * nrhs,
            bytes_accessed=(k + 2 * nrhs) * nrows * LANES
            * data.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data, x2)


def _pick_tile_rows_mrhs(nrows: int, k: int, hr: int, itemsize: int,
                         nrhs: int) -> int:
    """Tile picker with nrhs-wide x window and y tiles — the shared divisor
    search (spmv_dia_pallas._pick_tile_rows) with the nrhs factor."""
    return _pick_tile_rows(nrows, k, hr, itemsize, nrhs=nrhs)


def spmm_dia_supported(a: DiaMatrix, nrhs: int) -> bool:
    if a.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if a.nrows_pad % (8 * LANES) != 0 or nrhs < 1:
        return False
    hr = dia_halo_rows(a)
    if hr > 512:
        return False
    return _pick_tile_rows(
        a.nrows_pad // LANES, len(a.offsets), hr, a.data.dtype.itemsize,
        sym=a.symmetric, nrhs=nrhs,
    ) > 0


def spmm_to_layout(a: DiaMatrix, x: jax.Array) -> jax.Array:
    """(n, nrhs) column block -> the kernel's (nrows, nrhs*128) layout."""
    npad = a.nrows_pad
    n, nrhs = x.shape
    xp = x if n == npad else jnp.zeros((npad, nrhs), x.dtype).at[:n].set(x)
    # (npad, nrhs) -> (rows, 128, nrhs) -> (rows, nrhs, 128)
    return (
        xp.reshape(npad // LANES, LANES, nrhs)
        .transpose(0, 2, 1)
        .reshape(npad // LANES, nrhs * LANES)
    )


def spmm_from_layout(y2: jax.Array, nrhs: int) -> jax.Array:
    """Inverse of spmm_to_layout: (rows, nrhs*128) -> (nrows_pad, nrhs)."""
    rows = y2.shape[0]
    return (
        y2.reshape(rows, nrhs, LANES)
        .transpose(0, 2, 1)
        .reshape(rows * LANES, nrhs)
    )


def spmm_dia(a: DiaMatrix, x: jax.Array, interpret: bool = False) -> jax.Array:
    """Y = A X for X (n, nrhs): the matrix is streamed once for the whole
    block. Symmetric (lower-triangle) storage dispatches to the multi-RHS
    carry kernel. Returns (nrows_pad, nrhs)."""
    nrhs = x.shape[1]
    hr = dia_halo_rows(a)
    tr = _pick_tile_rows(
        a.nrows_pad // LANES, len(a.offsets), hr, a.data.dtype.itemsize,
        sym=a.symmetric, nrhs=nrhs,
    )
    if tr == 0:
        raise ValueError("no valid tile; check spmm_dia_supported first")
    if a.symmetric:
        y2 = _spmv_dia_sym_pallas_2d(
            a.data, spmm_to_layout(a, x), a.offsets, tr, hr, nrhs=nrhs,
            interpret=interpret,
        )
    else:
        y2 = _spmm_dia_pallas_2d(
            a.data, spmm_to_layout(a, x), a.offsets, tr, hr, nrhs,
            interpret=interpret,
        )
    return spmm_from_layout(y2, nrhs)
