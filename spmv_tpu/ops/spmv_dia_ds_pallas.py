"""Double-single (float64-class) Pallas DIA SpMV.

The reference is double-throughout (reference spmv/Matrix.cpp:565-566); on
TPU, XLA's software-emulated f64 caps even a pure streaming copy at ~91 GB/s
on the attached chip and f64 SpMV at ~30 GB/s (BENCH_NOTES.md). This kernel
carries matrix and vector as double-single (hi+lo f32 pairs,
spmv_tpu.ds): ~48 significand bits — rel. error ~1e-14 on stencil SpMV —
while storage, DMA traffic, and VPU work stay in f32 land.

Structure mirrors the fp32 DIA kernel (ops.spmv_dia_pallas): interleaved
(R, K*128) data tiles via the grid pipeline, windowed x HBM->VMEM staging
double-buffered, lane-roll shifted reads — run twice (hi and lo legs shift
identically) and combined with error-free transformations (Dekker two_prod,
Knuth two_sum — no FMA dependence).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.ds import ds_add, ds_from_f64, ds_mul_f32, ds_to_f64
from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.formats.dia import DiaMatrix, flat_to_interleaved
from spmv_tpu.ops.spmv_dia_pallas import _idx32, _mod2, LANES, _pick_tile_rows, dia_halo_rows


@dataclasses.dataclass
class DiaDsMatrix:
    """DIA matrix in double-single storage: two interleaved f32 planes."""

    data_hi: jax.Array  # (R/128, K*128) interleaved (DiaMatrix.data layout)
    data_lo: jax.Array
    offsets: tuple[int, ...]
    nrows: int
    ncols: int
    _nnz: int = 0

    @property
    def nrows_pad(self) -> int:
        return self.data_hi.shape[0] * LANES

    @property
    def ndiags(self) -> int:
        return len(self.offsets)

    def format_size_bytes(self) -> int:
        return 2 * self.data_hi.size * 4


jax.tree_util.register_dataclass(
    DiaDsMatrix,
    data_fields=["data_hi", "data_lo"],
    meta_fields=["offsets", "nrows", "ncols", "_nnz"],
)


def csr_to_dia_ds(a: CSRHost, row_align: int = 128, max_diags: int = 64) -> DiaDsMatrix:
    """Convert an f64 host CSR to double-single DIA storage. The split stays
    in NUMPY until upload: routing through a jax array would silently
    downcast f64 to f32 when x64 is off and zero the lo plane (the round-2
    on-chip 1e-9 bug)."""
    from spmv_tpu.formats.dia import csr_to_dia_host

    flat, offsets, nnz = csr_to_dia_host(
        a, row_align=row_align, max_diags=max_diags, dtype=np.float64
    )
    hi, lo = ds_from_f64(flat)
    k = flat.shape[0]
    return DiaDsMatrix(
        data_hi=jnp.asarray(flat_to_interleaved(hi, k)),
        data_lo=jnp.asarray(flat_to_interleaved(lo, k)),
        offsets=offsets,
        nrows=a.nrows,
        ncols=a.ncols,
        _nnz=nnz,
    )


def _ds_x_window_dma(hbm, xwin, xsem, tr, hr, n_tiles, sub):
    """(start, wait) closures for the double-buffered TWO-LEG (hi/lo)
    x-window DMA — the DS analogue of spmv_dia_pallas._x_window_dma. Width
    is whatever the hbm legs carry (128 lanes single-RHS, nrhs*128 for the
    multi-RHS kernel)."""
    wrows = tr + 2 * hr

    def leg_copy(slot, leg, tile_kind, tile):
        slot, leg = _idx32(slot), _idx32(leg)
        if tile_kind == "first":
            rows = min(tr + hr, n_tiles * tr)
            return pltpu.make_async_copy(
                hbm[leg].at[pl.ds(0, rows), :],
                xwin.at[slot, leg, pl.ds(hr, rows), :], xsem.at[slot, leg])
        if tile_kind == "last":
            rows = min(tr + hr, n_tiles * tr)
            return pltpu.make_async_copy(
                hbm[leg].at[pl.ds(n_tiles * tr - rows, rows), :],
                xwin.at[slot, leg, pl.ds(0, rows), :], xsem.at[slot, leg])
        start_row = pl.multiple_of(tile * tr - hr, sub)
        return pltpu.make_async_copy(
            hbm[leg].at[pl.ds(start_row, wrows), :],
            xwin.at[slot, leg], xsem.at[slot, leg])

    def start(slot, tile):
        slot = _idx32(slot)
        if n_tiles == 1:
            for leg in map(_idx32, range(2)):
                pltpu.make_async_copy(
                    hbm[leg].at[pl.ds(0, tr), :],
                    xwin.at[slot, leg, pl.ds(hr, tr), :], xsem.at[slot, leg]
                ).start()
            return

        @pl.when(tile == 0)
        def _():
            for leg in map(_idx32, range(2)):
                leg_copy(slot, leg, "first", tile).start()

        @pl.when(tile == n_tiles - 1)
        def _():
            for leg in map(_idx32, range(2)):
                leg_copy(slot, leg, "last", tile).start()

        if n_tiles > 2:
            @pl.when((tile > 0) & (tile < n_tiles - 1))
            def _():
                for leg in map(_idx32, range(2)):
                    leg_copy(slot, leg, "mid", tile).start()

    def wait(slot, tile):
        slot = _idx32(slot)
        if n_tiles == 1:
            for leg in map(_idx32, range(2)):
                pltpu.make_async_copy(
                    hbm[leg].at[pl.ds(0, tr), :],
                    xwin.at[slot, leg, pl.ds(hr, tr), :], xsem.at[slot, leg]
                ).wait()
            return

        @pl.when(tile == 0)
        def _():
            for leg in map(_idx32, range(2)):
                leg_copy(slot, leg, "first", tile).wait()

        @pl.when(tile == n_tiles - 1)
        def _():
            for leg in map(_idx32, range(2)):
                leg_copy(slot, leg, "last", tile).wait()

        if n_tiles > 2:
            @pl.when((tile > 0) & (tile < n_tiles - 1))
            def _():
                for leg in map(_idx32, range(2)):
                    leg_copy(slot, leg, "mid", tile).wait()

    return start, wait


def _dia_ds_kernel(
    dh_ref,     # (TR, K*128) VMEM — hi data tile (pipelined)
    dl_ref,     # (TR, K*128) VMEM — lo data tile (pipelined)
    xh_hbm,     # (R, 128) ANY — x hi, windows DMA'd manually
    xl_hbm,     # (R, 128) ANY — x lo
    yh_ref,     # (TR, 128) VMEM — output hi tile
    yl_ref,     # (TR, 128) VMEM — output lo tile
    xwin,       # (2, 2, TR + 2*HR, 128) VMEM scratch (slot, hi/lo)
    xsem,       # (2, 2) DMA semaphores
    *,
    offsets: tuple[int, ...],
    tr: int,
    hr: int,
    n_tiles: int,
    sub: int,
):
    i = pl.program_id(0)
    wrows = tr + 2 * hr
    hbm = (xh_hbm, xl_hbm)
    start, wait = _ds_x_window_dma(hbm, xwin, xsem, tr, hr, n_tiles, sub)

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        start(_mod2(i + 1), i + 1)

    wait(_mod2(i), i)

    @pl.when(i == 0)
    def _():
        xwin[_mod2(i), :, 0:hr, :] = jnp.zeros((2, hr, LANES), xwin.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        xwin[_mod2(i), :, tr + hr : wrows, :] = jnp.zeros((2, hr, LANES), xwin.dtype)

    xwh = xwin[_mod2(i), 0]
    xwl = xwin[_mod2(i), 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)

    def shifted(buf, off):
        t = hr * LANES + off
        q, r = divmod(t, LANES)
        if r == 0:
            return buf[q : q + tr, :]
        r0 = pltpu.roll(buf[q : q + tr, :], np.int32(LANES - r), 1)
        r1 = pltpu.roll(buf[q + 1 : q + tr + 1, :], np.int32(LANES - r), 1)
        return jnp.where(lane < LANES - r, r0, r1)

    acc_h = jnp.zeros((tr, LANES), jnp.float32)
    acc_l = jnp.zeros((tr, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        dh = dh_ref[:, k * LANES : (k + 1) * LANES]
        dl = dl_ref[:, k * LANES : (k + 1) * LANES]
        vh = shifted(xwh, off)
        vl = shifted(xwl, off)
        ph, plo = ds_mul_f32(dh, dl, vh, vl)
        acc_h, acc_l = ds_add(acc_h, acc_l, ph, plo)
    yh_ref[:, :] = acc_h
    yl_ref[:, :] = acc_l


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile_rows", "hr", "interpret")
)
def _spmv_dia_ds_2d(
    data_hi, data_lo, xh2, xl2,
    offsets: tuple[int, ...], tile_rows: int, hr: int,
    interpret: bool = False,
):
    nrows, klanes = data_hi.shape
    k = klanes // LANES
    tr = tile_rows
    n_tiles = nrows // tr
    sub = 16 if tr % 16 == 0 else 8
    kernel = functools.partial(
        _dia_ds_kernel, offsets=offsets, tr=tr, hr=hr, n_tiles=n_tiles,
        sub=sub,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tr, klanes), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, klanes), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tr, LANES), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, LANES), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, tr + 2 * hr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * k * nrows * LANES,
            bytes_accessed=(2 * k + 4) * nrows * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data_hi, data_lo, xh2, xl2)


def dia_ds_pallas_supported(a: DiaDsMatrix) -> bool:
    if a.nrows_pad % (8 * LANES) != 0:
        return False
    hr = _ds_halo_rows(a)
    if hr > 512:
        return False
    return _ds_pick_tile(a) > 0


def _ds_halo_rows(a: DiaDsMatrix) -> int:
    view = DiaMatrix(data=a.data_hi, offsets=a.offsets, nrows=a.nrows,
                     ncols=a.ncols)
    return dia_halo_rows(view)


def _ds_pick_tile(a: DiaDsMatrix) -> int:
    # double the per-row cost vs the fp32 kernel (two planes, two windows)
    return _pick_tile_rows(
        a.nrows_pad // LANES, 2 * a.ndiags, _ds_halo_rows(a), 4, sym=False
    )


def spmv_dia_ds_pallas_2d(
    a: DiaDsMatrix, xh2: jax.Array, xl2: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Double-single SpMV in lane layout: (hi, lo) x pair -> (hi, lo) y pair.
    Rel. error ~1e-14 vs exact f64 (two_prod + two_sum accumulation)."""
    tr = _ds_pick_tile(a)
    if tr == 0:
        raise ValueError("no valid tile; check dia_ds_pallas_supported first")
    return _spmv_dia_ds_2d(
        a.data_hi, a.data_lo, xh2, xl2, a.offsets, tr, _ds_halo_rows(a),
        interpret=interpret,
    )


def spmv_dia_ds_xla(
    a: DiaDsMatrix, xh2: jax.Array, xl2: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Pure-XLA double-single DIA apply in the 2-D lane layout — the
    fallback when the Pallas tile floor (>= 16 lane rows per shard) cannot
    be met (tiny shards) and the interpreter path on CPU. Same error-free
    arithmetic, shifts as row-slices + lane rolls."""
    r_rows = xh2.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_rows, LANES), 1)

    def row_shift(v, q):
        if q == 0:
            return v
        if q > 0:
            return jnp.concatenate(
                [v[q:], jnp.zeros((q, LANES), v.dtype)], axis=0)
        return jnp.concatenate(
            [jnp.zeros((-q, LANES), v.dtype), v[:q]], axis=0)

    def shifted(v, off):
        q, rr = divmod(off, LANES)
        if rr == 0:
            return row_shift(v, q)
        a0 = row_shift(v, q)
        a1 = row_shift(v, q + 1)
        r0 = jnp.roll(a0, LANES - rr, axis=1)
        r1 = jnp.roll(a1, LANES - rr, axis=1)
        return jnp.where(lane < LANES - rr, r0, r1)

    acc_h = jnp.zeros((r_rows, LANES), jnp.float32)
    acc_l = jnp.zeros((r_rows, LANES), jnp.float32)
    for k, off in enumerate(a.offsets):
        dh = a.data_hi[:, k * LANES : (k + 1) * LANES]
        dl = a.data_lo[:, k * LANES : (k + 1) * LANES]
        ph, plo = ds_mul_f32(dh, dl, shifted(xh2, off), shifted(xl2, off))
        acc_h, acc_l = ds_add(acc_h, acc_l, ph, plo)
    return acc_h, acc_l


def spmv_dia_ds(a: DiaDsMatrix, x: np.ndarray | jax.Array,
                interpret: bool = False) -> np.ndarray:
    """Convenience: f64 vector in, f64 vector out (length nrows_pad).
    Conversions happen host-side; for hot loops keep vectors as (hi, lo)
    pairs and call spmv_dia_ds_pallas_2d directly."""
    npad = a.nrows_pad
    xv = np.zeros(npad, dtype=np.float64)
    n = min(len(x), npad)
    xv[:n] = np.asarray(x, dtype=np.float64)[:n]
    hi, lo = ds_from_f64(xv)
    yh, yl = spmv_dia_ds_pallas_2d(
        a, jnp.asarray(hi.reshape(-1, LANES)), jnp.asarray(lo.reshape(-1, LANES)),
        interpret=interpret,
    )
    return ds_to_f64(np.asarray(yh).reshape(-1), np.asarray(yl).reshape(-1))


# ---------------------------------------------------------------------------
# multi-RHS double-single SpMM: Y = A X with BOTH planes streamed once
# ---------------------------------------------------------------------------


def _dia_ds_mrhs_kernel(
    dh_ref,     # (TR, K*128) VMEM — hi data tile (pipelined)
    dl_ref,     # (TR, K*128) VMEM — lo data tile
    xh_hbm,     # (R, NRHS*128) ANY — x hi block, windows DMA'd manually
    xl_hbm,     # (R, NRHS*128) ANY — x lo block
    yh_ref,     # (TR, NRHS*128) VMEM
    yl_ref,     # (TR, NRHS*128) VMEM
    xwin,       # (2, 2, TR + 2*HR, NRHS*128) VMEM scratch (slot, hi/lo)
    xsem,       # (2, 2) DMA semaphores
    *,
    offsets: tuple[int, ...],
    tr: int,
    hr: int,
    n_tiles: int,
    sub: int,
    nrhs: int,
):
    """The DS SpMM: error-free hi/lo arithmetic (spmv_tpu.ds) per RHS slice
    of the shared x window — the matrix's two planes are read ONCE for the
    whole block (the f64-class answer to ops/spmm_dia_pallas; the refined
    block solver's residual pass uses it to stream A once for 8 columns
    instead of 8 times)."""
    i = pl.program_id(0)
    wrows = tr + 2 * hr
    lanes_all = nrhs * LANES
    hbm = (xh_hbm, xl_hbm)
    start, wait = _ds_x_window_dma(hbm, xwin, xsem, tr, hr, n_tiles, sub)

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        start(_mod2(i + 1), i + 1)

    wait(_mod2(i), i)

    @pl.when(i == 0)
    def _():
        xwin[_mod2(i), :, 0:hr, :] = jnp.zeros((2, hr, lanes_all),
                                               xwin.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        xwin[_mod2(i), :, tr + hr : wrows, :] = jnp.zeros(
            (2, hr, lanes_all), xwin.dtype
        )

    xwh = xwin[_mod2(i), _idx32(0)]
    xwl = xwin[_mod2(i), _idx32(1)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)

    def shifted(buf, r, off):
        sl = slice(r * LANES, (r + 1) * LANES)
        t = hr * LANES + off
        q, rr = divmod(t, LANES)
        if rr == 0:
            return buf[q : q + tr, sl]
        r0 = pltpu.roll(buf[q : q + tr, sl], np.int32(LANES - rr), 1)
        r1 = pltpu.roll(buf[q + 1 : q + tr + 1, sl], np.int32(LANES - rr), 1)
        return jnp.where(lane < LANES - rr, r0, r1)

    accs_h = [jnp.zeros((tr, LANES), jnp.float32) for _ in range(nrhs)]
    accs_l = [jnp.zeros((tr, LANES), jnp.float32) for _ in range(nrhs)]
    for k, off in enumerate(offsets):
        dh = dh_ref[:, k * LANES : (k + 1) * LANES]
        dl = dl_ref[:, k * LANES : (k + 1) * LANES]
        for r in range(nrhs):
            ph, plo = ds_mul_f32(dh, dl, shifted(xwh, r, off),
                                 shifted(xwl, r, off))
            accs_h[r], accs_l[r] = ds_add(accs_h[r], accs_l[r], ph, plo)
    yh_ref[:, :] = jnp.concatenate(accs_h, axis=1)
    yl_ref[:, :] = jnp.concatenate(accs_l, axis=1)


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile_rows", "hr", "nrhs",
                              "interpret")
)
def _spmm_dia_ds_2d(
    data_hi, data_lo, xh2, xl2,
    offsets: tuple[int, ...], tile_rows: int, hr: int, nrhs: int,
    interpret: bool = False,
):
    nrows, klanes = data_hi.shape
    tr = tile_rows
    n_tiles = nrows // tr
    sub = 16 if tr % 16 == 0 else 8
    k = klanes // LANES
    kernel = functools.partial(
        _dia_ds_mrhs_kernel, offsets=offsets, tr=tr, hr=hr,
        n_tiles=n_tiles, sub=sub, nrhs=nrhs,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tr, klanes), lambda i: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, klanes), lambda i: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tr, nrhs * LANES), lambda i: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, nrhs * LANES), lambda i: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nrows, nrhs * LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, nrhs * LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, tr + 2 * hr, nrhs * LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * k * nrows * LANES * nrhs,
            bytes_accessed=(2 * k + 4 * nrhs) * nrows * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data_hi, data_lo, xh2, xl2)


def _ds_pick_tile_mrhs(a: DiaDsMatrix, nrhs: int) -> int:
    # two data planes + two x/y legs per RHS: 2x the single-plane cost with
    # the nrhs lane factor on the vector terms
    return _pick_tile_rows(
        a.nrows_pad // LANES, 2 * a.ndiags, _ds_halo_rows(a), 4,
        sym=False, nrhs=2 * nrhs,
    )


def spmm_dia_ds_supported(a: DiaDsMatrix, nrhs: int) -> bool:
    if a.nrows_pad % (8 * LANES) != 0 or nrhs < 1:
        return False
    if _ds_halo_rows(a) > 512:
        return False
    return _ds_pick_tile_mrhs(a, nrhs) > 0


def spmm_dia_ds_pallas_2d(
    a: DiaDsMatrix, xh2: jax.Array, xl2: jax.Array, nrhs: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Double-single SpMM in the (rows, nrhs*128) SpMM lane layout
    (spmm_dia_pallas.spmm_to_layout): (hi, lo) x block -> (hi, lo) y block,
    matrix planes streamed once for the whole block."""
    tr = _ds_pick_tile_mrhs(a, nrhs)
    if tr == 0:
        raise ValueError("no valid tile; check spmm_dia_ds_supported first")
    return _spmm_dia_ds_2d(
        a.data_hi, a.data_lo, xh2, xl2, a.offsets, tr, _ds_halo_rows(a),
        nrhs, interpret=interpret,
    )


def spmm_dia_ds_xla(
    a: DiaDsMatrix, xh2: jax.Array, xl2: jax.Array, nrhs: int
) -> tuple[jax.Array, jax.Array]:
    """XLA fallback/oracle for the DS SpMM (per-RHS single applies over the
    lane-layout slices — correct anywhere, slower than the kernel)."""
    outs_h, outs_l = [], []
    for r in range(nrhs):
        sl = slice(r * LANES, (r + 1) * LANES)
        yh, yl = spmv_dia_ds_xla(a, xh2[:, sl], xl2[:, sl])
        outs_h.append(yh)
        outs_l.append(yl)
    return jnp.concatenate(outs_h, axis=1), jnp.concatenate(outs_l, axis=1)
