"""Pallas TPU kernels for DIA SpMV — the hand-tuned stencil fast path.

Why a kernel at all: the pure-XLA DIA path (spmv_tpu.ops.spmv_dia) measures
~10% of streaming roofline on the attached chip: the shifted slices and the
halo pad materialize as separate HBM passes, and big 1-D vector ops are
pathologically slow through this stack. This kernel makes the optimal
formulation explicit: one pass over the diagonal data, one windowed read of
x, one write of y — everything in 2-D (rows, 128) lane layout.

Zero-copy vector flow: vectors are plain (nrows/128, 128) lane-layout
arrays in and out, so repeated applies (CG) chain with no data movement.
The halo a shifted read needs (the intra-device analogue of the reference's
ghost padding, reference spmv/cg.cpp:36-42) is handled per tile: the x
window covers [tile*TR - HR, tile*TR + TR + HR) rows, edge tiles clamp to
the domain and zero the out-of-range window rows in VMEM (zero Dirichlet
halo), HR = ceil(max|offset|/128) rounded to the sublane tiling.

Per grid step i (rows [i*TR, (i+1)*TR)):
  - the x window (TR + 2*HR rows) is DMA'd HBM->VMEM, double-buffered so the
    window of tile i+1 transfers while tile i computes;
  - each diagonal contributes data[k] * shift(x) where the shift decomposes
    into whole rows q and lanes r; lane shifts are two lane-rolls + a select
    (Mosaic rejects the equivalent concat of sublane-shifted slices, and
    rotates only 32-bit data — sub-32-bit windows upcast first);
  - diagonal data and output tiles are pipelined by the grid machinery.

Plays the role of the reference's per-backend CSR kernels for its stencil
benchmarks (reference spmv/csr_kernels.*; the reference has no DIA format —
running stencils through CSR costs it index storage and gather bandwidth the
TPU formulation avoids entirely).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.formats.dia import DiaMatrix

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def dia_halo_rows(a: DiaMatrix) -> int:
    """Window halo rows for this matrix's offsets, rounded to a multiple of
    8 so every partial-window DMA length (tr + hr) stays sublane-aligned
    (Mosaic requires slice shapes aligned to the dtype tiling)."""
    hr = _round_up(max(max(abs(o) for o in a.offsets), 1), LANES) // LANES
    # 16 covers the strictest sublane tiling (bf16); DMA offsets like
    # tile*tr - hr must be provably tiling-divisible
    return _round_up(hr, 16)


def dia_to_2d(a: DiaMatrix, x: jax.Array) -> jax.Array:
    """Reshape a flat vector into the kernel's (nrows, 128) lane layout
    (free when len(x) == nrows_pad; zero-fills/truncates otherwise)."""
    npad = a.nrows_pad
    nrows = npad // LANES
    if x.ndim == 2:
        return x
    if x.shape[0] == npad:
        return x.reshape(nrows, LANES)
    take = min(x.shape[0], npad)
    flat = jnp.zeros((npad,), x.dtype).at[:take].set(x[:take])
    return flat.reshape(nrows, LANES)


def _dia_kernel(
    data_ref,   # (TR, K*128) VMEM — interleaved diagonal data tile
                #   (pipelined; ONE contiguous HBM chunk per grid step)
    x_hbm,      # (nrows, 128) ANY — UNFRAMED x, windows DMA'd manually
    y_ref,      # (TR, 128) VMEM — output tile (pipelined)
    xwin,       # (2, TR + 2*HR, 128) VMEM scratch
    xsem,       # (2,) DMA semaphores
    *,
    offsets: tuple[int, ...],
    tr: int,
    hr: int,
    n_tiles: int,
    sub: int,
):
    i = pl.program_id(0)
    wrows = tr + 2 * hr

    # The window for tile t covers x rows [t*tr - hr, t*tr + tr + hr); the
    # first/last tiles clamp to the domain and zero the out-of-domain frame
    # rows in VMEM instead (zero Dirichlet halo — exactly what a framed
    # vector would hold). Start/wait pairs branch identically so each wait
    # matches its start. Requires tr >= hr (enforced by _pick_tile_rows).
    def dma_mid(slot, tile):
        # tr is a multiple of the dtype's sublane tile ``sub`` and hr of 16,
        # so this offset is provably a multiple of ``sub`` — promising more
        # (e.g. a blanket 16 with fp32's tr % 8 tiles) would be UB Mosaic is
        # free to exploit
        start_row = pl.multiple_of(tile * tr - hr, sub)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_row, wrows), :],
            xwin.at[slot], xsem.at[slot],
        )

    def dma_first(slot):
        rows = min(tr + hr, n_tiles * tr)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, rows), :],
            xwin.at[slot, pl.ds(hr, rows), :], xsem.at[slot],
        )

    def dma_last(slot):
        rows = min(tr + hr, n_tiles * tr)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(n_tiles * tr - rows, rows), :],
            xwin.at[slot, pl.ds(0, rows), :], xsem.at[slot],
        )

    def start(slot, tile):
        if n_tiles == 1:
            # whole domain in one window, centered at offset hr
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr), :],
                xwin.at[slot, pl.ds(hr, tr), :], xsem.at[slot],
            ).start()
            return

        @pl.when(tile == 0)
        def _():
            dma_first(slot).start()

        @pl.when(tile == n_tiles - 1)
        def _():
            dma_last(slot).start()

        if n_tiles > 2:  # mid tiles exist; static guard keeps small cases
            @pl.when((tile > 0) & (tile < n_tiles - 1))
            def _():
                dma_mid(slot, tile).start()

    def wait(slot, tile):
        if n_tiles == 1:
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr), :],
                xwin.at[slot, pl.ds(hr, tr), :], xsem.at[slot],
            ).wait()
            return

        @pl.when(tile == 0)
        def _():
            dma_first(slot).wait()

        @pl.when(tile == n_tiles - 1)
        def _():
            dma_last(slot).wait()

        if n_tiles > 2:
            @pl.when((tile > 0) & (tile < n_tiles - 1))
            def _():
                dma_mid(slot, tile).wait()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        start((i + 1) % 2, i + 1)

    wait(i % 2, i)

    # zero the out-of-domain frame rows of edge tiles (slot was DMA-filled
    # only over the in-domain span)
    @pl.when(i == 0)
    def _():
        xwin[i % 2, 0:hr, :] = jnp.zeros((hr, LANES), xwin.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        xwin[i % 2, tr + hr : wrows, :] = jnp.zeros((hr, LANES), xwin.dtype)

    xw = xwin[i % 2]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)
    acc = jnp.zeros((tr, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        t = hr * LANES + off
        q, r = divmod(t, LANES)
        if r == 0:
            v = xw[q : q + tr, :].astype(jnp.float32)
        else:
            # v[:, j] = flat window element 128*q + j + r — two lane-rolls
            # plus a lane select (Mosaic rejects the equivalent concat of
            # sublane-shifted slices; rotate only supports 32-bit data, so
            # sub-32-bit windows are upcast before rolling)
            r0 = pltpu.roll(
                xw[q : q + tr, :].astype(jnp.float32), LANES - r, 1
            )
            r1 = pltpu.roll(
                xw[q + 1 : q + tr + 1, :].astype(jnp.float32), LANES - r, 1
            )
            v = jnp.where(lane < LANES - r, r0, r1)
        dk = data_ref[:, k * LANES : (k + 1) * LANES]  # free lane-slice view
        acc = acc + dk.astype(jnp.float32) * v
    y_ref[:, :] = acc.astype(y_ref.dtype)


def _dia_sym_kernel(
    x_hbm,      # (nrows, 128) ANY — unframed x
    d_hbm,      # (nrows, K*128) ANY — interleaved lower-tri diagonals
    y_ref,      # (TR, 128) VMEM — output tile (pipelined)
    xwin,       # (2, TR + 2*HR, 128) VMEM scratch
    dwin,       # (2, TR + HR, K*128) VMEM scratch (upper halo only)
    xsem,       # (2,) DMA semaphores
    dsem,       # (2,) DMA semaphores
    *,
    offsets: tuple[int, ...],
    tr: int,
    hr: int,
    n_tiles: int,
    sub: int,
):
    """Symmetric DIA SpMV: A = L + D + L^T with only offsets <= 0 stored.

    The transpose of diagonal o is diagonal -o with the SAME data shifted by
    -o rows/lanes: y[i] += d_o[i-o] * x[i-o]. So besides the x window, the
    kernel reads a data window with an upper halo — no scatter, no atomics,
    ~40%% less matrix traffic than full storage for a 5-point stencil.
    """
    i = pl.program_id(0)
    k = len(offsets)
    wrows = tr + 2 * hr

    def x_start(slot, tile):
        if n_tiles == 1:
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr), :],
                xwin.at[slot, pl.ds(hr, tr), :], xsem.at[slot],
            ).start()
            return

        @pl.when(tile == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr + hr), :],
                xwin.at[slot, pl.ds(hr, tr + hr), :], xsem.at[slot],
            ).start()

        @pl.when(tile == n_tiles - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(n_tiles * tr - (tr + hr), tr + hr), :],
                xwin.at[slot, pl.ds(0, tr + hr), :], xsem.at[slot],
            ).start()

        if n_tiles > 2:
            @pl.when((tile > 0) & (tile < n_tiles - 1))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of(tile * tr - hr, sub), wrows), :],
                    xwin.at[slot], xsem.at[slot],
                ).start()

    def x_wait(slot, tile):
        # reconstruct the started descriptor so the wait matches exactly
        if n_tiles == 1:
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr), :],
                xwin.at[slot, pl.ds(hr, tr), :], xsem.at[slot],
            ).wait()
            return

        @pl.when(tile == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr + hr), :],
                xwin.at[slot, pl.ds(hr, tr + hr), :], xsem.at[slot],
            ).wait()

        @pl.when(tile == n_tiles - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(n_tiles * tr - (tr + hr), tr + hr), :],
                xwin.at[slot, pl.ds(0, tr + hr), :], xsem.at[slot],
            ).wait()

        if n_tiles > 2:
            @pl.when((tile > 0) & (tile < n_tiles - 1))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of(tile * tr - hr, sub), wrows), :],
                    xwin.at[slot], xsem.at[slot],
                ).wait()

    def d_copy(slot, tile):
        # the interleaved layout makes the whole data window ONE contiguous
        # chunk; last tile has no upper halo
        last = tile == n_tiles - 1
        rows = tr if n_tiles == 1 else None  # static small case below
        if n_tiles == 1:
            return pltpu.make_async_copy(
                d_hbm.at[pl.ds(0, tr), :],
                dwin.at[slot, pl.ds(0, tr), :], dsem.at[slot],
            )
        return None

    def d_start(slot, tile):
        last = tile == n_tiles - 1
        if n_tiles == 1:
            d_copy(slot, tile).start()
            return

        @pl.when(last)
        def _():
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(pl.multiple_of(tile * tr, sub), tr), :],
                dwin.at[slot, pl.ds(0, tr), :], dsem.at[slot],
            ).start()

        @pl.when(jnp.logical_not(last))
        def _():
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(pl.multiple_of(tile * tr, sub), tr + hr), :],
                dwin.at[slot, pl.ds(0, tr + hr), :], dsem.at[slot],
            ).start()

    def d_wait(slot, tile):
        last = tile == n_tiles - 1
        if n_tiles == 1:
            d_copy(slot, tile).wait()
            return

        @pl.when(last)
        def _():
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(pl.multiple_of(tile * tr, sub), tr), :],
                dwin.at[slot, pl.ds(0, tr), :], dsem.at[slot],
            ).wait()

        @pl.when(jnp.logical_not(last))
        def _():
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(pl.multiple_of(tile * tr, sub), tr + hr), :],
                dwin.at[slot, pl.ds(0, tr + hr), :], dsem.at[slot],
            ).wait()

    @pl.when(i == 0)
    def _():
        x_start(0, 0)
        d_start(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        x_start((i + 1) % 2, i + 1)
        d_start((i + 1) % 2, i + 1)

    x_wait(i % 2, i)
    d_wait(i % 2, i)

    # zero the out-of-domain rows of edge windows
    @pl.when(i == 0)
    def _():
        xwin[i % 2, 0:hr, :] = jnp.zeros((hr, LANES), xwin.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        xwin[i % 2, tr + hr : wrows, :] = jnp.zeros((hr, LANES), xwin.dtype)
        dwin[i % 2, pl.ds(tr, hr), :] = jnp.zeros(
            (hr, k * LANES), dwin.dtype
        )

    xw = xwin[i % 2]
    dw = dwin[i % 2]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)

    def shifted(buf, base_rows, t):
        """buf rows [base..base+tr(+1)] viewed at flat element offset t
        (f32 result; sub-32-bit buffers upcast before the lane rotate,
        which Mosaic only implements for 32-bit data)."""
        q, rr = divmod(t, LANES)
        if rr == 0:
            return buf[base_rows + q : base_rows + q + tr, :].astype(jnp.float32)
        r0 = pltpu.roll(
            buf[base_rows + q : base_rows + q + tr, :].astype(jnp.float32),
            LANES - rr, 1,
        )
        r1 = pltpu.roll(
            buf[base_rows + q + 1 : base_rows + q + tr + 1, :].astype(jnp.float32),
            LANES - rr, 1,
        )
        return jnp.where(lane < LANES - rr, r0, r1)

    acc = jnp.zeros((tr, LANES), jnp.float32)
    for kk, off in enumerate(offsets):
        # (tr + hr, 128) lane-slice view, rows [i*tr, i*tr + tr + hr)
        dk = dw[:, kk * LANES : (kk + 1) * LANES]
        # forward: y[i] += d_o[i] * x[i + o]
        acc = acc + dk[0:tr, :].astype(jnp.float32) * shifted(
            xw, 0, hr * LANES + off
        )
        if off < 0:
            s = -off
            # transpose: y[i] += d_o[i + s] * x[i + s]
            acc = acc + shifted(dk, 0, s) * shifted(xw, 0, hr * LANES + s)
    y_ref[:, :] = acc.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile_rows", "hr", "interpret")
)
def _spmv_dia_sym_pallas_2d(
    data, x2, offsets: tuple[int, ...], tile_rows: int, hr: int,
    interpret: bool = False,
):
    """Symmetric kernel wrapper: data (npad/128, K*128) with offsets<=0."""
    nrows, klanes = data.shape
    k = klanes // LANES
    tr = tile_rows
    n_tiles = nrows // tr
    # strongest TRUE promise: hr is 16-aligned (dia_halo_rows), so
    # tile*tr - hr is 16-aligned iff tr is; otherwise the dtype sublane tile
    sub = 16 if tr % 16 == 0 else (8 if data.dtype.itemsize >= 4 else 16)
    kernel = functools.partial(
        _dia_sym_kernel, offsets=offsets, tr=tr, hr=hr, n_tiles=n_tiles,
        sub=sub,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * hr, LANES), x2.dtype),
            pltpu.VMEM((2, tr + hr, k * LANES), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * k * nrows * LANES,
            bytes_accessed=(k + 2) * nrows * LANES * data.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, data)


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile_rows", "hr", "interpret")
)
def _spmv_dia_pallas_2d(
    data, x2, offsets: tuple[int, ...], tile_rows: int, hr: int,
    interpret: bool = False,
):
    """data: (npad/128, K*128) — ALREADY row-interleaved (a relayout here
    would materialize a copy of the whole matrix per call inside solver
    loops); x2 (npad/128, 128) -> y (npad/128, 128)."""
    nrows, klanes = data.shape
    k = klanes // LANES
    npad = nrows * LANES
    tr = tile_rows
    n_tiles = nrows // tr
    d3 = data

    sub = 16 if tr % 16 == 0 else (8 if data.dtype.itemsize >= 4 else 16)
    kernel = functools.partial(
        _dia_kernel, offsets=offsets, tr=tr, hr=hr, n_tiles=n_tiles, sub=sub
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tr, k * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * hr, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * npad,
            bytes_accessed=(k + 2) * npad * data.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d3, x2)


def dia_pallas_supported(a: DiaMatrix, x: jax.Array | None = None) -> bool:
    dt = a.dtype
    if dt not in (jnp.float32, jnp.bfloat16):
        return False
    if x is not None and x.dtype != dt:
        return False
    if a.nrows_pad % (8 * LANES) != 0:
        return False
    hr = dia_halo_rows(a)
    if hr > 512:
        return False
    return _pick_tile_rows(
        a.nrows_pad // LANES, len(a.offsets), hr, a.data.dtype.itemsize,
        sym=a.symmetric,
    ) > 0


def _pick_tile_rows(
    nrows: int, k: int, hr: int, itemsize: int, sym: bool = False
) -> int:
    """Largest divisor-of-nrows tile (in 128-lane rows, a multiple of the
    dtype's sublane tile — 8 rows for fp32, 16 for bf16 — and >= hr for the
    edge-window math) fitting the VMEM budget: double-buffered window
    (2*(tr+2hr)) + data (pipelined 2*k*tr, or haloed window 2*k*(tr+hr) for
    the symmetric kernel) + pipelined y (2*tr). Bigger tiles amortize
    per-grid-step overhead. Returns 0 when no valid tile exists (caller
    falls back to the XLA path)."""
    # the symmetric kernel's roll/select chains keep several (tr, 128) vreg
    # temporaries live — leave Mosaic extra scoped-stack headroom
    budget = (4 if sym else 10) * 1024 * 1024
    sublanes = 8 if itemsize >= 4 else 16

    def fits(tr: int) -> bool:
        dneed = 2 * k * (tr + hr) if sym else 2 * k * tr
        need = (2 * (tr + 2 * hr) + dneed + 2 * tr) * LANES * itemsize
        return need <= budget

    best = 0
    d = 1
    while d * d <= nrows:
        if nrows % d == 0:
            for tr in (d, nrows // d):
                if tr % sublanes == 0 and tr >= hr and fits(tr) and tr > best:
                    best = tr
        d += 1
    return best


def spmv_dia_pallas_2d(
    a: DiaMatrix, x2: jax.Array, interpret: bool = False
) -> jax.Array:
    """Zero-copy SpMV in lane layout: x2 (nrows, 128) -> y (nrows, 128).
    The solver hot path — repeated applies chain with no data movement.
    Dispatches to the symmetric (lower-triangle-only) kernel when
    ``a.symmetric``."""
    nrows = a.nrows_pad // LANES
    hr = dia_halo_rows(a)
    tr = _pick_tile_rows(
        nrows, len(a.offsets), hr, a.data.dtype.itemsize, sym=a.symmetric
    )
    if tr == 0:
        raise ValueError("no valid tile; check dia_pallas_supported first")
    if a.symmetric:
        return _spmv_dia_sym_pallas_2d(
            a.data, x2, a.offsets, tr, hr, interpret=interpret
        )
    return _spmv_dia_pallas_2d(
        a.data, x2, a.offsets, tr, hr, interpret=interpret
    )


def spmv_dia_pallas(
    a: DiaMatrix, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Flat-vector convenience wrapper (a reshape when len(x) == nrows_pad).
    ``interpret=True`` runs in the Pallas interpreter (CPU) — the testing
    analogue of the reference's ReferenceExecutor-vs-device split
    (reference spmv/reference_executor.h)."""
    y2 = spmv_dia_pallas_2d(a, dia_to_2d(a, x), interpret=interpret)
    return y2.reshape(a.nrows_pad)
