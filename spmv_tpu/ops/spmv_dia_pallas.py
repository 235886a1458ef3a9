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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.formats.dia import DiaMatrix
from spmv_tpu.ops.batching import sequential_vmap

LANES = 128
# max grid steps per pallas_call for the vanilla kernel — longer grids
# degrade sustained HBM throughput (BENCH_NOTES "Grid-length cliff":
# 512-step call 62% of spec, 64-step calls 96%)
_CHUNK_TILES = 64


def _mod2(v):
    """(v % 2) via the lax primitive. jnp's ``%`` is a composite that
    materializes the literal 2 as an int64 constant when x64 is enabled,
    and Mosaic cannot lower the resulting int64->int32 convert (infinite
    recursion in _convert_helper). All call sites are runtime-guarded to
    v >= 0, where truncated rem == floor mod."""
    return jax.lax.rem(v, np.int32(2))


def _idx32(v):
    """Ref-index sanitizer for x64 mode: a plain Python int index is
    canonicalized to int64 when x64 is enabled, and Mosaic's memref_slice
    requires 32-bit indices ('operand must be ... 32-bit signless integer,
    but got i64'). Traced values pass through unchanged."""
    return np.int32(v) if isinstance(v, int) else v



def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def dia_halo_rows(a) -> int:
    """Window halo rows for this matrix's offsets (a DiaMatrix or a plain
    offsets tuple), rounded to a multiple of 8 so every partial-window DMA
    length (tr + hr) stays sublane-aligned (Mosaic requires slice shapes
    aligned to the dtype tiling)."""
    offsets = a if isinstance(a, tuple) else a.offsets
    hr = _round_up(max(max(abs(o) for o in offsets), 1), LANES) // LANES
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


def _x_window_dma(x_hbm, xwin, xsem, tr, hr, n_tiles, sub,
                  row0: int = 0, lo_clamp: bool = True,
                  hi_clamp: bool = True, nrows_tot: int | None = None):
    """(start, wait) closures for the double-buffered FULL-halo x-window
    DMA — the window for (call-local) tile t covers x rows
    [row0 + t*tr - hr, row0 + t*tr + tr + hr); domain-edge tiles clamp and
    callers zero the out-of-domain frame rows in VMEM (zero Dirichlet
    halo). Start/wait pairs branch identically so each wait matches its
    start. Requires tr >= hr (enforced by _pick_tile_rows). Shared by the
    vanilla single-RHS kernel and the multi-RHS SpMM kernel
    (spmm_dia_pallas) — the lane width is whatever xwin/x_hbm carry.

    ``row0``/``lo_clamp``/``hi_clamp``/``nrows_tot`` support CHUNKED
    applies (several pallas_calls over one big matrix — long single-call
    grids measured 62% of HBM spec vs 96% for <=64-tile calls,
    BENCH_NOTES "Grid-length cliff"): a non-edge chunk reads its halo from
    the neighboring chunk's rows of the SAME full x array instead of
    clamping. row0 must be a multiple of ``sub`` (chunk boundaries are
    tile-aligned)."""
    wrows = tr + 2 * hr
    if nrows_tot is None:
        nrows_tot = row0 + n_tiles * tr

    def dma_mid(slot, tile):
        # tr is a multiple of the dtype's sublane tile ``sub`` and hr of 16,
        # so this offset is provably a multiple of ``sub`` — promising more
        # (e.g. a blanket 16 with fp32's tr % 8 tiles) would be UB Mosaic is
        # free to exploit
        start_row = pl.multiple_of(row0 + tile * tr - hr, sub)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_row, wrows), :],
            xwin.at[slot], xsem.at[slot],
        )

    def dma_first(slot):
        rows = min(tr + hr, nrows_tot)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, rows), :],
            xwin.at[slot, pl.ds(hr, rows), :], xsem.at[slot],
        )

    def dma_last(slot):
        rows = min(tr + hr, nrows_tot)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(nrows_tot - rows, rows), :],
            xwin.at[slot, pl.ds(0, rows), :], xsem.at[slot],
        )

    def issue(slot, tile, op):
        slot = _idx32(slot)
        if n_tiles == 1 and lo_clamp and hi_clamp:
            # whole domain in one window, centered at offset hr
            getattr(pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr), :],
                xwin.at[slot, pl.ds(hr, tr), :], xsem.at[slot],
            ), op)()
            return
        if not lo_clamp and not hi_clamp:
            getattr(dma_mid(slot, tile), op)()  # every tile is interior
            return
        if lo_clamp:
            @pl.when(tile == 0)
            def _():
                getattr(dma_first(slot), op)()
        if hi_clamp:
            @pl.when(tile == n_tiles - 1)
            def _():
                getattr(dma_last(slot), op)()
        conds = []
        if lo_clamp:
            conds.append(lambda t: t > 0)
        if hi_clamp:
            conds.append(lambda t: t < n_tiles - 1)
        if not (lo_clamp and hi_clamp and n_tiles <= 2):
            c = conds[0](tile)
            for cc in conds[1:]:
                c = c & cc(tile)

            @pl.when(c)
            def _():
                getattr(dma_mid(slot, tile), op)()

    def start(slot, tile):
        issue(slot, tile, "start")

    def wait(slot, tile):
        issue(slot, tile, "wait")

    return start, wait


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
    row0: int = 0,
    lo_clamp: bool = True,
    hi_clamp: bool = True,
    nrows_tot: int | None = None,
):
    i = pl.program_id(0)
    wrows = tr + 2 * hr
    start, wait = _x_window_dma(x_hbm, xwin, xsem, tr, hr, n_tiles, sub,
                                row0=row0, lo_clamp=lo_clamp,
                                hi_clamp=hi_clamp, nrows_tot=nrows_tot)

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        start(_mod2(i + 1), i + 1)

    wait(_mod2(i), i)

    # zero the out-of-DOMAIN frame rows of domain-edge tiles (slot was
    # DMA-filled only over the in-domain span); interior chunk boundaries
    # read real neighbor rows instead
    if lo_clamp:
        @pl.when(i == 0)
        def _():
            xwin[_mod2(i), 0:hr, :] = jnp.zeros((hr, LANES), xwin.dtype)

    if hi_clamp:
        @pl.when(i == n_tiles - 1)
        def _():
            xwin[_mod2(i), tr + hr : wrows, :] = jnp.zeros(
                (hr, LANES), xwin.dtype)

    xw = xwin[_mod2(i)]

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
                xw[q : q + tr, :].astype(jnp.float32), np.int32(LANES - r), 1
            )
            r1 = pltpu.roll(
                xw[q + 1 : q + tr + 1, :].astype(jnp.float32), np.int32(LANES - r), 1
            )
            v = jnp.where(lane < LANES - r, r0, r1)
        dk = data_ref[:, k * LANES : (k + 1) * LANES]  # free lane-slice view
        acc = acc + dk.astype(jnp.float32) * v
    y_ref[:, :] = acc.astype(y_ref.dtype)


def _dia_sym_kernel(
    d_ref,      # (TR, K*128) VMEM — interleaved lower-tri diagonals
                #   (grid-pipelined: ONE contiguous HBM chunk per step)
    x_hbm,      # (nrows, 128) ANY — unframed x, windows DMA'd manually
    y_hbm,      # (nrows, 128) ANY — output, tiles DMA'd manually
    xwin,       # (2, TR + HR, 128) VMEM scratch (LOWER halo only)
    carry,      # (TR, 128) f32 scratch — previous tile's accumulator
    yscr,       # (2, TR, 128) VMEM staging for the delayed y writes
    xsem,       # (2,) DMA semaphores
    ysem,       # (2,) DMA semaphores
    *,
    offsets: tuple[int, ...],
    tr: int,
    hr: int,
    n_tiles: int,
    sub: int,
    nrhs: int = 1,
    row0: int = 0,
    lo_clamp: bool = True,
    spill_ref=None,
):
    """Symmetric DIA SpMV: A = L + D + L^T with only offsets <= 0 stored.
    Multi-RHS capable (nrhs > 1): x/y/carry/staging are nrhs*128 lanes wide
    in the SpMM lane layout (spmm_dia_pallas) and the matrix is streamed
    ONCE for the whole block.

    The transpose of a stored entry A[r, r+o] (o < 0) contributes
    y[r+o] += d_o[r] * x[r] — a BACKWARD scatter. Instead of gathering it
    from haloed d/x windows (measured ~60%% of the copy roofline: the extra
    manual haloed DMA stream breaks the pipelining that gives the vanilla
    kernel ~80%%), this kernel scatters each tile's aligned product
    d_o[r]*x[r] backward and DELAYS the y write by one step: step i
    computes tile i's accumulator into persistent scratch and ships tile
    i-1 = saved_acc + this tile's spill via a double-buffered manual DMA
    (the final step additionally ships its own tile, which receives no
    spill). The grid is sequential ("arbitrary" semantics), stays at
    n_tiles steps with plain AFFINE index maps — non-affine (clamped) maps
    measured ~7%% slower (they defeat the pipeline's block prefetch,
    tools/exp_affine) and a reversed grid ~9%% slower (descending HBM
    streams defeat prefetch, tools/exp_reverse_order.py). d pipelines
    exactly like the vanilla kernel (no halo at all) and x needs only a
    lower halo — no scatter primitives, no atomics, ~40%% less matrix
    traffic than full storage for a 5-point stencil.
    """
    i = pl.program_id(0)  # step i processes tile i, ships y tile i-1
    wrows = tr + hr
    wl = nrhs * LANES
    # f32 accumulation for the TPU dtypes; f64 data (CPU/interpret oracle
    # runs — dia_pallas_supported gates TPU to f32/bf16) accumulates in f64
    cdt = jnp.float64 if d_ref.dtype == jnp.float64 else jnp.float32

    # x window for tile t covers rows [t*tr - hr, t*tr + tr); tile 0 clamps
    # to the domain and zeros the out-of-domain top (zero Dirichlet halo).
    def x_issue(slot, t, op):
        slot = _idx32(slot)
        t = _idx32(t)
        if not lo_clamp:
            # chunk interior: every tile (incl. local tile 0) reads its full
            # lower halo from real neighbor rows of the FULL x array
            getattr(pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(row0 + t * tr - hr, sub),
                               wrows), :],
                xwin.at[slot], xsem.at[slot],
            ), op)()
            return

        @pl.when(t == 0)
        def _():
            getattr(pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, tr), :],
                xwin.at[slot, pl.ds(hr, tr), :], xsem.at[slot],
            ), op)()

        if n_tiles > 1:
            @pl.when(t > 0)
            def _():
                getattr(pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of(row0 + t * tr - hr, sub),
                                   wrows), :],
                    xwin.at[slot], xsem.at[slot],
                ), op)()

    def x_start(slot, t):
        x_issue(slot, t, "start")

    def x_wait(slot, t):
        x_issue(slot, t, "wait")

    def y_dma(slot, t):
        slot = _idx32(slot)
        t = _idx32(t)
        return pltpu.make_async_copy(
            yscr.at[slot],
            y_hbm.at[pl.ds(t * tr, tr), :],
            ysem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        x_start(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        x_start(_mod2(i + 1), i + 1)

    x_wait(_mod2(i), i)

    if lo_clamp:
        @pl.when(i == 0)
        def _():
            xwin[_mod2(i), 0:hr, :] = jnp.zeros((hr, wl), xwin.dtype)

    xw = xwin[_mod2(i)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)

    def gather_shift(sl, t):
        """RHS lane-slice ``sl`` of the x window viewed at flat element
        offset t in [0, hr*128] (y-row r reads flat element r*128 + t; f32
        result — sub-32-bit windows upcast before the lane rotate, which
        Mosaic only implements for 32-bit data)."""
        q, rr = divmod(t, LANES)
        if rr == 0:
            return xw[q : q + tr, sl].astype(cdt)
        r0 = pltpu.roll(xw[q : q + tr, sl].astype(cdt), np.int32(LANES - rr), 1)
        r1 = pltpu.roll(
            xw[q + 1 : q + tr + 1, sl].astype(cdt), np.int32(LANES - rr), 1
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
                jnp.zeros((q, LANES), cdt),
                prod,
                jnp.zeros((hr - q, LANES), cdt),
            )
        # extended row q+w: lanes >= rr hold prod row w (rolled), lanes < rr
        # the lane-wrap of prod row w-1
        r0 = pltpu.roll(prod, np.int32(rr), 1)
        r0a = cat(r0, jnp.zeros((1, LANES), cdt))
        r0b = cat(jnp.zeros((1, LANES), cdt), r0)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (tr + 1, LANES), 1)
        mid = jnp.where(lane1 >= rr, r0a, r0b)
        return cat(
            jnp.zeros((q, LANES), cdt),
            mid,
            jnp.zeros((hr - q - 1, LANES), cdt),
        )

    accs, spills = [], []
    for r in range(nrhs):
        sl = slice(r * LANES, (r + 1) * LANES)
        xa = xw[hr : hr + tr, sl].astype(cdt)  # aligned tile rows
        acc = jnp.zeros((tr, LANES), cdt)
        spill = jnp.zeros((hr, LANES), cdt)
        for kk, off in enumerate(offsets):
            dk = d_ref[:, kk * LANES : (kk + 1) * LANES]  # free lane slice
            # forward: y[j] += d_o[j] * x[j + o]  (o <= 0: lower window)
            acc = acc + dk.astype(cdt) * gather_shift(
                sl, hr * LANES + off)
            if off < 0:
                # transpose: y[j+o] += d_o[j] * x[j] — the ALIGNED product
                # scattered backward; the head spills into the PREVIOUS
                # tile's output block, finalized this step
                ext = scatter_shift(dk.astype(cdt) * xa,
                                    hr * LANES + off)
                acc = acc + ext[hr : hr + tr, :]
                spill = spill + ext[0:hr, :]
        accs.append(acc)
        spills.append(spill)
    acc = accs[0] if nrhs == 1 else jnp.concatenate(accs, axis=1)
    spill = spills[0] if nrhs == 1 else jnp.concatenate(spills, axis=1)
    prev = carry[...]

    if spill_ref is not None:
        # chunked apply: local tile 0's spill targets the PREVIOUS chunk's
        # last rows — emit it for the caller to stitch (see the chunking
        # notes on the vanilla kernel)
        @pl.when(i == 0)
        def _():
            spill_ref[:, :] = spill.astype(spill_ref.dtype)

    # ship tile i-1 = prev accumulator + this tile's spill (its last hr
    # rows). Each yscr slot's prior DMA (started two regular writes ago, at
    # step i-2) is waited before the slot is rewritten.
    @pl.when(i > 0)
    def _():
        if n_tiles > 3:
            @pl.when(i >= 3)
            def _():
                y_dma(_mod2(i - 1), i - 3).wait()
        yscr[_mod2(i - 1)] = jnp.concatenate(
            [prev[0 : tr - hr, :], prev[tr - hr : tr, :] + spill]
        ).astype(yscr.dtype)
        y_dma(_mod2(i - 1), i - 1).start()

    carry[...] = acc

    # final step: ship this tile too (it receives no spill), then drain
    # every outstanding DMA before the program ends
    @pl.when(i == n_tiles - 1)
    def _():
        if n_tiles > 2:
            @pl.when(i >= 2)
            def _():
                y_dma(_mod2(i), i - 2).wait()
        yscr[_mod2(i)] = acc.astype(yscr.dtype)
        y_dma(_mod2(i), i).start()

        @pl.when(i > 0)
        def _():
            y_dma(_mod2(i - 1), i - 1).wait()

        y_dma(_mod2(i), i).wait()


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile_rows", "hr", "nrhs",
                              "interpret")
)
def _spmv_dia_sym_pallas_2d(
    data, x2, offsets: tuple[int, ...], tile_rows: int, hr: int,
    nrhs: int = 1, interpret: bool = False,
):
    """Symmetric kernel wrapper: data (npad/128, K*128) with offsets<=0.
    n_tiles ascending grid steps with plain affine index maps; y is shipped
    by the kernel's own double-buffered DMAs (delayed one step). nrhs > 1
    applies the whole block with one matrix stream (SpMM lane layout).

    Long grids CHUNK like the vanilla kernel (BENCH_NOTES "Grid-length
    cliff"); the carry/spill chain crossing chunk boundaries is handled by
    each non-first chunk EMITTING its tile-0 spill as a small extra output,
    stitched into the previous chunk's last rows with one static-slice add.
    """
    nrows, klanes = data.shape
    k = klanes // LANES
    tr = tile_rows
    n_tiles = nrows // tr
    wl = nrhs * LANES
    # strongest TRUE promise: hr is 16-aligned (dia_halo_rows), so
    # tile*tr - hr is 16-aligned iff tr is; otherwise the dtype sublane tile
    sub = 16 if tr % 16 == 0 else (8 if data.dtype.itemsize >= 4 else 16)
    cdt = jnp.float64 if data.dtype == jnp.float64 else jnp.float32

    def call(t0, ct, lo):
        kw = dict(offsets=offsets, tr=tr, hr=hr, n_tiles=ct, sub=sub,
                  nrhs=nrhs, row0=t0 * tr, lo_clamp=lo)
        if lo and ct == n_tiles:
            kernel = functools.partial(_dia_sym_kernel, **kw)
            out_specs = pl.BlockSpec(memory_space=pl.ANY)
            out_shape = jax.ShapeDtypeStruct((ct * tr, wl), data.dtype)
        else:
            def kernel(d_ref, x_hbm, y_hbm, spill_out, xwin, carry, yscr,
                       xsem, ysem):
                _dia_sym_kernel(d_ref, x_hbm, y_hbm, xwin, carry, yscr,
                                xsem, ysem, spill_ref=spill_out, **kw)

            out_specs = (
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((hr, wl),
                             lambda i: (np.int32(0), np.int32(0)),
                             memory_space=pltpu.VMEM),
            )
            out_shape = (
                jax.ShapeDtypeStruct((ct * tr, wl), data.dtype),
                jax.ShapeDtypeStruct((hr, wl), data.dtype),
            )
        return pl.pallas_call(
            kernel,
            grid=(ct,),
            in_specs=[
                pl.BlockSpec((tr, k * LANES),
                             lambda i, t0=t0: (i + t0, np.int32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, tr + hr, wl), x2.dtype),
                pltpu.VMEM((tr, wl), cdt),
                pltpu.VMEM((2, tr, wl), data.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * k * tr * ct * LANES * nrhs,
                bytes_accessed=(k + 2 * nrhs) * tr * ct * LANES
                * data.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(data, x2)

    if n_tiles <= _CHUNK_TILES * 3 // 2:
        return call(0, n_tiles, True)
    n_chunks = -(-n_tiles // _CHUNK_TILES)
    base, extra = divmod(n_tiles, n_chunks)
    outs, spills, bounds = [], [], []
    t0 = 0
    for c in range(n_chunks):
        ct = base + (1 if c < extra else 0)
        res = call(t0, ct, c == 0)
        if c == 0 and isinstance(res, tuple):
            outs.append(res[0])  # first chunk's spill is out-of-domain
        elif isinstance(res, tuple):
            outs.append(res[0])
            spills.append(res[1])
            bounds.append(t0 * tr)
        else:
            outs.append(res)
        t0 += ct
    y = jnp.concatenate(outs, axis=0)
    for spill, b in zip(spills, bounds):
        y = y.at[b - hr : b, :].add(spill)
    return y


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile_rows", "hr", "interpret")
)
def _spmv_dia_pallas_2d(
    data, x2, offsets: tuple[int, ...], tile_rows: int, hr: int,
    interpret: bool = False,
):
    """data: (npad/128, K*128) — ALREADY row-interleaved (a relayout here
    would materialize a copy of the whole matrix per call inside solver
    loops); x2 (npad/128, 128) -> y (npad/128, 128).

    Long grids are CHUNKED into <= _CHUNK_TILES-step pallas_calls: one
    sustained call with 512 grid steps measured ~62% of HBM spec while the
    same per-apply work in 64-step calls over small matrices measured 96%
    (BENCH_NOTES "Grid-length cliff"); chunking a single big operator
    recovers part of that (62% -> 68% at 67M rows — the remainder tracks
    the vector/working-set size, still unattributed). Chunks are
    data-zero-copy — each call indexes the full data array via block-index
    offsets and reads its x halo from the full x (interior chunks take
    REAL neighbor rows, no clamping); per-chunk y blocks are concatenated
    (one extra y pass, already netted in the measured gain)."""
    nrows, klanes = data.shape
    k = klanes // LANES
    npad = nrows * LANES
    tr = tile_rows
    n_tiles = nrows // tr
    sub = 16 if tr % 16 == 0 else (8 if data.dtype.itemsize >= 4 else 16)

    def call(t0, ct, lo, hi):
        kernel = functools.partial(
            _dia_kernel, offsets=offsets, tr=tr, hr=hr, n_tiles=ct, sub=sub,
            row0=t0 * tr, lo_clamp=lo, hi_clamp=hi, nrows_tot=nrows,
        )
        return pl.pallas_call(
            kernel,
            grid=(ct,),
            in_specs=[
                pl.BlockSpec((tr, k * LANES),
                             lambda i, t0=t0: (i + t0, np.int32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (tr, LANES), lambda i: (i, np.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((ct * tr, LANES), data.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, tr + 2 * hr, LANES), x2.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * k * tr * ct * LANES,
                bytes_accessed=(k + 2) * tr * ct * LANES
                * data.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(data, x2)

    if n_tiles <= _CHUNK_TILES * 3 // 2:
        return call(0, n_tiles, True, True)
    n_chunks = -(-n_tiles // _CHUNK_TILES)
    base, extra = divmod(n_tiles, n_chunks)
    outs = []
    t0 = 0
    for c in range(n_chunks):
        ct = base + (1 if c < extra else 0)
        outs.append(call(t0, ct, c == 0, c == n_chunks - 1))
        t0 += ct
    return jnp.concatenate(outs, axis=0)


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
    nrows: int, k: int, hr: int, itemsize: int, sym: bool = False,
    nrhs: int = 1,
) -> int:
    """Largest divisor-of-nrows tile (in 128-lane rows, a multiple of the
    dtype's sublane tile — 8 rows for fp32, 16 for bf16 — and >= hr for the
    edge-window math) fitting the VMEM budget: double-buffered x window
    (2*(tr+2hr) per RHS, lower-halo-only 2*(tr+hr) for the symmetric
    kernel) + pipelined data (2*k*tr) + pipelined y (2*tr per RHS). Bigger
    tiles amortize per-grid-step overhead. Returns 0 when no valid tile
    exists (caller falls back to the XLA path)."""
    # the symmetric kernel's roll/select/concat chains keep several
    # (tr, 128) vreg temporaries live — leave Mosaic extra headroom
    budget = (8 if sym else 10) * 1024 * 1024
    sublanes = 8 if itemsize >= 4 else 16

    def fits(tr: int) -> bool:
        # sym: lower-halo-only x window + (tr, 128) f32 carry + (2, tr, 128)
        # y staging (y is otherwise unbuffered: out lives in ANY space)
        xneed = ((2 * (tr + hr) + 3 * tr) * nrhs if sym
                 else (2 * (tr + 2 * hr) + 2 * tr) * nrhs)
        need = (xneed + 2 * k * tr) * LANES * itemsize
        if sym and itemsize < 4:
            # the carry scratch is ALWAYS f32 regardless of storage dtype —
            # re-account it at 4 bytes so bf16 tiles don't overrun VMEM
            need += tr * nrhs * LANES * (4 - itemsize)
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


def _spmv_dia_pallas_2d_dispatch(
    a: DiaMatrix, x2: jax.Array, interpret: bool = False
) -> jax.Array:
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


# vmap over the kernel runs lane-by-lane (ops/batching.py): Mosaic rejects
# a batch dim on the ANY-space x-window operand, and sequential lanes are
# the right schedule for an HBM-bound kernel anyway. Two instances so the
# interpret flag stays static.
_spmv_dia_pallas_2d_compiled = sequential_vmap(
    lambda a, x2: _spmv_dia_pallas_2d_dispatch(a, x2, interpret=False))
_spmv_dia_pallas_2d_interp = sequential_vmap(
    lambda a, x2: _spmv_dia_pallas_2d_dispatch(a, x2, interpret=True))


def spmv_dia_pallas_2d(
    a: DiaMatrix, x2: jax.Array, interpret: bool = False
) -> jax.Array:
    """Zero-copy SpMV in lane layout: x2 (nrows, 128) -> y (nrows, 128).
    The solver hot path — repeated applies chain with no data movement.
    Dispatches to the symmetric (lower-triangle-only) kernel when
    ``a.symmetric``. Batchable: under ``jax.vmap`` (stacked ``a.data`` /
    ``x2``) lanes run sequentially at full kernel speed."""
    if interpret:
        return _spmv_dia_pallas_2d_interp(a, x2)
    return _spmv_dia_pallas_2d_compiled(a, x2)


def spmv_dia_pallas(
    a: DiaMatrix, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Flat-vector convenience wrapper (a reshape when len(x) == nrows_pad).
    ``interpret=True`` runs in the Pallas interpreter (CPU) — the testing
    analogue of the reference's ReferenceExecutor-vs-device split
    (reference spmv/reference_executor.h)."""
    y2 = spmv_dia_pallas_2d(a, dia_to_2d(a, x), interpret=interpret)
    return y2.reshape(a.nrows_pad)
