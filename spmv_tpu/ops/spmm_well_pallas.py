"""Multi-RHS WELL SpMM — Y = A X for a block of vectors, matrix streamed
ONCE, gather metadata decoded ONCE.

The WELL SpMV wall-clock is matrix stream + dependent compute
(BENCH_NOTES round-3 ablations), and BOTH amortize across right-hand
sides: values/pos stream once for the block, and the per-slot one-hot
construction + position decode (measured at VPU peak rate) are shared —
only the per-RHS MXU gather pass, lane gather and multiply scale with
nrhs. Applying A to nrhs vectors one at a time re-reads the matrix and
re-decodes the metadata nrhs times:

    bytes(separate) / bytes(spmm) ~ nrhs (M + 2) / (M + 2 nrhs)

with M = matrix bytes per vector byte (~18 on the 4M-row bench config:
~4.7x at nrhs=8 on traffic alone). The block apply feeds
``DistMatrix.matmat`` (general-sparsity local blocks) and through it the
block-Krylov solvers — absent from the reference (one vector everywhere,
reference spmv/cg.cpp).

Layout matches ops/spmm_dia_pallas: X and Y in (rows, nrhs*128) lane
layout — element (i, r*128 + j) is flat element i*128+j of RHS r. The
per-tile x-window DMA stays ONE contiguous (wseg, nrhs*128) chunk.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.formats.well import LANES, WellMatrix
from spmv_tpu.ops.spmv_dia_pallas import _idx32, _mod2


def _well_mrhs_kernel(
    w0_ref,     # (n_tiles,) SMEM scalar-prefetch — window start segments
    x_hbm,      # (S, NRHS*128) ANY — x block, windows DMA'd manually
    v_ref,      # (K, TG, 128) VMEM — values tile (pipelined)
    p_ref,      # (K, TG, 128) VMEM int — positions (pipelined)
    y_ref,      # (TG, NRHS*128) VMEM — output tile (pipelined)
    xwin,       # (2, wseg, NRHS*128) VMEM scratch
    xsem,       # (2,) DMA semaphores
    *,
    wseg: int,
    tg: int,
    k: int,
    n_tiles: int,
    nrhs: int,
    paired: bool,
    compute_dtype=jnp.float32,
    exact_gather: bool = False,
):
    i = pl.program_id(0)

    def dma(slot, tile):
        slot, tile = _idx32(slot), _idx32(tile)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(w0_ref[tile], 8), wseg), :],
            xwin.at[slot],
            xsem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        dma(_mod2(i + 1), i + 1).start()

    dma(_mod2(i), i).wait()

    b = k * tg
    # decoded ONCE for the whole block (the amortization this kernel is for)
    pos = p_ref[...].reshape(b, LANES).astype(jnp.int32)
    lane = jax.lax.bitwise_and(pos, jnp.int32(LANES - 1))
    sa = jax.lax.shift_right_logical(pos[:, 0:1], jnp.int32(7))
    if paired:
        sb = jax.lax.shift_right_logical(pos[:, LANES - 1:], jnp.int32(7))
        segd = jax.lax.shift_right_logical(pos, jnp.int32(7))
        sel_a = segd == sa
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)
    if exact_gather:
        oh_a = oh_b = None
    elif compute_dtype == jnp.float32:
        oh_a = (sa == iota).astype(jnp.bfloat16)
        oh_b = (sb == iota).astype(jnp.bfloat16) if paired else None
    else:
        oh_a = (sa == iota).astype(compute_dtype)
        oh_b = (sb == iota).astype(compute_dtype) if paired else None

    vv = v_ref[...].reshape(b, LANES).astype(compute_dtype)

    def gather_leg(xw, oh, sc):
        if exact_gather:
            # interpret / reference-executor path: real row gather (see
            # ops/spmv_well_pallas — XLA:CPU matmuls are bf16 at these
            # shapes and the interpreter drops precision requests)
            rows = jnp.take(xw, sc[:, 0], axis=0)
        elif compute_dtype == jnp.float32:
            # exact 3-term bf16 split, one matmul (see spmv_well_pallas)
            x_hi = xw.astype(jnp.bfloat16)
            r1 = xw - x_hi.astype(jnp.float32)
            x_mid = r1.astype(jnp.bfloat16)
            x_lo = (r1 - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            x3 = jnp.concatenate([x_hi, x_mid, x_lo], axis=1)
            rows3 = jnp.dot(oh, x3, preferred_element_type=jnp.float32)
            rows = (rows3[:, :LANES] + rows3[:, LANES:2 * LANES]
                    + rows3[:, 2 * LANES:])
        else:
            rows = jnp.dot(oh, xw, preferred_element_type=compute_dtype,
                           precision=jax.lax.Precision.HIGHEST)
        with jax.enable_x64(False):  # see spmv_well_pallas note
            return jnp.take_along_axis(rows, lane, axis=1)

    outs = []
    for r in range(nrhs):
        xw = xwin[_mod2(i), :, r * LANES:(r + 1) * LANES].astype(
            compute_dtype)
        ga = gather_leg(xw, oh_a, sa)
        if paired:
            gb = gather_leg(xw, oh_b, sb)
            gathered = jnp.where(sel_a, ga, gb)
        else:
            gathered = ga
        contrib = vv * gathered
        acc = jnp.zeros((tg, LANES), compute_dtype)
        for kk in range(k):
            acc = acc + contrib[kk * tg:(kk + 1) * tg, :]
        outs.append(acc)
    y_ref[:, :] = jnp.concatenate(outs, axis=1).astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("wseg", "tg", "k", "n_tiles", "nrhs", "paired",
                     "interpret"),
)
def _spmm_well_2d(
    values, pos, w0, x2,
    wseg: int, tg: int, k: int, n_tiles: int, nrhs: int,
    paired: bool = False,
    interpret: bool = False,
):
    g = values.shape[1]
    compute_dtype = (jnp.float64 if values.dtype == jnp.float64
                     else jnp.float32)
    kernel = functools.partial(
        _well_mrhs_kernel, wseg=wseg, tg=tg, k=k, n_tiles=n_tiles,
        nrhs=nrhs, paired=paired, compute_dtype=compute_dtype,
        exact_gather=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x block stays in HBM
            pl.BlockSpec(
                (k, tg, LANES),
                lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, tg, LANES),
                lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tg, nrhs * LANES), lambda i, w0_ref: (i, np.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wseg, nrhs * LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, nrhs * LANES), values.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * g * LANES * (wseg + 1) * nrhs
            * (2 if paired else 1),
            bytes_accessed=(values.size * values.dtype.itemsize
                            + pos.size * pos.dtype.itemsize
                            + 2 * nrhs * g * LANES
                            * values.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(w0, x2, values, pos)


def spmm_well_pallas_2d(
    a: WellMatrix, x2: jax.Array, nrhs: int, interpret: bool = False
) -> jax.Array:
    """Block SpMM in lane layout: x2 (ncols_pad/128, nrhs*128) ->
    y (nrows_pad/128, nrhs*128); column r of the block is lane slice
    [r*128, (r+1)*128). Same output layout as spmm_dia_pallas so the
    block solvers compose across formats."""
    return _spmm_well_2d(
        a.values, a.pos, a.w0, x2,
        wseg=a.wseg, tg=a.tile_groups, k=a.k_slots, n_tiles=a.n_tiles,
        nrhs=nrhs, paired=bool(a.paired), interpret=interpret,
    )


def spmm_well_supported(a: WellMatrix, nrhs: int) -> bool:
    """VMEM envelope gate for the block kernel: the (2, wseg, nrhs*128)
    x-window scratch plus the pipelined value/pos/y tiles must fit
    comfortably (~16 MB budget leaves headroom for Mosaic's own
    buffers)."""
    itemsize = a.values.dtype.itemsize
    need = (
        2 * a.wseg * nrhs * LANES * 4                       # x windows
        + 2 * a.k_slots * a.tile_groups * LANES * itemsize  # v tiles
        + 2 * a.k_slots * a.tile_groups * LANES * a.pos.dtype.itemsize
        + 2 * a.tile_groups * nrhs * LANES * itemsize       # y tiles
    )
    return need <= 16 * 1024 * 1024


# ---------------------------------------------------------------------------
# Double-single (f64-class) WELL block SpMM — both value planes and both
# x-window planes streamed once for the whole block; gather metadata
# decoded once. Pairs with ops/spmv_dia_ds_pallas' DS DIA SpMM to give the
# f64-class multi-RHS story GENERAL sparsity coverage.
# ---------------------------------------------------------------------------
from spmv_tpu.ds import ds_add, ds_mul_f32
from spmv_tpu.ops.spmv_well_pallas import WellDsMatrix


def _well_ds_mrhs_kernel(
    w0_ref, xh_hbm, xl_hbm, vh_ref, vl_ref, p_ref, yh_ref, yl_ref,
    xwin, xsem,
    *,
    wseg: int, tg: int, k: int, n_tiles: int, nrhs: int, paired: bool,
    exact_gather: bool = False,
):
    i = pl.program_id(0)
    hbm = (xh_hbm, xl_hbm)

    def dma(slot, leg, tile):
        slot, leg, tile = _idx32(slot), _idx32(leg), _idx32(tile)
        return pltpu.make_async_copy(
            hbm[leg].at[pl.ds(pl.multiple_of(w0_ref[tile], 8), wseg), :],
            xwin.at[slot, leg],
            xsem.at[slot, leg],
        )

    @pl.when(i == 0)
    def _():
        for leg in range(2):
            dma(0, leg, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        for leg in range(2):
            dma(_mod2(i + 1), leg, i + 1).start()

    for leg in range(2):
        dma(_mod2(i), leg, i).wait()

    b = k * tg
    pos = p_ref[...].reshape(b, LANES).astype(jnp.int32)
    lane = jax.lax.bitwise_and(pos, jnp.int32(LANES - 1))
    sa = jax.lax.shift_right_logical(pos[:, 0:1], jnp.int32(7))
    if paired:
        sb = jax.lax.shift_right_logical(pos[:, LANES - 1:], jnp.int32(7))
        segd = jax.lax.shift_right_logical(pos, jnp.int32(7))
        sel_a = segd == sa
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)
    oh_a = oh_b = None
    if not exact_gather:
        oh_a = (sa == iota).astype(jnp.bfloat16)
        if paired:
            oh_b = (sb == iota).astype(jnp.bfloat16)

    vh = vh_ref[...].reshape(b, LANES)
    vl = vl_ref[...].reshape(b, LANES)

    def gather(xw, oh, sc):
        if exact_gather:
            rows = jnp.take(xw, sc[:, 0], axis=0)
        else:
            x_hi = xw.astype(jnp.bfloat16)
            r1 = xw - x_hi.astype(jnp.float32)
            x_mid = r1.astype(jnp.bfloat16)
            x_lo = (r1 - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            x3 = jnp.concatenate([x_hi, x_mid, x_lo], axis=1)
            rows3 = jnp.dot(oh, x3, preferred_element_type=jnp.float32)
            rows = (rows3[:, :LANES] + rows3[:, LANES:2 * LANES]
                    + rows3[:, 2 * LANES:])
        with jax.enable_x64(False):  # see spmv_well_pallas note
            return jnp.take_along_axis(rows, lane, axis=1)

    outs_h, outs_l = [], []
    for r in range(nrhs):
        sl = slice(r * LANES, (r + 1) * LANES)
        xwh = xwin[_mod2(i), _idx32(0), :, sl]
        xwl = xwin[_mod2(i), _idx32(1), :, sl]
        gh = gather(xwh, oh_a, sa)
        gl = gather(xwl, oh_a, sa)
        if paired:
            gbh = gather(xwh, oh_b, sb)
            gbl = gather(xwl, oh_b, sb)
            gh = jnp.where(sel_a, gh, gbh)
            gl = jnp.where(sel_a, gl, gbl)
        ph, plo = ds_mul_f32(vh, vl, gh, gl)
        acc_h = jnp.zeros((tg, LANES), jnp.float32)
        acc_l = jnp.zeros((tg, LANES), jnp.float32)
        for kk in range(k):
            acc_h, acc_l = ds_add(
                acc_h, acc_l,
                ph[kk * tg:(kk + 1) * tg, :], plo[kk * tg:(kk + 1) * tg, :],
            )
        outs_h.append(acc_h)
        outs_l.append(acc_l)
    yh_ref[:, :] = jnp.concatenate(outs_h, axis=1)
    yl_ref[:, :] = jnp.concatenate(outs_l, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("wseg", "tg", "k", "n_tiles", "nrhs", "paired",
                     "interpret"),
)
def _spmm_well_ds_2d(
    vh, vl, pos, w0, xh2, xl2,
    wseg: int, tg: int, k: int, n_tiles: int, nrhs: int,
    paired: bool = False,
    interpret: bool = False,
):
    g = vh.shape[1]
    kernel = functools.partial(
        _well_ds_mrhs_kernel, wseg=wseg, tg=tg, k=k, n_tiles=n_tiles,
        nrhs=nrhs, paired=paired, exact_gather=interpret,
    )
    bspec = pl.BlockSpec(
        (k, tg, LANES), lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x hi block
            pl.BlockSpec(memory_space=pl.ANY),  # x lo block
            bspec, bspec,                       # values hi/lo
            pl.BlockSpec(
                (k, tg, LANES),
                lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
                memory_space=pltpu.VMEM),       # pos
        ],
        out_specs=(
            pl.BlockSpec((tg, nrhs * LANES),
                         lambda i, w0_ref: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nrhs * LANES),
                         lambda i, w0_ref: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, wseg, nrhs * LANES), xh2.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((g, nrhs * LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, nrhs * LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(w0, xh2, xl2, vh, vl, pos)


def spmm_well_ds_pallas_2d(
    a: WellDsMatrix, xh2: jax.Array, xl2: jax.Array, nrhs: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """f64-class block SpMM in the (rows, nrhs*128) lane layout: both
    value planes streamed once for the whole block, error-free per output
    row (slot-chunk ds accumulation, no scatters)."""
    return _spmm_well_ds_2d(
        a.values_hi, a.values_lo, a.pos, a.w0, xh2, xl2,
        wseg=a.wseg, tg=a.tile_groups, k=a.k_slots, n_tiles=a.n_tiles,
        nrhs=nrhs, paired=bool(a.paired), interpret=interpret,
    )


def spmm_well_ds_supported(a: WellDsMatrix, nrhs: int) -> bool:
    """VMEM gate: the (2, 2, wseg, nrhs*128) window scratch + pipelined
    hi/lo value, pos and two output tiles."""
    need = (
        4 * a.wseg * nrhs * LANES * 4
        + 4 * a.k_slots * a.tile_groups * LANES * 4
        + 2 * a.k_slots * a.tile_groups * LANES * a.pos.dtype.itemsize
        + 4 * a.tile_groups * nrhs * LANES * 4
    )
    return need <= 16 * 1024 * 1024
