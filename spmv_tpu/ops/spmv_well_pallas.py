"""Pallas TPU kernel for WELL (windowed gather-ELL) SpMV — the
general-sparsity fast path.

Per grid step (one tile = ``tile_groups`` row groups = tile_groups*128 rows):

  1. the x window ((wseg, 128) lane-rows starting at the scalar-prefetched
     ``w0[tile]``) is DMA'd HBM->VMEM, double-buffered across tiles;
  2. values/pos tiles arrive via the grid pipeline as (K, TG, 128) blocks,
     flattened to B = K*TG rows of 128;
  3. each row's window SEGMENT (pos // 128, constant within a row by the
     format invariant) selects one window lane-row — all B row-gathers are
     ONE one-hot matmul (B, wseg) @ (wseg, 128) on the MXU (Mosaic has no
     multi-row sublane gather: axis-0 dynamic_gather only works within one
     8-sublane vreg, measured; the MXU formulation is exact since one-hot
     rows are 0/1);
  4. within-segment positions (pos % 128) resolve with the fast lane gather
     (``take_along_axis`` axis=1 -> tpu.dynamic_gather, full-speed at any
     row count);
  5. contributions multiply by values and reduce over the K slot chunks
     (contiguous static slices — the reason the format is slot-major).

Plays the role of the reference's general-matrix device kernels
(cuSPARSE cusparseSpMV, reference spmv/cuda/csr_kernels.cuda.cu:106-151;
NNZ-balanced OpenMP row split, spmv/openmp/csr_kernels.openmp.cpp:56-87) —
redesigned around TPU's actual data-movement primitives instead of
per-thread row loops.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.ops.spmv_dia_pallas import _idx32, _mod2

from spmv_tpu.formats.well import LANES, WellMatrix


def _well_kernel(
    w0_ref,     # (n_tiles,) SMEM scalar-prefetch — window start segments
    x_hbm,      # (S, 128) ANY — x in lane layout, windows DMA'd manually
    v_ref,      # (K, TG, 128) VMEM — values tile (pipelined)
    p_ref,      # (K, TG, 128) VMEM int32/int16 — positions (pipelined)
    y_ref,      # (TG, 128) VMEM — output tile (pipelined)
    xwin,       # (2, wseg, 128) VMEM scratch
    xsem,       # (2,) DMA semaphores
    *,
    wseg: int,
    tg: int,
    k: int,
    n_tiles: int,
    paired: bool,
    compute_dtype=jnp.float32,
    exact_gather: bool = False,
    trace_phases: bool = False,
    gather_terms: int = 3,
):
    # trace_phases: wrap each compute phase in jax.named_scope — Mosaic
    # lowers scope boundaries to tpu.trace_start/stop ops (level 10), which
    # libtpu records as intra-kernel timeline events in the xplane trace
    # (tools/exp_well_timeline.py). Instrumentation-only: off on the
    # production path.
    def scope(name):
        return jax.named_scope(name) if trace_phases else (
            contextlib.nullcontext())

    i = pl.program_id(0)

    def dma(slot, tile):
        slot, tile = _idx32(slot), _idx32(tile)
        # w0 entries are multiples of 8 by construction (csr_to_well)
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

    with scope("xwin_wait"):
        dma(_mod2(i), i).wait()
        xw = xwin[_mod2(i)].astype(compute_dtype)  # (wseg, 128)

    b = k * tg
    with scope("pos_decode"):
        pos = p_ref[...].reshape(b, LANES).astype(jnp.int32)
        lane = jax.lax.bitwise_and(pos, jnp.int32(LANES - 1))
        # paired slots (formats/well.py): the two leg segments live at the
        # ENDPOINT lanes of pos — two free static slices (>> 7 strips the
        # lane bits). Cross-lane min/max reductions were measured at
        # +0.7 ms here (2x the kernel) — Mosaic lowers them poorly; do not
        # revisit.
        sa = jax.lax.shift_right_logical(pos[:, 0:1], jnp.int32(7))

    if exact_gather:
        # interpret / reference-executor path: a REAL row gather. The MXU
        # one-hot formulation below is exact on TPU (bf16 one-hot, one
        # product per output), but the CPU interpreter evaluates its dots
        # through XLA:CPU's default-precision matmul, which computes large
        # f32 matmuls at bf16 precision (measured 7.7e-3 on a
        # (608,16)@(16,128) one-hot gather — and it ignores the
        # per-op Precision.HIGHEST request under the TPU interpret
        # machinery). jnp.take is exact on CPU at every dtype.
        def gather_leg(sc):
            rows = jnp.take(xw, sc[:, 0], axis=0)  # (b, 128)
            with jax.enable_x64(False):  # see note below
                return jnp.take_along_axis(rows, lane, axis=1)
    elif compute_dtype == jnp.float32:
        # The MXU rounds f32 operands to bf16 at default precision —
        # measured 1e-3..1e-1 SpMV error. The one-hot operand is EXACT in
        # bf16 (0/1), and each output sums exactly one product, so splitting
        # the window into three bf16 terms (8 mantissa bits each -> 24 bits
        # total) reconstructs the f32 gather exactly, at native bf16 MXU
        # rate (faster than an f32 matmul pass, exact unlike it).
        # ``gather_terms`` trades mantissa bits of the GATHERED x for MXU
        # work: 3 = exact f32 (default), 2 = ~2^-16 relative gather error,
        # 1 = bf16 gather (~2^-8) — the reduced-op prototypes of
        # BENCH_NOTES "WELL reduced-op A/B"; values stay f32 either way.
        with scope("bf16_split"):
            x_hi = xw.astype(jnp.bfloat16)
            terms = [x_hi]
            if gather_terms >= 2:
                r1 = xw - x_hi.astype(jnp.float32)
                x_mid = r1.astype(jnp.bfloat16)
                terms.append(x_mid)
                if gather_terms >= 3:
                    terms.append(
                        (r1 - x_mid.astype(jnp.float32)).astype(jnp.bfloat16))
            # one (b, wseg) @ (wseg, T*128) matmul instead of T: same
            # FLOPs, one MXU pass; recombine with T-1 lane-slice adds (the
            # measured-fast round-2 form — a (b, T*wseg) one-hot is 2x
            # slower on chip)
            x3 = (jnp.concatenate(terms, axis=1) if len(terms) > 1
                  else terms[0])  # (wseg, T*128)
        iota = jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)

        def gather_leg(sc):
            with scope("onehot"):
                oh = (sc == iota).astype(jnp.bfloat16)
            with scope("mxu_pass"):
                rows3 = jnp.dot(oh, x3, preferred_element_type=jnp.float32)
            with scope("term_recombine"):
                rows = rows3[:, :LANES]
                for tt in range(1, gather_terms):
                    rows = rows + rows3[:, tt * LANES:(tt + 1) * LANES]
            # under x64, take_along_axis picks int64 index dtype (upstream
            # int_dtype_for_dim receives a shape, not a dim, and falls back
            # to the default int) and Mosaic has no 64-bit types — scope
            # x64 off for the trace of this one op
            with scope("lane_gather"), jax.enable_x64(False):
                return jnp.take_along_axis(rows, lane, axis=1)
    else:
        # fp64 path (CPU/interpret — the TPU MXU has no f64; TPU callers use
        # fp32/bf16 storage, the documented WELL precision envelope)
        iota = jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)

        def gather_leg(sc):
            oh = (sc == iota).astype(compute_dtype)
            rows = jnp.dot(oh, xw, preferred_element_type=compute_dtype,
                           precision=jax.lax.Precision.HIGHEST)
            with jax.enable_x64(False):
                return jnp.take_along_axis(rows, lane, axis=1)

    ga = gather_leg(sa)
    if paired:
        # each element's own segment picks its leg — two gather legs, one
        # per-lane select, zero scatters
        gb = gather_leg(
            jax.lax.shift_right_logical(pos[:, LANES - 1:], jnp.int32(7)))
        segd = jax.lax.shift_right_logical(pos, jnp.int32(7))
        gathered = jnp.where(segd == sa, ga, gb)
    else:
        gathered = ga
    with scope("mult_reduce"):
        contrib = v_ref[...].reshape(b, LANES).astype(compute_dtype) * gathered

        acc = jnp.zeros((tg, LANES), compute_dtype)
        for kk in range(k):  # slot-major layout: chunks are contiguous rows
            acc = acc + contrib[kk * tg : (kk + 1) * tg, :]
        y_ref[:, :] = acc.astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("wseg", "tg", "k", "n_tiles", "paired", "interpret",
                     "trace_phases", "gather_terms"),
)
def _spmv_well_2d(
    values, pos, w0, x2,
    wseg: int, tg: int, k: int, n_tiles: int,
    paired: bool = False,
    interpret: bool = False,
    trace_phases: bool = False,
    gather_terms: int = 3,
):
    g = values.shape[1]
    compute_dtype = (jnp.float64 if values.dtype == jnp.float64
                     else jnp.float32)
    kernel = functools.partial(
        _well_kernel, wseg=wseg, tg=tg, k=k, n_tiles=n_tiles,
        paired=paired, compute_dtype=compute_dtype,
        exact_gather=interpret,
        trace_phases=trace_phases, gather_terms=gather_terms,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (k, tg, LANES), lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, tg, LANES), lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tg, LANES), lambda i, w0_ref: (i, np.int32(0)), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wseg, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, LANES), values.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * g * LANES * (wseg + 1) * (2 if paired else 1),
            bytes_accessed=(values.size * values.dtype.itemsize
                            + pos.size * pos.dtype.itemsize
                            + 2 * g * LANES * values.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(w0, x2, values, pos)


def well_to_2d(a: WellMatrix, x: jax.Array) -> jax.Array:
    """Reshape a flat x into the kernel's (ncols_pad/128, 128) lane layout
    (free when already padded; zero-fills otherwise)."""
    npad = a.ncols_pad
    if x.ndim == 2:
        return x
    if x.shape[0] == npad:
        return x.reshape(npad // LANES, LANES)
    take = min(x.shape[0], npad)
    flat = jnp.zeros((npad,), x.dtype).at[:take].set(x[:take])
    return flat.reshape(npad // LANES, LANES)


def spmv_well_pallas_2d(
    a: WellMatrix, x2: jax.Array, interpret: bool = False,
    trace_phases: bool = False, gather_terms: int = 3,
) -> jax.Array:
    """SpMV in lane layout: x2 (ncols_pad/128, 128) -> y (nrows_pad/128, 128).
    Output element (g, j) is row 128g + j, matching the DIA kernel's layout
    so formats compose inside solvers.

    ``gather_terms``: bf16 terms in the exact-gather window split — 3 is
    exact f32 (default), 2 trades to ~2^-16 relative gather error, 1 to a
    bf16-class gather (~2^-8); reduced-op modes for bf16-tolerant solves
    (BENCH_NOTES "WELL reduced-op A/B"). ``trace_phases`` wraps kernel
    phases in named scopes for intra-kernel xplane timelines."""
    return _spmv_well_2d(
        a.values, a.pos, a.w0, x2,
        wseg=a.wseg, tg=a.tile_groups, k=a.k_slots, n_tiles=a.n_tiles,
        paired=bool(a.paired), interpret=interpret,
        trace_phases=trace_phases, gather_terms=gather_terms,
    )


def spmv_well_pallas(
    a: WellMatrix, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Flat-vector wrapper: returns y of length nrows_pad. ``interpret=True``
    runs the Pallas interpreter (CPU reference semantics)."""
    y2 = spmv_well_pallas_2d(a, well_to_2d(a, x), interpret=interpret)
    return y2.reshape(a.nrows_pad)


def spmv_well(
    a: WellMatrix,
    x: jax.Array,
    alpha=1.0,
    beta=0.0,
    y: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """y_out = alpha * A @ x + beta * y — SubMatrix::mult semantics
    (reference spmv/sub_matrix.h:26-122), matching spmv_ell/spmv_dia.
    Returns a vector of length nrows_pad."""
    ax = spmv_well_pallas(a, x, interpret=interpret)
    if y is None:
        return alpha * ax
    n = a.nrows_pad
    yp = y
    if yp.shape[0] != n:
        yp = jnp.zeros((n,), y.dtype).at[: min(y.shape[0], n)].set(y[:n])
    return alpha * ax + beta * yp


# ---------------------------------------------------------------------------
# Double-single (float64-class) WELL — fast f64-class GENERAL sparsity.
# Same windowed-gather structure; both value planes and both x windows are
# f32, combined with error-free transformations (spmv_tpu.ds). Gathers are
# exact by construction (one-hot rows, bf16-split windows), so accuracy is
# set by the ds arithmetic (~2^-48 relative).
# ---------------------------------------------------------------------------
import dataclasses

import numpy as np

from spmv_tpu.ds import ds_add, ds_from_f64, ds_mul_f32


@dataclasses.dataclass
class WellDsMatrix:
    """WELL matrix in double-single storage (hi/lo f32 value planes)."""

    values_hi: jax.Array  # (K, G, 128)
    values_lo: jax.Array
    pos: jax.Array        # (K, G, 128) int (shared by both planes)
    w0: jax.Array
    nrows: int
    ncols: int
    wseg: int
    tile_groups: int
    nseg: int = 0
    _nnz: int = 0
    paired: bool = False  # paired slots (formats/well.py module doc)

    @property
    def ngroups(self) -> int:
        return self.values_hi.shape[1]

    @property
    def k_slots(self) -> int:
        return self.values_hi.shape[0]

    @property
    def nrows_pad(self) -> int:
        return self.ngroups * LANES

    @property
    def ncols_pad(self) -> int:
        return self.nseg * LANES

    @property
    def n_tiles(self) -> int:
        return self.ngroups // self.tile_groups


jax.tree_util.register_dataclass(
    WellDsMatrix,
    data_fields=["values_hi", "values_lo", "pos", "w0"],
    meta_fields=["nrows", "ncols", "wseg", "tile_groups", "nseg", "_nnz",
                 "paired"],
)


def csr_to_well_ds(a, tile_groups: int = 16, max_k: int = 64,
                   pair: bool = False) -> WellDsMatrix:
    """f64 host CSR -> double-single WELL (one packing, two value planes;
    the split stays in numpy until upload — see csr_to_dia_ds)."""
    from spmv_tpu.formats.well import _build_arrays, _equalize_square_pads

    v64, pos, w0, wseg, nseg_x, paired = _build_arrays(
        a, tile_groups, max_k, np.float64, pair=pair
    )
    if a.nrows == a.ncols:
        # square operators chain pad-free (formats/well._equalize_square_pads)
        v64, pos, w0, nseg_x = _equalize_square_pads(
            v64, pos, w0, nseg_x, tile_groups)
    hi, lo = ds_from_f64(v64)
    return WellDsMatrix(
        values_hi=jnp.asarray(hi),
        values_lo=jnp.asarray(lo),
        pos=jnp.asarray(pos),
        w0=jnp.asarray(w0),
        nrows=a.nrows,
        ncols=a.ncols,
        wseg=wseg,
        tile_groups=tile_groups,
        nseg=nseg_x,
        _nnz=a.nnz,
        paired=paired,
    )


def _well_ds_kernel(
    w0_ref, xh_hbm, xl_hbm, vh_ref, vl_ref, p_ref, yh_ref, yl_ref,
    xwin, xsem,
    *,
    wseg: int, tg: int, k: int, n_tiles: int, paired: bool,
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
        for leg in map(_idx32, range(2)):
            dma(0, leg, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        for leg in map(_idx32, range(2)):
            dma(_mod2(i + 1), leg, i + 1).start()

    for leg in map(_idx32, range(2)):
        dma(_mod2(i), leg, i).wait()

    b = k * tg
    pos = p_ref[...].reshape(b, LANES).astype(jnp.int32)
    lane = jax.lax.bitwise_and(pos, jnp.int32(LANES - 1))
    # leg segments from the pos endpoint lanes (see the f32 kernel)
    sa = jax.lax.shift_right_logical(pos[:, 0:1], jnp.int32(7))
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)

    if exact_gather:
        # interpret / reference-executor path: real row gather (see the
        # f32 kernel — XLA:CPU's default matmul precision is bf16 at these
        # shapes, and the interpreter drops per-op precision requests)
        def gather_leg(sc):
            def gather(xw):
                rows = jnp.take(xw, sc[:, 0], axis=0)
                with jax.enable_x64(False):  # see f32 kernel note
                    return jnp.take_along_axis(rows, lane, axis=1)

            return (gather(xwin[_mod2(i), _idx32(0)]),
                    gather(xwin[_mod2(i), _idx32(1)]))
    else:
        def gather_leg(sc):
            # exact fused gather per plane: 3-term bf16 lane-stacked split
            # in one matmul (see the f32 kernel for the rationale)
            oh = (sc == iota).astype(jnp.bfloat16)

            def gather(xw):
                x_hi = xw.astype(jnp.bfloat16)
                r1 = xw - x_hi.astype(jnp.float32)
                x_mid = r1.astype(jnp.bfloat16)
                x_lo = (r1 - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
                x3 = jnp.concatenate([x_hi, x_mid, x_lo], axis=1)
                rows3 = jnp.dot(oh, x3, preferred_element_type=jnp.float32)
                rows = (rows3[:, :LANES] + rows3[:, LANES:2 * LANES]
                        + rows3[:, 2 * LANES:])
                with jax.enable_x64(False):  # see f32 kernel note
                    return jnp.take_along_axis(rows, lane, axis=1)

            return (gather(xwin[_mod2(i), _idx32(0)]),
                    gather(xwin[_mod2(i), _idx32(1)]))

    gh, gl = gather_leg(sa)
    if paired:
        gbh, gbl = gather_leg(
            jax.lax.shift_right_logical(pos[:, LANES - 1:], jnp.int32(7)))
        segd = jax.lax.shift_right_logical(pos, jnp.int32(7))
        sel = segd == sa
        gh = jnp.where(sel, gh, gbh)
        gl = jnp.where(sel, gl, gbl)
    vh = vh_ref[...].reshape(b, LANES)
    vl = vl_ref[...].reshape(b, LANES)
    ph, plo = ds_mul_f32(vh, vl, gh, gl)

    acc_h = jnp.zeros((tg, LANES), jnp.float32)
    acc_l = jnp.zeros((tg, LANES), jnp.float32)
    for kk in range(k):
        acc_h, acc_l = ds_add(
            acc_h, acc_l,
            ph[kk * tg:(kk + 1) * tg, :], plo[kk * tg:(kk + 1) * tg, :],
        )
    yh_ref[:, :] = acc_h
    yl_ref[:, :] = acc_l


@functools.partial(
    jax.jit,
    static_argnames=("wseg", "tg", "k", "n_tiles", "paired", "interpret"),
)
def _spmv_well_ds_2d(
    vh, vl, pos, w0, xh2, xl2,
    wseg: int, tg: int, k: int, n_tiles: int,
    paired: bool = False,
    interpret: bool = False,
):
    g = vh.shape[1]
    kernel = functools.partial(
        _well_ds_kernel, wseg=wseg, tg=tg, k=k, n_tiles=n_tiles,
        paired=paired, exact_gather=interpret,
    )
    bspec = pl.BlockSpec((k, tg, LANES), lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x hi
            pl.BlockSpec(memory_space=pl.ANY),  # x lo
            bspec, bspec,                       # values hi/lo
            pl.BlockSpec((k, tg, LANES), lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
                         memory_space=pltpu.VMEM),  # pos
        ],
        out_specs=(
            pl.BlockSpec((tg, LANES), lambda i, w0_ref: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, LANES), lambda i, w0_ref: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, wseg, LANES), xh2.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(w0, xh2, xl2, vh, vl, pos)


def spmv_well_ds_pallas_2d(
    a: WellDsMatrix, xh2: jax.Array, xl2: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Double-single general-sparsity SpMV: (hi, lo) pairs in lane layout."""
    return _spmv_well_ds_2d(
        a.values_hi, a.values_lo, a.pos, a.w0, xh2, xl2,
        wseg=a.wseg, tg=a.tile_groups, k=a.k_slots, n_tiles=a.n_tiles,
        paired=bool(a.paired), interpret=interpret,
    )


def spmv_well_ds(a: WellDsMatrix, x, interpret: bool = False) -> np.ndarray:
    """Convenience: f64 vector in, f64 out (length nrows_pad)."""
    from spmv_tpu.ds import ds_to_f64

    xv = np.zeros(a.ncols_pad, dtype=np.float64)
    n = min(len(x), a.ncols_pad)
    xv[:n] = np.asarray(x, np.float64)[:n]
    hi, lo = ds_from_f64(xv)
    yh, yl = spmv_well_ds_pallas_2d(
        a, jnp.asarray(hi.reshape(-1, LANES)), jnp.asarray(lo.reshape(-1, LANES)),
        interpret=interpret,
    )
    return ds_to_f64(np.asarray(yh).reshape(-1), np.asarray(yl).reshape(-1))


def spmv_well_sym(
    a, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Symmetric general-sparsity SpMV: y = (L + D + L^T) x with BOTH
    triangles as WELL gather kernels (formats/well.SymWellMatrix) — no
    scatter on the hot path; the far remainders (usually empty after RCM)
    are two compact scatter-adds touching far_nnz elements each.

    ``x`` is flat (>= nrows); returns flat y of length nrows_pad. Replaces
    the reference's conflict-map/atomics symmetric kernels
    (reference spmv/openmp/csr_kernels.openmp.cpp:89-168,
    reference spmv/cuda/csr_kernels.cuda.cu:20-47) with a formulation TPU
    executes at gather speed."""
    yl = spmv_well_pallas(a.lower, x, interpret=interpret)
    yu = spmv_well_pallas(a.upper, x, interpret=interpret)
    npad = a.lower.nrows_pad
    xp = jnp.zeros((npad,), x.dtype).at[: min(x.shape[0], npad)].set(
        x[:npad]
    ) if x.shape[0] != npad else x
    y = yl + yu + a.diag * xp
    for far in (a.farl, a.faru):
        if far is not None:
            fr, fc, fv = far
            y = y.at[fr].add(fv * jnp.take(x, fc, axis=0),
                             mode="promise_in_bounds")
    return y


def spmv_well_sym_2d(a, x2: jax.Array, interpret: bool = False) -> jax.Array:
    """Lane-layout wrapper for solver chaining: x2 (nrows_pad/128, 128) ->
    y2 same shape (square operator; both triangles share nrows_pad)."""
    y = spmv_well_sym(a, x2.reshape(-1), interpret=interpret)
    return y.reshape(-1, LANES)


# ---------------------------------------------------------------------------
# symmetric double-single WELL: f64-class symmetric GENERAL sparsity
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SymWellDsMatrix:
    """Symmetric general sparsity at f64-class accuracy: the dual-WELL
    formulation (formats/well.SymWellMatrix — L and a pre-built L^T as two
    gather stacks, zero scatters) with double-single (hi/lo f32) value
    planes everywhere. Closes the last storage-mode x format hole: every
    {vanilla, symmetric} x {banded, general} x {f32, f64-class} cell now
    has a device path.

    Far remainders are stored as small ELL rectangles (not compact COO):
    the ds accumulation chain must stay error-free per OUTPUT row, which
    slot-wise ELL gathers give and scatter-adds do not."""

    lower: WellDsMatrix
    upper: WellDsMatrix
    diag_hi: jax.Array   # (nrows_pad,)
    diag_lo: jax.Array
    farl: tuple | None   # (colind (R,K) i32, vh (R,K), vl (R,K)) or None
    faru: tuple | None
    nrows: int

    @property
    def nrows_pad(self) -> int:
        return self.lower.nrows_pad


jax.tree_util.register_dataclass(
    SymWellDsMatrix,
    data_fields=["lower", "upper", "diag_hi", "diag_lo", "farl", "faru"],
    meta_fields=["nrows"],
)


def _pad_well_ds_to(w: WellDsMatrix, target_groups: int) -> WellDsMatrix:
    """DS twin of formats/well._pad_well_to: pad both value planes + pos +
    w0 to a larger common group/segment count."""
    if w.ngroups == target_groups and w.nseg == target_groups:
        return w
    assert target_groups % w.tile_groups == 0, (
        f"target_groups={target_groups} must be a multiple of "
        f"tile_groups={w.tile_groups}")
    padg = target_groups - w.ngroups
    return dataclasses.replace(
        w,
        values_hi=jnp.pad(w.values_hi, ((0, 0), (0, padg), (0, 0))),
        values_lo=jnp.pad(w.values_lo, ((0, 0), (0, padg), (0, 0))),
        pos=jnp.pad(w.pos, ((0, 0), (0, padg), (0, 0))),
        w0=jnp.pad(w.w0, (0, padg // w.tile_groups)),
        nseg=target_groups,
    )


def _far_ell_ds(far, nrows_pad):
    """Far-remainder CSR -> (colind, vh, vl) ELL rectangle (None if empty)."""
    if far.nnz == 0:
        return None
    kf = int(far.row_nnz().max())
    ci = np.zeros((nrows_pad, kf), np.int32)
    v64 = np.zeros((nrows_pad, kf), np.float64)
    lens = far.row_nnz()
    rows = np.repeat(np.arange(far.nrows), lens)
    slot = np.arange(far.nnz) - np.repeat(far.rowptr[:-1], lens)
    ci[rows, slot] = far.colind
    v64[rows, slot] = far.values
    vh, vl = ds_from_f64(v64)
    return (jnp.asarray(ci), jnp.asarray(vh), jnp.asarray(vl))


def csr_to_well_sym_ds(
    a,
    tile_groups: int = 16,
    max_k: int = 64,
    wseg_cap: int = 512,
) -> SymWellDsMatrix:
    """f64 symmetric host CSR -> dual-WELL double-single format. Only the
    lower triangle of ``a`` is read (reference symmetric-reader semantics,
    reference spmv/read_petsc.cpp:177-188)."""
    from spmv_tpu.formats.well import split_window

    if a.nrows != a.ncols:
        raise ValueError("symmetric storage requires a square matrix")
    lower, diag = a.split_lower_diag()
    upper_full = lower.transpose()
    near_l, far_l = split_window(lower, tile_groups, wseg_cap)
    near_u, far_u = split_window(upper_full, tile_groups, wseg_cap)
    wl = csr_to_well_ds(near_l, tile_groups, max_k)
    wu = csr_to_well_ds(near_u, tile_groups, max_k)
    # one common layout for both triangles (formats/well._pad_well_to)
    tgt = max(wl.ngroups, wu.ngroups)
    wl, wu = _pad_well_ds_to(wl, tgt), _pad_well_ds_to(wu, tgt)
    npad = max(wl.nrows_pad, wu.nrows_pad)
    d64 = np.zeros(npad, np.float64)
    d64[: len(diag)] = diag
    dh, dl = ds_from_f64(d64)
    return SymWellDsMatrix(
        lower=wl,
        upper=wu,
        diag_hi=jnp.asarray(dh),
        diag_lo=jnp.asarray(dl),
        farl=_far_ell_ds(far_l, npad),
        faru=_far_ell_ds(far_u, npad),
        nrows=a.nrows,
    )


def spmv_well_sym_ds(
    a: SymWellDsMatrix, xh: jax.Array, xl: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """y = (L + D + L^T) x in double-single arithmetic: two DS gather
    kernels + DS diagonal product + (small) DS far-ELL chains — no
    scatters, error-free per output row. ``(xh, xl)`` flat (>= nrows);
    returns flat (yh, yl) of length nrows_pad."""
    from spmv_tpu.ds import ds_add, ds_mul_f32

    npad = a.nrows_pad

    def padto(v, m):
        if v.shape[0] == m:
            return v
        return jnp.zeros((m,), v.dtype).at[: min(v.shape[0], m)].set(v[:m])

    def leg(w, h, l):
        xh2 = padto(h, w.ncols_pad).reshape(-1, LANES)
        xl2 = padto(l, w.ncols_pad).reshape(-1, LANES)
        yh2, yl2 = spmv_well_ds_pallas_2d(w, xh2, xl2, interpret=interpret)
        return yh2.reshape(-1), yl2.reshape(-1)

    yh, yl = leg(a.lower, xh, xl)
    uh, ul = leg(a.upper, xh, xl)
    yh, yl = ds_add(yh, yl, uh, ul)
    xh_p, xl_p = padto(xh, npad), padto(xl, npad)
    dh, dl = ds_mul_f32(a.diag_hi, a.diag_lo, xh_p, xl_p)
    yh, yl = ds_add(yh, yl, dh, dl)
    for far in (a.farl, a.faru):
        if far is not None:
            ci, vh, vl = far
            gh = jnp.take(xh_p, ci, axis=0)  # padto covers far cols <= npad
            gl = jnp.take(xl_p, ci, axis=0)
            fh = jnp.zeros((npad,), jnp.float32)
            fl = jnp.zeros((npad,), jnp.float32)
            for kk in range(ci.shape[1]):
                ph, plo = ds_mul_f32(vh[:, kk], vl[:, kk],
                                     gh[:, kk], gl[:, kk])
                fh, fl = ds_add(fh, fl, ph, plo)
            yh, yl = ds_add(yh, yl, fh, fl)
    return yh, yl
