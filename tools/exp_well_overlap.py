#!/usr/bin/env python
"""WELL kernel overlap diagnosis (NEXT.md round-4 item 1).

Ablation kernels that surgically remove one stage each, timed sustained
(chained carry, same-run interleaved) to attribute the gap between the
WELL kernel's ~462 GB/s and the chip's ~555 GB/s achievable stream rate:

  full       — the library kernel (baseline)
  nolane     — lane gather removed (keeps MXU one-hot + window DMA)
  nomxu      — one-hot MXU gather replaced by a broadcast of window row 0
               (keeps lane gather + window DMA)
  nogather   — both gathers removed (keeps window DMA + value stream)
  streamonly — values+pos streamed, trivial combine (keeps window DMA)
  bf16       — full kernel on bf16-stored values (traffic prototype for
               the documented-precision-contract option)

Every variant's output depends on the window DMA (hence on x, hence on
the loop carry) so the fori_loop cannot be hoisted (BENCH_NOTES
"MEASUREMENT TRAP").
"""
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

from spmv_tpu.ops.spmv_dia_pallas import _idx32, _mod2
from spmv_tpu.formats.well import LANES

K_LOOP = 200


def _kernel(
    w0_ref, x_hbm, v_ref, p_ref, y_ref, xwin, xsem,
    *, wseg, tg, k, n_tiles, mode,
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
    xw = xwin[_mod2(i)].astype(jnp.float32)

    b = k * tg
    if mode in ("streamonly", "indep"):
        contrib = (v_ref[...].reshape(b, LANES).astype(jnp.float32)
                   + p_ref[...].reshape(b, LANES).astype(jnp.float32))
    else:
        pos = p_ref[...].reshape(b, LANES).astype(jnp.int32)
        seg = jax.lax.shift_right_logical(pos[:, 0:1], jnp.int32(7))
        lane = jax.lax.bitwise_and(pos, jnp.int32(LANES - 1))
        if mode in ("full", "nolane", "bf16"):
            onehot = (
                seg == jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)
            ).astype(jnp.bfloat16)
            x_hi = xw.astype(jnp.bfloat16)
            r1 = xw - x_hi.astype(jnp.float32)
            x_mid = r1.astype(jnp.bfloat16)
            x_lo = (r1 - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            x3 = jnp.concatenate([x_hi, x_mid, x_lo], axis=1)
            rows3 = jnp.dot(onehot, x3, preferred_element_type=jnp.float32)
            rows = (rows3[:, :LANES] + rows3[:, LANES:2 * LANES]
                    + rows3[:, 2 * LANES:])
        elif mode == "constoh":
            # constant one-hot: keeps the exact MXU shape, removes the
            # iota/compare/cast construction (isolates VPU construction cost)
            onehot = jnp.full((b, wseg), jnp.bfloat16(1.0 / wseg))
            x_hi = xw.astype(jnp.bfloat16)
            r1 = xw - x_hi.astype(jnp.float32)
            x_mid = r1.astype(jnp.bfloat16)
            x_lo = (r1 - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            x3 = jnp.concatenate([x_hi, x_mid, x_lo], axis=1)
            rows3 = jnp.dot(onehot, x3, preferred_element_type=jnp.float32)
            rows = (rows3[:, :LANES] + rows3[:, LANES:2 * LANES]
                    + rows3[:, 2 * LANES:])
        elif mode == "nosplit":
            # real one-hot, single bf16 term (no 3-term split): isolates the
            # split/concat/recombine cost; result is approximate
            onehot = (
                seg == jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)
            ).astype(jnp.bfloat16)
            rows = jnp.dot(onehot, xw.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:  # nomxu / nogather: broadcast window row 0 (keeps x dep)
            rows = jnp.broadcast_to(xw[0:1, :], (b, LANES))
        if mode in ("full", "nomxu", "bf16", "constoh", "nosplit"):
            with jax.enable_x64(False):
                gathered = jnp.take_along_axis(rows, lane, axis=1)
        else:  # nolane / nogather
            gathered = rows
        contrib = v_ref[...].reshape(b, LANES).astype(jnp.float32) * gathered

    acc = jnp.zeros((tg, LANES), jnp.float32)
    for kk in range(k):
        acc = acc + contrib[kk * tg:(kk + 1) * tg, :]
    if mode == "streamonly":
        acc = acc + xw[0:1, :]  # keep the x dependence
    if mode == "indep":
        # decisive overlap probe: compute of the real kernel's MXU size that
        # does NOT read the streamed blocks (only the window) — if this is
        # free, overlap works and the dependency structure is the problem;
        # if additive, DMA and compute serialize on this chip, period.
        oh = jnp.broadcast_to(xw[:, 0:1].astype(jnp.bfloat16).T, (b, wseg))
        x3i = jnp.concatenate(
            [xw.astype(jnp.bfloat16)] * 3, axis=1)
        ri = jnp.dot(oh, x3i, preferred_element_type=jnp.float32)
        with jax.enable_x64(False):
            gi = jnp.take_along_axis(
                ri[:, :LANES],
                jax.lax.broadcasted_iota(jnp.int32, (b, LANES), 1), axis=1)
        acc = acc + gi[:tg, :] * jnp.float32(1e-30)
    y_ref[:, :] = acc.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("wseg", "tg", "k", "n_tiles", "mode")
)
def _spmv_ab(values, pos, w0, x2, wseg, tg, k, n_tiles, mode):
    g = values.shape[1]
    kernel = functools.partial(
        _kernel, wseg=wseg, tg=tg, k=k, n_tiles=n_tiles, mode=mode
    )
    bspec = lambda: pl.BlockSpec(
        (k, tg, LANES), lambda i, w0_ref: (np.int32(0), i, np.int32(0)),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), bspec(), bspec()],
        out_specs=pl.BlockSpec(
            (tg, LANES), lambda i, w0_ref: (i, np.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wseg, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(w0, x2, values, pos)


def _manual_kernel(
    w0_ref, x_hbm, v_hbm, p_hbm, y_ref, xwin, xsem, vbuf, pbuf, vpsem,
    *, wseg, tg, k, n_tiles,
):
    """Full WELL compute, but values/pos streamed with MANUAL double-buffered
    DMAs: the copy for tile i+1 is started BEFORE tile i's compute, so any
    failure of the auto-pipeline to overlap is bypassed."""
    i = pl.program_id(0)

    def dma_x(slot, tile):
        slot, tile = _idx32(slot), _idx32(tile)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(w0_ref[tile], 8), wseg), :],
            xwin.at[slot],
            xsem.at[slot],
        )

    def dma_v(slot, tile):
        slot, tile = _idx32(slot), _idx32(tile)
        return pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(tile * tg, tg), :], vbuf.at[slot],
            vpsem.at[slot, 0],
        )

    def dma_p(slot, tile):
        slot, tile = _idx32(slot), _idx32(tile)
        return pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(tile * tg, tg), :], pbuf.at[slot],
            vpsem.at[slot, 1],
        )

    @pl.when(i == 0)
    def _():
        dma_x(0, 0).start()
        dma_v(0, 0).start()
        dma_p(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        s = _mod2(i + 1)
        dma_x(s, i + 1).start()
        dma_v(s, i + 1).start()
        dma_p(s, i + 1).start()

    s = _mod2(i)
    dma_x(s, i).wait()
    dma_v(s, i).wait()
    dma_p(s, i).wait()
    xw = xwin[s].astype(jnp.float32)

    b = k * tg
    pos = pbuf[s].reshape(b, LANES).astype(jnp.int32)
    seg = jax.lax.shift_right_logical(pos[:, 0:1], jnp.int32(7))
    lane = jax.lax.bitwise_and(pos, jnp.int32(LANES - 1))
    onehot = (
        seg == jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)
    ).astype(jnp.bfloat16)
    x_hi = xw.astype(jnp.bfloat16)
    r1 = xw - x_hi.astype(jnp.float32)
    x_mid = r1.astype(jnp.bfloat16)
    x_lo = (r1 - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    x3 = jnp.concatenate([x_hi, x_mid, x_lo], axis=1)
    rows3 = jnp.dot(onehot, x3, preferred_element_type=jnp.float32)
    rows = (rows3[:, :LANES] + rows3[:, LANES:2 * LANES]
            + rows3[:, 2 * LANES:])
    with jax.enable_x64(False):
        gathered = jnp.take_along_axis(rows, lane, axis=1)
    contrib = vbuf[s].reshape(b, LANES) * gathered

    acc = jnp.zeros((tg, LANES), jnp.float32)
    for kk in range(k):
        acc = acc + contrib[kk * tg:(kk + 1) * tg, :]
    y_ref[:, :] = acc.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("wseg", "tg", "k", "n_tiles")
)
def _spmv_manual(values, pos, w0, x2, wseg, tg, k, n_tiles):
    g = values.shape[1]
    kernel = functools.partial(
        _manual_kernel, wseg=wseg, tg=tg, k=k, n_tiles=n_tiles
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tg, LANES), lambda i, w0_ref: (i, np.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wseg, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, k, tg, LANES), values.dtype),
            pltpu.VMEM((2, k, tg, LANES), pos.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(w0, x2, values, pos)


def timed(fn_loop, args, k_loop=K_LOOP):
    t0 = time.perf_counter()
    out = fn_loop(*args)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / k_loop


def build_matrix(n=4_000_000, seed=0):
    from spmv_tpu.formats.csr import CSRHost

    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for off in (-1500, -130, -1, 0, 1, 128, 1400):
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(len(i)) < 0.85
        i = i[keep]
        rows.append(i); cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    return CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vals).astype(np.float32), n, n)


def main(modes=None):
    from spmv_tpu.formats.well import csr_to_well
    from spmv_tpu.ops.spmv_well_pallas import well_to_2d

    print("platform:", jax.devices()[0].platform, flush=True)
    a = build_matrix()
    tg = 64
    w = csr_to_well(a, tile_groups=tg, dtype=np.float32)
    import ml_dtypes
    wb = csr_to_well(a, tile_groups=tg, dtype=ml_dtypes.bfloat16)
    print(f"matrix: n={a.nrows} nnz={a.nnz} K={w.k_slots} wseg={w.wseg} "
          f"occ={w.occupancy:.2f} pos={w.pos.dtype}", flush=True)

    x2 = well_to_2d(w, jnp.full((w.ncols_pad,), 1e-3, jnp.float32))
    scale = jnp.float32(0.125)

    def make_loop(ww, mode):
        @jax.jit
        def loop(vv, pp, w0, u):
            def body(i, u):
                if mode == "manual":
                    y = _spmv_manual(vv, pp, w0, u, ww.wseg, ww.tile_groups,
                                     ww.k_slots, ww.n_tiles) * scale
                else:
                    y = _spmv_ab(vv, pp, w0, u, ww.wseg, ww.tile_groups,
                                 ww.k_slots, ww.n_tiles, mode) * scale
                if y.shape[0] >= u.shape[0]:
                    return y[: u.shape[0]].astype(u.dtype)
                return jnp.pad(y, ((0, u.shape[0] - y.shape[0]), (0, 0))
                               ).astype(u.dtype)
            return jax.lax.fori_loop(0, K_LOOP, body, u)
        return loop

    # correctness spot-check of 'full' against the library kernel
    from spmv_tpu.ops.spmv_well_pallas import spmv_well_pallas_2d
    y_lib = np.asarray(spmv_well_pallas_2d(w, x2))
    y_ab = np.asarray(_spmv_ab(w.values, w.pos, w.w0, x2, w.wseg,
                               w.tile_groups, w.k_slots, w.n_tiles, "full"))
    print("full-vs-lib max|d|:", float(np.abs(y_lib - y_ab).max()), flush=True)

    # manual correctness check
    y_man = np.asarray(_spmv_manual(w.values, w.pos, w.w0, x2, w.wseg,
                                    w.tile_groups, w.k_slots, w.n_tiles))
    print("manual-vs-lib max|d|:", float(np.abs(y_lib - y_man).max()),
          flush=True)

    if modes is None:
        modes = ["full", "indep", "streamonly"]
    loops = {m: make_loop(wb if m == "bf16" else w, m) for m in modes}
    argsets = {m: ((wb if m == "bf16" else w).values,
                   (wb if m == "bf16" else w).pos,
                   (wb if m == "bf16" else w).w0, x2) for m in modes}

    # copy-loop roofline (same-run)
    nstream = 64 * 1024 * 1024

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(
            0, K_LOOP, lambda i, u: u * jnp.float32(1.0000001), v)

    # warm up everything once
    for m in modes:
        _ = float(loops[m](*argsets[m]).reshape(-1)[0])
    cbuf = jnp.ones((nstream // 128, 128), jnp.float32)
    _ = float(copy_loop(cbuf)[0, 0])

    # interleaved trials
    best = {m: 1e9 for m in modes}
    best_c = 1e9
    for trial in range(4):
        best_c = min(best_c, timed(copy_loop, (cbuf,)))
        for m in modes:
            best[m] = min(best[m], timed(loops[m], argsets[m]))
    roof = 2 * nstream * 4 / best_c / 1e9
    print(f"copy roofline: {roof:.0f} GB/s", flush=True)
    for m in modes:
        ww = wb if m == "bf16" else w
        traffic = (ww.values.size * ww.values.dtype.itemsize
                   + ww.pos.size * ww.pos.dtype.itemsize
                   + 2 * ww.nrows_pad * 4)
        t = best[m]
        print(f"{m:>10}: {t*1e3:.3f} ms | {traffic/t/1e9:6.0f} GB/s stored "
              f"| {traffic/1e6:.0f} MB", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
