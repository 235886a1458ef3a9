#!/usr/bin/env python
"""Why is the symmetric DIA kernel only ~7% faster than vanilla with ~29%
less traffic? Same-run interleaved A/B of ablated variants on the bench
config (10.24M-row 2-D Laplacian, fp32):

  van        production vanilla kernel (5 offsets)
  sym        production symmetric kernel (3 stored offsets), picked tr
  sym_trXXX  symmetric at alternative tile sizes (VMEM-budget check)
  symNoT     transpose contributions removed (same traffic, less compute)
  symNoRoll  transpose kept but lane-rolls forced to r=0 row slices
             (same slice count, no roll/select chains; wrong values)
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

from spmv_tpu.formats.dia import DiaMatrix  # noqa: E402
from spmv_tpu.gen import create_laplace_2d  # noqa: E402
from spmv_tpu.formats.dia import csr_to_dia  # noqa: E402
from spmv_tpu.ops.spmv_dia_pallas import (  # noqa: E402
    LANES,
    _spmv_dia_pallas_2d,
    _spmv_dia_sym_pallas_2d,
    dia_halo_rows,
    _pick_tile_rows,
)

K = 30


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out[7, 5])
    return (time.perf_counter() - t0) / K


def _ablated_sym_kernel(
    x_hbm, d_hbm, y_ref, xwin, dwin, xsem, dsem,
    *, offsets, tr, hr, n_tiles, sub, mode,
):
    """Copy of _dia_sym_kernel's DMA skeleton with an ablated compute tail."""
    i = pl.program_id(0)
    k = len(offsets)
    wrows = tr + 2 * hr

    def x_start(slot, tile):
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

        @pl.when((tile > 0) & (tile < n_tiles - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(tile * tr - hr, sub), wrows), :],
                xwin.at[slot], xsem.at[slot],
            ).start()

    def x_wait(slot, tile):
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

        @pl.when((tile > 0) & (tile < n_tiles - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(tile * tr - hr, sub), wrows), :],
                xwin.at[slot], xsem.at[slot],
            ).wait()

    def d_start(slot, tile):
        last = tile == n_tiles - 1

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

    @pl.when(i == 0)
    def _():
        xwin[i % 2, 0:hr, :] = jnp.zeros((hr, LANES), xwin.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        xwin[i % 2, tr + hr: wrows, :] = jnp.zeros((hr, LANES), xwin.dtype)
        dwin[i % 2, pl.ds(tr, hr), :] = jnp.zeros((hr, k * LANES), dwin.dtype)

    xw = xwin[i % 2]
    dw = dwin[i % 2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)

    def shifted(buf, base_rows, t, noroll=False):
        q, rr = divmod(t, LANES)
        if rr == 0 or noroll:
            return buf[base_rows + q: base_rows + q + tr, :].astype(jnp.float32)
        r0 = pltpu.roll(
            buf[base_rows + q: base_rows + q + tr, :].astype(jnp.float32),
            LANES - rr, 1)
        r1 = pltpu.roll(
            buf[base_rows + q + 1: base_rows + q + tr + 1, :].astype(jnp.float32),
            LANES - rr, 1)
        return jnp.where(lane < LANES - rr, r0, r1)

    noroll = mode == "noroll"
    acc = jnp.zeros((tr, LANES), jnp.float32)
    for kk, off in enumerate(offsets):
        dk = dw[:, kk * LANES: (kk + 1) * LANES]
        acc = acc + dk[0:tr, :].astype(jnp.float32) * shifted(
            xw, 0, hr * LANES + off, noroll)
        if off < 0 and mode != "noT":
            s = -off
            acc = acc + shifted(dk, 0, s, noroll) * shifted(
                xw, 0, hr * LANES + s, noroll)
    y_ref[:, :] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "tr", "hr", "mode"))
def _sym_ablate(data, x2, offsets, tr, hr, mode):
    nrows, klanes = data.shape
    k = klanes // LANES
    n_tiles = nrows // tr
    sub = 16 if tr % 16 == 0 else 8
    kernel = functools.partial(
        _ablated_sym_kernel, offsets=offsets, tr=tr, hr=hr,
        n_tiles=n_tiles, sub=sub, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tr, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * hr, LANES), x2.dtype),
            pltpu.VMEM((2, tr + hr, k * LANES), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x2, data)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    nx = 3200
    a = create_laplace_2d(nx, dtype=np.float32)            # 10.24M rows
    d_full = csr_to_dia(a, dtype=np.float32)
    d_sym = csr_to_dia(a, dtype=np.float32, symmetric=True)
    nrows = d_full.nrows_pad // LANES
    hr_f = dia_halo_rows(d_full)
    hr_s = dia_halo_rows(d_sym)
    tr_f = _pick_tile_rows(nrows, len(d_full.offsets), hr_f, 4)
    tr_s = _pick_tile_rows(nrows, len(d_sym.offsets), hr_s, 4, sym=True)
    print(f"nrows={nrows} tr_full={tr_f} tr_sym={tr_s} "
          f"hr_f={hr_f} hr_s={hr_s}", flush=True)
    print("offsets full:", d_full.offsets, "sym:", d_sym.offsets, flush=True)

    u0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((nrows, LANES))
        .astype(np.float32))

    def loop_of(call):
        @jax.jit
        def loop(data, u):
            return jax.lax.fori_loop(0, K, lambda i, v: call(data, v), u)
        return loop

    variants = {
        "van": (loop_of(lambda dd, v: _spmv_dia_pallas_2d(
            dd, v, d_full.offsets, tr_f, hr_f)), d_full.data),
        "sym": (loop_of(lambda dd, v: _spmv_dia_sym_pallas_2d(
            dd, v, d_sym.offsets, tr_s, hr_s)), d_sym.data),
        "symNoT": (loop_of(lambda dd, v: _sym_ablate(
            dd, v, d_sym.offsets, tr_s, hr_s, "noT")), d_sym.data),
        "symNoRoll": (loop_of(lambda dd, v: _sym_ablate(
            dd, v, d_sym.offsets, tr_s, hr_s, "noroll")), d_sym.data),
    }
    for tr_alt in (1000, 1600, 2000):
        if nrows % tr_alt == 0 and tr_alt != tr_s:
            try:
                f = loop_of(lambda dd, v, t=tr_alt: _spmv_dia_sym_pallas_2d(
                    dd, v, d_sym.offsets, t, hr_s))
                f(d_sym.data, u0)  # compile check
                variants[f"sym_tr{tr_alt}"] = (f, d_sym.data)
            except Exception as e:  # noqa: BLE001
                print(f"sym_tr{tr_alt}: compile failed: {str(e)[:120]}",
                      flush=True)

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
            best[name] = min(best[name], timed(f, (dd, u0)))
        print(f"trial {trial}: " + " ".join(
            f"{k}={v*1e3:.3f}ms" for k, v in best.items()), flush=True)
    roof = 2 * n * 4 / t_c / 1e9
    print(f"copy roofline {roof:.0f} GB/s", flush=True)
    kf, ks = len(d_full.offsets), len(d_sym.offsets)
    for name, t in best.items():
        k = kf if name == "van" else ks
        traffic = (k + 2) * nrows * LANES * 4
        eff = (kf + 2) * nrows * LANES * 4  # vanilla-equivalent traffic
        print(f"{name:10}: {t*1e3:.3f} ms  stored {traffic/t/1e9:6.0f} GB/s "
              f"({100*traffic/t/1e9/roof:5.1f}%)  effective "
              f"{eff/t/1e9:6.0f} GB/s ({100*eff/t/1e9/roof:5.1f}%)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
