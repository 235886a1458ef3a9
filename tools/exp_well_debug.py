#!/usr/bin/env python
"""Debug the WELL kernel on TPU: tiny deterministic case, dump intermediates
(window, one-hot matmul rows, lane-gathered rows, final y) per tile and
compare each against numpy."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.formats.well import csr_to_well, LANES


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    n = 4096  # 32 groups
    rows, cols, vals = [], [], []
    for off in (-900, -37, -1, 0, 2, 41, 1100):
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(len(i)) < 0.8
        i = i[keep]
        rows.append(i); cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    a = CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals).astype(np.float32), n, n)
    w = csr_to_well(a, tile_groups=8, dtype=np.float32)
    tg, k, wseg, n_tiles = w.tile_groups, w.k_slots, w.wseg, w.n_tiles
    g = w.ngroups
    b = k * tg
    print(f"K={k} wseg={wseg} n_tiles={n_tiles} G={g}", flush=True)

    x = rng.standard_normal(w.ncols_pad).astype(np.float32)
    x2 = jnp.asarray(x.reshape(-1, LANES))

    def kernel(w0_ref, x_hbm, v_ref, p_ref, y_ref, win_ref, rows_ref,
               gath_ref, xwin, xsem):
        i = pl.program_id(0)

        def dma(slot, tile):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(w0_ref[tile], 8), wseg), :],
                xwin.at[slot], xsem.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n_tiles)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        xw = xwin[i % 2].astype(jnp.float32)
        win_ref[:, :] = xw

        pos = p_ref[...].reshape(b, LANES)
        seg = jax.lax.shift_right_logical(pos[:, 0:1], jnp.int32(7))
        lane = jax.lax.bitwise_and(pos, jnp.int32(LANES - 1))
        onehot = (seg == jax.lax.broadcasted_iota(jnp.int32, (b, wseg), 1)
                  ).astype(jnp.float32)
        rows_v = jnp.dot(onehot, xw, preferred_element_type=jnp.float32)
        rows_ref[:, :] = rows_v
        gath = jnp.take_along_axis(rows_v, lane, axis=1)
        gath_ref[:, :] = gath
        contrib = v_ref[...].reshape(b, LANES).astype(jnp.float32) * gath
        acc = jnp.zeros((tg, LANES), jnp.float32)
        for kk in range(k):
            acc = acc + contrib[kk * tg:(kk + 1) * tg, :]
        y_ref[:, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, tg, LANES), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tg, LANES), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tg, LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wseg, LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wseg, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y, win, rowsv, gath = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * wseg, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * b, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(w.w0, x2, w.values, w.pos)
    y, win, rowsv, gath = map(np.asarray, (y, win, rowsv, gath))

    # numpy reference of each stage
    w0 = np.asarray(w.w0)
    posn = np.asarray(w.pos)
    valn = np.asarray(w.values)
    x2n = x.reshape(-1, LANES)
    ok_win = ok_rows = ok_gath = ok_y = True
    for t in range(n_tiles):
        win_ref_np = x2n[w0[t]:w0[t] + wseg]
        got = win[t * wseg:(t + 1) * wseg]
        if not np.array_equal(got, win_ref_np):
            bad = np.flatnonzero((got != win_ref_np).any(1))
            print(f"tile {t}: WINDOW mismatch rows {bad[:5]}", flush=True)
            ok_win = False
        p_t = posn[:, t * tg:(t + 1) * tg, :].reshape(b, LANES)
        v_t = valn[:, t * tg:(t + 1) * tg, :].reshape(b, LANES)
        seg = p_t[:, 0] >> 7
        lane = p_t & 127
        rows_np = win_ref_np[seg]  # (b,128)
        got_r = rowsv[t * b:(t + 1) * b]
        if not np.allclose(got_r, rows_np, atol=1e-6):
            bad = np.flatnonzero((np.abs(got_r - rows_np) > 1e-6).any(1))
            print(f"tile {t}: ROWS mismatch at {bad[:5]} (of {b})", flush=True)
            ok_rows = False
        gath_np = np.take_along_axis(rows_np, lane, axis=1)
        got_g = gath[t * b:(t + 1) * b]
        if not np.allclose(got_g, gath_np, atol=1e-6):
            bad = np.flatnonzero((np.abs(got_g - gath_np) > 1e-6).any(1))
            print(f"tile {t}: GATH mismatch at {bad[:5]}", flush=True)
            ok_gath = False
        y_np = (v_t * gath_np).reshape(k, tg, LANES).sum(0)
        got_y = y[t * tg:(t + 1) * tg]
        if not np.allclose(got_y, y_np, atol=1e-5):
            bad = np.flatnonzero((np.abs(got_y - y_np) > 1e-5).any(1))
            print(f"tile {t}: Y mismatch at rows {bad[:5]}", flush=True)
            ok_y = False
    print(f"window ok={ok_win} rows ok={ok_rows} gath ok={ok_gath} y ok={ok_y}",
          flush=True)
    want = a.matvec(x[:n])
    err = np.linalg.norm(y.reshape(-1)[:n] - want) / np.linalg.norm(want)
    print("end-to-end err:", err, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
