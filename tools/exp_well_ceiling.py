#!/usr/bin/env python
"""WELL loss attribution: (a) full kernel, (b) streaming ceiling (values+pos
tiles + y only, no window/matmul/gather), (c) no-lane-gather variant."""
import os
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 20
LANES = 128


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out.reshape(-1)[7])
    return (time.perf_counter() - t0) / K


def main():
    from spmv_tpu.formats.csr import CSRHost
    from spmv_tpu.formats.well import csr_to_well
    from spmv_tpu.ops.spmv_well_pallas import spmv_well_pallas_2d, well_to_2d

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    n = 4_000_000
    rows, cols, vals = [], [], []
    for off in (-1500, -130, -1, 0, 1, 128, 1400):
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(len(i)) < 0.85
        i = i[keep]
        rows.append(i); cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    a = CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals).astype(np.float32), n, n)
    w = csr_to_well(a, tile_groups=128, dtype=np.float32)
    tg, k, wseg, n_tiles, g = (w.tile_groups, w.k_slots, w.wseg,
                               w.n_tiles, w.ngroups)
    print(f"K={k} wseg={wseg} n_tiles={n_tiles} pos dtype={w.pos.dtype}",
          flush=True)
    x2 = well_to_2d(w, jnp.full((w.ncols_pad,), 1e-3, jnp.float32))

    def ceiling_kernel(v_ref, p_ref, y_ref):
        b = k * tg
        contrib = (v_ref[...].reshape(b, LANES)
                   * p_ref[...].reshape(b, LANES).astype(jnp.float32))
        acc = jnp.zeros((tg, LANES), jnp.float32)
        for kk in range(k):
            acc = acc + contrib[kk * tg:(kk + 1) * tg, :]
        y_ref[:, :] = acc

    def ceiling_call(v, p):
        return pl.pallas_call(
            ceiling_kernel, grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((k, tg, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tg, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tg, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(v, p)

    @jax.jit
    def ceil_loop(v, p, u):
        return jax.lax.fori_loop(
            0, K,
            lambda i, u: u * jnp.float32(0.5)
            + ceiling_call(v, p)[: u.shape[0]] * jnp.float32(1e-9), u)

    @jax.jit
    def full_loop(vv, pp, w0, u):
        from spmv_tpu.formats.well import WellMatrix
        ww = WellMatrix(values=vv, pos=pp, w0=w0, nrows=w.nrows,
                        ncols=w.ncols, wseg=w.wseg,
                        tile_groups=w.tile_groups, nseg=w.nseg, _nnz=w._nnz)
        def body(i, u):
            y = spmv_well_pallas_2d(ww, u) * jnp.float32(0.125)
            if y.shape[0] >= u.shape[0]:
                return y[: u.shape[0]]
            return jnp.pad(y, ((0, u.shape[0] - y.shape[0]), (0, 0)))
        return jax.lax.fori_loop(0, K, body, u)

    t_c = t_f = 1e9
    for _ in range(3):
        t_c = min(t_c, timed(ceil_loop, (w.values, w.pos, x2)))
        t_f = min(t_f, timed(full_loop, (w.values, w.pos, w.w0, x2)))
    bytes_tiles = (w.values.size * 4 + w.pos.size * w.pos.dtype.itemsize
                   + w.nrows_pad * 4)
    print(f"streaming ceiling: {t_c*1e3:.3f} ms = "
          f"{bytes_tiles/t_c/1e9:.0f} GB/s", flush=True)
    print(f"full kernel:       {t_f*1e3:.3f} ms "
          f"(gather machinery costs {(t_f-t_c)*1e3:.3f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
