#!/usr/bin/env python
"""Pipelined-streaming ceiling vs grid dimension_semantics: the no-window
DIA kernel (data tiles + y only) under 'arbitrary' vs 'parallel'."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 30
LANES = 128


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out[7, 5])
    return (time.perf_counter() - t0) / K


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    k = 5
    nrows = 80896
    tr = 1024
    n_tiles = nrows // tr
    rng = np.random.default_rng(0)
    data_i = jnp.asarray(rng.standard_normal((nrows, k * LANES)).astype(np.float32))

    def kern(d_ref, y_ref):
        acc = jnp.zeros((tr, LANES), jnp.float32)
        for kk in range(k):
            acc = acc + d_ref[:, kk * LANES:(kk + 1) * LANES] * jnp.float32(1.0001)
        y_ref[:, :] = acc

    def make_loop(sem):
        def call(d):
            return pl.pallas_call(
                kern, grid=(n_tiles,),
                in_specs=[pl.BlockSpec((tr, k * LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((tr, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(sem,)),
            )(d)

        @jax.jit
        def loop(d, u):
            return jax.lax.fori_loop(
                0, K,
                lambda i, u: u * jnp.float32(0.5) + call(d)[: u.shape[0]] * jnp.float32(1e-9),
                u)
        return loop

    n = 64 * 1024 * 1024

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(0, K, lambda i, u: u * jnp.float32(1.0000001), v)

    u = jnp.ones((nrows, LANES), jnp.float32)
    loops = {s: make_loop(s) for s in ("arbitrary", "parallel")}
    best = {s: 1e9 for s in loops}
    t_c = 1e9
    for _ in range(3):
        t_c = min(t_c, timed(copy_loop, (jnp.ones((n // 128, 128), jnp.float32),)))
        for s, f in loops.items():
            best[s] = min(best[s], timed(f, (data_i, u)))
    roof = 2 * n * 4 / t_c / 1e9
    traffic = (k + 1) * nrows * LANES * 4
    print(f"roofline {roof:.0f} GB/s", flush=True)
    for s, t in best.items():
        print(f"{s:9}: {t*1e3:.3f} ms = {traffic/t/1e9:.0f} GB/s "
              f"({100*traffic/t/1e9/roof:.1f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
