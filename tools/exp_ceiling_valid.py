#!/usr/bin/env python
"""VALID streaming ceiling: y = sum(d lanes) + u with u chained through the
loop (LICM-proof: the body depends on the carry). Traffic = (k+2) streams,
the real DIA kernel shape minus windows/rolls."""
import functools, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
K = 30
LANES = 128

def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out[7, 5])
    return (time.perf_counter() - t0) / K

def make(k, tr, nrows):
    n_tiles = nrows // tr
    def kern(d_ref, u_ref, y_ref):
        acc = u_ref[:, :]
        for kk in range(k):
            acc = acc + d_ref[:, kk*LANES:(kk+1)*LANES]
        y_ref[:, :] = acc * jnp.float32(1e-3)
    def call(d, u):
        return pl.pallas_call(
            kern, grid=(n_tiles,),
            in_specs=[pl.BlockSpec((tr, k*LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tr, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tr, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(d, u)
    @jax.jit
    def loop(d, u):
        return jax.lax.fori_loop(0, K, lambda i, u: call(d, u), u)
    return loop

def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    nrows, tr = 80896, 1264
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((nrows, LANES)).astype(np.float32))
    data = {k: jnp.asarray(rng.standard_normal((nrows, k*LANES)).astype(np.float32))
            for k in (3, 5)}
    loops = {k: make(k, tr, nrows) for k in (3, 5)}
    n = 64*1024*1024
    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(0, K, lambda i, u: u*jnp.float32(1.0000001), v)
    cbuf = jnp.ones((n//128, 128), jnp.float32)
    best = {k: 1e9 for k in loops}
    t_c = 1e9
    for trial in range(5):
        t_c = min(t_c, timed(copy_loop, (cbuf,)))
        for k, f in loops.items():
            dt = timed(f, (data[k], u))
            if trial:
                best[k] = min(best[k], dt)
    roof = 2*n*4/t_c/1e9
    print(f"copy roofline {roof:.0f} GB/s", flush=True)
    for k, t in best.items():
        traffic = (k+2)*nrows*LANES*4
        print(f"k={k}: {t*1e3:.3f} ms  {100*traffic/t/1e9/roof:5.1f}% of copy",
              flush=True)
main()
