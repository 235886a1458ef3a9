#!/usr/bin/env python
"""DIA kernel loss attribution: compare (a) the real kernel, (b) a variant
with no x window at all (streams data tiles + writes y: the pipelined-path
ceiling), (c) window DMA at background priority."""
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

K = 30
LANES = 128


def timed(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out[7, 5])
    return (time.perf_counter() - t0) / K


def main():
    import spmv_tpu.ops.spmv_dia_pallas as dp
    from spmv_tpu.formats.dia import csr_to_dia
    from spmv_tpu.gen import create_laplace_2d

    print("platform:", jax.devices()[0].platform, flush=True)
    nx = 3200
    a = create_laplace_2d(nx, nx, dtype=np.float32)
    d = csr_to_dia(a, row_align=1024, dtype=np.float32)
    nrows = d.nrows_pad // 128
    hr = dp.dia_halo_rows(d)
    k = len(d.offsets)
    tr = 1024
    n_tiles = nrows // tr

    def ceiling_kernel(data_ref, y_ref):
        acc = jnp.zeros((tr, LANES), jnp.float32)
        for kk in range(k):
            acc = acc + data_ref[kk].astype(jnp.float32) * jnp.float32(1.0001)
        y_ref[:, :] = acc

    @jax.jit
    def ceiling_loop(data, u):
        def body(i, u):
            y = pl.pallas_call(
                ceiling_kernel,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec((k, tr, LANES), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((tr, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(data)
            return u * jnp.float32(0.5) + y[:u.shape[0]] * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, K, body, u)

    n = 64 * 1024 * 1024

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(0, K, lambda i, u: u * jnp.float32(1.0000001), v)

    x2 = dp.dia_to_2d(d, jnp.full((d.nrows_pad,), 1e-3, jnp.float32))
    scale = jnp.float32(0.125)

    @jax.jit
    def real_loop(dd, u):
        return jax.lax.fori_loop(
            0, K, lambda i, u: dp._spmv_dia_pallas_2d(dd, u, d.offsets, tr, hr) * scale, u
        )

    t_c = t_ceil = t_real = 1e9
    for _ in range(3):
        t_c = min(t_c, timed(copy_loop, (jnp.ones((n // 128, 128), jnp.float32),)))
        t_ceil = min(t_ceil, timed(ceiling_loop, (d.data, x2)))
        t_real = min(t_real, timed(real_loop, (d.data, x2)))
    roof = 2 * n * 4 / t_c / 1e9
    tr_data = (d.data.size + d.nrows_pad) * 4  # data read + y write
    tr_real = (d.data.size + 2 * d.nrows_pad) * 4
    print(f"roofline: {roof:.0f} GB/s", flush=True)
    print(f"ceiling (no window): {t_ceil*1e3:.3f} ms = "
          f"{tr_data/t_ceil/1e9:.0f} GB/s ({100*tr_data/t_ceil/1e9/roof:.1f}%)",
          flush=True)
    print(f"real kernel:         {t_real*1e3:.3f} ms = "
          f"{tr_real/t_real/1e9:.0f} GB/s ({100*tr_real/t_real/1e9/roof:.1f}%)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
