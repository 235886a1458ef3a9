#!/usr/bin/env python
"""Same-run A/B: DIA kernel tr=1024 with default vs explicit 128MB
vmem_limit_bytes."""
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
    tr = 1024
    n_tiles = nrows // tr
    x2 = dp.dia_to_2d(d, jnp.full((d.nrows_pad,), 1e-3, jnp.float32))
    scale = jnp.float32(0.125)

    def make(vmem_limit):
        kern = functools.partial(
            dp._dia_kernel, offsets=d.offsets, tr=tr, hr=hr,
            n_tiles=n_tiles, sub=16)
        params = dict(dimension_semantics=("arbitrary",))
        if vmem_limit:
            params["vmem_limit_bytes"] = vmem_limit

        def call(data, u):
            return pl.pallas_call(
                kern,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((tr, len(d.offsets) * LANES),
                                 lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((tr, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((2, tr + 2 * hr, LANES), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(**params),
            )(data, u)

        @jax.jit
        def loop(data, u):
            return jax.lax.fori_loop(
                0, K, lambda i, u: call(data, u) * scale, u)
        return loop

    f_def = make(None)
    f_128 = make(128 * 1024 * 1024)
    t_def = t_128 = 1e9
    for _ in range(4):
        t_def = min(t_def, timed(f_def, (d.data, x2)))
        t_128 = min(t_128, timed(f_128, (d.data, x2)))
    print(f"default limit: {t_def*1e3:.3f} ms", flush=True)
    print(f"128MB limit:   {t_128*1e3:.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
