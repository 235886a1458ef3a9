#!/usr/bin/env python
"""Which error-free transformation breaks under Mosaic? Run each primitive
in a tiny Pallas kernel on chip and compare against exact f64 on host."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spmv_tpu.ds import two_sum, two_prod, split, ds_mul_f32, ds_add


def run_kernel(fn, n_out, *arrays):
    def kernel(*refs):
        ins = [r[...] for r in refs[: len(arrays)]]
        outs = fn(*ins)
        for o_ref, o in zip(refs[len(arrays):], outs):
            o_ref[...] = o

    shape = arrays[0].shape
    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(n_out)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrays),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(n_out)),
    )(*arrays)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    a64 = rng.standard_normal((256, 128))
    b64 = rng.standard_normal((256, 128))
    a = jnp.asarray(a64.astype(np.float32))
    b = jnp.asarray(b64.astype(np.float32))
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)

    # two_sum: s + e must equal a + b exactly
    s, e = run_kernel(lambda x, y: two_sum(x, y), 2, a, b)
    exact = a64 + b64
    err = np.abs(np.asarray(s, np.float64) + np.asarray(e, np.float64) - exact).max()
    print(f"two_sum max abs err: {err:.3e}", flush=True)

    # split: hi + lo == a and hi has <= 12 significand bits
    hi, lo = run_kernel(lambda x: split(x), 2, a)
    recon = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    print(f"split recon err: {np.abs(recon - a64).max():.3e}; "
          f"hi 12-bit: {np.all(np.asarray(hi) == np.float32((np.asarray(hi, np.float64) * 2**12).round() / 2**12) ) }",
          flush=True)

    # two_prod: p + e == a * b exactly
    p, e = run_kernel(lambda x, y: two_prod(x, y), 2, a, b)
    exact = a64 * b64
    err = np.abs(np.asarray(p, np.float64) + np.asarray(e, np.float64) - exact).max()
    print(f"two_prod max abs err: {err:.3e} (f32 rounding alone would be ~1e-8)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
