#!/usr/bin/env python
"""Experiment: Mosaic tpu.dynamic_gather (jnp.take_along_axis) inside Pallas.

Questions:
1. Does take_along_axis(x, idx, axis=0) compile+run in a TPU Pallas kernel
   for (N,128) tiles with indices spanning the FULL N (not just one vreg)?
2. Same for axis=1 (lane gather)?
3. Correctness of a 2-step arbitrary gather (sublane then lane).
4. Throughput: gathers/second at various N — is a gather-based general SpMV
   bandwidth-competitive?
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_axis0_kernel(x_ref, idx_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx_ref[:, :], axis=0)


def gather_axis1_kernel(x_ref, idx_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx_ref[:, :], axis=1)


def run_one(kernel, x, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def main():
    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform, flush=True)

    for n in (8, 64, 512, 2048):
        x = rng.standard_normal((n, 128)).astype(np.float32)
        idx0 = rng.integers(0, n, size=(n, 128)).astype(np.int32)
        idx1 = rng.integers(0, 128, size=(n, 128)).astype(np.int32)
        try:
            y = np.asarray(jax.jit(lambda a, b: run_one(gather_axis0_kernel, a, b))(x, idx0))
            ref = np.take_along_axis(x, idx0, axis=0)
            print(f"axis0 N={n}: ok={np.array_equal(y, ref)}", flush=True)
        except Exception as e:
            print(f"axis0 N={n}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        try:
            y = np.asarray(jax.jit(lambda a, b: run_one(gather_axis1_kernel, a, b))(x, idx1))
            ref = np.take_along_axis(x, idx1, axis=1)
            print(f"axis1 N={n}: ok={np.array_equal(y, ref)}", flush=True)
        except Exception as e:
            print(f"axis1 N={n}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    # 2-step arbitrary gather: out[i,j] = w[r[i,j], l[i,j]] within an (N,128)
    # window w, where r/l arbitrary. Step 1: t[i,j] = w[rsel[i,j], j] needs
    # rsel[i, l[i,j]] == r[i,j] — conflict-free only if, per output row i,
    # elements wanted from lane j' share one source row. Instead use the
    # transposed trick: t = gather_axis0(w, R) with R[i,j] = row wanted by
    # output (i, j) AFTER the lane gather: out[i,j] = t[i, l[i,j]] where
    # t[i,j'] = w[R[i,j'], j']. Setting R[i, l[i,j]] = r[i,j] works iff no
    # two j map to same l with different r. Build such a test case.
    n = 512
    w = rng.standard_normal((n, 128)).astype(np.float32)
    # pick for each output row a permutation of lanes (conflict-free) and
    # arbitrary rows
    l = np.stack([rng.permutation(128) for _ in range(n)]).astype(np.int32)
    r = rng.integers(0, n, size=(n, 128)).astype(np.int32)
    R = np.zeros((n, 128), np.int32)
    np.put_along_axis(R, l, r, axis=1)

    def two_step(w_ref, R_ref, l_ref, o_ref):
        t = jnp.take_along_axis(w_ref[:, :], R_ref[:, :], axis=0)
        o_ref[:, :] = jnp.take_along_axis(t, l_ref[:, :], axis=1)

    try:
        y = np.asarray(jax.jit(lambda a, b, c: pl.pallas_call(
            two_step,
            out_shape=jax.ShapeDtypeStruct(w.shape, w.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b, c))(w, R, l))
        ref = w[r, l]
        ok = np.array_equal(y, ref)
        print(f"two-step arbitrary gather: ok={ok}", flush=True)
    except Exception as e:
        print(f"two-step: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)

    # throughput: K chained gathers over a (N,128) window
    K = 100
    for n in (256, 1024, 4096):
        x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, size=(n, 128)).astype(np.int32))

        def chain_kernel(x_ref, idx_ref, o_ref):
            acc = x_ref[:, :]
            for _ in range(K):
                acc = jnp.take_along_axis(acc, idx_ref[:, :], axis=0) * 1.0000001
            o_ref[:, :] = acc

        try:
            f = jax.jit(lambda a, b: pl.pallas_call(
                chain_kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b))
            y = f(x, idx); _ = float(y[0, 0])
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                y = f(y, idx)
                _ = float(y[0, 0])
                best = min(best, time.perf_counter() - t0)
            per = best / K
            elems = n * 128
            print(f"gather-chain N={n}: {per*1e6:.2f} us/gather "
                  f"({elems/per/1e9:.1f} Gelem/s)", flush=True)
        except Exception as e:
            print(f"gather-chain N={n}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
