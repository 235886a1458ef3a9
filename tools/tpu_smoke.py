#!/usr/bin/env python
"""On-hardware validation battery.

The CPU test suite runs Pallas kernels in interpreter mode; several failure
classes only exist on the real chip (Mosaic lowering gaps, VMEM budgets,
DMA alignment proofs, MXU default-precision rounding — each bit us in
rounds 1 and 2). This script exercises the compiled kernels and the
distributed stack end-to-end on the attached TPU and prints PASS/FAIL per
check. Coverage caveat: with ONE chip the distributed checks run on a
1-device mesh, so shard_map+Pallas dispatch is exercised on hardware but
multi-chip ppermute rounds are not (those are validated on the virtual CPU
mesh by the test suite, and their TPU schedule by tests/test_overlap.py's
AOT-topology compile). Run after any kernel change:

    python tools/tpu_smoke.py            # ~2-4 min warm, longer cold

Exit code 0 iff all checks pass.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []


def check(name):
    def deco(fn):
        RESULTS.append((name, fn))
        return fn
    return deco


@check("dia kernel fp32 (lane offsets)")
def _(env):
    st, jnp, P = env["st"], env["jnp"], env["P"]
    a = st.create_laplace_2d(256, 256, dtype=np.float32)
    d = st.csr_to_dia(a, dtype=np.float32)
    x = jnp.asarray(np.pad(st.gaussian_bump(a.ncols, dtype=np.float32),
                           (0, d.nrows_pad - a.ncols)))
    y = np.asarray(P.spmv_dia_pallas(d, x))[: a.nrows]
    want = a.matvec(np.asarray(x)[: a.ncols].astype(np.float64))
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 1e-5


@check("dia kernel fp32 odd lane remainder")
def _(env):
    st, jnp, P = env["st"], env["jnp"], env["P"]
    a = st.create_laplace_2d(70, 300, dtype=np.float32)  # offsets +-70
    d = st.csr_to_dia(a, dtype=np.float32, row_align=4096)
    x = jnp.asarray(np.pad(st.gaussian_bump(a.ncols, dtype=np.float32),
                           (0, d.nrows_pad - a.ncols)))
    y = np.asarray(P.spmv_dia_pallas(d, x))[: a.nrows]
    want = a.matvec(np.asarray(x)[: a.ncols].astype(np.float64))
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 1e-5


@check("dia kernel bf16")
def _(env):
    st, jnp, P = env["st"], env["jnp"], env["P"]
    a = st.create_laplace_2d(256, 256, dtype=np.float32)
    d = st.csr_to_dia(a, dtype=jnp.bfloat16)
    xh = st.gaussian_bump(a.ncols, dtype=np.float32)
    x = jnp.asarray(np.pad(xh, (0, d.nrows_pad - a.ncols))).astype(jnp.bfloat16)
    y = np.asarray(P.spmv_dia_pallas(d, x).astype(jnp.float32))[: a.nrows]
    want = a.matvec(xh.astype(np.float64))
    # bf16 input rounding amplified by stencil cancellation: loose bound
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 0.2


@check("dia symmetric kernel")
def _(env):
    st, jnp, P = env["st"], env["jnp"], env["P"]
    a = st.create_laplace_2d(256, 256, dtype=np.float32)
    d = st.csr_to_dia(a, dtype=np.float32, symmetric=True)
    x = jnp.asarray(np.pad(st.gaussian_bump(a.ncols, dtype=np.float32),
                           (0, d.nrows_pad - a.ncols)))
    y = np.asarray(P.spmv_dia_pallas(d, x))[: a.nrows]
    want = a.matvec(np.asarray(x)[: a.ncols].astype(np.float64))
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 1e-5


@check("multi-tile kernel (tr < nrows)")
def _(env):
    st, jnp, P = env["st"], env["jnp"], env["P"]
    a = st.create_laplace_2d(1024, 1024, dtype=np.float32)  # forces tiling
    d = st.csr_to_dia(a, dtype=np.float32)
    x = jnp.asarray(np.pad(st.gaussian_bump(a.ncols, dtype=np.float32),
                           (0, d.nrows_pad - a.ncols)))
    y = np.asarray(P.spmv_dia_pallas(d, x))[: a.nrows]
    import scipy.sparse as sp
    A = sp.csr_matrix((a.values, a.colind, a.rowptr), shape=a.shape)
    want = A @ np.asarray(x)[: a.ncols].astype(np.float64)
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 1e-5


@check("distributed matvec via shard_map (DIA local)")
def _(env):
    st, jax = env["st"], env["jax"]
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    a = st.create_laplace_2d(128, 64, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=1, local_format="dia", dtype=np.float32)
    xh = st.gaussian_bump(a.nrows, dtype=np.float32)
    y = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(xh)))
    want = a.matvec(xh.astype(np.float64))
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 1e-5


@check("distributed CG while_loop (symmetric ELL)")
def _(env):
    st, jax = env["st"], env["jax"]
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.cg import cg
    a = st.create_laplace_2d(64, 64, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=1, symmetric=True, dtype=np.float32)
    b = A.to_dist(st.gaussian_bump(a.nrows, dtype=np.float32))
    res = jax.jit(lambda A_, bb: cg(A_.as_linear_operator(), bb,
                                    kmax=200, rtol=1e-5))(A, b)
    r = a.matvec(A.from_dist(res.x).astype(np.float64)) - st.gaussian_bump(a.nrows)
    return np.linalg.norm(r) / np.linalg.norm(st.gaussian_bump(a.nrows)) < 1e-3


@check("WELL general-sparsity kernel (banded random)")
def _(env):
    st, jnp = env["st"], env["jnp"]
    rng = np.random.default_rng(0)
    n = 20000
    rows, cols, vals = [], [], []
    for off in (-700, -13, 0, 4, 450):
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(len(i)) < 0.8
        i = i[keep]
        rows.append(i)
        cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    a = st.CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vals).astype(np.float32), n, n)
    w = st.csr_to_well(a, dtype=np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(st.spmv_well_pallas(
        w, jnp.asarray(np.pad(x, (0, w.ncols_pad - n)))))[:n]
    want = a.matvec(x)
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 1e-5


@check("distributed matvec via shard_map (WELL local)")
def _(env):
    st, jax = env["st"], env["jax"]
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    rng = np.random.default_rng(1)
    n = 8000
    rows, cols, vals = [], [], []
    for off in (-300, -1, 0, 2, 150):
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(len(i)) < 0.8
        i = i[keep]
        rows.append(i)
        cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    a = st.CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vals).astype(np.float32), n, n)
    A = build_dist_matrix(a, n_devices=1, local_format="well", dtype=np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    y = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x)))
    want = a.matvec(x)
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 1e-5


@check("double-single DIA kernel (f64-class)")
def _(env):
    st, jnp = env["st"], env["jnp"]
    rng = np.random.default_rng(3)
    a = st.create_laplace_2d(128, 128)  # f64
    a.values[:] = a.values * (1 + 1e-9 * rng.standard_normal(a.nnz))
    d = st.csr_to_dia_ds(a, row_align=1024)
    x = rng.standard_normal(a.nrows) * 1e3
    y = st.spmv_dia_ds(d, x)[: a.nrows]
    want = a.matvec(x)
    return np.linalg.norm(y - want) / np.linalg.norm(want) < 1e-12


@check("multi-RHS SpMM bitwise-matches single applies")
def _spmm(env):
    st, jnp = env["st"], env["jnp"]
    import jax
    import numpy as np
    from spmv_tpu.ops.spmm_dia_pallas import (
        spmm_dia, spmm_dia_supported, spmm_to_layout,
    )
    from spmv_tpu.ops.spmv_dia_pallas import spmv_dia_pallas

    a = st.create_laplace_2d(128, 128, dtype=np.float32)
    d = st.csr_to_dia(a, dtype=np.float32, row_align=4096)
    if not spmm_dia_supported(d, 3):
        return False
    X = np.random.default_rng(5).standard_normal(
        (a.nrows, 3)).astype(np.float32)
    Y = np.asarray(spmm_dia(d, jnp.asarray(X)))
    for r in range(3):
        y1 = np.asarray(spmv_dia_pallas(
            d, jnp.asarray(np.pad(X[:, r], (0, d.nrows_pad - a.nrows)))))
        if not np.array_equal(Y[:, r], y1):
            return False
    return True


def main() -> int:
    import jax
    import jax.numpy as jnp

    import spmv_tpu as st
    import spmv_tpu.ops.spmv_dia_pallas as P

    env = {"jax": jax, "jnp": jnp, "st": st, "P": P}
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    failures = 0
    for name, fn in RESULTS:
        t0 = time.perf_counter()
        try:
            ok = bool(fn(env))
        except Exception as e:  # noqa: BLE001 — report, keep going
            ok = False
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        dt = time.perf_counter() - t0
        if ok:
            print(f"PASS {name} ({dt:.1f}s)")
        else:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s)")
    print(f"{len(RESULTS) - failures}/{len(RESULTS)} checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
