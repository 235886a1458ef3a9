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


@check("symmetric dual-WELL (round 3)")
def _(env):
    st, np_, jnp, jax = env["st"], np, env["jnp"], env["jax"]
    from spmv_tpu.gen import random_csr
    a0 = random_csr(2000, 2000, 4, seed=31, symmetric=True, spd_shift=1.0)
    from spmv_tpu.formats.csr import CSRHost
    a = CSRHost(a0.rowptr, a0.colind, a0.values.astype(np_.float32), a0.ncols)
    sw = st.csr_to_well_sym(a, tile_groups=8, dtype=np_.float32)
    x = np_.random.default_rng(32).standard_normal(2000).astype(np_.float32)
    y = np_.asarray(st.spmv_well_sym(sw, jnp.asarray(x)))[:2000]
    want = a.matvec(x)
    return np_.linalg.norm(y - want) / np_.linalg.norm(want) < 1e-4


@check("symmetric well_ds f64-class (round 3)")
def _(env):
    st, np_, jnp, jax = env["st"], np, env["jnp"], env["jax"]
    from spmv_tpu.ds import ds_from_f64
    from spmv_tpu.ops.spmv_well_pallas import (
        csr_to_well_sym_ds, spmv_well_sym_ds)
    from spmv_tpu.gen import random_csr
    a = random_csr(2000, 2000, 4, seed=33, symmetric=True, spd_shift=1.0)
    sw = csr_to_well_sym_ds(a, tile_groups=8)
    x = np_.random.default_rng(34).standard_normal(2000)
    xh, xl = ds_from_f64(np_.pad(x, (0, sw.nrows_pad - 2000)))
    yh, yl = spmv_well_sym_ds(sw, jnp.asarray(xh), jnp.asarray(xl))
    got = (np_.asarray(yh).astype(np_.float64)
           + np_.asarray(yl).astype(np_.float64))[:2000]
    want = a.matvec(x)
    return np_.linalg.norm(got - want) / np_.linalg.norm(want) < 1e-13


@check("DS SpMM block kernel (round 3)")
def _(env):
    st, np_, jnp = env["st"], np, env["jnp"]
    from spmv_tpu.ds import ds_from_f64, ds_to_f64
    from spmv_tpu.ops.spmm_dia_pallas import spmm_to_layout, spmm_from_layout
    from spmv_tpu.ops.spmv_dia_ds_pallas import (
        csr_to_dia_ds, spmm_dia_ds_pallas_2d)
    a = st.create_laplace_2d(64, 64)
    dds = csr_to_dia_ds(a, row_align=1024)
    nrhs = 2
    X = np_.random.default_rng(35).standard_normal((a.nrows, nrhs))
    Xp = np_.zeros((dds.nrows_pad, nrhs)); Xp[:a.nrows] = X
    hi, lo = ds_from_f64(Xp)
    to2 = lambda v: jnp.asarray(
        v.reshape(-1, 128, nrhs).transpose(0, 2, 1).reshape(-1, nrhs * 128))
    yh, yl = spmm_dia_ds_pallas_2d(dds, to2(hi), to2(lo), nrhs)
    col = lambda v, r: np_.asarray(
        v[:, r * 128:(r + 1) * 128]).reshape(-1)
    got = np_.stack([ds_to_f64(col(yh, r), col(yl, r))[:a.nrows]
                     for r in range(nrhs)], axis=1)
    want = np_.stack([a.matvec(X[:, r]) for r in range(nrhs)], axis=1)
    return np_.linalg.norm(got - want) / np_.linalg.norm(want) < 1e-13


@check("chunked vanilla kernel bitwise (round 3)")
def _(env):
    st, np_, jnp = env["st"], np, env["jnp"]
    import spmv_tpu.ops.spmv_dia_pallas as dp
    a = st.create_laplace_2d(128, 128, dtype=np_.float32)
    d = st.csr_to_dia(a, row_align=1024, dtype=np_.float32)
    x = np_.random.default_rng(36).standard_normal(d.nrows_pad).astype(
        np_.float32)
    x2 = jnp.asarray(x.reshape(-1, 128))
    hr = dp.dia_halo_rows(d)
    fn = dp._spmv_dia_pallas_2d.__wrapped__
    y1 = np_.asarray(fn(d.data, x2, d.offsets, 16, hr))
    old = dp._CHUNK_TILES
    try:
        dp._CHUNK_TILES = 2
        y2 = np_.asarray(fn(d.data, x2, d.offsets, 16, hr))
    finally:
        dp._CHUNK_TILES = old
    return np_.array_equal(y1, y2)


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
