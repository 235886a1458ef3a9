"""Complex-dtype envelope.

The reference declares complex MPI dtype traits but never instantiates them
(reference spmv/mpi_utils.h:55-77; Matrix.cpp:565-566 instantiates
float/double only). spmv_tpu goes further: complex64/complex128 are
first-class on the host formats and on the ELL/DIA device paths (the XLA
formulation — XLA decomposes complex arithmetic into re/im pairs), through
the distributed comm plan, and in GMRES (complex-aware vdot/conj rotations).
WELL has no complex device kernel and rejects complex at conversion with
guidance. These tests lock that envelope down.
"""
import jax
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.parallel.dist_matrix import build_dist_matrix
from spmv_tpu.solvers.gmres import gmres


def _complex_operator(n, nnz_per_row=5, diag=20.0 + 5.0j, seed=1):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = (rows + rng.integers(-4, 5, len(rows))) % n
    vals = rng.standard_normal(len(rows)) + 1j * rng.standard_normal(len(rows))
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    vals = np.concatenate([vals, np.full(n, diag)])
    return CSRHost.from_coo(rows, cols, vals.astype(np.complex128), n, n)


def _dense(a):
    dense = np.zeros((a.nrows, a.ncols), np.complex128)
    rg = np.repeat(np.arange(a.nrows), a.row_nnz())
    np.add.at(dense, (rg, a.colind), a.values)
    return dense


@pytest.mark.parametrize("n_dev", [1, 2, 4])
@pytest.mark.parametrize("fmt", ["ell", "dia"])
@pytest.mark.parametrize("cdtype", [np.complex64, np.complex128])
def test_complex_dist_matvec_parity(n_dev, fmt, cdtype):
    a = _complex_operator(203)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(a.ncols)
         + 1j * rng.standard_normal(a.ncols)).astype(np.complex128)
    want = a.matvec(x)
    A = build_dist_matrix(a, n_devices=n_dev, local_format=fmt, dtype=cdtype)
    got = np.asarray(A.from_dist(jax.jit(A.matvec)(A.to_dist(x.astype(cdtype)))))
    tol = 1e-6 if cdtype == np.complex64 else 1e-13
    err = np.abs(got[: a.nrows] - want).max() / np.abs(want).max()
    assert err < tol, (n_dev, fmt, cdtype, err)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_complex_gmres_vs_direct(n_dev):
    a = _complex_operator(160)
    rng = np.random.default_rng(3)
    bvec = (rng.standard_normal(a.nrows)
            + 1j * rng.standard_normal(a.nrows)).astype(np.complex128)
    xref = np.linalg.solve(_dense(a), bvec)
    A = build_dist_matrix(a, n_devices=n_dev, local_format="ell")
    r = gmres(A.as_linear_operator(), A.to_dist(bvec), restart=60,
              max_cycles=5, rtol=1e-10)
    assert bool(r.converged)
    x = np.asarray(A.from_dist(r.x))[: a.nrows]
    assert np.abs(x - xref).max() / np.abs(xref).max() < 1e-8


def test_complex_transpose_matvec():
    a = _complex_operator(150)
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(a.nrows)
         + 1j * rng.standard_normal(a.nrows)).astype(np.complex128)
    want = _dense(a).T @ x  # unconjugated transpose, like a.transpose()
    A = build_dist_matrix(a, n_devices=4, local_format="ell")
    At = A.transposed()
    got = np.asarray(At.from_dist(At.matvec(At.to_dist(x))))
    assert np.abs(got[: a.ncols] - want).max() / np.abs(want).max() < 1e-12


def test_well_rejects_complex_with_guidance():
    a = _complex_operator(150)
    with pytest.raises(ValueError, match="complex"):
        build_dist_matrix(a, n_devices=1, local_format="well")
    from spmv_tpu.formats.well import csr_to_well

    with pytest.raises(ValueError, match="ELL/DIA"):
        csr_to_well(a)
