"""scipy.sparse / jax.experimental.sparse bridges (spmv_tpu.interop).

The reference's interop boundary is Eigen (reference spmv/Matrix.cpp:415-479);
ours is scipy.sparse + BCOO. Round-trips must be exact and canonical
(sorted columns, summed duplicates) since every downstream converter
assumes canonical CSR.
"""
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import random_csr
from spmv_tpu.interop import from_bcoo, from_scipy, to_bcoo, to_scipy

scipy_sparse = pytest.importorskip("scipy.sparse")


def _rand(n=37, m=29, seed=0):
    return random_csr(n, m, 4, seed=seed)


def test_scipy_round_trip_exact():
    a = _rand()
    s = to_scipy(a)
    assert s.shape == a.shape
    b = from_scipy(s)
    np.testing.assert_array_equal(b.rowptr, a.rowptr)
    np.testing.assert_array_equal(b.colind, a.colind)
    np.testing.assert_array_equal(b.values, a.values)
    assert b.ncols == a.ncols


@pytest.mark.parametrize("conv", ["tocoo", "tocsc", "tolil", "todia"])
def test_from_scipy_any_container(conv):
    a = _rand(seed=3)
    s = getattr(to_scipy(a), conv)()
    b = from_scipy(s)
    np.testing.assert_array_equal(b.colind, a.colind)
    np.testing.assert_allclose(b.values, a.values, rtol=0, atol=0)


def test_from_scipy_sums_duplicates_and_sorts():
    # COO with unsorted + duplicate entries -> canonical CSR
    coo = scipy_sparse.coo_array(
        (np.array([1.0, 2.0, 4.0, 8.0]),
         (np.array([1, 0, 1, 1]), np.array([2, 1, 0, 2]))),
        shape=(3, 4),
    )
    b = from_scipy(coo)
    assert b.nnz == 3  # (1,2) duplicated
    np.testing.assert_array_equal(b.rowptr, [0, 1, 3, 3])
    np.testing.assert_array_equal(b.colind, [1, 0, 2])
    np.testing.assert_array_equal(b.values, [2.0, 4.0, 9.0])
    # matvec parity against scipy itself
    x = np.arange(4, dtype=np.float64)
    np.testing.assert_allclose(b.matvec(x), coo @ x)


def test_from_scipy_rejects_non_sparse():
    with pytest.raises(TypeError):
        from_scipy(np.eye(3))


def test_bcoo_round_trip_exact():
    a = _rand(seed=5)
    m = to_bcoo(a)
    assert m.shape == a.shape
    assert m.unique_indices and m.indices_sorted
    # device matvec parity
    x = np.linspace(-1, 1, a.ncols)
    np.testing.assert_allclose(np.asarray(m @ x), a.matvec(x), rtol=1e-12)
    b = from_bcoo(m)
    np.testing.assert_array_equal(b.rowptr, a.rowptr)
    np.testing.assert_array_equal(b.colind, a.colind)
    np.testing.assert_array_equal(b.values, a.values)


def test_from_bcoo_sums_duplicates_drops_padding():
    from jax.experimental import sparse as jsparse

    # duplicate (0,1) entries plus an out-of-range padded row (BCOO padding
    # convention: indices == shape)
    idx = np.array([[0, 1], [0, 1], [2, 0], [3, 2]])
    dat = np.array([1.5, 2.5, 7.0, 99.0])
    m = jsparse.BCOO((dat, idx), shape=(3, 2))
    b = from_bcoo(m)
    assert b.shape == (3, 2)
    assert b.nnz == 2
    np.testing.assert_allclose(b.to_dense(),
                               [[0.0, 4.0], [0.0, 0.0], [7.0, 0.0]])


def test_from_bcoo_rejects_batched():
    from jax.experimental import sparse as jsparse

    dense = np.arange(24.0).reshape(2, 3, 4)
    m = jsparse.BCOO.fromdense(dense, n_batch=1)
    with pytest.raises(ValueError, match="n_batch"):
        from_bcoo(m)


def test_bcsr_accepted():
    from jax.experimental import sparse as jsparse

    a = _rand(seed=9)
    m = jsparse.BCSR.fromdense(a.to_dense())
    b = from_bcoo(m)
    np.testing.assert_allclose(b.to_dense(), a.to_dense())


def test_interop_to_dist_matrix_end_to_end():
    """The advertised workflow: scipy matrix in -> distributed matvec."""
    import jax

    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = _rand(n=64, m=64, seed=11)
    A = build_dist_matrix(from_scipy(to_scipy(a)), n_devices=4)
    x = np.linspace(-1, 1, 64)
    y = jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x))
    np.testing.assert_allclose(np.asarray(A.from_dist(y)), a.matvec(x),
                               rtol=1e-12)


def test_scipy_complex_round_trip():
    """Complex matrices bridge too (the ELL/DIA XLA paths accept them)."""
    rng = np.random.default_rng(4)
    d = rng.standard_normal((9, 9)) + 1j * rng.standard_normal((9, 9))
    d[np.abs(d.real) < 0.8] = 0
    s = scipy_sparse.csr_array(d)
    b = from_scipy(s)
    assert b.dtype == np.complex128
    np.testing.assert_allclose(b.to_dense(), s.todense())
    np.testing.assert_allclose(to_scipy(b).todense(), s.todense())
    x = rng.standard_normal(9) + 1j * rng.standard_normal(9)
    np.testing.assert_allclose(b.matvec(x), s @ x)
