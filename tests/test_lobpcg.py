"""LOBPCG block eigensolver (beyond-reference: the reference has no
eigensolver; ours feeds Chebyshev bounds and spectral diagnostics and rides
the block-SpMM fast path distributed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.gen import create_laplace_2d
from spmv_tpu.solvers.lobpcg import lane_block_ops, lobpcg


def rotated_spectrum(n, lam, seed):
    """Dense symmetric matrix with a prescribed spectrum (Q diag(lam) Q^T)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return (Q * lam) @ Q.T


def test_lobpcg_smallest_matches_dense_eigh():
    n = 120
    lam = np.concatenate([[1.0, 2.0, 3.5, 5.0], np.linspace(10, 100, n - 4)])
    dense = rotated_spectrum(n, lam, seed=1)
    want = np.sort(lam)[:4]
    X0 = jnp.asarray(np.random.default_rng(1).standard_normal((n, 4)))
    mm = lambda X: jnp.asarray(dense) @ X
    res = jax.jit(lambda X: lobpcg(mm, X, maxiter=400, tol=1e-10))(X0)
    assert bool(res.converged), np.asarray(res.resid_norms)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-9, atol=1e-10)
    # Ritz vectors: A x = theta x columnwise
    X = np.asarray(res.X)
    for j in range(4):
        r = dense @ X[:, j] - float(res.eigenvalues[j]) * X[:, j]
        assert np.linalg.norm(r) < 1e-7


def test_lobpcg_largest():
    n = 90
    lam = np.concatenate([np.linspace(1, 50, n - 3), [80.0, 90.0, 100.0]])
    dense = rotated_spectrum(n, lam, seed=2)
    want = np.sort(lam)[-3:]
    X0 = jnp.asarray(np.random.default_rng(2).standard_normal((n, 3)))
    res = lobpcg(lambda X: jnp.asarray(dense) @ X, X0,
                 maxiter=400, tol=1e-10, largest=True)
    assert bool(res.converged), np.asarray(res.resid_norms)
    got = np.sort(np.asarray(res.eigenvalues))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_lobpcg_indefinite_smallest():
    """Smallest (most negative) eigenpairs of an INDEFINITE operator — the
    sentinel masking must push dropped directions past the true spectrum
    on both sides."""
    n = 100
    lam = np.concatenate([[-8.0, -3.0, -1.0], np.linspace(0.5, 40, n - 3)])
    dense = rotated_spectrum(n, lam, seed=3)
    want = np.sort(lam)[:3]
    X0 = jnp.asarray(np.random.default_rng(3).standard_normal((n, 3)))
    res = lobpcg(lambda X: jnp.asarray(dense) @ X, X0,
                 maxiter=400, tol=1e-10)
    assert bool(res.converged), np.asarray(res.resid_norms)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-9, atol=1e-9)


def test_lobpcg_preconditioner_accelerates():
    """A^-1-like preconditioning (here: exact inverse of a nearby operator)
    cuts the iteration count on a stiff spectrum; answers unchanged."""
    n = 150
    lam = np.concatenate([[1.0, 1.5], np.linspace(50, 5000, n - 2)])
    dense = rotated_spectrum(n, lam, seed=4)
    want = np.sort(lam)[:2]
    shift_inv = np.linalg.inv(dense + 0.5 * np.eye(n))
    X0 = jnp.asarray(np.random.default_rng(4).standard_normal((n, 2)))
    mm = lambda X: jnp.asarray(dense) @ X
    plain = lobpcg(mm, X0, maxiter=600, tol=1e-8)
    prec = lobpcg(mm, X0, maxiter=600, tol=1e-8,
                  preconditioner=lambda R: jnp.asarray(shift_inv) @ R)
    assert bool(prec.converged), np.asarray(prec.resid_norms)
    np.testing.assert_allclose(np.asarray(prec.eigenvalues), want,
                               rtol=1e-7)
    assert int(prec.iterations) < int(plain.iterations)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_lobpcg_distributed_lane_layout(n_dev):
    """LOBPCG over DistMatrix.matmat in the SpMM lane layout: Gram einsums
    psum under jit; eigenvalues match the dense oracle."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = create_laplace_2d(16, 16)
    n = a.nrows
    dense = a.to_dense()
    want = np.linalg.eigvalsh(dense)[:2]
    A = build_dist_matrix(a, n_devices=n_dev)
    X0 = A.to_dist_block(
        np.random.default_rng(5).standard_normal((n, 2)))
    res = jax.jit(
        lambda M, X: lobpcg(M.matmat, X, k=2, maxiter=800, tol=1e-7,
                            block_ops=lane_block_ops())
    )(A, X0)
    assert bool(res.converged), np.asarray(res.resid_norms)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-6, atol=1e-8)
    # vectors come back through the block gather and satisfy the residual
    X = A.from_dist_block(res.X)
    for j in range(2):
        r = dense @ X[:, j] - float(res.eigenvalues[j]) * X[:, j]
        assert np.linalg.norm(r) < 1e-5


def test_lobpcg_chebyshev_filter_converges_where_plain_stalls():
    """Chebyshev spectral-filter preconditioning (chebyshev_preconditioner
    on an upper sub-interval [a, lmax] amplifies the bottom targets): on the
    Laplacian bottom spectrum (tiny gap ratio) plain LOBPCG stalls within
    the budget while the filtered run converges to oracle eigenvalues —
    the demo_eig --cheb path."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.chebyshev import chebyshev_preconditioner
    from spmv_tpu.solvers.lanczos import lanczos_extreme

    a = create_laplace_2d(32, 32)
    n = a.nrows
    want = np.linalg.eigvalsh(a.to_dense())[:2]
    A = build_dist_matrix(a, n_devices=4, local_format="dia")
    X0 = A.to_dist_block(
        np.random.default_rng(7).standard_normal((n, 2)))
    _, lmax_d = lanczos_extreme(A.as_linear_operator(),
                                A.to_dist(np.ones(n)), m=32)
    lmax = float(lmax_d) * 1.05
    deg = 12
    lo = (2.0 / deg) ** 2 * lmax

    def run(filtered):
        def f(M, X):
            pre = (chebyshev_preconditioner(M.matmat, lo, lmax, degree=deg)
                   if filtered else None)
            return lobpcg(M.matmat, X, k=2, maxiter=120, tol=1e-7,
                          preconditioner=pre, block_ops=lane_block_ops())
        return jax.jit(f)(A, X0)

    plain = run(False)
    filt = run(True)
    assert not bool(plain.converged)  # spectrum too clustered for the budget
    assert bool(filt.converged), np.asarray(filt.resid_norms)
    np.testing.assert_allclose(np.asarray(filt.eigenvalues), want,
                               rtol=1e-8, atol=1e-10)
