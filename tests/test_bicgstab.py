"""BiCGStab for non-symmetric systems (beyond-reference: the reference only
ships CG, reference spmv/cg.cpp, which requires SPD operators)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import random_csr
from spmv_tpu.solvers.bicgstab import bicgstab


def nonsym_dd(n, seed, k=5):
    """Random non-symmetric, diagonally dominant (solvable) matrix."""
    a = random_csr(n, n, k, seed=seed)
    dense = a.to_dense()
    np.fill_diagonal(dense, np.abs(dense).sum(axis=1) + 1.0)
    assert not np.allclose(dense, dense.T)
    return CSRHost.from_dense(dense)


def test_bicgstab_matches_direct_solve():
    a = nonsym_dd(200, seed=3)
    b = np.random.default_rng(4).standard_normal(200)
    mv = lambda x: jnp.asarray(a.to_dense()) @ x
    res = jax.jit(
        lambda bb: bicgstab(mv, bb, kmax=400, rtol=1e-12)
    )(jnp.asarray(b))
    assert bool(res.converged) and not bool(res.breakdown)
    want = np.linalg.solve(a.to_dense(), b)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-8, atol=1e-9)


def test_bicgstab_true_residual_reported():
    a = nonsym_dd(150, seed=7)
    b = np.random.default_rng(8).standard_normal(150)
    mv = lambda x: jnp.asarray(a.to_dense()) @ x
    res = bicgstab(mv, jnp.asarray(b), kmax=300, rtol=1e-10)
    r = b - a.matvec(np.asarray(res.x))
    np.testing.assert_allclose(np.linalg.norm(r), float(res.rnorm),
                               rtol=1e-6, atol=1e-12)


def test_bicgstab_jacobi_preconditioned():
    """Right-preconditioned: same TRUE-residual convergence meaning, fewer
    iterations on a badly diagonally-scaled operator."""
    a0 = nonsym_dd(300, seed=11)
    n = a0.nrows
    w = np.logspace(-2, 2, n)
    dense = a0.to_dense() * w[:, None] * w[None, :]
    a = CSRHost.from_dense(dense)
    diag = jnp.asarray(np.diag(dense))
    b = np.random.default_rng(12).standard_normal(n)
    mv = lambda x: jnp.asarray(dense) @ x
    plain = bicgstab(mv, jnp.asarray(b), kmax=2000, rtol=1e-9)
    prec = bicgstab(mv, jnp.asarray(b), kmax=2000, rtol=1e-9,
                    preconditioner=lambda r: r / diag)
    assert bool(prec.converged)
    rel = np.linalg.norm(a.matvec(np.asarray(prec.x)) - b) / np.linalg.norm(b)
    assert rel < 1e-8
    assert int(prec.iterations) < int(plain.iterations)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_bicgstab_distributed(n_dev):
    """BiCGStab over a sharded DistMatrix: non-symmetric banded operator,
    global dots lower to psum under jit."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    rng = np.random.default_rng(100 + n_dev)
    n = 260
    rows, cols, vals = [], [], []
    for off in (-7, -1, 1, 3):  # asymmetric stencil
        i = np.arange(max(0, -off), min(n, n - off))
        rows.append(i)
        cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    i = np.arange(n)
    rows.append(i); cols.append(i)
    vals.append(np.full(n, 8.0))
    a = CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), n, n)
    A = build_dist_matrix(a, n_devices=n_dev)
    b = rng.standard_normal(n)
    res = jax.jit(
        lambda A_, bb: bicgstab(A_.as_linear_operator(), bb,
                                kmax=500, rtol=1e-11)
    )(A, A.to_dist(b))
    assert bool(res.converged), float(res.rnorm)
    x = A.from_dist(res.x, side="col")
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-9, rel


def test_bicgstab_complex_system():
    """Complex non-Hermitian system (complex dtypes are supported through
    the ELL paths; vdot conjugates, so the BiCG recurrences are the standard
    complex ones)."""
    rng = np.random.default_rng(55)
    n = 120
    dense = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
             ) * (rng.random((n, n)) < 0.05)
    np.fill_diagonal(dense, np.abs(dense).sum(axis=1) + 2.0)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    mv = lambda x: jnp.asarray(dense) @ x
    res = bicgstab(mv, jnp.asarray(b), kmax=300, rtol=1e-10)
    assert bool(res.converged) and not bool(res.breakdown)
    want = np.linalg.solve(dense, b)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-7, atol=1e-9)


def test_bicgstab_breakdown_returns_last_good_iterate():
    """Skew-symmetric operator forces rho-breakdown at step 2; the result
    must carry a FINITE pre-breakdown iterate, not garbage quotients."""
    A = jnp.asarray(np.array([[0.0, 1.0], [-1.0, 0.0]]))
    b = jnp.asarray(np.array([1.0, 0.0]))
    res = bicgstab(lambda x: A @ x, b, kmax=50, rtol=1e-12)
    assert bool(res.breakdown)
    assert np.all(np.isfinite(np.asarray(res.x)))
    assert np.isfinite(float(res.rnorm))
