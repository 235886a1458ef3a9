"""LSQR least-squares solver (solvers/lsqr.py) — the solver the reference's
rectangular operators (restrictmain.cpp) never had."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import random_csr
from spmv_tpu.solvers.lsqr import lsqr


def _tall_dense(m, n, seed, cond_spread=2.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, n))
    a *= np.logspace(0, -cond_spread, n)[None, :]  # controlled conditioning
    return a


def test_lsqr_overdetermined_matches_lstsq():
    m, n = 300, 80
    dense = _tall_dense(m, n, seed=11)
    b = np.random.default_rng(12).standard_normal(m)
    mv = lambda x: jnp.asarray(dense) @ x
    rmv = lambda y: jnp.asarray(dense.T) @ y
    res = jax.jit(lambda bb: lsqr(mv, rmv, bb, kmax=400, atol=1e-12,
                                  btol=1e-12))(jnp.asarray(b))
    assert bool(res.converged)
    assert int(res.istop) == 2  # inconsistent system -> least-squares test
    want, *_ = np.linalg.lstsq(dense, b, rcond=None)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-7, atol=1e-9)
    # reported rnorm is the true residual norm
    np.testing.assert_allclose(
        float(res.rnorm), np.linalg.norm(dense @ want - b), rtol=1e-8)


def test_lsqr_consistent_square_system():
    """On a consistent square system LSQR solves A x = b (istop=1)."""
    n = 150
    a = random_csr(n, n, 5, seed=21)
    dense = a.to_dense()
    np.fill_diagonal(dense, np.abs(dense).sum(axis=1) + 1.0)
    xstar = np.random.default_rng(22).standard_normal(n)
    b = dense @ xstar
    mv = lambda x: jnp.asarray(dense) @ x
    rmv = lambda y: jnp.asarray(dense.T) @ y
    res = lsqr(mv, rmv, jnp.asarray(b), kmax=600, atol=1e-12, btol=1e-12)
    assert bool(res.converged)
    assert int(res.istop) == 1
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-8, atol=1e-10)


def test_lsqr_underdetermined_min_norm_direction():
    """Wide system: LSQR's iterates stay in range(A^T), so the converged
    solution is the MINIMUM-NORM one (pseudoinverse solution)."""
    m, n = 60, 200
    dense = _tall_dense(n, m, seed=31).T  # wide, well-conditioned rows
    b = np.random.default_rng(32).standard_normal(m)
    mv = lambda x: jnp.asarray(dense) @ x
    rmv = lambda y: jnp.asarray(dense.T) @ y
    res = lsqr(mv, rmv, jnp.asarray(b), kmax=400, atol=1e-12, btol=1e-12)
    assert bool(res.converged)
    want = np.linalg.pinv(dense) @ b
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-7, atol=1e-9)


def test_lsqr_damped_matches_augmented_lstsq():
    """damp > 0 solves min |Ax-b|^2 + damp^2 |x|^2 == the augmented system
    [A; damp I] x = [b; 0]."""
    m, n, damp = 250, 70, 0.3
    dense = _tall_dense(m, n, seed=41)
    b = np.random.default_rng(42).standard_normal(m)
    mv = lambda x: jnp.asarray(dense) @ x
    rmv = lambda y: jnp.asarray(dense.T) @ y
    res = lsqr(mv, rmv, jnp.asarray(b), damp=damp, kmax=400,
               atol=1e-12, btol=1e-12)
    assert bool(res.converged)
    aug = np.vstack([dense, damp * np.eye(n)])
    baug = np.concatenate([b, np.zeros(n)])
    want, *_ = np.linalg.lstsq(aug, baug, rcond=None)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-7, atol=1e-9)
    # damped rnorm estimate = |[b;0] - [A; damp I] x|
    np.testing.assert_allclose(
        float(res.rnorm), np.linalg.norm(baug - aug @ want), rtol=1e-6)


def test_lsqr_warm_start():
    """x0 warm start: solving from near the solution takes far fewer steps."""
    m, n = 300, 80
    dense = _tall_dense(m, n, seed=51, cond_spread=1.0)
    b = np.random.default_rng(52).standard_normal(m)
    mv = lambda x: jnp.asarray(dense) @ x
    rmv = lambda y: jnp.asarray(dense.T) @ y
    cold = lsqr(mv, rmv, jnp.asarray(b), kmax=400, atol=1e-10, btol=1e-10)
    warm = lsqr(mv, rmv, jnp.asarray(b), x0=cold.x, kmax=400,
                atol=1e-10, btol=1e-10)
    assert bool(warm.converged)
    assert int(warm.iterations) <= max(2, int(cold.iterations) // 4)
    # both land within the stopping rule's error envelope of the true
    # solution (|x - x*| <~ arnorm / sigma_min^2); compare to the oracle,
    # not to each other, at that envelope
    want, *_ = np.linalg.lstsq(dense, b, rcond=None)
    np.testing.assert_allclose(np.asarray(warm.x), want, rtol=1e-5,
                               atol=1e-7)


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_lsqr_distributed_rectangular(n_dev):
    """Distributed least squares on a tall rectangular DistMatrix: matvec on
    the operator, rmatvec via the CACHED pre-built transpose (one relayout
    total), both on the padded lane layouts."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    m, n = 520, 260
    rng = np.random.default_rng(60 + n_dev)
    rows, cols, vals = [], [], []
    for off in (0, 3, 17, 130, 200):
        i = np.arange(m)
        j = (i + off) % n
        rows.append(i); cols.append(j)
        vals.append(rng.standard_normal(m))
    a = CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), m, n)
    A = build_dist_matrix(a, n_devices=n_dev, local_format="ell")
    At = A.transposed()
    b = rng.standard_normal(m)
    res = jax.jit(
        lambda A_, At_, bb: lsqr(A_.as_linear_operator(),
                                 At_.as_linear_operator(), bb,
                                 kmax=600, atol=1e-12, btol=1e-12)
    )(A, At, A.to_dist(b, side="row"))
    assert bool(res.converged), (int(res.istop), float(res.rnorm))
    x = A.from_dist(res.x, side="col")
    want, *_ = np.linalg.lstsq(a.to_dense(), b, rcond=None)
    np.testing.assert_allclose(x, want, rtol=1e-6, atol=1e-8)
