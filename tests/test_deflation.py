"""Deflated/recycling CG (solvers/deflation.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.gen import create_laplace_2d
from spmv_tpu.solvers.cg import cg
from spmv_tpu.solvers.deflation import cg_deflated
from spmv_tpu.solvers.fsai import fsai_preconditioner, fsai_setup


def _lap_setup(g=32, d=8, seed=0):
    a = create_laplace_2d(g, g)
    dense = a.to_dense()
    w, V = np.linalg.eigh(dense)
    W = jnp.asarray(V[:, :d].T)
    b = jnp.asarray(np.random.default_rng(seed).standard_normal(a.nrows))
    mv = lambda x: jnp.asarray(dense) @ x
    return a, dense, w, W, b, mv


def test_deflation_reduces_iterations():
    """Deflating the d bottom eigenvectors cuts CG iterations (effective
    condition number lambda_max/lambda_{d+1}) at equal true residual."""
    a, dense, w, W, b, mv = _lap_setup()
    plain = cg(mv, b, kmax=600, rtol=1e-10)
    defl = cg_deflated(mv, b, W, kmax=600, rtol=1e-10)
    assert bool(defl.converged)
    rel = float(jnp.linalg.norm(mv(defl.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-9
    assert int(defl.iterations) < 0.8 * int(plain.iterations), (
        int(defl.iterations), int(plain.iterations))


def test_deflation_keeps_residual_w_orthogonal():
    """The Galerkin correction + projected p-updates keep W^T r = 0
    throughout; check at exit."""
    _a, _dense, _w, W, b, mv = _lap_setup(d=6)
    defl = cg_deflated(mv, b, W, kmax=600, rtol=1e-10)
    wr = np.abs(np.asarray(W) @ np.asarray(defl.r))
    assert wr.max() < 1e-12 * float(defl.rnorm0)


def test_deflation_depends_only_on_span():
    """A scaled/mixed (non-orthonormal) basis with the same span gives the
    same iterate path."""
    _a, dense, _w, W, b, mv = _lap_setup(d=5, seed=3)
    rng = np.random.default_rng(4)
    C = rng.standard_normal((5, 5)) + 3 * np.eye(5)
    W2 = jnp.asarray(C) @ W
    r1 = cg_deflated(mv, b, W, kmax=600, rtol=1e-10)
    r2 = cg_deflated(mv, b, W2, kmax=600, rtol=1e-10)
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-8, atol=1e-10)


def test_deflation_rank_deficient_basis_degrades_gracefully():
    """Duplicated columns in W (singular E) must not NaN — the ridge keeps
    the solve finite and CG still converges."""
    _a, dense, _w, W, b, mv = _lap_setup(d=4, seed=5)
    Wdup = jnp.concatenate([W, W[:2]], axis=0)   # rank 4, d=6
    res = cg_deflated(mv, b, Wdup, kmax=600, rtol=1e-10)
    assert bool(res.converged)
    assert np.all(np.isfinite(np.asarray(res.x)))
    rel = float(jnp.linalg.norm(mv(res.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-9


def test_deflation_composes_with_preconditioner():
    """FSAI + deflation of the preconditioned operator's slow modes beats
    FSAI alone."""
    a, dense, _w, _W, b, mv = _lap_setup(g=32, seed=7)
    g = fsai_setup(a)
    gd = jnp.asarray(g.to_dense())
    prec = lambda r: gd.T @ (gd @ r)
    # slow modes of the PRECONDITIONED operator: eigh of G A G^T, mapped
    # back through G^T (deflation basis for M^-1 A is G^T y)
    gag = np.asarray(gd) @ dense @ np.asarray(gd).T
    _wp, Vp = np.linalg.eigh(gag)
    W = jnp.asarray((np.asarray(gd).T @ Vp[:, :6]).T)
    base = cg(mv, b, kmax=600, rtol=1e-10, preconditioner=prec)
    defl = cg_deflated(mv, b, W, kmax=600, rtol=1e-10, preconditioner=prec)
    assert bool(defl.converged)
    rel = float(jnp.linalg.norm(mv(defl.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-9
    assert int(defl.iterations) < int(base.iterations), (
        int(defl.iterations), int(base.iterations))


def test_deflation_nonzero_x0():
    """rtol is relative to the PRE-correction residual of the given x0."""
    _a, dense, _w, W, b, mv = _lap_setup(d=4, seed=9)
    x0 = jnp.asarray(np.random.default_rng(10).standard_normal(b.shape[0]))
    res = cg_deflated(mv, b, W, x0=x0, kmax=600, rtol=1e-10)
    assert bool(res.converged)
    want = float(jnp.linalg.norm(b - mv(x0)))
    np.testing.assert_allclose(float(res.rnorm0), want, rtol=1e-12)
    rel = float(jnp.linalg.norm(mv(res.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-9


def test_deflation_fp32_inexact_basis_stable():
    """fp32 + an APPROXIMATE basis (the real recycling case: lobpcg output
    at loose tolerance) must stay stable — without the per-iteration
    Galerkin re-projection this configuration diverged (rel residual 6.8
    after 800 iterations, measured)."""
    a = create_laplace_2d(48, 48, dtype=np.float32)
    dense = a.to_dense().astype(np.float32)
    n = a.nrows
    _w, V = np.linalg.eigh(dense.astype(np.float64))
    rng = np.random.default_rng(21)
    W = jnp.asarray(
        (V[:, :6].T + 3e-3 * rng.standard_normal((6, n))).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mv = lambda x: jnp.asarray(dense) @ x
    defl = cg_deflated(mv, b, W, kmax=800, rtol=1e-6)
    plain = cg(mv, b, kmax=800, rtol=1e-6)
    assert bool(defl.converged)
    rel = float(jnp.linalg.norm(mv(defl.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-5
    assert int(defl.iterations) < int(plain.iterations)


def test_deflation_empty_basis_raises():
    _a, _dense, _w, _W, b, mv = _lap_setup()
    with pytest.raises(ValueError, match="empty deflation basis"):
        cg_deflated(mv, b, jnp.zeros((0, b.shape[0])))


@pytest.mark.parametrize("n_dev", [1, 4])
def test_deflation_distributed(n_dev):
    """Distributed deflated CG on the mesh: W rows in the operator's padded
    layout; fewer iterations than plain, matches the host solve."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = create_laplace_2d(24, 24)
    dense = a.to_dense()
    n = a.nrows
    _w, V = np.linalg.eigh(dense)
    A = build_dist_matrix(a, n_devices=n_dev)
    W = jnp.stack([A.to_dist(np.ascontiguousarray(V[:, i]))
                   for i in range(6)])
    b = np.random.default_rng(11 + n_dev).standard_normal(n)
    bb = A.to_dist(b)
    run = jax.jit(lambda A_, v, Wb: cg_deflated(
        A_.as_linear_operator(), v, Wb, kmax=600, rtol=1e-10))
    res = run(A, bb, W)
    assert bool(res.converged)
    x = A.from_dist(res.x, side="col")
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-9, rel
    plain = jax.jit(lambda A_, v: cg(
        A_.as_linear_operator(), v, kmax=600, rtol=1e-10))(A, bb)
    assert int(res.iterations) < 0.85 * int(plain.iterations)
