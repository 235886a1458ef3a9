"""MINRES: symmetric-indefinite solver (beyond-reference — the reference's
only solver is CG, reference spmv/cg.cpp, which requires SPD; its symmetric
storage mode happily assembles indefinite operators CG cannot solve)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.solvers.cg import cg
from spmv_tpu.solvers.minres import minres


def lap1d_shifted(n, sigma):
    """1-D Laplacian minus sigma*I — symmetric, INDEFINITE for sigma inside
    the spectrum (eigenvalues 2-2cos(pi k/(n+1)) - sigma straddle zero)."""
    d = np.full(n, 2.0 - sigma)
    e = np.full(n - 1, -1.0)
    dense = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    return dense


def test_minres_indefinite_matches_direct_solve():
    n = 200
    # NOT sigma=1.0: 2-2cos(67*pi/201) == 1 exactly, which would make the
    # shifted operator singular and stall any Krylov method
    dense = lap1d_shifted(n, sigma=1.05)
    evals = np.linalg.eigvalsh(dense)
    assert evals[0] < 0 < evals[-1]  # genuinely indefinite
    assert np.abs(evals).min() > 1e-3  # and safely nonsingular
    b = np.random.default_rng(5).standard_normal(n)
    mv = lambda x: jnp.asarray(dense) @ x
    res = jax.jit(lambda bb: minres(mv, bb, kmax=600, rtol=1e-12))(
        jnp.asarray(b))
    assert bool(res.converged), float(res.rnorm / res.rnorm0)
    want = np.linalg.solve(dense, b)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-7, atol=1e-8)


def test_minres_rnorm_is_true_residual():
    n = 150
    dense = lap1d_shifted(n, sigma=0.7)
    b = np.random.default_rng(6).standard_normal(n)
    mv = lambda x: jnp.asarray(dense) @ x
    res = minres(mv, jnp.asarray(b), kmax=500, rtol=1e-10)
    r = b - dense @ np.asarray(res.x)
    # phibar is the recurrence estimate of |r|; they agree to rounding
    np.testing.assert_allclose(np.linalg.norm(r), float(res.rnorm),
                               rtol=1e-5, atol=1e-10)


def test_minres_spd_agrees_with_cg():
    """On an SPD system MINRES and CG minimize over the same Krylov space;
    both must reach the same solution."""
    n = 180
    dense = lap1d_shifted(n, sigma=0.0) + np.eye(n) * 0.1
    b = np.random.default_rng(7).standard_normal(n)
    mv = lambda x: jnp.asarray(dense) @ x
    res_m = minres(mv, jnp.asarray(b), kmax=800, rtol=1e-12)
    res_c = cg(mv, jnp.asarray(b), kmax=800, rtol=1e-12)
    assert bool(res_m.converged) and bool(res_c.converged)
    np.testing.assert_allclose(np.asarray(res_m.x), np.asarray(res_c.x),
                               rtol=1e-7, atol=1e-9)


def test_minres_jacobi_preconditioned():
    """SPD Jacobi preconditioning on a badly diagonally-scaled symmetric
    system: converges in fewer iterations, same true-residual meaning."""
    n = 300
    rng = np.random.default_rng(11)
    w = np.logspace(-2, 2, n)
    base = lap1d_shifted(n, sigma=0.0) + np.eye(n)
    dense = base * w[:, None] * w[None, :]
    diag = jnp.asarray(np.diag(dense))
    b = rng.standard_normal(n)
    mv = lambda x: jnp.asarray(dense) @ x
    plain = minres(mv, jnp.asarray(b), kmax=3000, rtol=1e-9)
    prec = minres(mv, jnp.asarray(b), kmax=3000, rtol=1e-9,
                  preconditioner=lambda r: r / diag)
    assert bool(prec.converged)
    rel = np.linalg.norm(dense @ np.asarray(prec.x) - b) / np.linalg.norm(b)
    assert rel < 1e-7, rel
    assert int(prec.iterations) < int(plain.iterations)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_minres_distributed_indefinite(n_dev):
    """MINRES over a sharded DistMatrix: shifted banded Laplacian stored
    SYMMETRIC (lower triangle + diagonal), global dots psum under jit."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    rng = np.random.default_rng(200 + n_dev)
    n = 260
    rows, cols, vals = [], [], []
    for off in (-9, -1, 0, 1, 9):
        i = np.arange(max(0, -off), min(n, n - off))
        rows.append(i)
        cols.append(i + off)
        vals.append(np.full(len(i), 4.5 if off == 0 else -1.0))
    a = CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), n, n)
    dense = a.to_dense() - 2.0 * np.eye(n)  # shift into indefiniteness
    a = CSRHost.from_dense(dense)
    assert np.linalg.eigvalsh(dense)[0] < 0 < np.linalg.eigvalsh(dense)[-1]
    A = build_dist_matrix(a, n_devices=n_dev, symmetric=True)
    b = rng.standard_normal(n)
    res = jax.jit(
        lambda A_, bb: minres(A_.as_linear_operator(), bb,
                              kmax=800, rtol=1e-11)
    )(A, A.to_dist(b))
    assert bool(res.converged), float(res.rnorm)
    x = A.from_dist(res.x, side="col")
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-8, rel
