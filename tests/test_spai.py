"""SPAI sparse-approximate-inverse preconditioner (solvers/spai.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import random_csr
from spmv_tpu.solvers.gmres import gmres
from spmv_tpu.solvers.spai import spai_preconditioner, spai_setup


def _nonsym(n, seed, dom=1.2, k=5):
    a = random_csr(n, n, k, seed=seed)
    dense = a.to_dense()
    np.fill_diagonal(dense, np.abs(dense).sum(axis=1) * dom + 0.5)
    return CSRHost.from_dense(dense)


def test_spai_reduces_frobenius_residual():
    """||A M - I||_F must beat the best DIAGONAL approximation — SPAI on
    A's pattern strictly contains the diagonal pattern."""
    a = _nonsym(180, seed=11)
    dense = a.to_dense()
    m = spai_setup(a)
    am = dense @ m.to_dense()
    spai_res = np.linalg.norm(am - np.eye(180))
    d = np.diag(dense)
    jac_res = np.linalg.norm(dense @ np.diag(1.0 / d) - np.eye(180))
    assert spai_res < 0.6 * jac_res, (spai_res, jac_res)


def test_spai_pattern_is_a_pattern():
    a = _nonsym(120, seed=13)
    m = spai_setup(a)
    pa = set(zip(*a.to_dense().nonzero()))
    pm = set(zip(*(np.abs(m.to_dense()) > 0).nonzero()))
    assert pm <= pa


def test_spai_exact_on_diagonal_matrix():
    """Diagonal A: pattern-of-A SPAI contains the exact inverse."""
    rng = np.random.default_rng(17)
    d = rng.random(90) + 0.5
    a = CSRHost.from_dense(np.diag(d))
    m = spai_setup(a)
    np.testing.assert_allclose(m.to_dense(), np.diag(1.0 / d),
                               rtol=1e-12, atol=1e-14)


def test_spai_exact_on_triangular_bidiagonal_inverse_pattern():
    """When A's pattern contains A^-1's pattern the SPAI IS the inverse:
    block-diagonal 2x2 blocks."""
    rng = np.random.default_rng(19)
    n = 80
    dense = np.zeros((n, n))
    for i in range(0, n, 2):
        blk = rng.standard_normal((2, 2)) + 3 * np.eye(2)
        dense[i:i + 2, i:i + 2] = blk
    a = CSRHost.from_dense(dense)
    m = spai_setup(a)
    np.testing.assert_allclose(m.to_dense(), np.linalg.inv(dense),
                               rtol=1e-10, atol=1e-12)


def _convection_diffusion_2d(g: int, cx=12.0, cy=8.0) -> CSRHost:
    """Upwind convection-diffusion on a g x g grid — the canonical
    nonsymmetric test operator. Its diagonal is CONSTANT, so Jacobi is a
    pure rescale; the convective asymmetry lives entirely off-diagonal,
    exactly what SPAI's pattern can capture."""
    n = g * g
    h = 1.0 / (g + 1)
    rows, cols, vals = [], [], []

    def add(i, j, v):
        rows.append(i); cols.append(j); vals.append(v)

    for iy in range(g):
        for ix in range(g):
            i = iy * g + ix
            add(i, i, 4.0 + (cx + cy) * h)
            if ix > 0:
                add(i, i - 1, -1.0 - cx * h)
            if ix < g - 1:
                add(i, i + 1, -1.0)
            if iy > 0:
                add(i, i - g, -1.0 - cy * h)
            if iy < g - 1:
                add(i, i + g, -1.0)
    return CSRHost.from_coo(np.array(rows), np.array(cols),
                            np.array(vals), n, n)


def test_spai_gmres_fewer_iterations():
    """GMRES + SPAI converges in fewer Arnoldi steps than unpreconditioned
    and than Jacobi on a convection-diffusion operator (constant diagonal:
    Jacobi is inert, the asymmetry is off-diagonal)."""
    a = _convection_diffusion_2d(18)
    n = a.nrows
    dense = a.to_dense()
    b = np.random.default_rng(24).standard_normal(n)
    mv = lambda x: jnp.asarray(dense) @ x
    m = spai_setup(a)
    md = jnp.asarray(m.to_dense())
    plain = gmres(mv, jnp.asarray(b), restart=40, max_cycles=30, rtol=1e-9)
    jac = gmres(mv, jnp.asarray(b), restart=40, max_cycles=30, rtol=1e-9,
                preconditioner=lambda r: r / jnp.asarray(np.diag(dense)))
    spai = gmres(mv, jnp.asarray(b), restart=40, max_cycles=30, rtol=1e-9,
                 preconditioner=lambda r: md @ r)
    assert bool(spai.converged)
    rel = np.linalg.norm(dense @ np.asarray(spai.x) - b) / np.linalg.norm(b)
    assert rel < 1e-8
    assert int(spai.iterations) < int(plain.iterations)
    assert int(spai.iterations) < int(jac.iterations)


def test_spai_pattern_level_2_stronger():
    """pattern(|A|^2 + |A|) contains pattern(A) and yields a strictly
    better Frobenius residual (and a less singular A M) on a weakly
    dominant scaled operator — the documented remedy when level 1 is too
    poor."""
    a0 = _nonsym(200, seed=29, dom=0.9)
    n = a0.nrows
    w = np.logspace(-1.5, 1.5, n)
    dense = a0.to_dense() * w[:, None] * w[None, :]
    a = CSRHost.from_dense(dense)
    m1 = spai_setup(a, pattern_level=1).to_dense()
    m2 = spai_setup(a, pattern_level=2).to_dense()
    r1 = np.linalg.norm(dense @ m1 - np.eye(n))
    r2 = np.linalg.norm(dense @ m2 - np.eye(n))
    assert r2 < r1, (r2, r1)
    s1 = np.linalg.svd(dense @ m1, compute_uv=False)[-1]
    s2 = np.linalg.svd(dense @ m2, compute_uv=False)[-1]
    assert s2 > s1, (s2, s1)
    # level-2 pattern contains level-1's
    p1 = set(zip(*(np.abs(m1) > 0).nonzero()))
    p2 = set(zip(*(np.abs(m2) > 0).nonzero()))
    assert len(p2) > len(p1)


def test_spai_structurally_singular_column_stays_zero():
    """A zero column cannot be matched; its M column must come out zero
    (ridge guard), not NaN."""
    dense = np.diag(np.arange(1.0, 31.0))
    dense[:, 7] = 0.0
    dense[7, 7] = 0.0
    # keep the pattern nonempty for column 7 via an off-diagonal in row 7
    dense[7, 8] = 1.0
    a = CSRHost.from_dense(dense)
    m = spai_setup(a).to_dense()
    assert np.all(np.isfinite(m))
    np.testing.assert_array_equal(m[:, 7], 0.0)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_spai_preconditioner_distributed(n_dev):
    """spai_preconditioner(A) builds M on A's mesh; preconditioned
    distributed GMRES beats plain on iterations and matches the direct
    solve."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    rng = np.random.default_rng(40 + n_dev)
    a = _convection_diffusion_2d(16)
    n = a.nrows
    A = build_dist_matrix(a, n_devices=n_dev)
    prec = spai_preconditioner(A)
    b = rng.standard_normal(n)
    res = jax.jit(
        lambda A_, bb: gmres(A_.as_linear_operator(), bb, restart=30,
                             max_cycles=25, rtol=1e-11, preconditioner=prec)
    )(A, A.to_dist(b))
    assert bool(res.converged)
    x = A.from_dist(res.x, side="col")
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-9, rel
    plain = jax.jit(
        lambda A_, bb: gmres(A_.as_linear_operator(), bb, restart=30,
                             max_cycles=25, rtol=1e-11)
    )(A, A.to_dist(b))
    assert int(res.iterations) < int(plain.iterations)
