"""FSAI factorized sparse-approximate-inverse preconditioner
(solvers/fsai.py) — the SPD companion to test_spai.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import create_laplace_2d, random_csr
from spmv_tpu.solvers.cg import cg
from spmv_tpu.solvers.fsai import fsai_preconditioner, fsai_setup


def _spd_general(n, seed, shift=None):
    """Scrambled SPD general-sparsity operator: A = B B^T + s I."""
    b = random_csr(n, n, nnz_per_row=4, seed=seed).to_dense()
    s = shift if shift is not None else 0.5 * n ** 0.5
    d = b @ b.T + s * np.eye(n)
    d[np.abs(d) < 1e-13] = 0.0
    return CSRHost.from_dense(d)


def test_fsai_factor_shape():
    """G is lower triangular with positive diagonal and pattern inside
    tril(pattern(A))."""
    a = create_laplace_2d(16, 16)
    g = fsai_setup(a).to_dense()
    assert np.allclose(np.triu(g, 1), 0.0)
    assert (np.diag(g) > 0).all()
    pa = set(zip(*a.to_dense().nonzero()))
    pg = set(zip(*(np.abs(g) > 0).nonzero()))
    assert pg <= pa


def test_fsai_unit_preconditioned_diagonal():
    """The Kolotilina-Yeremin scaling makes diag(G A G^T) = 1 exactly."""
    a = _spd_general(200, seed=5)
    g = fsai_setup(a).to_dense()
    m = g @ a.to_dense() @ g.T
    np.testing.assert_allclose(np.diag(m), 1.0, rtol=0, atol=1e-10)


def test_fsai_exact_on_diagonal_matrix():
    """Diagonal A: G = diag(1/sqrt(d)) and M^-1 = A^-1 exactly."""
    rng = np.random.default_rng(7)
    d = rng.random(90) + 0.5
    a = CSRHost.from_dense(np.diag(d))
    g = fsai_setup(a).to_dense()
    np.testing.assert_allclose(g, np.diag(1.0 / np.sqrt(d)),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(g.T @ g, np.diag(1.0 / d),
                               rtol=1e-12, atol=1e-14)


def test_fsai_minv_is_spd():
    """M^-1 = G^T G must be SPD — the property Jacobi/SPAI cannot give
    PCG on a general pattern."""
    a = _spd_general(150, seed=9)
    g = fsai_setup(a).to_dense()
    minv = g.T @ g
    np.testing.assert_allclose(minv, minv.T, rtol=0, atol=1e-14)
    w = np.linalg.eigvalsh(minv)
    assert w.min() > 0


def test_fsai_beats_jacobi_conditioning():
    """cond(G A G^T) < cond(D^-1/2 A D^-1/2): FSAI strictly extends the
    Jacobi (diagonal) pattern on the 2-D Laplacian, where the diagonal is
    constant and Jacobi is a pure rescale."""
    a = create_laplace_2d(24, 24)
    dense = a.to_dense()
    g = fsai_setup(a).to_dense()
    kf = np.linalg.cond(g @ dense @ g.T)
    dj = np.diag(1.0 / np.sqrt(np.diag(dense)))
    kj = np.linalg.cond(dj @ dense @ dj)
    assert kf < 0.5 * kj, (kf, kj)


def test_fsai_reads_lower_triangle_only():
    """Passing tril(A) (the symmetric-storage form) gives the same factor
    as passing the full symmetric matrix — the gather symmetrizes."""
    a = _spd_general(120, seed=11)
    dense = a.to_dense()
    full = fsai_setup(a).to_dense()
    tril = fsai_setup(CSRHost.from_dense(np.tril(dense))).to_dense()
    np.testing.assert_allclose(tril, full, rtol=1e-12, atol=1e-13)


def test_fsai_structurally_missing_diagonal_is_finite():
    """A structurally zero diagonal entry must yield finite output (ridge
    guard), not NaN."""
    dense = np.diag(np.arange(1.0, 31.0))
    dense[7, 7] = 0.0
    dense[7, 6] = dense[6, 7] = 1e-3  # keep row 7 in the pattern
    a = CSRHost.from_dense(dense)
    g = fsai_setup(a).to_dense()
    assert np.all(np.isfinite(g))


def test_fsai_pcg_fewer_iterations_single_device():
    """PCG + FSAI converges in fewer iterations than plain CG on the 2-D
    Laplacian, to the same true residual."""
    a = create_laplace_2d(32, 32)
    dense = jnp.asarray(a.to_dense())
    n = a.nrows
    b = jnp.asarray(np.random.default_rng(13).standard_normal(n))
    mv = lambda x: dense @ x
    g = fsai_setup(a)
    gd = jnp.asarray(g.to_dense())
    prec = lambda r: gd.T @ (gd @ r)
    plain = cg(mv, b, kmax=400, rtol=1e-10)
    pfsai = cg(mv, b, kmax=400, rtol=1e-10, preconditioner=prec)
    assert bool(pfsai.converged)
    rel = float(jnp.linalg.norm(mv(pfsai.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-9
    assert int(pfsai.iterations) < 0.8 * int(plain.iterations), (
        int(pfsai.iterations), int(plain.iterations))


@pytest.mark.parametrize("n_dev", [1, 4])
def test_fsai_preconditioner_distributed(n_dev):
    """fsai_preconditioner(A) = two distributed SpMVs on A's mesh;
    preconditioned distributed CG beats plain on iterations and matches
    the host solve."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = create_laplace_2d(24, 24)
    n = a.nrows
    A = build_dist_matrix(a, n_devices=n_dev)
    prec = fsai_preconditioner(A)
    b = np.random.default_rng(17 + n_dev).standard_normal(n)
    run = jax.jit(lambda A_, bb, p: cg(
        A_.as_linear_operator(), bb, kmax=400, rtol=1e-10,
        preconditioner=prec if p else None), static_argnums=2)
    res = run(A, A.to_dist(b), True)
    assert bool(res.converged)
    x = A.from_dist(res.x, side="col")
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-9, rel
    plain = run(A, A.to_dist(b), False)
    assert int(res.iterations) < 0.8 * int(plain.iterations)


def test_fsai_preconditioner_matches_host_apply():
    """The distributed apply G^T (G r) agrees with the host-dense
    factor applied to the same vector."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = _spd_general(96, seed=23, shift=12.0)
    A = build_dist_matrix(a, n_devices=4)
    prec = fsai_preconditioner(A)
    g = fsai_setup(a).to_dense()
    r = np.random.default_rng(29).standard_normal(96)
    z = A.from_dist(prec(A.to_dist(r)), side="col")
    np.testing.assert_allclose(z, g.T @ (g @ r), rtol=2e-5, atol=2e-6)
