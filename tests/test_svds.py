"""Golub-Kahan singular-triplet estimation (solvers/svds.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.solvers.svds import svds


def _dense_ops(dense):
    d = jnp.asarray(dense)
    dt = jnp.asarray(dense.T)
    return (lambda x: d @ x), (lambda y: dt @ y)


def _tall(mr, nc, seed, spread=2.0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((mr, nc)) * np.logspace(0, -spread, nc)[None]


def test_svds_exact_at_full_steps():
    """m = ncols on a full-rank operator reproduces the dense SVD."""
    dense = _tall(120, 60, seed=1)
    mv, rmv = _dense_ops(dense)
    b0 = jnp.asarray(np.random.default_rng(2).standard_normal(120))
    r = svds(mv, rmv, b0, k=6, m=60)
    want = np.linalg.svd(dense, compute_uv=False)
    np.testing.assert_allclose(r.s, want[:6], rtol=1e-12)
    assert r.steps == 60
    # fully converged: certificates at the rounding floor
    assert r.residuals.max() < 1e-10 * r.s[0]


def test_svds_certificate_equals_true_residual():
    """In the unconverged regime the certificate alpha_{m+1}|p_i[m]| EQUALS
    |A^T u_i - s_i v_i| (module docstring identity), and |A v_i - s_i u_i|
    stays at rounding level (exact in the Krylov frame)."""
    dense = _tall(120, 70, seed=3, spread=0.5)  # clustered -> slow
    mv, rmv = _dense_ops(dense)
    b0 = jnp.asarray(np.random.default_rng(4).standard_normal(120))
    r = svds(mv, rmv, b0, k=4, m=10)
    for i in range(4):
        u, v = np.asarray(r.u[i]), np.asarray(r.v[i])
        act = np.linalg.norm(dense.T @ u - r.s[i] * v)
        np.testing.assert_allclose(r.residuals[i], act, rtol=1e-8)
        assert np.linalg.norm(dense @ v - r.s[i] * u) < 1e-10 * r.s[0]


def test_svds_top_values_converge_before_m_exhausts():
    """Extreme singular values converge first: at m ~ 2k the top value is
    already at certificate < 1e-8 on a well-separated spectrum."""
    dense = _tall(200, 120, seed=5, spread=3.0)
    mv, rmv = _dense_ops(dense)
    b0 = jnp.asarray(np.random.default_rng(6).standard_normal(200))
    r = svds(mv, rmv, b0, k=2, m=24)
    want = np.linalg.svd(dense, compute_uv=False)
    np.testing.assert_allclose(r.s[0], want[0], rtol=1e-9)
    assert r.residuals[0] < 1e-8 * r.s[0]


def test_svds_ritz_vectors_orthonormal():
    dense = _tall(90, 50, seed=7)
    mv, rmv = _dense_ops(dense)
    b0 = jnp.asarray(np.random.default_rng(8).standard_normal(90))
    r = svds(mv, rmv, b0, k=5, m=30)
    U, V = np.asarray(r.u), np.asarray(r.v)
    np.testing.assert_allclose(U @ U.T, np.eye(5), atol=1e-10)
    np.testing.assert_allclose(V @ V.T, np.eye(5), atol=1e-10)


def test_svds_breakdown_on_exact_rank():
    """Rank-r operator: the process breaks down at step r with the r
    nonzero singular values EXACT and zero-certificate triplets."""
    rng = np.random.default_rng(9)
    rank = 5
    dense = (rng.standard_normal((80, rank)) * [5, 4, 3, 2, 1]) @ \
        rng.standard_normal((rank, 40))
    mv, rmv = _dense_ops(dense)
    b0 = jnp.asarray(rng.standard_normal(80))
    r = svds(mv, rmv, b0, k=8, m=20)
    assert r.steps == rank
    want = np.linalg.svd(dense, compute_uv=False)
    np.testing.assert_allclose(r.s, want[:rank], rtol=1e-10)
    assert r.residuals.max() < 1e-10 * r.s[0]


def test_svds_wide_operator():
    """Wide (nrows < ncols) operators work — b0 lives in the SHORT row
    space."""
    dense = np.ascontiguousarray(_tall(110, 50, seed=11).T)  # (50, 110)
    mv, rmv = _dense_ops(dense)
    b0 = jnp.asarray(np.random.default_rng(12).standard_normal(50))
    r = svds(mv, rmv, b0, k=3, m=40)
    want = np.linalg.svd(dense, compute_uv=False)
    np.testing.assert_allclose(r.s, want[:3], rtol=1e-9)


def test_svds_zero_start_raises():
    dense = _tall(30, 20, seed=13)
    mv, rmv = _dense_ops(dense)
    with pytest.raises(ValueError, match="breakdown at step 0"):
        svds(mv, rmv, jnp.zeros(30), k=2, m=10)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_svds_distributed_rectangular(n_dev):
    """svds on a tall rectangular DistMatrix: matvec on the operator,
    rmatvec via the cached transpose, padded lane layouts throughout;
    values match the host dense SVD."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    mr, nc = 520, 260
    rng = np.random.default_rng(20 + n_dev)
    rows, cols, vals = [], [], []
    for off in (0, 3, 17, 130, 200):
        i = np.arange(mr)
        rows.append(i); cols.append((i + off) % nc)
        vals.append(rng.standard_normal(mr))
    a = CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), mr, nc)
    A = build_dist_matrix(a, n_devices=n_dev, local_format="ell")
    At = A.transposed()
    b0 = A.to_dist(rng.standard_normal(mr), side="row")
    r = svds(A.as_linear_operator(), At.as_linear_operator(), b0, k=3, m=48)
    want = np.linalg.svd(a.to_dense(), compute_uv=False)
    np.testing.assert_allclose(r.s, want[:3], rtol=1e-7)
    # Ritz vectors live in the padded layouts; check the triplet identity
    # through the distributed operator itself
    av = A.from_dist(A.matvec(r.v[0]), side="row")
    u0 = A.from_dist(r.u[0], side="row")
    np.testing.assert_allclose(av, r.s[0] * u0, rtol=1e-6, atol=1e-9)
