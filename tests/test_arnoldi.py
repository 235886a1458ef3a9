"""Arnoldi Ritz-value estimation for nonsymmetric operators
(solvers/arnoldi.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.solvers.arnoldi import arnoldi_factorization, arnoldi_ritz

from test_spai import _convection_diffusion_2d


def test_arnoldi_extreme_ritz_match_known_spectrum():
    """Diagonal + small perturbation: extreme Ritz values converge to the
    extreme eigenvalues with tight residual certificates."""
    rng = np.random.default_rng(11)
    n = 300
    d = np.linspace(1.0, 50.0, n)
    dense = np.diag(d) + 0.01 * rng.standard_normal((n, n))
    true = np.linalg.eigvals(dense)
    mv = lambda x: jnp.asarray(dense) @ x
    v0 = jnp.asarray(rng.standard_normal(n))
    r = arnoldi_ritz(mv, v0, m=60)
    np.testing.assert_allclose(r.spectral_radius, np.abs(true).max(),
                               rtol=1e-6)
    np.testing.assert_allclose(r.rightmost.real, true.real.max(), rtol=1e-6)
    # the top Ritz value's certificate is small relative to the spectrum
    assert r.residuals[0] < 1e-4 * r.spectral_radius


def test_arnoldi_complex_pair():
    """Rotation-dominated block: the dominant COMPLEX conjugate pair must
    surface (a symmetric-only method cannot represent it)."""
    rng = np.random.default_rng(13)
    n = 120
    dense = 0.05 * rng.standard_normal((n, n)) + 2.0 * np.eye(n)
    dense[0, 1] = -5.0
    dense[1, 0] = 5.0  # eigenpair ~ 2 +- 5i
    mv = lambda x: jnp.asarray(dense) @ x
    r = arnoldi_ritz(mv, jnp.asarray(rng.standard_normal(n)), m=50)
    top2 = r.values[:2]
    assert abs(top2[0].imag) > 4.5
    np.testing.assert_allclose(sorted(top2.imag), [-top2[0].imag.__abs__(),
                                                   top2[0].imag.__abs__()],
                               rtol=1e-6)
    want = np.linalg.eigvals(dense)
    np.testing.assert_allclose(r.spectral_radius, np.abs(want).max(),
                               rtol=1e-5)


def test_arnoldi_lucky_breakdown_exact():
    """Operator with minimal polynomial degree 4: the process breaks down
    early, residual certificates go to ZERO, and the Ritz values are the
    exact eigenvalues of the restriction."""
    n = 96
    nil = np.zeros((n, n))
    for i in range(0, n - 3, 4):
        nil[i, i + 1] = nil[i + 1, i + 2] = nil[i + 2, i + 3] = 1.0
    dense = 3.0 * np.eye(n) + nil
    mv = lambda x: jnp.asarray(dense) @ x
    v0 = jnp.asarray(np.random.default_rng(17).standard_normal(n))
    r = arnoldi_ritz(mv, v0, m=40)
    assert r.steps <= 5
    np.testing.assert_allclose(r.residuals, 0.0, atol=1e-10)
    # Jordan-block eigenvalue sensitivity: an O(eps) Hessenberg perturbation
    # moves a degree-4 defective eigenvalue by O(eps^(1/4)) ~ 1e-4 — the
    # attainable accuracy, not a method defect
    np.testing.assert_allclose(r.values.real, 3.0, rtol=2e-4)
    np.testing.assert_allclose(r.values.imag, 0.0, atol=2e-4)


def test_arnoldi_factorization_relation():
    """A V_m = V_{m+1} H holds (checked through the Hessenberg's action on
    the start vector: matvec moments match)."""
    rng = np.random.default_rng(19)
    n = 80
    dense = rng.standard_normal((n, n)) / np.sqrt(n) + np.eye(n)
    mv = lambda x: jnp.asarray(dense) @ x
    v0 = rng.standard_normal(n)
    m = 20
    h = np.asarray(jax.jit(
        lambda v: arnoldi_factorization(mv, v, m))(jnp.asarray(v0)))
    # moments: v0^T A^k v0 = |v0|^2 * (H^k)[0,0] for k < m
    hk = h[:m, :m]
    nrm2 = float(v0 @ v0)
    vk = v0.copy()
    for k in range(1, 6):
        vk = dense @ vk
        np.testing.assert_allclose(
            float(v0 @ vk), nrm2 * np.linalg.matrix_power(hk, k)[0, 0],
            rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_arnoldi_distributed(n_dev):
    """Distributed nonsymmetric spectrum estimate on the mesh matches the
    host eig extremes."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = _convection_diffusion_2d(14)
    A = build_dist_matrix(a, n_devices=n_dev)
    v0 = A.to_dist(np.random.default_rng(23).standard_normal(a.nrows))
    r = arnoldi_ritz(A.as_linear_operator(), v0, m=60)
    want = np.linalg.eigvals(a.to_dense())
    np.testing.assert_allclose(r.spectral_radius, np.abs(want).max(),
                               rtol=1e-4)
    np.testing.assert_allclose(r.rightmost.real, want.real.max(), rtol=1e-3)
