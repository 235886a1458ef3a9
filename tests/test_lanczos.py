"""Lanczos extreme-eigenvalue / condition estimation (solvers/lanczos.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.gen import create_laplace_2d, random_csr
from spmv_tpu.solvers.lanczos import condition_estimate, lanczos_extreme


def test_extremes_match_dense_eigvals():
    a = create_laplace_2d(16, 16)
    dense = a.to_dense()
    want = np.linalg.eigvalsh(dense)
    v0 = jnp.asarray(np.random.default_rng(1).standard_normal(a.nrows))
    lmin, lmax = lanczos_extreme(lambda x: jnp.asarray(dense) @ x, v0, m=120)
    np.testing.assert_allclose(float(lmax), want[-1], rtol=1e-8)
    np.testing.assert_allclose(float(lmin), want[0], rtol=1e-6)


def test_condition_estimate_vs_dense():
    a = create_laplace_2d(12, 12)
    dense = a.to_dense()
    want = np.linalg.cond(dense)
    v0 = jnp.asarray(np.random.default_rng(2).standard_normal(a.nrows))
    got = float(condition_estimate(lambda x: jnp.asarray(dense) @ x, v0,
                                   m=144))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_extremes_distributed_padded_operator():
    """Through DistMatrix across a mesh: the padded zero rows must NOT leak
    a spurious zero eigenvalue into lambda_min (v0 is zero on padding and
    the operator maps padding to zero)."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = random_csr(200, 200, 4, seed=5, symmetric=True, spd_shift=1.0)
    dense = a.to_dense()
    want = np.linalg.eigvalsh(dense)
    A = build_dist_matrix(a, n_devices=4)
    v0 = A.to_dist(np.random.default_rng(6).standard_normal(200))
    lmin, lmax = jax.jit(
        lambda A_, v: lanczos_extreme(A_.as_linear_operator(), v, m=150)
    )(A, v0)
    np.testing.assert_allclose(float(lmax), want[-1], rtol=1e-8)
    assert float(lmin) > 0.5 * want[0]  # no spurious zero mode
    np.testing.assert_allclose(float(lmin), want[0], rtol=1e-4)


def test_breakdown_on_invariant_subspace():
    """Starting inside a small invariant subspace: clean early breakdown,
    extremes limited to that subspace's spectrum."""
    d = np.array([1.0, 2.0, 3.0, 4.0])
    dense = np.diag(np.concatenate([d, np.full(60, 2.5)]))
    v0 = np.zeros(64)
    v0[:4] = [1.0, 1.0, 1.0, 1.0]
    lmin, lmax = lanczos_extreme(lambda x: jnp.asarray(dense) @ x,
                                 jnp.asarray(v0), m=40)
    np.testing.assert_allclose(float(lmin), 1.0, rtol=1e-10)
    np.testing.assert_allclose(float(lmax), 4.0, rtol=1e-10)


def test_small_norm_operator_no_false_breakdown():
    """A 1e-7-scaled operator must not trip the (relative) breakdown test
    at step 0 — an absolute eps threshold returned kappa=1 for kappa=1e3
    operators."""
    a = create_laplace_2d(12, 12)
    dense = a.to_dense() * 1e-7
    want = np.linalg.eigvalsh(dense)
    v0 = jnp.asarray(np.random.default_rng(3).standard_normal(a.nrows))
    lmin, lmax = lanczos_extreme(lambda x: jnp.asarray(dense) @ x, v0, m=144)
    np.testing.assert_allclose(float(lmax), want[-1], rtol=1e-6)
    np.testing.assert_allclose(float(lmin), want[0], rtol=1e-3)


def test_condition_interval_brackets_true_kappa():
    """The interval brackets kappa when m is large enough to converge the
    extremes, and reports an INFINITE upper end when it is not."""
    from spmv_tpu.solvers.lanczos import condition_interval

    n = 300
    rng = np.random.default_rng(61)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    evals = np.linspace(1.0, 50.0, n)
    dense = (q * evals) @ q.T
    mv = lambda x: jnp.asarray(dense) @ x
    v0 = jnp.asarray(rng.standard_normal(n))
    lo, hi = condition_interval(mv, v0, m=120)
    kappa = 50.0
    assert float(lo) <= kappa * 1.01
    assert float(hi) >= kappa * 0.99
    assert float(hi) < 10 * kappa  # converged: interval is tight-ish
    # short run on a clustered spectrum: upper end must signal distrust
    evals2 = np.concatenate([[1e-4], np.linspace(1.0, 2.0, n - 1)])
    dense2 = (q * evals2) @ q.T
    mv2 = lambda x: jnp.asarray(dense2) @ x
    lo2, hi2 = condition_interval(mv2, v0, m=6)
    assert not np.isfinite(float(hi2)) or float(hi2) > 1e3
