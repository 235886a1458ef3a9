"""Lanczos matrix-function actions (solvers/funm.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.gen import create_laplace_2d
from spmv_tpu.solvers.funm import (
    expm_multiply,
    funm_multiply,
    inv_sqrt_multiply,
    slq_logdet,
    slq_trace,
    sqrt_multiply,
)


def _setup(g=20, seed=0):
    a = create_laplace_2d(g, g)
    dense = a.to_dense()
    w, V = np.linalg.eigh(dense)
    b = np.random.default_rng(seed).standard_normal(a.nrows)
    mv = lambda x: jnp.asarray(dense) @ x
    return a, dense, w, V, b, mv


def _f_dense(w, V, b, f):
    return V @ (f(w) * (V.T @ b))


@pytest.mark.parametrize("t", [-1.0, -0.1, 0.5])
def test_expm_multiply_matches_dense(t):
    _a, _dense, w, V, b, mv = _setup()
    y, est = expm_multiply(mv, jnp.asarray(b), t=t, m=48)
    want = _f_dense(w, V, b, lambda x: np.exp(t * x))
    rel = np.linalg.norm(np.asarray(y) - want) / np.linalg.norm(want)
    assert rel < 1e-12, rel
    assert float(est) < 1e-10 * np.linalg.norm(want)


def test_inv_sqrt_multiply():
    """A^{-1/2} b vs dense; and A^{-1/2}(A^{-1/2} b) = A^{-1} b."""
    _a, dense, w, V, b, mv = _setup(seed=1)
    y, _ = inv_sqrt_multiply(mv, jnp.asarray(b), m=64)
    want = _f_dense(w, V, b, lambda x: x ** -0.5)
    assert np.linalg.norm(np.asarray(y) - want) < 1e-8 * np.linalg.norm(want)
    y2, _ = inv_sqrt_multiply(mv, y, m=64)
    solve = np.linalg.solve(dense, b)
    assert np.linalg.norm(np.asarray(y2) - solve) < 1e-8 * np.linalg.norm(solve)


def test_sqrt_multiply_squares_back():
    """A^{1/2}(A^{1/2} b) = A b to rounding."""
    _a, dense, _w, _V, b, mv = _setup(seed=2)
    y, _ = sqrt_multiply(mv, jnp.asarray(b), m=64)
    y2, _ = sqrt_multiply(mv, y, m=64)
    want = dense @ b
    assert np.linalg.norm(np.asarray(y2) - want) < 1e-9 * np.linalg.norm(want)


def test_funm_identity_is_matvec():
    """f(x) = x reproduces A b essentially exactly at any m >= 2."""
    _a, dense, _w, _V, b, mv = _setup(seed=3)
    y, est = funm_multiply(mv, jnp.asarray(b), lambda th: th, m=8)
    want = dense @ b
    assert np.linalg.norm(np.asarray(y) - want) < 1e-12 * np.linalg.norm(want)


def test_funm_error_estimate_tracks_convergence():
    """err_est decreases as m grows and, once small, certifies a small
    true error (within two orders on this well-behaved spectrum)."""
    _a, _dense, w, V, b, mv = _setup(seed=4)
    want = _f_dense(w, V, b, lambda x: np.exp(-x))
    errs, ests = [], []
    for m in (6, 12, 24, 48):
        y, est = expm_multiply(mv, jnp.asarray(b), t=-1.0, m=m)
        errs.append(np.linalg.norm(np.asarray(y) - want))
        ests.append(float(est))
    assert ests[-1] < ests[0]
    assert errs[-1] < 1e-10 * np.linalg.norm(want)
    # the heuristic is within two orders of the truth while converging
    assert errs[1] < 100 * max(ests[1], 1e-300)


def test_funm_identity_operator_breakdown():
    """A = c*I breaks down at step 1 and still returns exp(t c) b
    exactly — dead Lanczos steps must not pollute f(T)."""
    n = 64
    c = 0.7
    mv = lambda x: c * x
    b = np.random.default_rng(5).standard_normal(n)
    y, est = expm_multiply(mv, jnp.asarray(b), t=2.0, m=16)
    np.testing.assert_allclose(np.asarray(y), np.exp(2.0 * c) * b,
                               rtol=1e-12)
    assert float(est) < 1e-12


def test_funm_jittable_end_to_end():
    _a, _dense, w, V, b, mv = _setup(seed=6)
    y, est = jax.jit(
        lambda v: expm_multiply(mv, v, t=-0.5, m=32))(jnp.asarray(b))
    want = _f_dense(w, V, b, lambda x: np.exp(-0.5 * x))
    assert np.linalg.norm(np.asarray(y) - want) < 1e-11 * np.linalg.norm(want)


def test_slq_logdet_within_error_bars():
    """SLQ log-det lands within 5 standard errors of the exact slogdet
    (deterministic key) and the bar is itself sane (< 3% of the value)."""
    a = create_laplace_2d(24, 24)
    dense = a.to_dense()
    mv = lambda x: jnp.asarray(dense) @ x
    mean, se = slq_logdet(mv, jnp.ones(a.nrows), jax.random.PRNGKey(0),
                          n_probes=24, m=40)
    want = np.linalg.slogdet(dense)[1]
    assert abs(float(mean) - want) < 5 * float(se)
    assert float(se) < 0.03 * abs(want)


def test_slq_trace_identity_function():
    """f = id: the estimator targets tr(A) (Hutchinson through exact
    quadrature)."""
    a = create_laplace_2d(20, 20)
    dense = a.to_dense()
    mv = lambda x: jnp.asarray(dense) @ x
    mean, se = slq_trace(mv, lambda th: th, jnp.ones(a.nrows),
                         jax.random.PRNGKey(1), n_probes=24, m=32)
    assert abs(float(mean) - np.trace(dense)) < 5 * max(float(se), 1e-12)


def test_slq_exact_on_diagonal_operator():
    """Diagonal A with few distinct eigenvalues: every Rademacher probe
    gives the exact trace (z_i^2 = 1, no cross terms) and the Lanczos
    quadrature is exact once m exceeds the number of distinct
    eigenvalues — so the variance is EXACTLY zero."""
    d = np.repeat([1.0, 2.0, 3.0, 4.0], 16)
    mv = lambda x: jnp.asarray(d) * x
    mean, se = slq_trace(mv, lambda th: th ** 2, jnp.ones(64),
                         jax.random.PRNGKey(2), n_probes=4, m=8)
    np.testing.assert_allclose(float(mean), np.sum(d ** 2), rtol=1e-10)
    assert float(se) < 1e-10


def test_slq_respects_padding_support():
    """Zero entries of the template never receive probe mass — the
    estimate equals the one on the dense subproblem."""
    d = np.arange(1.0, 33.0)
    dpad = np.concatenate([d, np.zeros(8)])       # 8 padding rows
    mv = lambda x: jnp.asarray(dpad) * x
    tmpl = jnp.asarray((dpad != 0).astype(np.float64))
    mean, _se = slq_trace(mv, lambda th: th, tmpl, jax.random.PRNGKey(3),
                          n_probes=8, m=40)
    np.testing.assert_allclose(float(mean), d.sum(), rtol=1e-9)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_slq_logdet_distributed(n_dev):
    """SLQ through a DistMatrix on the mesh, probes drawn on the padded
    lane layout's true support."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = create_laplace_2d(16, 16)
    A = build_dist_matrix(a, n_devices=n_dev)
    tmpl = A.to_dist(np.ones(a.nrows))
    mean, se = jax.jit(lambda A_, t: slq_logdet(
        A_.as_linear_operator(), t, jax.random.PRNGKey(4),
        n_probes=20, m=40))(A, tmpl)
    want = np.linalg.slogdet(a.to_dense())[1]
    assert abs(float(mean) - want) < 5 * float(se)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_funm_distributed(n_dev):
    """Heat propagation exp(-t A) b through a DistMatrix on the mesh
    matches the host dense propagator."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = create_laplace_2d(16, 16)
    dense = a.to_dense()
    w, V = np.linalg.eigh(dense)
    A = build_dist_matrix(a, n_devices=n_dev)
    b = np.random.default_rng(7 + n_dev).standard_normal(a.nrows)
    y, _ = jax.jit(lambda A_, v: expm_multiply(
        A_.as_linear_operator(), v, t=-0.8, m=48))(A, A.to_dist(b))
    got = A.from_dist(y, side="col")
    want = _f_dense(w, V, b, lambda x: np.exp(-0.8 * x))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)
