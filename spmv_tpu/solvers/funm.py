"""Matrix-function actions f(A) v for symmetric (SPD) operators via
Lanczos — heat propagators, inverse square roots, and any other spectral
function, WITHOUT ever forming f(A).

Why this belongs in a sparse-solver stack: several production workloads
need the ACTION of a matrix function, not a linear solve —

- ``exp(t A) v``: exponential integrators / heat & diffusion propagation
  (one call replaces many implicit-Euler solves);
- ``A^{-1/2} v``: sampling from N(0, A^{-1}) Gaussian fields (Bayesian
  inverse problems, lattice QCD pseudofermions);
- ``A^{1/2} v``, ``log(A) v``: fractional diffusion, log-determinant
  estimators (Hutchinson tracing f = log).

Method (Saad '92): run m Lanczos steps (``lanczos_factorization``,
CGS2-reorthogonalized, distributed through the injected ``matvec``), then

    f(A) v  ~=  |v| * V_m U f(Theta) U^T e_1

with T_m = U Theta U^T the m x m tridiagonal eigendecomposition. The
whole pipeline is pure JAX and JITTABLE END TO END — symmetric ``eigh``
lowers on TPU, so unlike Arnoldi extraction nothing round-trips to host.
Convergence is superlinear for entire functions (exp) and
smooth-on-spectrum functions: m ~ sqrt(|t| * lambda_max) steps for the
exponential, m ~ sqrt(kappa) log(1/tol) for inverse roots.

Error estimate: the returned ``err_est = |v| * beta_m * |c_m|`` (the next
Lanczos weight times the last Krylov coefficient of f) is the standard
generalized-residual heuristic — exact for f(x) = x, asymptotically tight
for exp, and the practical stopping signal: raise m until it is small.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from spmv_tpu.solvers.lanczos import lanczos_factorization


def funm_multiply(
    matvec: Callable[[jax.Array], jax.Array],
    v0: jax.Array,
    f: Callable[[jax.Array], jax.Array],
    m: int = 48,
) -> tuple[jax.Array, jax.Array]:
    """Return ``(y, err_est)`` with ``y ~= f(A) v0`` for the symmetric
    operator behind ``matvec``; ``f`` is applied elementwise to the Ritz
    values (device arrays — use ``jnp``). ``v0``: any vector in the
    operator's padded layout, zero on padding rows. Jittable; distributed
    when ``matvec`` is. ``err_est`` is the generalized-residual heuristic
    (module docstring) in the SAME scale as |y|."""
    alphas, betas, basis, nrm0 = lanczos_factorization(matvec, v0, m)
    t = (jnp.diag(alphas)
         + jnp.diag(betas[:-1], 1)
         + jnp.diag(betas[:-1], -1))
    evals, evecs = jnp.linalg.eigh(t)
    ftheta = f(evals)
    c = evecs @ (ftheta * evecs[0, :])           # U f(Theta) U^T e_1, (m,)
    y = (nrm0.astype(v0.dtype)
         * (c.astype(v0.dtype) @ basis[:m])).reshape(v0.shape)
    err_est = nrm0 * betas[-1] * jnp.abs(c[-1])
    return y, err_est


def expm_multiply(
    matvec: Callable[[jax.Array], jax.Array],
    v0: jax.Array,
    t: float = 1.0,
    m: int = 48,
) -> tuple[jax.Array, jax.Array]:
    """``exp(t A) v0`` (scipy.sparse.linalg.expm_multiply semantics: pass
    ``t < 0`` for decay/diffusion with an SPD A). m ~ sqrt(|t| lambda_max)
    + a margin gives full accuracy; check ``err_est``."""
    ts = jnp.asarray(t)
    return funm_multiply(matvec, v0, lambda th: jnp.exp(ts * th), m=m)


def inv_sqrt_multiply(
    matvec: Callable[[jax.Array], jax.Array],
    v0: jax.Array,
    m: int = 48,
) -> tuple[jax.Array, jax.Array]:
    """``A^{-1/2} v0`` for SPD A — e.g. z ~ N(0, I) gives
    ``A^{-1/2} z ~ N(0, A^{-1})``, the whitening/sampling primitive.
    Ritz values are clipped at tiny to keep a not-yet-converged bottom
    from producing inf."""
    def f(th):
        tiny = jnp.asarray(jnp.finfo(th.dtype).tiny, th.dtype)
        return 1.0 / jnp.sqrt(jnp.maximum(th, tiny))
    return funm_multiply(matvec, v0, f, m=m)


def sqrt_multiply(
    matvec: Callable[[jax.Array], jax.Array],
    v0: jax.Array,
    m: int = 48,
) -> tuple[jax.Array, jax.Array]:
    """``A^{1/2} v0`` for symmetric positive SEMI-definite A (fractional
    diffusion, covariance coloring: ``A^{1/2} z ~ N(0, A)``)."""
    def f(th):
        return jnp.sqrt(jnp.maximum(th, 0.0))
    return funm_multiply(matvec, v0, f, m=m)
