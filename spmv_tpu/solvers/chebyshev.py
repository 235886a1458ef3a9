"""Chebyshev iteration — the reduction-free inner solver.

Every Krylov method in this library pays per-iteration global reductions
(dots -> psum across the mesh); at pod scale those collectives are the
latency floor of the whole solve (the reference pays 3 MPI_Allreduce per
CG iteration, reference spmv/cg.cpp:49,65,75; ``cg_pipelined`` gets that
to 1). Chebyshev iteration on an SPD operator with spectrum enclosed in
[lmin, lmax] needs ZERO reductions: the step scalars come from the
recurrence, not from dots, so a distributed Chebyshev sweep is matvec +
axpy only — the halo exchange is the ONLY communication. It is also
immune to the fp32 conjugacy decay that limits long CG/block-CG inner
solves (solvers/block_cg.py): the recurrence never feeds rounding errors
back through orthogonality assumptions.

The price is needing spectrum bounds. ``lanczos_extreme_with_bounds``
(solvers/lanczos.py) supplies them: Ritz theta_max UNDERestimates
lambda_max (Cauchy interlacing), so the enclosure inflates it by its Ritz
residual plus a margin — modes outside [lmin, lmax] are AMPLIFIED by the
Chebyshev polynomial, so the top bound must be safe; a too-small lmin
only slows convergence (and theta_min >= lambda_min always, so it is
deflated by the same logic).

Converges like CG asymptotically (factor (sqrt(kappa)-1)/(sqrt(kappa)+1)
per sweep step) without sharing CG's minimax optimality on clustered
spectra — as an INNER solver for mixed-precision refinement
(block_cg_refined(inner_solver="chebyshev")): fixed iteration count,
fixed cost, no collectives, no decay.

Measured envelope (on chip): at kappa ~ 1e3 the Chebyshev inner reaches
the same f64-class refinement floor as CG; at kappa ~ 1e5 a 48-step
Lanczos cannot certify the clustered bottom of the spectrum, the
quarter-theta floor lands above lambda_min, and refinement STALLS SAFELY
(the outer stall detector returns the honest partial residual) — there
CG remains the right inner default. Use Chebyshev when bounds are known
(or kappa is modest) and collective latency dominates — e.g. pod-scale
meshes where each CG dot is a cross-slice psum.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ChebyshevResult:
    x: jax.Array
    iterations: int


jax.tree_util.register_dataclass(
    ChebyshevResult, data_fields=["x"], meta_fields=["iterations"],
)


def chebyshev(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    lmin: float | jax.Array,
    lmax: float | jax.Array,
    iters: int,
    x0: jax.Array | None = None,
) -> ChebyshevResult:
    """``iters`` Chebyshev steps on SPD A with spectrum in [lmin, lmax].
    ``b`` may be a single vector or a multi-RHS block — the recurrence is
    elementwise, so one shared ``matvec``/``matmat`` serves any width.
    ZERO reductions; exactly ``iters`` + (0 if x0 is None else 1) operator
    applications."""
    dt = b.dtype
    theta = ((jnp.asarray(lmax) + jnp.asarray(lmin)) / 2).astype(dt)
    delta = ((jnp.asarray(lmax) - jnp.asarray(lmin)) / 2).astype(dt)
    sigma = theta / delta
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - matvec(x0)

    d0 = r / theta
    rho0 = 1.0 / sigma

    def body(_, carry):
        x, r, d, rho_old = carry
        x = x + d
        r = r - matvec(d)
        rho = 1.0 / (2.0 * sigma - rho_old)
        d = (rho * rho_old) * d + (2.0 * rho / delta) * r
        return (x, r, d, rho)

    x, _r, _d, _ = jax.lax.fori_loop(
        0, iters, body, (x, r, d0, rho0.astype(dt))
    )
    return ChebyshevResult(x=x, iterations=iters)


def chebyshev_bounds(
    matvec: Callable[[jax.Array], jax.Array],
    v0: jax.Array,
    m: int = 32,
    safety: float = 1.1,
) -> tuple[jax.Array, jax.Array]:
    """Safe spectrum enclosure [lmin, lmax] for ``chebyshev`` from an
    m-step Lanczos run: lmax inflated by its Ritz residual and ``safety``
    (an UNDERestimated top bound diverges); lmin deflated likewise (a
    too-small bottom bound merely slows convergence)."""
    from spmv_tpu.solvers.lanczos import lanczos_extreme_with_bounds

    lmin, lmax, err_min, err_max = lanczos_extreme_with_bounds(
        matvec, v0, m=m)
    hi = (lmax + err_max) * safety
    # bottom: Ritz-residual deflation when it converged, a PROPORTIONAL
    # quarter-theta floor when it did not (theta_min - err can collapse to
    # ~0 on clustered spectra, which would balloon the iteration count to
    # uselessness; theta_min/4 trades a 2x iteration factor for a bound
    # that is below lambda_min whenever theta_min is within 4x of it —
    # and the refinement outer loop's stall detector catches the rare
    # matrix where it is not)
    lo = jnp.maximum(lmin - err_min, lmin * 0.25) / safety
    return jnp.maximum(lo, hi * 1e-12), hi


def chebyshev_iterations_for(kappa: float, rtol: float) -> int:
    """Iteration count for a target contraction ``rtol`` given a condition
    bound: error_k <= 2 * ((sqrt(k)-1)/(sqrt(k)+1))**k_steps."""
    import math

    kappa = max(float(kappa), 1.0 + 1e-12)
    r = (math.sqrt(kappa) - 1.0) / (math.sqrt(kappa) + 1.0)
    if r <= 0:
        return 1
    return max(1, int(math.ceil(math.log(rtol / 2.0) / math.log(r))))
