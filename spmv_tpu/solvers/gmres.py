"""GMRES(m) — restarted GMRES for general (non-symmetric) systems.

Completes the Krylov suite (cg for SPD, bicgstab for non-symmetric
short-recurrence, gmres for robustness without breakdown) — the reference
ships CG only (reference spmv/cg.cpp). Same architecture: pure JAX, one
``lax.while_loop`` over restart cycles with a ``lax.scan`` Arnoldi inside,
device-resident scalars, distribution injected through ``matvec`` (sharded
global reductions lower to psum under jit).

TPU-native choices:
- Orthogonalization is CLASSICAL Gram-Schmidt done twice (CGS2): the
  projections are batched dots against the whole basis — ONE (m+1, n) @ (n,)
  matmul pass per application instead of modified-GS's j sequential dots —
  MXU/VPU-friendly and numerically as strong as MGS when applied twice.
  Masking keeps not-yet-filled basis rows inert.
- The small (m+1, m) Hessenberg least-squares solve runs on device via
  QR (jnp.linalg) once per cycle — negligible next to m matvecs.
- Right preconditioning: the convergence test uses the TRUE residual of the
  original system, so ``rtol`` means the same thing as in ``cg``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class GMRESResult:
    x: jax.Array
    iterations: jax.Array  # int32 — total inner (Arnoldi) steps ~ matvecs
    cycles: jax.Array      # int32 — restart cycles run
    rnorm: jax.Array       # final TRUE |r|_2
    rnorm0: jax.Array
    converged: jax.Array


jax.tree_util.register_dataclass(
    GMRESResult,
    data_fields=["x", "iterations", "cycles", "rnorm", "rnorm0", "converged"],
    meta_fields=[],
)


def gmres(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    restart: int = 30,
    max_cycles: int = 20,
    rtol: float = 1e-10,
    dot: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    preconditioner: Callable[[jax.Array], jax.Array] | None = None,
) -> GMRESResult:
    """Solve A x = b with restarted GMRES(m), m = ``restart``. Vectors keep
    b's (padded) shape; padding entries of b must be zero. Total matvec
    budget is restart * max_cycles (+1 residual per cycle).

    Checkpoint/resume: passing a saved solution as ``x0`` IS the exact warm
    resume — every restart cycle rebuilds the Krylov space from the current
    residual anyway, so a resumed run continues precisely like an
    uninterrupted one at the same cycle boundary (unlike CG, which needs
    its carried r/p state — solvers/cg.py ``resume``)."""
    if dot is None:
        dot = lambda u, v: jnp.vdot(u, v)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    precond = preconditioner if preconditioner is not None else (lambda r: r)
    m = restart
    vshape = b.shape
    n_flat = b.size
    # norms/tolerances in the vector dtype's REAL precision (f32 Hessenberg
    # math would cap each cycle at ~1e-7 even for f64 data); projection
    # coefficients and the Hessenberg keep the vector dtype itself so
    # COMPLEX systems orthogonalize correctly (a .real cast here leaves
    # components along i*v_j unremoved — measured |<v_i,v_j>| ~ 0.3)
    rdtype = jnp.finfo(b.dtype).dtype
    cdtype = b.dtype
    eps = jnp.asarray(jnp.finfo(b.dtype).tiny, dtype=rdtype)

    r_init = b - matvec(x0)
    rnorm0 = jnp.sqrt(dot(r_init, r_init).real.astype(rdtype))

    def cycle_body(state):
        x, r, k_total, cycles, _rnorm = state
        beta = jnp.sqrt(dot(r, r).real.astype(rdtype))
        safe_beta = jnp.maximum(beta, eps)
        v0 = (r / safe_beta.astype(b.dtype)).reshape(n_flat)

        basis0 = jnp.zeros((m + 1, n_flat), b.dtype).at[0].set(v0)
        h0 = jnp.zeros((m + 1, m), cdtype)

        def arnoldi_step(carry, j):
            basis, h, live = carry
            vj = basis[j].reshape(vshape)
            w = matvec(precond(vj)).reshape(n_flat)
            # CGS2: two passes of project-against-all (masked to rows <= j)
            mask = (jnp.arange(m + 1) <= j).astype(rdtype)
            coeffs = jnp.zeros((m + 1,), cdtype)
            for _ in range(2):
                proj = (basis.conj() @ w) * mask
                w = w - (proj.astype(b.dtype) @ basis)
                coeffs = coeffs + proj
            wnorm = jnp.sqrt((w.conj() @ w).real.astype(rdtype))
            # lucky breakdown: wnorm ~ 0 means the Krylov space is invariant
            alive = live & (wnorm > eps * 4)
            wn_safe = jnp.maximum(wnorm, eps)
            basis = basis.at[j + 1].set(
                jnp.where(alive, (w / wn_safe.astype(b.dtype)),
                          jnp.zeros_like(w))
            )
            hcol = (coeffs.at[j + 1].set(wnorm.astype(cdtype))
                    ) * live.astype(rdtype)
            h = h.at[:, j].set(hcol)
            return (basis, h, alive), live

        (basis, h, _), live_hist = jax.lax.scan(
            arnoldi_step, (basis0, h0, jnp.asarray(True)), jnp.arange(m)
        )
        steps = jnp.sum(live_hist).astype(jnp.int32)

        # least squares  min || beta e1 - H y ||  on the small Hessenberg.
        # Dead columns (after a lucky breakdown) are zero; regularize them
        # with identity rows so the solve stays well-posed and yields y=0
        # there.
        e1 = jnp.zeros((m + 1,), cdtype).at[0].set(beta.astype(cdtype))
        col_dead = jnp.arange(m) >= steps
        h_solve = h + (jnp.eye(m + 1, m, dtype=rdtype)
                       * col_dead.astype(rdtype)).astype(cdtype)
        q, rr = jnp.linalg.qr(h_solve, mode="reduced")
        y = jax.scipy.linalg.solve_triangular(
            rr, q.conj().T @ e1, lower=False
        )
        y = jnp.where(col_dead, jnp.zeros((), cdtype), y)
        dx = (y.astype(b.dtype) @ basis[:m]).reshape(vshape)
        x = x + precond(dx)
        # the TRUE residual doubles as the next cycle's starting residual —
        # carrying it saves one matvec per cycle
        r_new = b - matvec(x)
        rnorm = jnp.sqrt(dot(r_new, r_new).real.astype(rdtype))
        return (x, r_new, k_total + steps, cycles + jnp.int32(1), rnorm)

    def cycle_cond(state):
        _x, _r, _k, cycles, rnorm = state
        return (cycles < max_cycles) & (
            rnorm / jnp.maximum(rnorm0, eps) >= rtol
        )

    x, _r, k_total, cycles, rnorm = jax.lax.while_loop(
        cycle_cond, cycle_body,
        (x0, r_init, jnp.int32(0), jnp.int32(0), rnorm0),
    )
    return GMRESResult(
        x=x,
        iterations=k_total,
        cycles=cycles,
        rnorm=rnorm,
        rnorm0=rnorm0,
        converged=rnorm / jnp.maximum(rnorm0, eps) < rtol,
    )
