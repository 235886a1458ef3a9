#!/usr/bin/env python
"""AMG-PCG at the 100M-row weak-scale target (BASELINE.json: weak-scale
to 100M rows) — the optimal-order solver at 10x the headline scale, on
one chip. Round-3 proved SpMV at 100M; this closes the SOLVER half.

10000^2 2-D Laplacian, fp32 DIA, interval2d 4x4 grid-block aggregation,
W-cycle, rtol 1e-6. Reports setup/solve wall-clock, iteration count, a
plain-CG time-to-rtol comparison, and a residual-consistency check
against the HOST CSR matvec (the same oracle discipline as
__graft_entry__; a wrong device operator converges against the wrong A).

Usage: python tools/exp_amg_100m.py [--nx 10000] [--plain-kmax 30000]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=10_000)
    ap.add_argument("--plain-kmax", type=int, default=30_000)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-outer", type=int, default=120,
                    help="refinement passes: per-pass contraction is "
                         "~eps_f32*kappa (the f32 correction's own "
                         "residual floor) — legitimately ~0.6-0.8/pass "
                         "at 50M rows, so deep-kappa scales need many "
                         "cheap passes")
    ap.add_argument("--refined-only", action="store_true",
                    help="skip the fp32 AMG-PCG section; run only the "
                         "f64-class refined leg")
    ap.add_argument("--lean-refined", action="store_true",
                    help="8x8-block smoothed interval2d V-cycle for the "
                         "refined leg: 64x coarsening -> 3-4 levels, so "
                         "the compiled cycle program + the double-single "
                         "operator fit a single v5e's 16 GB HBM. CAVEAT "
                         "(chip-measured): 8x8 coarsening loses mesh "
                         "independence past 2048^2 (37 -> 83 V / 28 -> "
                         "45 W at 4096^2) and STALLED the 100M refined "
                         "leg — the mesh-independent 4x4 W config (the "
                         "default here) is the one that converges, and "
                         "at 100M it needs >1 chip's HBM (BENCH_NOTES "
                         "weak-scale capstone failure ledger)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from spmv_tpu.gen import create_laplace_2d, gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.amg import amg_setup
    from spmv_tpu.solvers.cg import cg

    t0 = time.perf_counter()
    a = create_laplace_2d(args.nx, args.nx, dtype=np.float32)
    a.values *= np.float32(1.0 / 9.0)
    print(f"generate: {time.perf_counter()-t0:.1f} s "
          f"(n={a.nrows/1e6:.1f}M nnz={a.nnz/1e6:.0f}M)", flush=True)

    if args.refined_only:
        from spmv_tpu.solvers.refine import cg_refined_dist

        b_host = gaussian_bump(a.nrows, dtype=np.float32).astype(np.float64)
        amg_cfg = (dict(aggregate="interval2d", interval_size=8, cycle=1,
                        local_format="dia")
                   if args.lean_refined else
                   dict(aggregate="interval2d", interval_size=4, cycle=2,
                        local_format="dia"))
        t0 = time.perf_counter()
        rr = cg_refined_dist(a, b_host, n_devices=1, rtol=1e-10,
                             inner_kmax=80, max_outer=args.max_outer,
                             amg=amg_cfg)
        t_ref = time.perf_counter() - t0
        true_rel = (np.linalg.norm(b_host - a.matvec(rr.x))
                    / np.linalg.norm(b_host))
        print(f"amg-refined: outer={rr.outer_iterations} "
              f"inner={rr.inner_iterations} true rel |r|={true_rel:.3e} "
              f"total={t_ref:.1f} s (incl. DS+AMG setup; "
              f"lean={args.lean_refined})", flush=True)
        return 0

    t0 = time.perf_counter()
    A = build_dist_matrix(a, n_devices=1, local_format="dia",
                          dtype=np.float32)
    b = A.to_dist(gaussian_bump(a.nrows, dtype=np.float32))
    # warmup pull so the first d2h is not inside a timed phase
    _ = float(b.reshape(-1)[7])
    print(f"assemble+upload: {time.perf_counter()-t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    h = amg_setup(a, A, aggregate="interval2d", interval_size=4,
                  cycle=2, local_format="dia")
    print(f"amg_setup: {time.perf_counter()-t0:.1f} s, "
          f"{h.n_levels} levels", flush=True)

    solve = jax.jit(lambda A_, bb, h_: cg(
        A_.as_linear_operator(), bb, kmax=60, rtol=args.rtol,
        preconditioner=h_.as_preconditioner()))
    r = solve(A, b, h)
    _ = float(r.rnorm)  # compile round
    ts = []
    for t in range(2):
        bt = b * np.float32(1.0 + 1e-6 * (t + 1))  # defeat tunnel cache
        t0 = time.perf_counter()
        r = solve(A, bt, h)
        _ = float(r.rnorm)
        ts.append(time.perf_counter() - t0)
    print(f"amg_pcg: iters={int(r.iterations)} "
          f"converged={bool(r.converged)} solve={min(ts):.2f} s "
          f"(trials {['%.2f' % x for x in ts]})", flush=True)

    # floor-aware residual oracle vs the HOST matvec (f64). In fp32 the
    # TRUE residual cannot beat ~eps_f32 * |A| |x| — just STORING x in
    # f32 perturbs A x by that much (measured 3.3e-3 rel at 512^2,
    # 1.37e-2 at 1024^2, ~nx^2 growth — O(1) here). The check: the host
    # residual must sit UNDER that storage floor (a wrong operator would
    # be O(1) ABOVE it at small scale and is caught by the 10M-scale
    # dryrun oracles); f64-class truth comes from the refined leg below.
    x_glob = np.asarray(A.from_dist(r.x), np.float64)
    bh = np.asarray(A.from_dist(b), np.float64) * (1.0 + 1e-6 * 2)
    bnorm = np.linalg.norm(bh)
    host_rel = np.linalg.norm(bh - a.matvec(x_glob)) / bnorm
    rep_rel = float(r.rnorm) / float(r.rnorm0)
    floor = 1.2e-7 * np.abs(x_glob).max() * np.sqrt(a.nrows) / bnorm
    print(f"oracle: host rel |r| {host_rel:.3e} (fp32 storage floor "
          f"~{floor:.1e}) vs recursive {rep_rel:.3e}", flush=True)
    assert host_rel <= max(8 * rep_rel, floor), "residual oracle FAIL"

    if args.plain_kmax:
        # CHUNKED dispatches with exact warm resume: one 30000-iteration
        # while_loop is a single ~85 s device dispatch, which crashed the
        # axon TPU worker at this scale ("TPU worker process crashed or
        # restarted") — 2000-iteration chunks (~6 s each) continue the
        # same Krylov sequence bitwise via cg's resume state.
        chunk = 2000
        plain = jax.jit(lambda A_, bb, x0_, res_: cg(
            A_.as_linear_operator(), bb, x0=x0_, kmax=chunk,
            rtol=args.rtol, resume=res_))
        bt = b * np.float32(1.0 + 3e-6)
        rp = plain(A, bt, jnp_zeros := (bt * 0), None)
        _ = float(rp.rnorm)  # compile round (restart-from-zero chunk)
        t0 = time.perf_counter()
        done = 0
        rp = None
        x0_, res_ = bt * 0, None
        while done < args.plain_kmax:
            rp = plain(A, bt, x0_, res_)
            done += int(rp.iterations)
            x0_, res_ = rp.x, (rp.r, rp.p, rp.rnorm0 if res_ is None
                               else res_[2])
            if bool(rp.converged):
                break
        _ = float(rp.rnorm)
        print(f"plain cg: iters={done} "
              f"converged={bool(rp.converged)} "
              f"solve={time.perf_counter()-t0:.2f} s", flush=True)
        del plain, rp, bt, x0_, res_

    # f64-class truth at 100M: AMG-preconditioned mixed-precision
    # refinement (fp32 AMG-PCG inner + double-single residuals/updates).
    # FREE the first section's device buffers first — cg_refined_dist
    # builds its own fp32 + DS (2 value planes) operators + hierarchy,
    # and both sets at once exceed the 16 GB HBM (measured
    # RESOURCE_EXHAUSTED on v5e).
    from spmv_tpu.solvers.refine import cg_refined_dist

    import gc

    b_host = np.asarray(A.from_dist(b), np.float64)
    del A, b, h, r, solve, x_glob
    jax.clear_caches()
    gc.collect()

    t0 = time.perf_counter()
    rr = cg_refined_dist(a, b_host, n_devices=1, rtol=1e-10,
                         inner_kmax=60,
                         amg=dict(aggregate="interval2d", interval_size=4,
                                  cycle=2, local_format="dia"))
    t_ref = time.perf_counter() - t0
    true_rel = (np.linalg.norm(b_host - a.matvec(rr.x))
                / np.linalg.norm(b_host))
    print(f"amg-refined: outer={rr.outer_iterations} "
          f"inner={rr.inner_iterations} true rel |r|={true_rel:.3e} "
          f"total={t_ref:.1f} s (incl. its own DS+AMG setup)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
