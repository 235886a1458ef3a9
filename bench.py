#!/usr/bin/env python
"""Headline benchmark: single-chip SpMV throughput on a 10M-row 2-D Laplacian
(fp32, DIA Pallas kernels) + a general-sparsity WELL audit config
(4M-row banded-random, FEM-like spread) — BASELINE.md north-star config 1.

Prints ONE JSON line:
  {"metric": ..., "value": GFLOP/s, "unit": "GFLOP/s", "vs_baseline": r, ...}
where r = (median effective bandwidth of the headline kernel / the chip's
HBM SPEC roofline) / 0.8 — r >= 1.0 means the north-star (>=80% of HBM
roofline, BASELINE.json) is met. All fractions are MEDIANS over N
interleaved trials with min/max spread.

Measurement methodology (round-5 revision; see BENCH_NOTES "Sustained
measurement" and "tunnel constant"): each sample runs TWO sustained
chained-apply loops (K=300 and K=60 inside one jitted lax.fori_loop
each) and reports the SLOPE (T_300 - T_60)/240 — per-apply device time
with the fixed per-call cost cancelled exactly. Two artifacts motivated
the two revisions: (1) short loops (K=30, rounds 1-2) under-measure the
sustained rate (power-state ramp) — both lengths now stay sustained;
(2) single-length wall carries a ~23-28 ms per-call axon dispatch/sync
constant, which at K=300 still inflated a 0.499 ms/apply kernel (xplane
device time) to a 0.593 wall reading — the slope removes it. The copy
rate is still measured and reported (``copy_gbs``) as a same-run sanity
line; the roofline denominator is the chip's spec bandwidth (falling
back to the measured copy when the device kind is unknown).

``--smoke`` runs the same code on tiny shapes with the Pallas interpreter
(CPU) — the CI configuration (.github/workflows/test.yml), a functional
dry run of the benchmark path, not a performance claim.
"""
import argparse
import json
import statistics
import sys
import time

import numpy as np

K = 300  # sustained device-side loop length (see module docstring)

# HBM spec bandwidth by device kind (GB/s); roofline denominator
HBM_SPEC_GBS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,       # v5p
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,  # v6e / Trillium
    "TPU v6e": 1640.0,
}


def _timed_call(fn_loop, args) -> float:
    t0 = time.perf_counter()
    out = fn_loop(*args)
    # slice ON DEVICE before transferring: np.asarray(out) would drag the
    # whole array through the tunnel (~2 GB/s) and swamp the measurement
    _ = float(out.reshape(-1)[7])
    return time.perf_counter() - t0


def interleaved_trial_seconds(loops_and_args, trials, k, k_short=None):
    """Per-trial seconds/iteration for each device loop, measured
    INTERLEAVED (a,b,c,a,b,c,...) with the first round (compile) discarded.
    Returns times[i] = list of ``trials`` samples for loop i. Same-trial
    ratios sample the same chip conditions.

    TWO-LENGTH SLOPE (round-5 revision; BENCH_NOTES "tunnel constant"):
    each loop entry is a FACTORY ``make(k) -> fn`` compiled at both ``k``
    and ``k_short``; the per-apply sample is (T_k - T_k_short)/(k -
    k_short), which cancels the fixed per-call cost exactly. The xplane
    shows the device executing the sustained WELL loop at 0.499 ms/apply
    while single-length wall at K=300 reported 0.593: ~28 ms of axon
    dispatch/sync constant per call — a harness artifact, not kernel
    time (production TPU serving has no such tunnel). Both lengths stay
    sustained (>= 60 chained applies) so power-ramp effects cancel too.
    Passing plain functions (k_short=None) keeps the old single-length
    behavior (per-apply = T/k).

    The trailing argument of every loop is its input VECTOR; it is
    perturbed by (1 + 1e-6*trial) so no two timed calls present the same
    (executable, args) pair — the tunnel can serve exact repeats from an
    execution cache (measured: a repeated 10M-row solve "ran" in 0.00 s)."""
    n = len(loops_and_args)
    times = [[] for _ in range(n)]
    pairs = []
    for make, args in loops_and_args:
        if k_short is None:
            pairs.append(((make, None), args))
        else:
            pairs.append(((make(k), make(k_short)), args))
    for trial in range(trials + 1):
        for i, ((fn, fn_s), args) in enumerate(pairs):
            scale = args[-1].dtype.type(1.0 + 1e-6 * trial)
            targs = (*args[:-1], args[-1] * scale)
            if fn_s is None:
                dt = _timed_call(fn, targs) / k
            else:
                t_long = _timed_call(fn, targs)
                t_short = _timed_call(fn_s, targs)
                dt = max(t_long - t_short, 1e-9) / (k - k_short)
            if trial > 0:
                times[i].append(dt)
            print(f"#   loop{i} trial {trial}: {dt*1e3:.3f} ms/iter",
                  file=sys.stderr)
    return times


def _med_spread(fracs):
    return (round(statistics.median(fracs), 4),
            round(min(fracs), 4), round(max(fracs), 4))


def _build_well_matrix(n, rng):
    """Banded random with holes — the general-sparsity (FEM-like) config
    from BENCH_NOTES; exercises the WELL windowed-gather kernel."""
    from spmv_tpu.formats.csr import CSRHost

    rows, cols, vals = [], [], []
    for off in (-1500, -130, -1, 0, 1, 128, 1400):
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(len(i)) < 0.85
        i = i[keep]
        rows.append(i)
        cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    return CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vals).astype(np.float32), n, n)


def _solver_metrics(a, smoke: bool, rtol: float = 1e-6) -> dict:
    """Solver-level driver metrics (VERDICT r3 item 4): distributed-CG
    iterations/sec on the headline operator (BASELINE configs 2/5 role:
    the reference's own CG harness, reference demos/cg.cpp:64-117) and
    AMG-PCG setup + solve wall-clock (the optimal-order preconditioning
    capability at the headline scale). Medians with spread."""
    import jax

    from spmv_tpu.gen import gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.amg import amg_setup
    from spmv_tpu.solvers.cg import cg

    out = {}
    t0 = time.perf_counter()
    A = build_dist_matrix(a, n_devices=1, local_format="dia",
                          dtype=np.float32)
    b = A.to_dist(gaussian_bump(a.nrows, dtype=np.float32))
    out["cg_assemble_s"] = round(time.perf_counter() - t0, 1)

    # Timing discipline (both required on the axon tunnel, see
    # .claude/skills/verify): (1) sync by PULLING a device scalar — a bare
    # block_until_ready under-reports; (2) PERTURB the input per trial —
    # repeated identical (executable, args) pairs can be served from the
    # tunnel's execution cache (measured: a repeated 10M-row AMG solve
    # "returned" in 0.00 s).
    # two-length slope (see interleaved_trial_seconds): cancels the fixed
    # per-call dispatch constant out of the iteration rate
    niter, niter_s = (5, 2) if smoke else (100, 20)
    rate = jax.jit(lambda A_, bb: cg(A_.as_linear_operator(), bb,
                                     kmax=niter, rtol=0.0))
    rate_s = jax.jit(lambda A_, bb: cg(A_.as_linear_operator(), bb,
                                       kmax=niter_s, rtol=0.0))
    float(rate(A, b).rnorm)  # compile round
    float(rate_s(A, b).rnorm)
    its = []
    for t in range(2 if smoke else 4):
        bt = b * np.float32(1.0 + 1e-6 * (t + 1))
        t0 = time.perf_counter()
        _ = float(rate(A, bt).rnorm)
        t_long = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(rate_s(A, bt).rnorm)
        t_short = time.perf_counter() - t0
        its.append((niter - niter_s) / max(t_long - t_short, 1e-9))
    out["cg_iters_per_s"] = round(statistics.median(its), 1)
    out["cg_iters_per_s_spread"] = [round(min(its), 1), round(max(its), 1)]

    # plain-CG time-to-rtol (VERDICT r4 item 7): a CONVERGED solve's
    # wall-clock, comparable round-over-round even when iteration counts
    # shift, and the auditable baseline the AMG number below must beat
    kmax_conv = 60 if smoke else 20_000
    solve_plain = jax.jit(lambda A_, bb: cg(
        A_.as_linear_operator(), bb, kmax=kmax_conv, rtol=rtol))
    float(solve_plain(A, b).rnorm)  # compile round
    ts = []
    for t in range(2 if smoke else 3):
        bt = b * np.float32(1.0 + 1e-6 * (t + 1))
        t0 = time.perf_counter()
        rp = solve_plain(A, bt)
        _ = float(rp.rnorm)
        ts.append(time.perf_counter() - t0)
    out["cg_time_to_rtol_s"] = round(statistics.median(ts), 2)
    out["cg_time_to_rtol_iters"] = int(rp.iterations)
    out["cg_time_to_rtol_converged"] = bool(rp.converged)

    # 2-D grid-block aggregation + W-cycle: mesh-INDEPENDENT counts
    # (10/12/12 at 512^2..2048^2) with bounded 9-point coarse stencils —
    # the round-4 interval (1-D semicoarsening) config did not converge
    # at this scale (BENCH_r04; solvers/amg.py interval2d docstring)
    t0 = time.perf_counter()
    h = amg_setup(a, A, aggregate="interval2d", interval_size=4,
                  cycle=2, local_format="dia")
    out["amg_pcg_setup_s"] = round(time.perf_counter() - t0, 1)
    solve = jax.jit(lambda A_, bb, h_: cg(
        A_.as_linear_operator(), bb, kmax=60 if smoke else 200, rtol=rtol,
        preconditioner=h_.as_preconditioner()))
    float(solve(A, b, h).rnorm)  # compile round
    ws = []
    for t in range(2 if smoke else 3):
        bt = b * np.float32(1.0 + 1e-6 * (t + 1))
        t0 = time.perf_counter()
        r = solve(A, bt, h)
        _ = float(r.rnorm)
        ws.append(time.perf_counter() - t0)
    out["amg_pcg_solve_s"] = round(statistics.median(ws), 2)
    out["amg_pcg_solve_s_spread"] = [round(min(ws), 2), round(max(ws), 2)]
    out["amg_pcg_iters"] = int(r.iterations)
    out["amg_pcg_converged"] = bool(r.converged)
    out["amg_pcg_rtol"] = rtol
    # honesty keys: the convergence above is the RECURSIVE residual. In
    # fp32 the TRUE residual is floored at ~eps_f32*|A||x| (storing x in
    # f32 perturbs A x by that much) — ~0.1-1 relative at this kappa
    # (BENCH_NOTES "fp32 true-residual storage floor"). Recompute |b-Ax|
    # with the host f64 matvec and report it next to the floor estimate,
    # so the JSON is self-auditing; f64-class truth is
    # cg_refined_dist(amg=True) (50M-row chip record in BENCH_NOTES).
    xg = np.asarray(A.from_dist(r.x), np.float64)
    bg = np.asarray(A.from_dist(bt), np.float64)
    bn = float(np.linalg.norm(bg))
    out["amg_pcg_true_rel_residual"] = float(
        np.linalg.norm(bg - a.matvec(xg)) / max(bn, 1e-300))
    out["fp32_true_residual_floor_est"] = float(
        1.2e-7 * np.abs(xg).max() * np.sqrt(a.nrows) / max(bn, 1e-300))
    return out


def _corpus_summary(smoke: bool, trials: int) -> dict:
    """One-line corpus summary (VERDICT r3 item 2): the general-sparsity
    path on structurally diverse operators (spmv_tpu.corpus) through the
    real user workflow — RCM -> auto format select -> sustained SpMV.
    Full per-matrix detail: tools/exp_corpus_chip.py + BENCH_NOTES."""
    import jax
    import jax.numpy as jnp

    from spmv_tpu.corpus import circuit_network, fem_p1_2d, powerlaw_laplacian
    from spmv_tpu.gen import gaussian_bump
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.reorder import rcm_reorder

    kind = jax.devices()[0].device_kind
    roof = HBM_SPEC_GBS.get(kind)
    cases = [
        ("fem2d", fem_p1_2d, {"n_nodes": 3000 if smoke else 800_000}),
        ("powerlaw", powerlaw_laplacian, {"n": 3000 if smoke else 500_000}),
        ("circuit", circuit_network, {"nx": 50 if smoke else 800}),
    ]
    k = 3 if smoke else 60
    fracs, formats, errors, ms = {}, {}, {}, {}
    for tag, fn, kw in cases:
        # per-case containment (VERDICT r4 item 4): one case's failure
        # must not discard the cases already measured — keep partial
        # results and attach the per-case error instead
        try:
            a = fn(**kw)
            row_sums = np.zeros(a.nrows)
            np.add.at(row_sums, np.repeat(np.arange(a.nrows), a.row_nnz()),
                      np.abs(a.values))
            a.values *= np.float32(0.9 / max(row_sums.max(), 1e-30))
            # keep_best: RCM can DESTROY already-structured orderings
            # (grid + random edges measured p90 bandwidth 800 -> 103854)
            a, _ = rcm_reorder(a, keep_best=True)
            A = build_dist_matrix(a, n_devices=1, local_format="auto",
                                  dtype=np.float32)
            b = A.to_dist(gaussian_bump(a.nrows, dtype=np.float32))

            ks = max(k // 5, 1)

            def make_loop(kk):
                @jax.jit
                def loop(A_, v):
                    mv = A_.as_linear_operator()
                    return jax.lax.fori_loop(0, kk, lambda i, u: mv(u), v)
                return loop

            loop, loop_s = make_loop(k), make_loop(ks)
            ts = []
            for t in range(trials + 1):
                bt = b * np.float32(1.0 + 1e-6 * t)  # defeat tunnel cache
                t0 = time.perf_counter()
                out = loop(A, bt)
                _ = float(out.reshape(-1)[7])
                t_long = time.perf_counter() - t0
                t0 = time.perf_counter()
                out = loop_s(A, bt)
                _ = float(out.reshape(-1)[7])
                t_short = time.perf_counter() - t0
                if t > 0:
                    # two-length slope: cancels per-call dispatch constant
                    ts.append(max(t_long - t_short, 1e-9) / (k - ks))
            traffic = A.format_size_bytes() + 2 * a.nrows * 4
            sec = statistics.median(ts)
            fmt = A.local_format + ("+hub" if A.hub_nnz else "")
            formats[tag] = fmt
            ms[tag] = round(sec * 1e3, 3)
            if roof is not None:
                fracs[tag] = round(traffic / sec / (roof * 1e9), 4)
            print(f"#   corpus {tag}: n={a.nrows} fmt={fmt} "
                  f"{sec*1e3:.3f} ms/apply"
                  + (f" {fracs[tag]*100:.1f}% stored roofline" if roof
                     else ""),
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — containment by design
            errors[tag] = repr(e)[:200]
            print(f"#   corpus {tag} FAILED: {e!r}", file=sys.stderr)
    out = {"corpus_formats": formats, "corpus_ms_per_apply": ms}
    if errors:
        out["corpus_case_errors"] = errors
    if fracs:
        out["corpus_stored_roofline_frac"] = fracs
        out["corpus_stored_roofline_median"] = round(
            statistics.median(fracs.values()), 4)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + Pallas interpreter (CI dry run)")
    ap.add_argument("--trials", type=int, default=6,
                    help="measured interleaved trials (after compile round)")
    ap.add_argument("--no-solvers", action="store_true",
                    help="skip the CG/AMG solver metrics")
    ap.add_argument("--no-corpus", action="store_true",
                    help="skip the corpus summary")
    args = ap.parse_args(argv)

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from spmv_tpu.formats.dia import csr_to_dia
    from spmv_tpu.formats.well import csr_to_well
    from spmv_tpu.gen import create_laplace_2d
    from spmv_tpu.ops.spmv_dia_pallas import (
        dia_pallas_supported,
        dia_to_2d,
        spmv_dia_pallas_2d,
    )
    from spmv_tpu.ops.spmv_well_pallas import spmv_well_pallas_2d, well_to_2d

    interpret = args.smoke
    k = 3 if args.smoke else K
    trials = min(args.trials, 2) if args.smoke else args.trials
    nx = 128 if args.smoke else 3200  # 10.24M rows, lane-aligned
    n_well = 30_000 if args.smoke else 4_000_000
    n_stream = (1 if args.smoke else 64) * 1024 * 1024

    a = create_laplace_2d(nx, nx, dtype=np.float32)
    # scale so ||A||_inf < 1: K=300 chained applies stay bounded WITHOUT a
    # per-iteration rescale epilogue (which would add two extra HBM vector
    # passes per apply); decayed values flush to zero on TPU (FTZ), which
    # runs at full rate. Scaling changes no traffic/flops accounting.
    a.values *= np.float32(1.0 / 9.0)
    d = csr_to_dia(a, row_align=1024, dtype=np.float32)
    # headline configuration: the operator is symmetric, so the fastest
    # correct kernel is the symmetric (lower-triangle + carry) one — the
    # same optimization the reference offers as its symmetric mode. GFLOP/s
    # counts the operator's true 2*nnz flops (format-independent);
    # vs_baseline rates EFFECTIVE bandwidth — the bytes the full (vanilla)
    # format would stream, delivered per second — against the same-trial
    # measured streaming roofline and the 80% north star (BASELINE.json).
    # Stored-traffic fractions for both kernels are reported alongside.
    ds = csr_to_dia(a, row_align=1024, dtype=np.float32, symmetric=True)
    assert dia_pallas_supported(d), "Pallas layout must be supported here"
    assert dia_pallas_supported(ds)
    itemsize = 4

    rng = np.random.default_rng(0)
    aw = _build_well_matrix(n_well, rng)
    row_sums = np.zeros(aw.nrows)
    np.add.at(row_sums, np.repeat(np.arange(aw.nrows), aw.row_nnz()),
              np.abs(aw.values))
    aw.values *= np.float32(0.9 / max(row_sums.max(), 1e-30))
    w = csr_to_well(aw, tile_groups=64, dtype=np.float32)

    # roofline: chained big copy with identical loop methodology. All
    # loops are FACTORIES over the chain length so the harness can run
    # the two-length slope (see interleaved_trial_seconds).
    def make_copy_loop(kk):
        @jax.jit
        def copy_loop(v):
            return jax.lax.fori_loop(
                0, kk, lambda i, u: u * jnp.float32(1.0000001), v
            )
        return copy_loop

    def make_spmv_loop(kk):
        @jax.jit
        def spmv_loop(dd, v):
            # dd passed as an ARGUMENT: closing over the matrix would
            # embed its arrays as literal constants in the lowered program
            # (2 GB at 100M rows) and ship them through the remote compile
            # service. No per-iteration scaling epilogue (it would add two
            # extra HBM vector passes); the host-side ||A||_inf < 1
            # scaling keeps chained applies bounded.
            return jax.lax.fori_loop(
                0, kk,
                lambda i, u: spmv_dia_pallas_2d(dd, u, interpret=interpret),
                v,
            )
        return spmv_loop

    def make_well_loop(kk):
        @jax.jit
        def well_loop(ww, v):
            def body(i, u):
                y = spmv_well_pallas_2d(ww, u, interpret=interpret)
                # chain: y (nrows_pad/128, 128) -> next x; values bounded
                # by the host-side ||A||_inf < 1 scaling
                if y.shape[0] >= u.shape[0]:
                    return y[: u.shape[0]]
                return jnp.pad(y, ((0, u.shape[0] - y.shape[0]), (0, 0)))

            return jax.lax.fori_loop(0, kk, body, v)
        return well_loop

    k_short = None if args.smoke else max(k // 5, 1)
    x2 = dia_to_2d(d, jnp.full((d.nrows_pad,), 1e-3, jnp.float32))
    xw = well_to_2d(w, jnp.full((w.ncols_pad,), 1e-3, jnp.float32))
    t_copy, t_van, t_sym, t_well = interleaved_trial_seconds(
        [
            (make_copy_loop if k_short else make_copy_loop(k),
             (jnp.ones((n_stream // 128, 128), jnp.float32),)),
            (make_spmv_loop if k_short else make_spmv_loop(k), (d, x2)),
            (make_spmv_loop if k_short else make_spmv_loop(k), (ds, x2)),
            (make_well_loop if k_short else make_well_loop(k), (w, xw)),
        ],
        trials, k, k_short=k_short,
    )

    vec_bytes = 2 * d.nrows_pad * itemsize
    traffic_van = d.data.size * itemsize + vec_bytes
    traffic_sym = ds.data.size * itemsize + vec_bytes
    traffic_well = (w.values.size * itemsize
                    + w.pos.size * w.pos.dtype.itemsize
                    + (w.ncols_pad + w.nrows_pad) * itemsize)
    copy_gbs = [2 * n_stream * itemsize / c / 1e9 for c in t_copy]
    kind = jax.devices()[0].device_kind
    spec_gbs = HBM_SPEC_GBS.get(kind)
    if spec_gbs is None:
        # unknown device (or CPU smoke): fall back to the measured copy
        spec_gbs = statistics.median(copy_gbs)
    roof = spec_gbs * 1e9

    def fracs(traffic, ts):
        return [(traffic / t) / roof for t in ts]

    f_van = _med_spread(fracs(traffic_van, t_van))
    f_sym = _med_spread(fracs(traffic_sym, t_sym))
    f_sym_eff = _med_spread(fracs(traffic_van, t_sym))
    f_well = _med_spread(fracs(traffic_well, t_well))
    sec_sym = statistics.median(t_sym)
    gflops = 2.0 * a.nnz / sec_sym / 1e9
    gflops_well = 2.0 * aw.nnz / statistics.median(t_well) / 1e9

    # WELL block SpMM (ops/spmm_well_pallas): ms/column vs the per-column
    # kernel — guarded so a regression here cannot take down the headline
    spmm_speedup = None
    spmm_ms_col = None
    try:
        from spmv_tpu.ops.spmm_well_pallas import spmm_well_pallas_2d

        nrhs = 4 if args.smoke else 8
        xblk = jnp.tile(xw, (1, nrhs))

        def make_spmm_loop(kk):
            @jax.jit
            def spmm_loop(ww, v):
                def body(i, u):
                    y = spmm_well_pallas_2d(ww, u, nrhs,
                                            interpret=interpret)
                    if y.shape[0] >= u.shape[0]:
                        return y[: u.shape[0]]
                    return jnp.pad(y, ((0, u.shape[0] - y.shape[0]),
                                       (0, 0)))

                return jax.lax.fori_loop(0, kk, body, v)
            return spmm_loop

        (t_spmm,) = interleaved_trial_seconds(
            [(make_spmm_loop if k_short else make_spmm_loop(k),
              (w, xblk))],
            max(trials - 1, 1), k, k_short=k_short)
        sec_blk = statistics.median(t_spmm)
        spmm_ms_col = sec_blk / nrhs * 1e3
        spmm_speedup = statistics.median(t_well) * nrhs / sec_blk
    except Exception as e:  # noqa: BLE001 — auxiliary metric only
        print(f"# WELL SpMM metric skipped: {e!r}", file=sys.stderr)

    solver_keys: dict = {}
    if not args.no_solvers:
        try:
            solver_keys = _solver_metrics(a, args.smoke)
            print(f"# solver metrics: {solver_keys}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — guarded auxiliary metrics
            print(f"# solver metrics skipped: {e!r}", file=sys.stderr)
            solver_keys = {"solver_metrics_error": repr(e)[:200]}

    corpus_keys: dict = {}
    if not args.no_corpus:
        try:
            corpus_keys = _corpus_summary(args.smoke, max(trials - 3, 1))
        except Exception as e:  # noqa: BLE001 — guarded auxiliary metrics
            print(f"# corpus summary skipped: {e!r}", file=sys.stderr)
            corpus_keys = {"corpus_error": repr(e)[:200]}

    print(
        f"# {kind}: spec roofline {spec_gbs:.0f} GB/s, measured copy "
        f"{statistics.median(copy_gbs):.0f} GB/s | n={a.nrows} nnz={a.nnz} | "
        f"vanilla {f_van[0]*100:.1f}% stored "
        f"[{f_van[1]*100:.1f},{f_van[2]*100:.1f}] | "
        f"symmetric {statistics.median(t_sym)*1e3:.3f} ms "
        f"{f_sym[0]*100:.1f}% stored, {f_sym_eff[0]*100:.1f}% eff "
        f"[{f_sym_eff[1]*100:.1f},{f_sym_eff[2]*100:.1f}] | "
        f"WELL n={aw.nrows} nnz={aw.nnz} occ={w.occupancy:.2f} "
        f"{f_well[0]*100:.1f}% stored [{f_well[1]*100:.1f},{f_well[2]*100:.1f}]"
        f" {gflops_well:.1f} GFLOP/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "spmv_lap2d_10M_fp32_gflops",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(f_sym_eff[0] / 0.8, 4),
                "config": "symmetric-DIA carry kernel, sustained K=300"
                          + (" [SMOKE]" if args.smoke else ""),
                "trials": trials,
                "device_kind": kind,
                "hbm_spec_gbs": spec_gbs,
                "copy_gbs": round(statistics.median(copy_gbs), 1),
                "stored_roofline_frac": f_sym[0],
                "stored_roofline_spread": [f_sym[1], f_sym[2]],
                "vanilla_roofline_frac": f_van[0],
                "vanilla_roofline_spread": [f_van[1], f_van[2]],
                "well_gflops": round(gflops_well, 2),
                "well_stored_roofline_frac": f_well[0],
                "well_stored_roofline_spread": [f_well[1], f_well[2]],
                **({} if spmm_speedup is None else {
                    "well_spmm_ms_per_col": round(spmm_ms_col, 4),
                    "well_spmm_speedup_vs_percol": round(spmm_speedup, 3),
                }),
                **solver_keys,
                **corpus_keys,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
