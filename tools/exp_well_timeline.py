#!/usr/bin/env python
"""WELL kernel intra-kernel timeline + reduced-op A/B on chip (VERDICT r3 #1).

Two experiments in ONE process (the axon d2h warmup is paid once):

1. **Reduced-op A/B** — same-run interleaved sustained loops of the WELL
   kernel at gather_terms = 3 (exact f32 gather, default) / 2 (~2^-16
   relative gather error) / 1 (bf16-class gather): the prototype
   formulations VERDICT r3 item 1 asks for. Reports ms/apply and
   stored-roofline fraction per mode.

2. **Intra-kernel timeline** — the kernel's compute phases are wrapped in
   jax.named_scope (trace_phases=True), which Mosaic lowers to
   tpu.trace_start/stop; jax.profiler.trace captures the xplane and this
   script parses it (xprof/tensorflow xplane_pb2) to print a per-phase
   timeline: where the 25%-over-stream-floor actually goes, and whether
   the x-window DMA overlaps the one-hot/MXU compute. This is the
   profile-not-accounting evidence BENCH_NOTES' ablation analysis lacked.

Usage: python tools/exp_well_timeline.py [--n 4000000] [--trials 5]
"""
import argparse
import glob
import statistics
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_SPEC = {"TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v5": 2765.0,
            "TPU v5p": 2765.0, "TPU v4": 1228.0, "TPU v6 lite": 1640.0}

PHASES = ["xwin_wait", "pos_decode", "bf16_split", "onehot", "mxu_pass",
          "term_recombine", "lane_gather", "mult_reduce"]


def parse_xplane(logdir):
    """Load every .xplane.pb under logdir -> list of (plane, line, event
    name, offset_ps, dur_ps). The xplane proto moved across TF versions;
    try the known homes and, failing all, print the logdir so the
    captured trace is still usable by hand (ADVICE r4: the chip run must
    not be lost to an ImportError in the parse half)."""
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf",
                "tsl.profiler.protobuf",
                "tensorboard_plugin_profile.protobuf"):
        try:
            xplane_pb2 = __import__(mod + ".xplane_pb2",
                                    fromlist=["xplane_pb2"])
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        print(f"xplane proto unavailable — raw trace kept at {logdir}; "
              "parse offline with tensorboard_plugin_profile")
        return []

    rows = []
    for path in glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True):
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    rows.append((plane.name, line.name or line.display_name,
                                 emeta.get(ev.metadata_id, "?"),
                                 ev.offset_ps, ev.duration_ps))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--k", type=int, default=300)
    ap.add_argument("--trace-k", type=int, default=30)
    ap.add_argument("--skip-ab", action="store_true")
    ap.add_argument("--skip-trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench  # repo-root benchmark module (matrix builder + timing)
    from spmv_tpu.formats.well import csr_to_well
    from spmv_tpu.ops.spmv_well_pallas import (
        spmv_well_pallas_2d,
        well_to_2d,
    )

    kind = jax.devices()[0].device_kind
    roof = HBM_SPEC.get(kind, 819.0) * 1e9
    print(f"device: {kind} (roofline {roof/1e9:.0f} GB/s)", flush=True)
    t0 = time.perf_counter()
    float(jax.device_put(jnp.float32(1.0)) + 1)
    print(f"d2h warmup: {time.perf_counter()-t0:.1f}s (excluded)", flush=True)

    rng = np.random.default_rng(0)
    aw = bench._build_well_matrix(args.n, rng)
    row_sums = np.zeros(aw.nrows)
    np.add.at(row_sums, np.repeat(np.arange(aw.nrows), aw.row_nnz()),
              np.abs(aw.values))
    aw.values *= np.float32(0.9 / max(row_sums.max(), 1e-30))
    w = csr_to_well(aw, tile_groups=64, dtype=np.float32)
    traffic = (w.values.size * 4 + w.pos.size * w.pos.dtype.itemsize
               + (w.ncols_pad + w.nrows_pad) * 4)
    print(f"n={aw.nrows} nnz={aw.nnz} occ={w.occupancy:.3f} "
          f"K={w.k_slots} wseg={w.wseg} traffic={traffic/1e6:.0f} MB",
          flush=True)
    xw = well_to_2d(w, jnp.full((w.ncols_pad,), 1e-3, jnp.float32))

    def make_loop(gather_terms, k):
        @jax.jit
        def loop(ww, v):
            def body(i, u):
                y = spmv_well_pallas_2d(ww, u, gather_terms=gather_terms)
                if y.shape[0] >= u.shape[0]:
                    return y[: u.shape[0]]
                return jnp.pad(y, ((0, u.shape[0] - y.shape[0]), (0, 0)))
            return jax.lax.fori_loop(0, k, body, v)
        return loop

    # oracle check per mode (gt=1/2 are approximate: check against tolerance)
    xs = np.asarray(xw).reshape(-1)[: aw.ncols]
    ref = aw.matvec(xs)
    for gt, tol in ((3, 5e-6), (2, 3e-4), (1, 2e-2)):
        y = np.asarray(
            spmv_well_pallas_2d(w, xw, gather_terms=gt)).reshape(-1)[: aw.nrows]
        rel = np.linalg.norm(y - ref) / max(np.linalg.norm(ref), 1e-30)
        print(f"gather_terms={gt}: rel err {rel:.2e} (tol {tol:g}) "
              f"{'OK' if rel < tol else 'FAIL'}", flush=True)

    if not args.skip_ab:
        loops = [(make_loop(gt, args.k), (w, xw)) for gt in (3, 2, 1)]
        times = bench.interleaved_trial_seconds(loops, args.trials, args.k)
        base = statistics.median(times[0])
        for gt, ts in zip((3, 2, 1), times):
            sec = statistics.median(ts)
            print(f"AB gather_terms={gt}: {sec*1e3:.3f} ms/apply "
                  f"{traffic/sec/1e9:.0f} GB/s stored "
                  f"({traffic/sec/roof*100:.1f}% roofline) "
                  f"speedup vs gt3 {base/sec:.3f}x", flush=True)

    if args.skip_trace:
        return
    # ---- intra-kernel timeline ----
    logdir = "/tmp/well_trace"
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)

    @jax.jit
    def traced_loop(ww, v):
        def body(i, u):
            y = spmv_well_pallas_2d(ww, u, trace_phases=True)
            if y.shape[0] >= u.shape[0]:
                return y[: u.shape[0]]
            return jnp.pad(y, ((0, u.shape[0] - y.shape[0]), (0, 0)))
        return jax.lax.fori_loop(0, args.trace_k, body, v)

    # compile + one warm run outside the trace
    float(traced_loop(w, xw).reshape(-1)[7])
    with jax.profiler.trace(logdir):
        float(traced_loop(w, xw * np.float32(1.000001)).reshape(-1)[7])
    print("trace captured; parsing...", flush=True)
    rows = parse_xplane(logdir)
    print(f"{len(rows)} events across "
          f"{len(set((r[0], r[1]) for r in rows))} lines", flush=True)
    # dump the line inventory (what lanes does the tunnel xplane carry?)
    lines = {}
    for pl_, ln, name, off, dur in rows:
        lines.setdefault((pl_, ln), [0, 0])
        lines[(pl_, ln)][0] += 1
        lines[(pl_, ln)][1] += dur
    for (pl_, ln), (cnt, dur) in sorted(lines.items()):
        print(f"  line [{pl_}] / [{ln}]: {cnt} events, {dur/1e9:.3f} ms total",
              flush=True)
    # per-phase aggregation
    agg = {}
    for pl_, ln, name, off, dur in rows:
        for ph in PHASES:
            if ph in name:
                a = agg.setdefault(ph, [0, 0])
                a[0] += 1
                a[1] += dur
    if agg:
        print(f"per-phase totals over {args.trace_k} applies:", flush=True)
        for ph in PHASES:
            if ph in agg:
                cnt, dur = agg[ph]
                print(f"  {ph:15s}: {cnt:6d} events  "
                      f"{dur/1e9/args.trace_k:.4f} ms/apply", flush=True)
    else:
        print("NO phase-named events found in the xplane — dumping the 30 "
              "longest event names for inspection:", flush=True)
        top = {}
        for pl_, ln, name, off, dur in rows:
            top[name] = top.get(name, 0) + dur
        for name, dur in sorted(top.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {dur/1e9:9.3f} ms  {name[:120]}", flush=True)


if __name__ == "__main__":
    main()
