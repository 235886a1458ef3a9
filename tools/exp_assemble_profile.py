#!/usr/bin/env python
"""Profile build_dist_matrix host time at the headline scale (DIA fp32,
single device) — the cg_assemble_s driver metric.

Usage: python tools/exp_assemble_profile.py [--nx 3200] [--fmt dia]
"""
import argparse
import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=3200)
    ap.add_argument("--fmt", default="dia")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from spmv_tpu.gen import create_laplace_2d
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = create_laplace_2d(args.nx, args.nx, dtype=np.float32)
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    A = build_dist_matrix(a, n_devices=1, local_format=args.fmt,
                          dtype=np.float32)
    prof.disable()
    print(f"build_dist_matrix({args.fmt}): {time.perf_counter()-t0:.1f} s",
          flush=True)
    pstats.Stats(prof).sort_stats("cumtime").print_stats(args.top)


if __name__ == "__main__":
    sys.exit(main())
