#!/usr/bin/env python
"""Profile amg_setup host time at the headline scale (interval2d bench
config) — the setup is host-numpy + native SpGEMM; this finds where the
seconds go before optimizing.

Usage: python tools/exp_amg_setup_profile.py [--nx 3200] [--sort cumtime]
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
    ap.add_argument("--sort", default="cumtime")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from spmv_tpu.gen import create_laplace_2d
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.amg import amg_setup

    a = create_laplace_2d(args.nx, args.nx, dtype=np.float32)
    a.values *= np.float32(1.0 / 9.0)
    t0 = time.perf_counter()
    A = build_dist_matrix(a, n_devices=1, local_format="dia",
                          dtype=np.float32)
    print(f"build_dist_matrix: {time.perf_counter()-t0:.1f} s", flush=True)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    h = amg_setup(a, A, aggregate="interval2d", interval_size=4, cycle=2,
                  local_format="dia")
    prof.disable()
    print(f"amg_setup: {time.perf_counter()-t0:.1f} s, "
          f"{h.n_levels} levels", flush=True)
    pstats.Stats(prof).sort_stats(args.sort).print_stats(args.top)


if __name__ == "__main__":
    sys.exit(main())
