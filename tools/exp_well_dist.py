#!/usr/bin/env python
"""On-chip validation: distributed WELL path (shard_map + Pallas kernel on a
1-device mesh) and the RCM -> WELL pipeline on a scrambled stencil."""
import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    from spmv_tpu.gen import create_laplace_2d, random_csr
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.reorder import bandwidth, permute_symmetric, rcm_reorder

    rng = np.random.default_rng(0)

    # distributed WELL through shard_map on the chip
    a = random_csr(30000, 30000, 6, seed=1)
    # random_csr scatters columns globally -> huge windows; band it instead
    rows, cols, vals = [], [], []
    for off in (-700, -13, 0, 4, 450):
        i = np.arange(max(0, -off), min(30000, 30000 - off))
        keep = rng.random(len(i)) < 0.8
        i = i[keep]
        rows.append(i); cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    from spmv_tpu.formats.csr import CSRHost
    a = CSRHost.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals).astype(np.float32), 30000, 30000)
    A = build_dist_matrix(a, n_devices=1, local_format="well", dtype=np.float32)
    x = rng.standard_normal(30000).astype(np.float32)
    got = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x)))
    want = a.matvec(x)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    print(f"dist WELL 1-dev mesh: meta={A.well_meta} err={err:.2e}", flush=True)
    assert err < 1e-5

    # RCM -> WELL: scrambled 2-D stencil recovered to a narrow band
    s = create_laplace_2d(300, 300, dtype=np.float32)  # 90k rows
    scramble = rng.permutation(s.nrows)
    scrambled = permute_symmetric(s, scramble)
    b0 = bandwidth(scrambled)
    reordered, order = rcm_reorder(scrambled)
    b1 = bandwidth(reordered)
    print(f"RCM: bandwidth {b0} -> {b1}", flush=True)
    A2 = build_dist_matrix(reordered, n_devices=1, local_format="well",
                           dtype=np.float32)
    x2 = rng.standard_normal(s.nrows).astype(np.float32)
    got2 = A2.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A2, A2.to_dist(x2)))
    want2 = reordered.matvec(x2)
    err2 = np.linalg.norm(got2 - want2) / np.linalg.norm(want2)
    print(f"RCM+WELL on chip: meta={A2.well_meta} err={err2:.2e}", flush=True)
    assert err2 < 1e-5
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
