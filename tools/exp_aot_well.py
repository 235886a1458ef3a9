"""Chipless Mosaic compile check for the WELL kernels (paired + unpaired).

AOT-compiles spmv_well_pallas against the v5e topology description — no
chips needed — so kernel-lowering regressions (e.g. Mosaic rejecting an
op layout) surface in seconds instead of a tunnel round-trip. Exits 0
when every variant compiles.
"""
import os
import sys
import functools

import numpy as np
import jax

jax.config.update("jax_enable_x64", False)

from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    repl = NamedSharding(mesh, P())

    from spmv_tpu.ops import spmv_well_pallas as wp

    tg, k, wseg, n_tiles, nseg = 64, 8, 96, 4, 128
    g = tg * n_tiles

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=repl)

    ok = True
    for paired in (False, True):
        fn = functools.partial(
            wp._spmv_well_2d, wseg=wseg, tg=tg, k=k, n_tiles=n_tiles,
            paired=paired,
        )
        args = (
            sds((k, g, 128), np.float32),     # values
            sds((k, g, 128), np.int16),       # pos
            sds((n_tiles,), np.int32),        # w0
            sds((nseg, 128), np.float32),     # x2
        )
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"f32 paired={paired}: compile OK", flush=True)
        except Exception as e:
            ok = False
            print(f"f32 paired={paired}: FAIL\n{e}", flush=True)

    for paired in (False, True):
        fn = functools.partial(
            wp._spmv_well_ds_2d, wseg=wseg, tg=tg, k=k, n_tiles=n_tiles,
            paired=paired,
        )
        args = (
            sds((k, g, 128), np.float32),     # vh
            sds((k, g, 128), np.float32),     # vl
            sds((k, g, 128), np.int16),       # pos
            sds((n_tiles,), np.int32),        # w0
            sds((nseg, 128), np.float32),     # xh2
            sds((nseg, 128), np.float32),     # xl2
        )
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"ds  paired={paired}: compile OK", flush=True)
        except Exception as e:
            ok = False
            print(f"ds  paired={paired}: FAIL\n{e}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
