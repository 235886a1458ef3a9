"""Comm/compute overlap proof — regression test on the compiled TPU schedule.

The framework's replacement for the reference's nonblocking-MPI overlap
(``spmv_overlap``, reference spmv/Matrix.cpp:498-511 + update_finalise,
spmv/L2GMap.cpp:528-561) is structural: the ghost buffer is a separate value
with no dependence on the interior SpMV, so XLA's latency-hiding scheduler
can keep the halo ppermutes in flight while the interior Pallas kernel runs.

This test PROVES it rather than asserting it by design: it AOT-compiles the
distributed DIA matvec for a real TPU topology (v5e 2x2 — no chips needed,
the TPU compiler schedules against the topology description) and checks the
scheduled instruction order in the optimized HLO:

    collective-permute-start  <  Mosaic DIA kernel  <  collective-permute-done

i.e. the halo transfer is airborne across the interior kernel's execution.
"""
import dataclasses

import numpy as np
import pytest

import jax


def _aot_tpu_hlo():
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding

    # the fp32 kernel path traces into unbounded dtype-promotion recursion
    # under x64 mode (conftest enables it globally); scope it off here
    x64_was = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        return _aot_tpu_hlo_inner(topologies, Mesh, NamedSharding)
    finally:
        jax.config.update("jax_enable_x64", x64_was)


def _aot_tpu_hlo_inner(topologies, Mesh, NamedSharding):
    try:
        topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    except Exception as e:  # no TPU compiler available in this environment
        pytest.skip(f"TPU AOT topology unavailable: {e}")
    topo_mesh = Mesh(np.array(topo.devices[:4]), ("shards",))

    from spmv_tpu.gen import create_laplace_2d
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = create_laplace_2d(128, 128, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=4, local_format="dia", dtype=np.float32)
    x = A.to_dist(np.ones(a.nrows, np.float32))

    def absify(leaf):
        return jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype,
            sharding=NamedSharding(topo_mesh, leaf.sharding.spec),
        )

    A_abs = dataclasses.replace(jax.tree.map(absify, A), mesh=topo_mesh)
    try:
        return (
            jax.jit(lambda A_, x_: A_.matvec(x_))
            .lower(A_abs, absify(x))
            .compile()
            .as_text()
        )
    except Exception as e:
        pytest.skip(f"TPU AOT compile unavailable: {e}")


def test_halo_overlaps_interior_kernel_in_tpu_schedule():
    hlo = _aot_tpu_hlo()
    lines = hlo.splitlines()
    starts = [i for i, l in enumerate(lines) if "collective-permute-start" in l
              and "= (" in l]
    dones = [i for i, l in enumerate(lines) if "collective-permute-done(" in l]
    kernels = [i for i, l in enumerate(lines) if "custom-call" in l
               and "_spmv_dia_pallas" in l]
    assert starts, "no async collective-permute in compiled program"
    assert dones, "no collective-permute-done in compiled program"
    assert kernels, "interior Pallas DIA kernel missing from compiled program"
    k = kernels[0]
    # the TPU compiler emits the entry computation post-scheduling: some halo
    # send must START before the interior kernel and COMPLETE after it
    assert min(starts) < k, (min(starts), k)
    assert max(dones) > k, (max(dones), k)


def test_interior_kernel_independent_of_halo():
    """Dataflow precondition for overlap: the interior kernel's operands
    must not (transitively, within its line) reference the collectives."""
    hlo = _aot_tpu_hlo()
    for line in hlo.splitlines():
        if "custom-call" in line and "_spmv_dia_pallas" in line:
            assert "collective-permute" not in line
            return
    pytest.fail("interior kernel not found")
