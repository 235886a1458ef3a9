"""Checkpoint / resume for distributed solves.

The reference has NO checkpointing (SURVEY.md section 5: "Checkpoint /
resume: none") — its only persistence is the input-only PETSc reader. For a
production solver on preemptible TPU pools that is a real gap: a 100M-row CG
run losing 500 iterations to a preemption restarts from zero. This module
adds simple, dependency-light persistence:

  - ``save_dist_matrix`` / ``load_dist_matrix``: the assembled operator
    (stacked ELL blocks + comm plan), so re-assembly (the expensive
    host-side partition/plan compile) is skipped on resume;
  - ``save_solver_state`` / ``load_solver_state``: x (and any extra
    vectors) mid-solve; CG restarted from x0=x_saved re-derives r and p
    (a standard restarted-CG resume — the Krylov space restarts, the
    solution does not).

Format: a single .npz (numpy, portable, no orbax dependency for plain
arrays) + a JSON sidecar for static metadata.
"""
from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from spmv_tpu.parallel.comm_plan import CommPlan, CommPlan2
from spmv_tpu.parallel.dist_matrix import DIST_DATA_FIELDS, DistMatrix


def _npz_path(path: str) -> str:
    """Normalize once in save AND load: np.savez appends '.npz' when absent,
    while np.load takes the path verbatim — without this, a suffix-less path
    saves fine but fails to load, and the .meta.json sidecar name diverges
    from the actual array file."""
    return path if path.endswith(".npz") else path + ".npz"


def save_dist_matrix(path: str, a: DistMatrix) -> None:
    """Persist the assembled operator (without the mesh — meshes are
    machine-specific and are re-supplied at load). Every array field of the
    DistMatrix pytree is saved by name, so ALL local formats round-trip
    (ell/dia/well and their double-single variants)."""
    if isinstance(a.plan, CommPlan2):
        raise NotImplementedError(
            "two-tier (CommPlan2) operators cannot be checkpointed yet; "
            "rebuild on a 1-D mesh or re-assemble on load"
        )
    path = _npz_path(path)
    arrays = {
        "plan_send_idx": np.asarray(a.plan.send_idx),
        "plan_recv_pos": np.asarray(a.plan.recv_pos),
        "plan_nlocal": np.asarray(a.plan.nlocal),
        "plan_nghosts": np.asarray(a.plan.nghosts),
    }
    for name in DIST_DATA_FIELDS:
        if name == "plan":
            continue
        v = getattr(a, name)
        if v is not None:
            arrays[name] = np.asarray(v)
    np.savez_compressed(path, **arrays)
    meta = {
        "version": 1,
        "nrows_global": a.nrows_global,
        "ncols_global": a.ncols_global,
        "row_pad": a.row_pad,
        "symmetric": a.symmetric,
        "nnz_global": a.nnz_global,
        "axis_name": a.axis_name,
        "local_format": a.local_format,
        "dia_offsets": list(a.dia_offsets),
        "well_meta": list(a.well_meta),
        "well_far_nnz": a.well_far_nnz,
        "dia_layout": "interleaved",
        "plan": {
            "rounds": list(a.plan.rounds),
            "n_devices": a.plan.n_devices,
            "nlocal_pad": a.plan.nlocal_pad,
            "nghost_pad": a.plan.nghost_pad,
        },
    }
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_dist_matrix(path: str, mesh=None) -> DistMatrix:
    """Load an operator saved by save_dist_matrix onto ``mesh`` (defaults to
    a fresh 1-D mesh over the first n_devices available devices)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    path = _npz_path(path)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    z = np.load(path)
    pm = meta["plan"]
    axis = meta["axis_name"]
    if mesh is None:
        devs = jax.devices()
        if len(devs) < pm["n_devices"]:
            raise ValueError(
                f"checkpoint needs {pm['n_devices']} devices, have {len(devs)}"
            )
        mesh = Mesh(np.array(devs[: pm["n_devices"]]), (axis,))

    def put(arr, spec):
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

    mspec = P(axis, None, None)
    plan = CommPlan(
        send_idx=put(z["plan_send_idx"], mspec),
        recv_pos=put(z["plan_recv_pos"], mspec),
        nlocal=put(z["plan_nlocal"], P(axis)),
        nghosts=put(z["plan_nghosts"], P(axis)),
        rounds=tuple(pm["rounds"]),
        n_devices=pm["n_devices"],
        nlocal_pad=pm["nlocal_pad"],
        nghost_pad=pm["nghost_pad"],
    )
    kwargs = {}
    for name in DIST_DATA_FIELDS:
        if name == "plan":
            continue
        if name in z:
            arr = z[name]
            if name == "local_dia_data":
                arr = _dia_to_interleaved(arr, meta.get("dia_layout"))
            kwargs[name] = put(arr, P(axis, *([None] * (arr.ndim - 1))))
        else:
            kwargs[name] = None
    return DistMatrix(
        plan=plan,
        nrows_global=meta["nrows_global"],
        ncols_global=meta.get("ncols_global", meta["nrows_global"]),
        row_pad=meta.get("row_pad", pm["nlocal_pad"]),
        symmetric=meta["symmetric"],
        nnz_global=meta["nnz_global"],
        mesh=mesh,
        axis_name=axis,
        local_format=meta.get("local_format", "ell"),
        dia_offsets=tuple(meta.get("dia_offsets", [])),
        well_meta=tuple(meta.get("well_meta", [])),
        well_far_nnz=meta.get("well_far_nnz", 0),
        **kwargs,
    )


def _dia_to_interleaved(arr, layout):
    """Round-1 checkpoints stored (D, K, R/128, 128) per-diagonal planes;
    the device layout is now row-interleaved (D, R/128, K*128)."""
    if layout == "interleaved":
        return arr
    d, k, lr, _ = arr.shape
    return arr.transpose(0, 2, 1, 3).reshape(d, lr, k * 128)


def save_solver_state(path: str, a: DistMatrix, x, iteration: int = 0,
                      **extra_vectors) -> None:
    """Persist a mid-solve state (global host layout, mesh-independent)."""
    path = _npz_path(path)
    arrays = {"x": a.from_dist(x)}
    for name, v in extra_vectors.items():
        arrays[name] = a.from_dist(v)
    np.savez_compressed(path, **arrays)
    with open(path + ".meta.json", "w") as f:
        json.dump({"version": 1, "iteration": int(iteration)}, f)


def load_solver_state(path: str, a: DistMatrix):
    """Returns (vectors: dict of sharded arrays, iteration)."""
    path = _npz_path(path)
    z = np.load(path)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    vectors = {name: a.to_dist(z[name]) for name in z.files}
    return vectors, meta["iteration"]
