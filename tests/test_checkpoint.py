"""Checkpoint/resume round trips (capability beyond the reference — it has
none, SURVEY.md section 5)."""
import numpy as np

import jax

from spmv_tpu.gen import create_laplace_2d, gaussian_bump
from spmv_tpu.io.checkpoint import (
    load_dist_matrix,
    load_solver_state,
    save_dist_matrix,
    save_solver_state,
)
from spmv_tpu.parallel.dist_matrix import build_dist_matrix
from spmv_tpu.solvers.cg import cg


def test_dist_matrix_roundtrip(tmp_path):
    a = create_laplace_2d(10, 12)
    A = build_dist_matrix(a, n_devices=4, symmetric=True)
    path = str(tmp_path / "A.npz")
    save_dist_matrix(path, A)
    B = load_dist_matrix(path)
    x_host = gaussian_bump(a.nrows)
    ya = A.from_dist(A.matvec(A.to_dist(x_host)))
    yb = B.from_dist(B.matvec(B.to_dist(x_host)))
    np.testing.assert_allclose(ya, yb, rtol=1e-14)
    assert B.symmetric and B.nnz_global == A.nnz_global


def test_solver_resume_converges_to_same_solution(tmp_path):
    """Run 20 CG iterations, checkpoint x, resume to convergence; final
    solution must match an uninterrupted solve."""
    a = create_laplace_2d(12, 12)
    A = build_dist_matrix(a, n_devices=2)
    b_host = gaussian_bump(a.nrows)
    b = A.to_dist(b_host)
    mv = A.as_linear_operator()

    full = cg(mv, b, kmax=500, rtol=1e-10)

    part = cg(mv, b, kmax=20, rtol=1e-10)
    path = str(tmp_path / "state.npz")
    save_solver_state(path, A, part.x, iteration=int(part.iterations))
    vecs, it = load_solver_state(path, A)
    assert it == 20
    resumed = cg(mv, b, x0=vecs["x"], kmax=500, rtol=1e-10)
    assert bool(resumed.converged)

    x_full = A.from_dist(full.x)
    x_res = A.from_dist(resumed.x)
    # restarted CG reaches the same solution to the solve tolerance
    assert np.linalg.norm(x_full - x_res) / np.linalg.norm(x_full) < 1e-7
