"""Block CG over the multi-RHS SpMM kernel (see solvers/block_cg.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.dia import csr_to_dia
from spmv_tpu.gen import create_laplace_2d, gaussian_bump
from spmv_tpu.solvers.block_cg import block_cg_dia


@pytest.mark.parametrize("nrhs", [2, 4])
def test_block_cg_solves_all_columns(nrhs):
    a = create_laplace_2d(48, 48)
    d = csr_to_dia(a, dtype=np.float64, row_align=4096)
    rng = np.random.default_rng(nrhs)
    B = rng.standard_normal((a.nrows, nrhs))
    X, res = block_cg_dia(d, B, kmax=800, rtol=1e-10, interpret=True)
    assert bool(res.converged), np.asarray(res.rnorm)
    for r in range(nrhs):
        rel = np.linalg.norm(a.matvec(np.asarray(X[:, r])) - B[:, r]) \
            / np.linalg.norm(B[:, r])
        assert rel < 1e-9, (r, rel)


def test_block_cg_fewer_iterations_than_worst_column():
    """Sharing the Krylov block must not need more iterations than solving
    the hardest column alone with plain CG."""
    import jax

    from spmv_tpu.ops.spmv_dia_pallas import spmv_dia_pallas_2d, dia_to_2d
    from spmv_tpu.solvers.cg import cg

    a = create_laplace_2d(32, 32)
    d = csr_to_dia(a, dtype=np.float64, row_align=4096)
    rng = np.random.default_rng(9)
    B = np.stack([gaussian_bump(a.nrows), rng.standard_normal(a.nrows),
                  rng.standard_normal(a.nrows)], axis=1)
    X, res = block_cg_dia(d, B, kmax=800, rtol=1e-9, interpret=True)
    assert bool(res.converged)

    from spmv_tpu.ops.spmv_dia import spmv_dia

    worst = 0
    for r in range(3):
        b2 = dia_to_2d(d, jnp.asarray(np.pad(B[:, r],
                                             (0, d.nrows_pad - a.nrows))))
        single = cg(lambda p: spmv_dia(d, p.reshape(-1),
                                       method="xla").reshape(p.shape),
                    b2, kmax=800, rtol=1e-9)
        worst = max(worst, int(single.iterations))
    assert int(res.iterations) <= worst, (int(res.iterations), worst)


def test_block_cg_mixed_convergence_rates():
    """Columns with very different difficulty (one pre-solved) must not
    destabilize the block (rank-deficiency regularization)."""
    a = create_laplace_2d(32, 32)
    d = csr_to_dia(a, dtype=np.float64, row_align=4096)
    rng = np.random.default_rng(11)
    x_known = rng.standard_normal(a.nrows)
    B = np.stack([a.matvec(x_known) * 1e-8,  # tiny, converges instantly
                  rng.standard_normal(a.nrows)], axis=1)
    X, res = block_cg_dia(d, B, kmax=800, rtol=1e-8, interpret=True)
    assert bool(res.converged)
    for r in range(2):
        rel = np.linalg.norm(a.matvec(np.asarray(X[:, r])) - B[:, r]) \
            / np.linalg.norm(B[:, r])
        assert rel < 1e-7, (r, rel)


def test_block_cg_refined_f64_class():
    """fp32 block-CG inner + DS residual refinement: TRUE f64-class
    residuals for every column (the naked fp32 block solve stalls at
    kappa*eps_f32 — measured on chip)."""
    from spmv_tpu.solvers.block_cg import block_cg_refined

    a = create_laplace_2d(48, 48)
    rng = np.random.default_rng(21)
    B = rng.standard_normal((a.nrows, 3))
    X, outer, inner, rnorms = block_cg_refined(
        a, B, rtol=1e-11, inner_kmax=2000, inner_rtol=1e-5, interpret=True)
    for r in range(3):
        rel = np.linalg.norm(a.matvec(X[:, r]) - B[:, r]) \
            / np.linalg.norm(B[:, r])
        assert rel < 1e-10, (r, rel)
