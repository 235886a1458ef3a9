"""Multi-RHS DIA SpMM (matrix streamed once per block — see
ops/spmm_dia_pallas.py; the reference applies one vector at a time)."""
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.formats.dia import csr_to_dia
from spmv_tpu.gen import create_laplace_2d, create_laplace_3d
from spmv_tpu.ops.spmm_dia_pallas import spmm_dia, spmm_dia_supported


@pytest.mark.parametrize("nrhs", [1, 2, 4, 5])
def test_spmm_matches_per_vector_oracle(nrhs):
    a = create_laplace_2d(64, 64)
    d = csr_to_dia(a, dtype=np.float32, row_align=4096)
    assert spmm_dia_supported(d, nrhs)
    X = np.random.default_rng(nrhs).standard_normal(
        (a.nrows, nrhs)).astype(np.float32)
    Y = np.asarray(spmm_dia(d, jnp.asarray(X), interpret=True))
    for r in range(nrhs):
        want = a.matvec(X[:, r].astype(np.float64))
        err = np.linalg.norm(Y[: a.nrows, r] - want) / np.linalg.norm(want)
        assert err < 1e-5, (nrhs, r, err)


def test_spmm_3d_stencil_large_halo():
    a = create_laplace_3d(16)
    d = csr_to_dia(a, dtype=np.float32, row_align=4096)
    nrhs = 3
    assert spmm_dia_supported(d, nrhs)
    X = np.random.default_rng(7).standard_normal(
        (a.nrows, nrhs)).astype(np.float32)
    Y = np.asarray(spmm_dia(d, jnp.asarray(X), interpret=True))
    for r in range(nrhs):
        want = a.matvec(X[:, r].astype(np.float64))
        err = np.linalg.norm(Y[: a.nrows, r] - want) / np.linalg.norm(want)
        assert err < 1e-5, (r, err)


def test_spmm_layout_roundtrip():
    from spmv_tpu.ops.spmm_dia_pallas import spmm_from_layout, spmm_to_layout

    a = create_laplace_2d(32, 32)
    d = csr_to_dia(a, dtype=np.float32, row_align=1024)
    X = np.random.default_rng(3).standard_normal((a.nrows, 4)).astype(np.float32)
    lay = spmm_to_layout(d, jnp.asarray(X))
    back = np.asarray(spmm_from_layout(lay, 4))
    np.testing.assert_array_equal(back[: a.nrows], X)
