"""Matrix Market I/O (capability beyond the reference's PETSc-only loader)."""
import gzip

import numpy as np
import pytest

from spmv_tpu.gen import random_csr
from spmv_tpu.io.matrix_market import read_matrix_market, write_matrix_market


def test_roundtrip_general(tmp_path):
    a = random_csr(23, 17, 4, seed=101)
    p = str(tmp_path / "a.mtx")
    write_matrix_market(p, a, comment="test matrix")
    b = read_matrix_market(p)
    np.testing.assert_allclose(b.to_dense(), a.to_dense(), rtol=1e-15)


def test_symmetric_expansion(tmp_path):
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 4\n1 1 2.0\n2 1 -1.0\n3 2 -1.0\n3 3 5.0\n")
    a = read_matrix_market(p)
    want = np.array([[2, -1, 0], [-1, 0, -1], [0, -1, 5.0]])
    np.testing.assert_allclose(a.to_dense(), want)


def test_skew_symmetric(tmp_path):
    p = str(tmp_path / "k.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real skew-symmetric\n")
        f.write("2 2 1\n2 1 3.0\n")
    a = read_matrix_market(p)
    np.testing.assert_allclose(a.to_dense(), [[0, -3.0], [3.0, 0]])


def test_pattern_field(tmp_path):
    p = str(tmp_path / "p.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("% comment line\n2 2 2\n1 2\n2 1\n")
    a = read_matrix_market(p)
    np.testing.assert_allclose(a.to_dense(), [[0, 1.0], [1.0, 0]])


def test_gzip_roundtrip(tmp_path):
    a = random_csr(9, 9, 3, seed=102)
    p = str(tmp_path / "a.mtx.gz")
    write_matrix_market(p, a)
    assert open(p, "rb").read(2) == b"\x1f\x8b"  # really gzipped
    b = read_matrix_market(p)
    np.testing.assert_allclose(b.to_dense(), a.to_dense())


def test_bad_header(tmp_path):
    p = str(tmp_path / "bad.mtx")
    with open(p, "w") as f:
        f.write("not a matrix\n")
    with pytest.raises(ValueError, match="not a MatrixMarket"):
        read_matrix_market(p)
