"""PETSc binary I/O round trips and sliced reads
(reference spmv/read_petsc.cpp behavior; the writer is new)."""
import numpy as np
import pytest

from spmv_tpu.gen import random_csr
from spmv_tpu.io.petsc import (
    read_petsc_binary_matrix_host,
    read_petsc_binary_vector_host,
    write_petsc_binary_matrix,
    write_petsc_binary_vector,
)


def test_matrix_roundtrip(tmp_path):
    a = random_csr(37, 29, 4, seed=30)
    path = str(tmp_path / "a.petsc")
    write_petsc_binary_matrix(path, a)
    back = read_petsc_binary_matrix_host(path)
    assert back.shape == a.shape
    np.testing.assert_array_equal(back.rowptr, a.rowptr)
    np.testing.assert_array_equal(back.colind, a.colind)
    np.testing.assert_allclose(back.values, a.values)


def test_matrix_row_slice(tmp_path):
    """Per-rank sliced read (reference read_petsc.cpp:109-124 seek strategy)."""
    a = random_csr(40, 40, 3, seed=31)
    path = str(tmp_path / "a.petsc")
    write_petsc_binary_matrix(path, a)
    sl = read_petsc_binary_matrix_host(path, row_range=(10, 25))
    np.testing.assert_array_equal(sl.to_dense(), a.to_dense()[10:25])


def test_vector_roundtrip_and_slice(tmp_path):
    x = np.random.default_rng(32).standard_normal(101)
    path = str(tmp_path / "x.petsc")
    write_petsc_binary_vector(path, x)
    np.testing.assert_allclose(read_petsc_binary_vector_host(path), x)
    np.testing.assert_allclose(
        read_petsc_binary_vector_host(path, index_range=(7, 55)), x[7:55]
    )


def test_bad_magic_raises(tmp_path):
    path = str(tmp_path / "bad.petsc")
    with open(path, "wb") as f:
        np.array([123, 4, 4, 0], dtype=">i4").tofile(f)
    # mirrors the reference's signature check (read_petsc.cpp:74-76)
    with pytest.raises(ValueError, match="not a PETSc"):
        read_petsc_binary_matrix_host(path)
    with pytest.raises(ValueError, match="not a PETSc"):
        read_petsc_binary_vector_host(path)


def test_big_endian_on_disk(tmp_path):
    """Bytes on disk must be big-endian PETSc classid 1211216."""
    a = random_csr(3, 3, 1, seed=33)
    path = str(tmp_path / "a.petsc")
    write_petsc_binary_matrix(path, a)
    raw = open(path, "rb").read(4)
    assert int.from_bytes(raw, "big") == 1211216


def test_native_reader_matches_numpy(tmp_path):
    """C++ mmap parser vs the numpy reference implementation."""
    from spmv_tpu.native.lib import native_available

    if not native_available():
        import pytest as _pytest
        _pytest.skip("native toolchain unavailable")
    a = random_csr(53, 41, 6, seed=34)
    path = str(tmp_path / "a.petsc")
    write_petsc_binary_matrix(path, a)
    nat = read_petsc_binary_matrix_host(path, native=True)
    ref = read_petsc_binary_matrix_host(path, native=False)
    np.testing.assert_array_equal(nat.rowptr, ref.rowptr)
    np.testing.assert_array_equal(nat.colind, ref.colind)
    np.testing.assert_allclose(nat.values, ref.values)
    # sliced
    nat_s = read_petsc_binary_matrix_host(path, row_range=(10, 30), native=True)
    ref_s = read_petsc_binary_matrix_host(path, row_range=(10, 30), native=False)
    np.testing.assert_array_equal(nat_s.to_dense(), ref_s.to_dense())


def test_native_reader_bad_magic(tmp_path):
    from spmv_tpu.native.lib import native_available

    if not native_available():
        import pytest as _pytest
        _pytest.skip("native toolchain unavailable")
    path = str(tmp_path / "bad.petsc")
    with open(path, "wb") as f:
        np.array([99, 3, 3, 1], dtype=">i4").tofile(f)
    with pytest.raises(ValueError, match="not a PETSc"):
        read_petsc_binary_matrix_host(path, native=True)
