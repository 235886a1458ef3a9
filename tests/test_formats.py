"""Format containers and conversions."""
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.formats.dia import csr_to_dia
from spmv_tpu.formats.ell import csr_to_ell
from spmv_tpu.gen import create_laplace_1d, create_laplace_2d, random_csr


def test_csr_from_coo_merges_duplicates():
    a = CSRHost.from_coo([0, 0, 1], [1, 1, 0], [2.0, 3.0, 4.0], 2, 2)
    dense = a.to_dense()
    np.testing.assert_allclose(dense, [[0, 5], [4, 0]])
    assert a.nnz == 2


def test_csr_dense_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((7, 9)) * (rng.random((7, 9)) < 0.3)
    a = CSRHost.from_dense(d)
    np.testing.assert_array_equal(a.to_dense(), d)


def test_csr_matvec_oracle_matches_dense():
    a = random_csr(33, 21, 4, seed=1)
    x = np.random.default_rng(2).standard_normal(21)
    np.testing.assert_allclose(a.matvec(x), a.to_dense() @ x, rtol=1e-12)


def test_csr_transpose():
    a = random_csr(13, 17, 3, seed=3)
    np.testing.assert_allclose(a.transpose().to_dense(), a.to_dense().T)


def test_csr_extract_rows():
    a = random_csr(20, 20, 3, seed=4)
    sub = a.extract_rows(5, 12)
    np.testing.assert_array_equal(sub.to_dense(), a.to_dense()[5:12])


def test_split_lower_diag():
    a = random_csr(10, 10, 4, seed=5, symmetric=True)
    lower, diag = a.split_lower_diag()
    dense = a.to_dense()
    np.testing.assert_allclose(np.tril(dense, -1), lower.to_dense())
    np.testing.assert_allclose(np.diag(dense), diag)
    # reassembled: L + D + L^T == A for symmetric A
    np.testing.assert_allclose(
        lower.to_dense() + np.diag(diag) + lower.to_dense().T, dense, atol=1e-12
    )


@pytest.mark.parametrize("nrows,ncols,k", [(5, 5, 3), (17, 11, 4), (1, 3, 2)])
def test_ell_roundtrip(nrows, ncols, k):
    a = random_csr(nrows, ncols, k, seed=6)
    e = csr_to_ell(a, row_align=8, k_align=4)
    assert e.nrows_pad % 8 == 0 and e.k % 4 == 0
    # reconstruct dense from ELL
    dense = np.zeros((e.nrows_pad, ncols))
    ci = np.asarray(e.colind)
    v = np.asarray(e.values)
    for r in range(e.nrows_pad):
        for s in range(e.k):
            dense[r, ci[r, s]] += v[r, s]
    np.testing.assert_allclose(dense[:nrows], a.to_dense())
    np.testing.assert_allclose(dense[nrows:], 0)
    assert e.nnz_stored == a.nnz


def test_ell_symmetric_stores_lower_only():
    a = random_csr(12, 12, 3, seed=7, symmetric=True)
    e = csr_to_ell(a, symmetric=True)
    lower, diag = a.split_lower_diag()
    assert e.nnz_stored == lower.nnz
    np.testing.assert_allclose(np.asarray(e.diagonal)[:12], diag)


def test_dia_laplace_1d_offsets():
    a = create_laplace_1d(32, gamma=0.25)
    d = csr_to_dia(a)
    assert d.offsets == (-1, 0, 1)
    data = np.asarray(d.data_flat)
    np.testing.assert_allclose(data[1][:32], 1.5)
    np.testing.assert_allclose(data[0][1:32], -0.25)  # sub-diagonal, rows 1..
    np.testing.assert_allclose(data[2][:31], -0.25)


def test_dia_laplace_2d_offsets():
    a = create_laplace_2d(6, 5)
    d = csr_to_dia(a)
    assert d.offsets == (-6, -1, 0, 1, 6)


def test_dia_rejects_unstructured():
    a = random_csr(64, 64, 8, seed=8)
    with pytest.raises(ValueError, match="diagonals"):
        csr_to_dia(a, max_diags=4)


def test_laplace_2d_is_spd_stencil():
    a = create_laplace_2d(4, 4)
    dense = a.to_dense()
    np.testing.assert_allclose(dense, dense.T)
    assert np.all(np.linalg.eigvalsh(dense) > 0)
    assert a.nnz == 5 * 16 - 2 * 4 - 2 * 4  # 5n - 2*nx - 2*ny


def test_native_ell_pack_matches_numpy():
    """C++ ELL packer vs the numpy path on the same matrix."""
    from spmv_tpu.formats.ell import _pack_ell_native
    from spmv_tpu.native.lib import native_available

    if not native_available():
        import pytest as _pytest
        _pytest.skip("native toolchain unavailable")
    a = random_csr(200, 150, 6, seed=95)  # float64 default
    e_np = csr_to_ell(a, row_align=8, k_align=1)
    k = e_np.k
    colind = np.zeros((e_np.nrows_pad, k), dtype=np.int32)
    values = np.zeros((e_np.nrows_pad, k), dtype=np.float64)
    assert _pack_ell_native(a, k, colind, values)
    np.testing.assert_array_equal(colind, np.asarray(e_np.colind))
    np.testing.assert_allclose(values, np.asarray(e_np.values))


def test_laplace_3d_structure():
    from spmv_tpu.gen import create_laplace_3d
    from spmv_tpu.formats.dia import csr_to_dia

    a = create_laplace_3d(4, 3, 2)
    dense = a.to_dense()
    np.testing.assert_allclose(dense, dense.T)
    assert np.all(np.linalg.eigvalsh(dense) > 0)
    d = csr_to_dia(a)
    assert d.offsets == (-12, -4, -1, 0, 1, 4, 12)
    x = np.random.default_rng(1).standard_normal(a.nrows)
    from spmv_tpu.ops.spmv_dia import spmv_dia
    import jax.numpy as jnp
    got = np.asarray(spmv_dia(d, jnp.asarray(x)))[: a.nrows]
    np.testing.assert_allclose(got, dense @ x, rtol=1e-12)


def test_dia_transpose():
    """dia_transpose vs the dense transpose oracle (negated offsets with
    row-shifted data), including a rectangular-reject check."""
    import jax.numpy as jnp
    from spmv_tpu.formats.dia import csr_to_dia, dia_transpose
    from spmv_tpu.gen import random_csr

    rng = np.random.default_rng(7)
    n = 200
    rows, cols, vals = [], [], []
    for off in (-9, -1, 0, 2, 5):
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(len(i)) < 0.8
        i = i[keep]
        rows.append(i); cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    a = CSRHost.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), n, n
    )
    d = csr_to_dia(a)
    dt = dia_transpose(d)
    assert dt.offsets == tuple(sorted(-o for o in d.offsets))
    x = rng.standard_normal(dt.nrows_pad)
    from spmv_tpu.ops.spmv_dia import spmv_dia
    got = np.asarray(spmv_dia(dt, jnp.asarray(x)))[:n]
    want = a.to_dense().T @ x[:n]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # symmetric storage is self-transpose
    ds = csr_to_dia(CSRHost.from_dense(np.array([[2.0, 1], [1, 3]])), symmetric=True)
    assert dia_transpose(ds) is ds


def test_native_dia_pack_matches_numpy():
    """The native CSR->DIA pack (spmv_dia_scan/spmv_dia_pack_*,
    native/spmv_host.cpp) must be bitwise-identical to the numpy path —
    offsets, nnz accounting, and data planes — for f32/f64 x
    {vanilla, symmetric}, including duplicate summation."""
    import spmv_tpu.native.lib as native_lib
    from spmv_tpu.formats.dia import csr_to_dia_host, csr_to_dia

    if not native_lib.native_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    n = 700
    rows, cols, vals = [], [], []
    for off in (-33, -5, -1, 0, 1, 4, 50):
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(len(i)) < 0.75
        i = i[keep]
        rows.append(i); cols.append(i + off)
        vals.append(rng.standard_normal(len(i)))
    r = np.concatenate(rows + [rows[0][:7]])
    c = np.concatenate(cols + [cols[0][:7]])
    v = np.concatenate(vals + [vals[0][:7]])  # duplicates must SUM
    for dt in (np.float32, np.float64):
        a = CSRHost.from_coo(r, c, v.astype(dt), n, n, sum_duplicates=False)
        for sym in (False, True):
            nat = csr_to_dia_host(a, symmetric=sym)
            real = native_lib.get_lib
            native_lib.get_lib = lambda: None
            try:
                ref = csr_to_dia_host(a, symmetric=sym)
            finally:
                native_lib.get_lib = real
            assert nat[1] == ref[1]
            assert nat[2] == ref[2]
            # duplicate accumulation order may differ (native adds in CSR
            # order; numpy bincount too) — identical here by construction
            np.testing.assert_array_equal(nat[0], ref[0])
            # and the interleaved device build agrees with the flat build
            d = csr_to_dia(a, symmetric=sym)
            from spmv_tpu.formats.dia import flat_to_interleaved
            np.testing.assert_array_equal(
                np.asarray(d.data), flat_to_interleaved(ref[0], ref[0].shape[0])
            )


def test_native_well_pack_matches_numpy():
    """The native CSR->WELL pack (spmv_well_scan/spmv_well_pack_*,
    native/spmv_host.cpp) must be BITWISE-identical to the numpy path —
    values, pos (incl. the endpoint-lane fill), w0, wseg, nseg. ~45x at
    weak-scale sizes (BENCH_NOTES)."""
    import pytest as _pytest

    from spmv_tpu.formats import well as fw
    from spmv_tpu.native.lib import native_available

    if not native_available():
        _pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(5)

    def numpy_arrays(a, tg, dtype):
        gpad, k, wseg, w0, nseg_x, scatter = fw._pack(a, tg, pair=False)
        g_s, slot, lo_s, seg_rel, li_s, vals_s, sa, sb, _ = scatter
        pos_dtype = (np.int16 if wseg * 128 <= 32767 and tg % 16 == 0
                     else np.int32)
        values = np.zeros((k, gpad, 128), dtype=dtype)
        pos = np.zeros((k, gpad, 128), dtype=pos_dtype)
        pos[...] = (sa.T[:, :, None] * 128).astype(pos_dtype)
        pos[:, :, 127] = (sb.T * 128).astype(pos_dtype)
        if len(g_s):
            values[slot, g_s, lo_s] = vals_s
            pos[slot, g_s, lo_s] = (seg_rel * 128 + li_s).astype(pos_dtype)
        return values, pos, w0.astype(np.int32), wseg, nseg_x

    cases = []
    n, nnz = 2000, 14000
    rows = rng.integers(0, n, nnz)
    cols = np.clip(rows + rng.integers(-700, 700, nnz), 0, n - 1)
    cases.append((CSRHost.from_coo(
        rows, cols, rng.standard_normal(nnz).astype(np.float32), n, n), 16,
        np.float32))
    cases.append((create_laplace_2d(48, 48, dtype=np.float64), 16,
                  np.float64))
    # rectangular + duplicate-rank rows + empty
    cases.append((CSRHost.from_coo(
        rng.integers(0, 300, 1500), rng.integers(0, 3000, 1500),
        rng.standard_normal(1500).astype(np.float32), 300, 3000), 2,
        np.float32))
    cases.append((CSRHost.from_coo(
        np.array([], np.int64), np.array([], np.int64),
        np.array([], np.float32), 400, 400), 16, np.float32))

    for a, tg, dtype in cases:
        nat = fw._build_arrays_native(a, tg, 512, dtype)
        assert nat is not None
        nv, npp, nw0, nwseg, nnseg, npaired = nat
        values, pos, w0, wseg, nseg_x = numpy_arrays(a, tg, dtype)
        assert (nwseg, nnseg) == (wseg, nseg_x)
        assert np.array_equal(nw0, w0)
        assert nv.shape == values.shape and np.array_equal(nv, values)
        assert npp.dtype == pos.dtype and np.array_equal(npp, pos)
        assert npaired is False

    # complex dtype falls back (returns None), numpy path still works
    ac = CSRHost.from_coo(np.array([0, 1]), np.array([1, 0]),
                          np.array([1 + 1j, 2 - 1j], np.complex64), 2, 2)
    assert fw._build_arrays_native(ac, 16, 64, np.complex64) is None


def test_native_laplace_fill_matches_numpy(monkeypatch):
    """The C++ single-pass stencil fills are bitwise-identical to the numpy
    builders (same rowptr/colind/values), for 2-D and 3-D, f64 and f32,
    including degenerate strip grids."""
    from spmv_tpu import gen
    from spmv_tpu.native.lib import native_available

    if not native_available():
        import pytest as _pytest
        _pytest.skip("native toolchain unavailable")

    cases = [
        (gen.create_laplace_2d, (70, 73), np.float64),
        (gen.create_laplace_2d, (70, 73), np.float32),
        (gen.create_laplace_2d, (1, 5000), np.float64),   # 1-wide strip
        (gen.create_laplace_2d, (5000, 1), np.float64),
        (gen.create_laplace_3d, (17, 19, 23), np.float64),
        (gen.create_laplace_3d, (17, 19, 23), np.float32),
        (gen.create_laplace_3d, (1, 1, 8000), np.float64),  # 1x1 pencil
    ]
    for builder, dims, dtype in cases:
        a_nat = builder(*dims, dtype=dtype)
        with monkeypatch.context() as m:
            m.setattr("spmv_tpu.native.lib.get_lib", lambda: None)
            a_np = builder(*dims, dtype=dtype)
        np.testing.assert_array_equal(a_nat.rowptr, a_np.rowptr), (dims,)
        np.testing.assert_array_equal(a_nat.colind, a_np.colind)
        np.testing.assert_array_equal(
            np.asarray(a_nat.values), np.asarray(a_np.values))
        assert a_nat.values.dtype == np.dtype(dtype)


def test_csr_matmul_matches_dense():
    """Host SpGEMM (csr_matmul): rectangular chains and the FSAI split
    triple product match dense, incl. duplicate coalescing."""
    from spmv_tpu.formats.csr import csr_matmul
    from spmv_tpu.gen import create_laplace_2d, random_csr

    a = random_csr(40, 24, 3, seed=5)
    b = random_csr(24, 31, 4, seed=6)
    c = csr_matmul(a, b)
    np.testing.assert_allclose(c.to_dense(), a.to_dense() @ b.to_dense(),
                               atol=1e-12)
    lap = create_laplace_2d(8, 8)
    m = csr_matmul(csr_matmul(lap, lap), lap.transpose())
    d = lap.to_dense()
    np.testing.assert_allclose(m.to_dense(), d @ d @ d.T, atol=1e-10)
    with pytest.raises(ValueError, match="shape mismatch"):
        csr_matmul(a, a)


def test_native_from_coo_bitwise_matches_numpy():
    """Native counting-scatter from_coo vs the numpy lexsort tier: same
    rowptr/colind/values BITWISE (stability within duplicate (row, col)
    groups and the f64 duplicate-accumulation order both preserved)."""
    import spmv_tpu.native.lib as NL

    if not NL.native_available():
        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(3)
    for sd in (True, False):
        for dt in (np.float64, np.float32):
            n = 400
            rows = rng.integers(0, n, 5000)
            cols = rng.integers(0, n, 5000)
            vals = rng.standard_normal(5000).astype(dt)
            for r, c, v in [
                (rows, cols, vals),
                (np.concatenate([rows] * 3), np.concatenate([cols] * 3),
                 rng.standard_normal(15000).astype(dt)),
                (np.empty(0, np.int64), np.empty(0, np.int64),
                 np.empty(0, dt)),
            ]:
                a = CSRHost.from_coo(r, c, v, n, n, sum_duplicates=sd)
                orig = NL.get_lib
                NL.get_lib = lambda: None
                try:
                    b = CSRHost.from_coo(r, c, v, n, n, sum_duplicates=sd)
                finally:
                    NL.get_lib = orig
                np.testing.assert_array_equal(a.rowptr, b.rowptr)
                np.testing.assert_array_equal(a.colind, b.colind)
                np.testing.assert_array_equal(a.values, b.values)


def test_native_spgemm_matches_numpy_and_dense():
    """Gustavson SpGEMM vs the numpy ESC tier: identical structure, values
    to 1e-13 (accumulation order differs by design), and both match the
    dense product."""
    import spmv_tpu.native.lib as NL
    from spmv_tpu.formats.csr import csr_matmul

    if not NL.native_available():
        pytest.skip("native tier unavailable")
    for (m, k, n, per) in [(50, 40, 30, 4), (200, 200, 200, 7), (1, 5, 9, 2)]:
        a = random_csr(m, k, per, seed=1)
        b = random_csr(k, n, per, seed=2)
        cn = csr_matmul(a, b, native=True)
        cp = csr_matmul(a, b, native=False)
        np.testing.assert_array_equal(cn.rowptr, cp.rowptr)
        np.testing.assert_array_equal(cn.colind, cp.colind)
        np.testing.assert_allclose(cn.values, cp.values, rtol=1e-13,
                                   atol=1e-13)
        np.testing.assert_allclose(cn.to_dense(),
                                   a.to_dense() @ b.to_dense(), atol=1e-10)
