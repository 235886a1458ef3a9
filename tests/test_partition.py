"""Partitioning / shard classification (spmv_tpu.parallel.partition).

Pins the canonical-slice fast path (mask + prefix-sum, no sort) BITWISE
against the triplet path (from_coo re-sort) — the two must be
interchangeable since partition_csr picks per input canonicality.
"""
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import create_laplace_2d, random_csr
from spmv_tpu.parallel.partition import (
    classify_shard,
    owner_ranges,
    partition_csr,
)


def _classify_both_ways(a, r0, r1, c0, c1, symmetric):
    """The fast (rowptr) and triplet classify paths on one row slice."""
    s = a.extract_rows(r0, r1)
    fast = classify_shard(None, s.colind, s.values, (r0, r1), (c0, c1),
                          symmetric=symmetric, rowptr=s.rowptr)
    rows_l = np.repeat(np.arange(r1 - r0, dtype=np.int64), s.row_nnz())
    slow = classify_shard(rows_l, s.colind, s.values, (r0, r1), (c0, c1),
                          symmetric=symmetric)
    return fast, slow


def _assert_shard_equal(fast, slow):
    for name in ("local", "remote"):
        f, s = getattr(fast, name), getattr(slow, name)
        np.testing.assert_array_equal(f.rowptr, s.rowptr, err_msg=name)
        np.testing.assert_array_equal(f.colind, s.colind, err_msg=name)
        np.testing.assert_array_equal(f.values, s.values, err_msg=name)
        assert f.values.dtype == s.values.dtype
        assert f.ncols == s.ncols
    np.testing.assert_array_equal(fast.ghosts, slow.ghosts)
    if slow.diagonal is None:
        assert fast.diagonal is None
    else:
        np.testing.assert_array_equal(fast.diagonal, slow.diagonal)


@pytest.mark.parametrize("symmetric", [False, True])
@pytest.mark.parametrize("nd", [1, 3, 8])
def test_classify_fast_path_bitwise(symmetric, nd):
    a = random_csr(97, 97, 5, seed=12, symmetric=symmetric,
                   spd_shift=1.0 if symmetric else 0.0)
    rr = owner_ranges(a.nrows, nd)
    for s in range(nd):
        r0, r1 = int(rr[s]), int(rr[s + 1])
        fast, slow = _classify_both_ways(a, r0, r1, r0, r1, symmetric)
        _assert_shard_equal(fast, slow)


def test_classify_fast_path_bitwise_rectangular():
    a = random_csr(60, 31, 4, seed=7)
    rr, cr = owner_ranges(60, 4), owner_ranges(31, 4)
    for s in range(4):
        fast, slow = _classify_both_ways(
            a, int(rr[s]), int(rr[s + 1]), int(cr[s]), int(cr[s + 1]), False)
        _assert_shard_equal(fast, slow)


def test_partition_csr_same_result_canonical_or_not():
    """partition_csr must produce identical shards whether or not the
    input advertises canonicality (the flag only selects the path)."""
    a = create_laplace_2d(12, 9)
    assert getattr(a, "_sorted_unique", False)
    b = CSRHost(a.rowptr.copy(), a.colind.copy(), a.values.copy(), a.ncols)
    assert not getattr(b, "_sorted_unique", False)
    for sym in (False, True):
        for fa, sl in zip(partition_csr(a, 4, symmetric=sym),
                          partition_csr(b, 4, symmetric=sym)):
            _assert_shard_equal(fa, sl)


def test_extract_rows_propagates_canonicality():
    a = create_laplace_2d(8, 8)
    assert a.extract_rows(3, 20)._sorted_unique
    b = CSRHost(a.rowptr, a.colind, a.values, a.ncols)
    assert not getattr(b.extract_rows(3, 20), "_sorted_unique", False)


def test_classify_fast_path_empty_rows_and_shards():
    # shard with zero rows / rows with zero entries
    rows = np.array([0, 0, 5])
    cols = np.array([1, 3, 2])
    vals = np.array([1.0, 2.0, 3.0])
    a = CSRHost.from_coo(rows, cols, vals, 7, 4)
    for s in range(7):
        fast, slow = _classify_both_ways(a, s, s + 1, 0, 2, False)
        _assert_shard_equal(fast, slow)
