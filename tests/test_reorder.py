"""RCM bandwidth-reduction reordering (spmv_tpu.reorder)."""
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import create_laplace_2d, random_csr
from spmv_tpu.reorder import (
    bandwidth,
    permute_symmetric,
    rcm_reorder,
    reverse_cuthill_mckee,
)


def test_rcm_is_permutation():
    a = random_csr(200, 200, 5, seed=1, symmetric=True)
    order = reverse_cuthill_mckee(a)
    assert sorted(order) == list(range(200))


def test_rcm_reduces_bandwidth_scrambled_stencil():
    """A randomly permuted 2-D Laplacian has ~full bandwidth; RCM recovers a
    narrow band (the property the WELL/DIA windows rely on)."""
    a = create_laplace_2d(24, 24)
    rng = np.random.default_rng(2)
    scramble = rng.permutation(a.nrows)
    scrambled = permute_symmetric(a, scramble)
    b0 = bandwidth(scrambled)
    reordered, order = rcm_reorder(scrambled)
    b1 = bandwidth(reordered)
    assert b0 > a.nrows // 2
    assert b1 < b0 / 5, (b0, b1)


def test_permute_preserves_spectrum_and_matvec():
    a = random_csr(80, 80, 4, seed=3, symmetric=True)
    reordered, order = rcm_reorder(a)
    x = np.random.default_rng(4).standard_normal(80)
    # B[i,j] = A[order[i], order[j]]  =>  (B x)[i] = (A (x∘inv))[order[i]]
    y_b = reordered.matvec(x)
    inv = np.empty(80, np.int64)
    inv[order] = np.arange(80)
    y_a = a.matvec(x[inv])[order]
    np.testing.assert_allclose(y_b, y_a, rtol=1e-12)


def test_rcm_disconnected_components():
    # two disjoint paths
    rows = np.array([0, 1, 1, 2, 5, 6, 6, 7])
    cols = np.array([1, 0, 2, 1, 6, 5, 7, 6])
    a = CSRHost.from_coo(rows, cols, np.ones(8), 9, 9)  # node 3,4,8 isolated
    order = reverse_cuthill_mckee(a)
    assert sorted(order) == list(range(9))


def test_rcm_rejects_rectangular():
    with pytest.raises(ValueError):
        reverse_cuthill_mckee(random_csr(10, 20, 2, seed=5))


def test_native_rcm_bitwise_matches_numpy():
    """The native C++ RCM pipeline (symmetrize, CM order, permute) must be
    BITWISE identical to the numpy tier — same tie-breaking, same reversal,
    same per-row column order."""
    from spmv_tpu.native.lib import native_available

    if not native_available():
        pytest.skip("native tier unavailable (no toolchain)")
    rng = np.random.default_rng(7)
    cases = []
    # random non-symmetric pattern (exercises the symmetrization)
    cases.append(random_csr(300, 300, 5, seed=1))
    # scrambled banded (the RCM showcase), f32 values
    a = random_csr(256, 256, 3, seed=2, symmetric=True)
    cases.append(
        CSRHost(a.rowptr, a.colind, a.values.astype(np.float32), a.ncols))
    # disconnected components + empty rows + duplicate-prone self loops
    i = np.array([0, 0, 1, 5, 5, 6, 9])
    j = np.array([0, 1, 0, 6, 5, 5, 9])
    cases.append(CSRHost.from_coo(i, j, np.ones(7, float), 10, 10))
    for k, m in enumerate(cases):
        bn, on = rcm_reorder(m, native=True)
        bp, op = rcm_reorder(m, native=False)
        np.testing.assert_array_equal(on, op, err_msg=f"case {k} order")
        np.testing.assert_array_equal(bn.rowptr, bp.rowptr)
        np.testing.assert_array_equal(bn.colind, bp.colind)
        np.testing.assert_array_equal(bn.values, bp.values)
        # the standalone entry points agree too
        np.testing.assert_array_equal(
            reverse_cuthill_mckee(m, native=True),
            reverse_cuthill_mckee(m, native=False))
        pn = permute_symmetric(m, on, native=True)
        pp = permute_symmetric(m, on, native=False)
        np.testing.assert_array_equal(pn.colind, pp.colind)
        np.testing.assert_array_equal(pn.values, pp.values)


def test_rcm_keep_best_preserves_structured_ordering():
    """keep_best must return the identity when RCM worsens the bulk
    window locality — BFS orderings destroy grid + random-edge graphs
    (the corpus circuit case: p90 bandwidth 800 -> ~100k under RCM)."""
    import numpy as np

    from spmv_tpu.corpus import circuit_network
    from spmv_tpu.reorder import bandwidth_quantile, rcm_reorder

    a = circuit_network(60, seed=3)
    b_raw, _ = rcm_reorder(a)
    b_best, order = rcm_reorder(a, keep_best=True)
    assert bandwidth_quantile(b_best) <= bandwidth_quantile(b_raw)
    if bandwidth_quantile(b_raw) > bandwidth_quantile(a):
        # RCM hurt -> identity kept
        np.testing.assert_array_equal(order, np.arange(a.nrows))
    # and on a scrambled stencil keep_best still applies the improvement
    from spmv_tpu.corpus import scramble
    from spmv_tpu.gen import create_laplace_2d

    c = scramble(create_laplace_2d(32, 32), seed=5)
    c_best, order_c = rcm_reorder(c, keep_best=True)
    assert bandwidth_quantile(c_best) < bandwidth_quantile(c)
    assert not np.array_equal(order_c, np.arange(c.nrows))
