"""Rectangular distributed operators + pre-distributed (row-ghost) assembly.

The reference declares both capabilities but delivers neither working:
``transpmult`` throws (reference spmv/Matrix.cpp:144-148) so its
restriction demo is broken (demos/restrictmain.cpp:60-91), and
``create_matrix`` accepts per-rank triplets with ``row_ghosts``
(spmv/Matrix.h:97,109; Matrix.cpp:164-292) that build_dist_matrix round 1
had no counterpart for.
"""
import jax
import numpy as np
import pytest

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import random_csr
from spmv_tpu.parallel.dist_matrix import (
    build_dist_matrix,
    build_dist_matrix_from_shards,
)
from spmv_tpu.parallel.partition import owner_ranges


def _restriction_matrix(nf: int, dtype=np.float64) -> CSRHost:
    """1-D full-weighting restriction (nf fine rows -> nf//2 coarse rows),
    the operator shape of the reference's restrictmain demo."""
    nc = nf // 2
    rows, cols, vals = [], [], []
    for i in range(nc):
        f = 2 * i + 1
        for df, w in ((-1, 0.25), (0, 0.5), (1, 0.25)):
            if 0 <= f + df < nf:
                rows.append(i)
                cols.append(f + df)
                vals.append(w)
    return CSRHost.from_coo(
        np.array(rows), np.array(cols), np.array(vals, dtype=dtype), nc, nf
    )


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_rectangular_matvec(n_dev):
    """R @ x for a wide rectangular operator across mesh sizes."""
    r = _restriction_matrix(240)
    A = build_dist_matrix(r, n_devices=n_dev)
    x_host = np.random.default_rng(5).standard_normal(r.ncols)
    y = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x_host)))
    np.testing.assert_allclose(y, r.matvec(x_host), rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_rectangular_transpose_matvec(n_dev):
    """R^T @ q (prolongation via the transpose product) across meshes."""
    r = _restriction_matrix(240)
    A = build_dist_matrix(r, n_devices=n_dev)
    q_host = np.random.default_rng(6).standard_normal(r.nrows)
    y = A.from_dist(
        jax.jit(lambda A_, q_: A_.matvec_transpose(q_))(
            A, A.to_dist(q_host, side="row")
        ),
        side="col",
    )
    np.testing.assert_allclose(y, r.to_dense().T @ q_host, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_rectangular_random(n_dev):
    """Random tall and wide matrices, forward and transpose."""
    for nr, nc, seed in ((150, 70, 7), (60, 200, 8)):
        a = random_csr(nr, nc, 5, seed=seed)
        A = build_dist_matrix(a, n_devices=n_dev)
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(nc)
        y = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x)))
        np.testing.assert_allclose(y, a.matvec(x), rtol=1e-11, atol=1e-12)
        q = rng.standard_normal(nr)
        z = A.from_dist(
            jax.jit(lambda A_, q_: A_.matvec_transpose(q_))(
                A, A.to_dist(q, side="row")
            ),
            side="col",
        )
        np.testing.assert_allclose(z, a.to_dense().T @ q, rtol=1e-11, atol=1e-12)


def test_restrict_prolongate_cycle_distributed():
    """The restrictmain cycle (q = R x_fine; y = R^T q) on an 8-device mesh —
    a WORKING distributed version of reference demos/restrictmain.cpp:60-91."""
    r = _restriction_matrix(512)
    A = build_dist_matrix(r, n_devices=8)
    x = np.random.default_rng(9).standard_normal(r.ncols)
    q = jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x))
    y = A.from_dist(
        jax.jit(lambda A_, q_: A_.matvec_transpose(q_))(A, q), side="col"
    )
    dense = r.to_dense()
    np.testing.assert_allclose(y, dense.T @ (dense @ x), rtol=1e-12, atol=1e-13)


# ---------------------------------------------------------------------------
# Assembly from pre-distributed triplets with row ghosts
# ---------------------------------------------------------------------------


def _shard_triplets_with_ghosts(a: CSRHost, n_dev: int, seed: int):
    """Distribute a's triplets over shards, deliberately misplacing ~30% of
    entries onto the WRONG shard (row ghosts) and splitting ~10% of entries
    into two partial contributions on different shards (overlapping
    additive assembly). The global matrix is never given to any one shard."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(a.nrows, dtype=np.int64), a.row_nnz())
    cols = a.colind.astype(np.int64)
    vals = a.values.copy()
    ranges = owner_ranges(a.nrows, n_dev)
    owner = np.searchsorted(ranges, rows, side="right") - 1

    # misplace entries: shard = (owner + shift) % n_dev for a random subset
    shift = np.where(rng.random(len(rows)) < 0.3,
                     rng.integers(1, n_dev, len(rows)), 0)
    shard = (owner + shift) % n_dev

    # split some entries into two halves on different shards
    split = rng.random(len(rows)) < 0.1
    rows2 = np.concatenate([rows, rows[split]])
    cols2 = np.concatenate([cols, cols[split]])
    vals2 = np.concatenate([np.where(split, vals * 0.25, vals), vals[split] * 0.75])
    shard2 = np.concatenate([shard, (shard[split] + 1) % n_dev])

    return [
        (rows2[shard2 == s], cols2[shard2 == s], vals2[shard2 == s])
        for s in range(n_dev)
    ]


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("symmetric", [False, True])
def test_from_shards_matches_global(n_dev, symmetric):
    a = random_csr(130, 130, 5, seed=40, symmetric=symmetric)
    trips = _shard_triplets_with_ghosts(a, n_dev, seed=41)
    A = build_dist_matrix_from_shards(
        trips, a.nrows, mesh=None, symmetric=symmetric
    )
    assert A.nnz_global == a.nnz
    x_host = np.random.default_rng(42).standard_normal(a.nrows)
    got = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x_host)))
    np.testing.assert_allclose(got, a.matvec(x_host), rtol=1e-11, atol=1e-12)


def test_from_shards_rectangular():
    a = random_csr(90, 150, 4, seed=44)
    trips = _shard_triplets_with_ghosts(a, 4, seed=45)
    A = build_dist_matrix_from_shards(trips, a.nrows, ncols_global=a.ncols)
    x_host = np.random.default_rng(46).standard_normal(a.ncols)
    got = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x_host)))
    np.testing.assert_allclose(got, a.matvec(x_host), rtol=1e-11, atol=1e-12)


def test_from_shards_validates_indices():
    with pytest.raises(ValueError, match="row index"):
        build_dist_matrix_from_shards(
            [(np.array([5]), np.array([0]), np.array([1.0])),
             (np.array([0]), np.array([0]), np.array([1.0]))],
            nrows_global=4,
        )


def test_transposed_prebuilt_operator():
    """A.transposed() returns a cached first-class DistMatrix whose matvec
    equals matvec_transpose — the pre-built form for hot loops (VERDICT r2
    item 7; reference transpmult was never implemented,
    reference spmv/Matrix.cpp:144-148)."""
    import jax

    from spmv_tpu.formats.csr import CSRHost
    from spmv_tpu.gen import random_csr
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = random_csr(300, 220, 4, seed=41)
    A = build_dist_matrix(a, n_devices=2)
    At = A.transposed()
    assert A.transposed() is At          # cached
    assert At.transposed() is A          # involution shares the cache
    assert (At.nrows_global, At.ncols_global) == (220, 300)
    x = np.random.default_rng(42).standard_normal(300)
    got = At.from_dist(
        jax.jit(lambda M, v: M.matvec(v))(At, At.to_dist(x))
    )
    want = a.to_dense().T @ x
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_transposed_symmetric_is_self():
    from spmv_tpu.gen import random_csr
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = random_csr(128, 128, 4, seed=43, symmetric=True, spd_shift=1.0)
    A = build_dist_matrix(a, n_devices=2, symmetric=True)
    assert A.transposed() is A


def test_transposed_dia_square():
    import jax

    from spmv_tpu.gen import create_laplace_1d
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    a = create_laplace_1d(4096, gamma=0.3)  # non-symmetric: gamma couples
    A = build_dist_matrix(a, n_devices=2, local_format="dia")
    At = A.transposed()
    assert At.local_format == "dia"
    x = np.random.default_rng(44).standard_normal(4096)
    got = At.from_dist(jax.jit(lambda M, v: M.matvec(v))(At, At.to_dist(x)))
    want = a.to_dense().T @ x
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
