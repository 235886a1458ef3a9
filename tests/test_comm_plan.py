"""CommPlan compilation + halo exchange on a virtual multi-device mesh.

The distributed analogue of the reference's L2GMap behavior, tested at
np in {1, 2, 4, 8} like ctest's np sweep (reference tests/CMakeLists.txt:22-30).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spmv_tpu.parallel.comm_plan import compile_plan, halo_gather, halo_scatter_add
from spmv_tpu.parallel.partition import owner_ranges, owner_of, partition_csr
from spmv_tpu.gen import random_csr


def test_owner_ranges_near_equal():
    r = owner_ranges(10, 4)
    np.testing.assert_array_equal(r, [0, 3, 6, 8, 10])
    assert owner_of(r, np.array([0, 2, 3, 7, 9])).tolist() == [0, 0, 1, 2, 3]


def test_compile_plan_rejects_local_ghost():
    ranges = np.array([0, 5, 10])
    with pytest.raises(ValueError, match="owned range"):
        compile_plan(ranges, [np.array([3]), np.array([0])])


def test_compile_plan_rejects_out_of_range():
    ranges = np.array([0, 5, 10])
    with pytest.raises(ValueError, match="global range"):
        compile_plan(ranges, [np.array([12]), np.array([], dtype=np.int64)])


def _run_halo(n_dev, ghost_lists, global_size):
    """Compile a plan, run the forward halo on [0..global) identity data, and
    return each shard's received ghost buffer."""
    ranges = owner_ranges(global_size, n_dev)
    plan = compile_plan(ranges, ghost_lists)
    r = plan.nlocal_pad
    devs = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devs), ("shards",))

    xg = np.zeros((n_dev, r))
    for s in range(n_dev):
        n_s = int(ranges[s + 1] - ranges[s])
        xg[s, :n_s] = np.arange(ranges[s], ranges[s + 1], dtype=np.float64)
    x = jax.device_put(jnp.asarray(xg.reshape(-1)), NamedSharding(mesh, P("shards")))

    def f(x_s, send_idx, recv_pos):
        g = halo_gather(
            x_s.reshape(r), send_idx[0], recv_pos[0], plan.rounds,
            plan.n_devices, plan.nghost_pad, "shards",
        )
        return g

    g = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("shards"), P("shards", None, None), P("shards", None, None)),
        out_specs=P("shards"),
    )(x, plan.send_idx, plan.recv_pos)
    return np.asarray(g).reshape(n_dev, plan.nghost_pad), plan


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_halo_gather_ring_neighbors(n_dev):
    """Each shard ghosts the last element of its left neighbor and the first
    of its right (the 1-D Laplacian pattern)."""
    gsize = 8 * n_dev
    ranges = owner_ranges(gsize, n_dev)
    ghost_lists = []
    for s in range(n_dev):
        g = []
        if s > 0:
            g.append(ranges[s] - 1)
        if s < n_dev - 1:
            g.append(ranges[s + 1])
        ghost_lists.append(np.array(sorted(g), dtype=np.int64))
    got, plan = _run_halo(n_dev, ghost_lists, gsize)
    for s in range(n_dev):
        for j, gidx in enumerate(ghost_lists[s]):
            assert got[s, j] == float(gidx), (s, j, gidx, got[s])


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("seed", [0, 1])
def test_halo_gather_random_pattern(n_dev, seed):
    """Arbitrary all-to-all ghost patterns, including far neighbors."""
    gsize = 5 * n_dev + 3
    ranges = owner_ranges(gsize, n_dev)
    rng = np.random.default_rng(seed)
    ghost_lists = []
    for s in range(n_dev):
        owned = set(range(int(ranges[s]), int(ranges[s + 1])))
        cand = np.array([i for i in range(gsize) if i not in owned])
        k = rng.integers(0, min(7, len(cand)) + 1)
        ghost_lists.append(np.unique(rng.choice(cand, size=k, replace=False)))
    got, plan = _run_halo(n_dev, ghost_lists, gsize)
    for s in range(n_dev):
        for j, gidx in enumerate(ghost_lists[s]):
            assert got[s, j] == float(gidx), (s, ghost_lists[s], got[s])
        # padding slots untouched (zero)
        np.testing.assert_array_equal(got[s, len(ghost_lists[s]):], 0.0)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_halo_scatter_add_reverses_gather(n_dev):
    """reverse(forward) accumulates each ghost contribution into its owner:
    putting 1.0 in every ghost slot must add (number of ghosting shards) to
    each owned index — L2GMap::reverse_update semantics
    (reference spmv/L2GMap.cpp:907-959)."""
    gsize = 6 * n_dev
    ranges = owner_ranges(gsize, n_dev)
    rng = np.random.default_rng(3)
    ghost_lists = []
    for s in range(n_dev):
        owned = set(range(int(ranges[s]), int(ranges[s + 1])))
        cand = np.array([i for i in range(gsize) if i not in owned])
        ghost_lists.append(np.unique(rng.choice(cand, size=4, replace=False)))
    plan = compile_plan(ranges, ghost_lists)
    r = plan.nlocal_pad
    devs = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devs), ("shards",))

    def f(send_idx, recv_pos, nghosts):
        slot = jnp.arange(plan.nghost_pad)
        gz = jnp.where(slot < nghosts[0], 1.0, 0.0)
        y = jnp.zeros((r,))
        return halo_scatter_add(
            gz, y, send_idx[0], recv_pos[0], plan.rounds, plan.n_devices, "shards"
        )

    y = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("shards", None, None), P("shards", None, None), P("shards")),
        out_specs=P("shards"),
    )(plan.send_idx, plan.recv_pos, plan.nghosts)
    y = np.asarray(y).reshape(n_dev, r)

    want = np.zeros(gsize)
    for s in range(n_dev):
        for gidx in ghost_lists[s]:
            want[gidx] += 1.0
    for s in range(n_dev):
        n_s = int(ranges[s + 1] - ranges[s])
        np.testing.assert_allclose(y[s, :n_s], want[ranges[s]:ranges[s + 1]])
        np.testing.assert_allclose(y[s, n_s:], 0.0)


def test_partition_csr_reassembles():
    a = random_csr(37, 37, 5, seed=40)
    shards = partition_csr(a, 4)
    ranges = owner_ranges(37, 4)
    dense = a.to_dense()
    for s, sh in enumerate(shards):
        r0, r1 = sh.row_range
        block = np.zeros((r1 - r0, 37))
        block[:, r0:r1] += sh.local.to_dense()
        if sh.nghosts:
            rem = sh.remote.to_dense()[:, : sh.nghosts]
            block[:, sh.ghosts] += rem
        np.testing.assert_allclose(block, dense[r0:r1])


def test_partition_csr_symmetric_classification():
    """local = strict lower in-range, remote = lower out-of-range, diag dense
    (reference Matrix.cpp:337-349 rules)."""
    a = random_csr(24, 24, 4, seed=41, symmetric=True)
    shards = partition_csr(a, 3, symmetric=True)
    dense = a.to_dense()
    for s, sh in enumerate(shards):
        r0, r1 = sh.row_range
        np.testing.assert_allclose(sh.diagonal, np.diag(dense)[r0:r1])
        block = np.zeros((r1 - r0, 24))
        block[:, r0:r1] += sh.local.to_dense()
        if sh.nghosts:
            block[:, sh.ghosts] += sh.remote.to_dense()[:, : sh.nghosts]
        lower = np.tril(dense[r0:r1], r0 - 1)
        np.testing.assert_allclose(block, lower)
        # every remote (ghost) column is strictly below the diagonal
        assert all(g < r0 for g in sh.ghosts)


def test_plan_stats_and_inefficiency_warning(caplog):
    """Round/padding accounting (plan_stats) + the assembly-time warning for
    scatter-heavy ghost patterns."""
    import logging
    from spmv_tpu.parallel.comm_plan import compile_plan, plan_stats
    from spmv_tpu.parallel.partition import owner_ranges

    # ring pattern: 1 round, no waste
    ranges = owner_ranges(64, 8)
    ghosts = [np.array([int(ranges[(s + 1) % 8]) % 64]) for s in range(8)]
    plan = compile_plan(ranges, ghosts)
    s = plan_stats(plan)
    assert s["rounds"] == 1 and s["padding_waste"] < 0.9

    # scattered pattern: every shard needs one element of every other shard
    # -> 7 rounds; plus one shard needing MANY elements pads all rounds
    rng = np.random.default_rng(0)
    ghosts = []
    for s_ in range(8):
        own = set(range(int(ranges[s_]), int(ranges[s_ + 1])))
        g = sorted(set(range(64)) - own)
        ghosts.append(np.array(g[:: 2 if s_ else 1]))
    with caplog.at_level(logging.WARNING, logger="spmv_tpu"):
        plan = compile_plan(ranges, ghosts)
    s = plan_stats(plan)
    assert s["rounds"] >= 7
    assert any("halo plan" in r.message for r in caplog.records) or s["padding_waste"] < 0.75


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_halo_gather_block_matches_per_column(n_dev):
    """Block-capable halo_gather: an (nlocal_pad, nrhs) block gathered in
    one ppermute set per round equals nrhs per-column gathers exactly."""
    import jax

    rng = np.random.default_rng(300 + n_dev)
    nlocal = 32
    ranges = np.arange(n_dev + 1) * nlocal
    ghosts = []
    for s in range(n_dev):
        lo, hi = ranges[s], ranges[s + 1]
        cand = np.setdiff1d(
            rng.choice(ranges[-1], size=10, replace=False),
            np.arange(lo, hi),
        )
        ghosts.append(np.sort(cand))
    plan = compile_plan(ranges, ghosts)
    x_glob = rng.standard_normal((ranges[-1], 3))

    def run(nrhs_slice):
        def per_shard(xs, si, rp):
            return halo_gather(xs[0], si[0], rp[0], plan.rounds,
                               plan.n_devices, plan.nghost_pad)
        import jax.numpy as jnp
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shards",))
        xsh = x_glob.reshape(n_dev, plan.nlocal_pad, 3)
        if nrhs_slice is not None:
            xsh = xsh[..., nrhs_slice]
        return np.asarray(jax.jit(jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("shards"), P("shards"), P("shards")),
            out_specs=P("shards"), check_vma=False,
        ))(jnp.asarray(xsh), plan.send_idx, plan.recv_pos))

    blk = run(None)  # (n_dev*nghost_pad, 3)
    for r in range(3):
        col = run(r)
        np.testing.assert_array_equal(blk.reshape(n_dev, -1, 3)[..., r],
                                      col.reshape(n_dev, -1))
