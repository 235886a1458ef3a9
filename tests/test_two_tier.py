"""Two-tier (DCN/ICI) halo exchange on 2-D virtual meshes.

The multi-slice analogue of the reference's on-node shared-memory vs
off-node split (reference spmv/L2GMap.cpp:723-865): same-slice pairs ride
the fast (ici) axis; cross-slice pairs route the slow (dcn) axis first.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import create_laplace_1d, create_laplace_2d, gaussian_bump, random_csr
from spmv_tpu.parallel.comm_plan import CommPlan2, compile_plan_two_tier
from spmv_tpu.parallel.dist_matrix import build_dist_matrix
from spmv_tpu.solvers.cg import cg


def mesh2(n_dcn, n_ici):
    devs = np.array(jax.devices()[: n_dcn * n_ici]).reshape(n_dcn, n_ici)
    return Mesh(devs, ("dcn", "ici"))


def test_two_tier_plan_classifies_pairs():
    """A ring over 8 shards on a 2x4 mesh: neighbor pairs within a slice go
    to the ICI tier, pairs crossing the slice boundary to the DCN tier."""
    from spmv_tpu.parallel.partition import owner_ranges

    n, nd = 64, 8
    ranges = owner_ranges(n, nd)
    # each shard needs the first element of the next shard (ring)
    ghosts = [np.array([ranges[(s + 1) % nd]]) for s in range(nd)]
    ghosts[-1] = np.array([0])
    plan = compile_plan_two_tier(ranges, ghosts, n_dcn=2, n_ici=4)
    assert isinstance(plan, CommPlan2)
    # within-slice ring hops: ici offset 3 means src+3 (mod 4)... the
    # forward ring (dest = owner - 1 direction) gives ici round offsets
    assert len(plan.rounds_ici) >= 1
    # shards 3->4 and 7->0 cross slices
    assert len(plan.rounds_dcn) >= 1
    for dd, di in plan.rounds_dcn:
        assert dd != 0


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (2, 2)])
@pytest.mark.parametrize("symmetric", [False, True])
def test_two_tier_matvec_oracle(shape, symmetric):
    a = create_laplace_2d(13, 11)
    A = build_dist_matrix(a, mesh=mesh2(*shape), symmetric=symmetric)
    assert isinstance(A.plan, CommPlan2)
    x_host = np.random.default_rng(77).standard_normal(a.nrows)
    got = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x_host)))
    want = a.matvec(x_host)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_two_tier_random_matrix(shape):
    """Random sparsity: ghosts span many shards -> both tiers exercised with
    multiple rounds each."""
    a = random_csr(97, 97, 6, seed=50)
    A = build_dist_matrix(a, mesh=mesh2(*shape))
    assert len(A.plan.rounds_dcn) > 0 and len(A.plan.rounds_ici) > 0
    x_host = np.random.default_rng(51).standard_normal(a.nrows)
    got = A.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A, A.to_dist(x_host)))
    want = a.matvec(x_host)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


def test_two_tier_matches_one_tier_bitwise():
    """The two-tier schedule must deliver the same ghost values as the 1-D
    plan — results agree bitwise (same summation order per shard)."""
    a = create_laplace_1d(111, gamma=0.4)
    x_host = np.random.default_rng(5).standard_normal(a.nrows)
    A1 = build_dist_matrix(a, n_devices=8)
    A2 = build_dist_matrix(a, mesh=mesh2(2, 4))
    y1 = A1.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A1, A1.to_dist(x_host)))
    y2 = A2.from_dist(jax.jit(lambda A_, x_: A_.matvec(x_))(A2, A2.to_dist(x_host)))
    np.testing.assert_array_equal(y1, y2)


def test_two_tier_transpose():
    a = random_csr(80, 80, 5, seed=60)
    A = build_dist_matrix(a, mesh=mesh2(2, 4))
    x_host = np.random.default_rng(61).standard_normal(80)
    got = A.from_dist(
        jax.jit(lambda A_, x_: A_.matvec_transpose(x_))(
            A, A.to_dist(x_host, side="row")
        ),
        side="col",
    )
    want = a.to_dense().T @ x_host
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


def test_two_tier_cg():
    """Distributed CG over a 2-D mesh: psum dots + two-tier halo."""
    a = create_laplace_2d(16, 16)
    A = build_dist_matrix(a, mesh=mesh2(2, 4), symmetric=True)
    b_host = gaussian_bump(a.nrows)
    res = jax.jit(
        lambda A_, bb: cg(A_.as_linear_operator(), bb, kmax=300, rtol=1e-10)
    )(A, A.to_dist(b_host))
    x_host = A.from_dist(res.x)
    r = a.matvec(x_host) - b_host
    assert np.linalg.norm(r) / np.linalg.norm(b_host) < 1e-9
    assert bool(res.converged)
