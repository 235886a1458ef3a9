"""Matrix-powers kernel (parallel/powers.py): depth-s ghost plan + local
basis build == the naive s-exchange recurrence, with HLO-counted
collective savings."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.gen import create_laplace_2d, gaussian_bump, random_csr
from spmv_tpu.parallel.dist_matrix import build_dist_matrix
from spmv_tpu.parallel.powers import (
    build_powers_plan,
    chebyshev_powers_basis,
    powers_ghost_stats,
)
from spmv_tpu.solvers.cg_sstep import cg_sstep


def _naive_basis(A, x, c, e, s):
    vs = [x, (A.matvec(x) - c * x) / e]
    for _ in range(1, s):
        vs.append(2 * (A.matvec(vs[-1]) - c * vs[-1]) / e - vs[-2])
    return jnp.stack(vs)


@pytest.mark.parametrize("n_dev,s", [(1, 4), (4, 2), (8, 4), (8, 8)])
def test_powers_basis_matches_naive(n_dev, s):
    """The one-exchange basis equals s halo-exchanged matvecs to rounding
    — including configurations where the depth-s ghost region spans
    MULTIPLE neighbor shards (8 devices, 72 rows/shard, depth 8 reaches
    ~192 rows out)."""
    a = create_laplace_2d(24, 24)
    A = build_dist_matrix(a, n_devices=n_dev)
    pp = build_powers_plan(a, A, s=s)
    x = A.to_dist(gaussian_bump(a.nrows))
    c, e = 4.0, 4.2
    V = jax.jit(lambda p_, x_: chebyshev_powers_basis(p_, x_, c, e))(pp, x)
    Vn = jax.jit(lambda A_, x_: _naive_basis(A_, x_, c, e, s))(A, x)
    assert V.shape == (s + 1,) + x.shape
    np.testing.assert_allclose(np.asarray(V), np.asarray(Vn), atol=1e-13)


def test_powers_basis_general_sparsity():
    """Not stencil-specific: random banded-ish sparsity with off-band
    couplings still builds an exact basis (the BFS hop sets follow the
    actual pattern)."""
    a = random_csr(192, 192, 4, seed=3, symmetric=True, spd_shift=1.0)
    A = build_dist_matrix(a, n_devices=4)
    pp = build_powers_plan(a, A, s=3)
    x = A.to_dist(np.random.default_rng(0).standard_normal(a.nrows))
    c, e = 2.0, 2.5
    V = jax.jit(lambda p_, x_: chebyshev_powers_basis(p_, x_, c, e))(pp, x)
    Vn = jax.jit(lambda A_, x_: _naive_basis(A_, x_, c, e, 3))(A, x)
    np.testing.assert_allclose(np.asarray(V), np.asarray(Vn), atol=1e-12)


def test_powers_ghost_growth_linear_for_banded():
    """Stencil sparsity grows the ghost set ~linearly in s (the MPK sweet
    spot); the stats helper makes the cost visible."""
    a = create_laplace_2d(64, 64)
    A = build_dist_matrix(a, n_devices=8)
    pp = build_powers_plan(a, A, s=4)
    st = powers_ghost_stats(pp, A)
    # lap2d bandwidth 64: depth-1 ghosts = 64/side, depth-4 = 256/side
    assert st["nghost_pad_depth_s"] <= 5 * max(st["nghost_pad_depth_1"], 128)


def test_powers_cg_sstep_end_to_end():
    """cg_sstep with the MPK basis_builder: same iteration count and
    solution as the naive s-exchange build, fully converged."""
    a = create_laplace_2d(24, 24)
    A = build_dist_matrix(a, n_devices=8)
    pp = build_powers_plan(a, A, s=4)
    b_host = gaussian_bump(a.nrows)
    b = A.to_dist(b_host)
    r1 = jax.jit(
        lambda A_, p_, bb: cg_sstep(
            A_.as_linear_operator(), bb, s=4, kmax=400, rtol=1e-10,
            basis_builder=lambda r, c, e: chebyshev_powers_basis(p_, r, c, e))
    )(A, pp, b)
    r2 = jax.jit(
        lambda A_, bb: cg_sstep(A_.as_linear_operator(), bb, s=4,
                                kmax=400, rtol=1e-10))(A, b)
    assert bool(r1.converged)
    assert int(r1.iterations) == int(r2.iterations)
    x = A.from_dist(r1.x)
    assert np.linalg.norm(a.matvec(x) - b_host) / np.linalg.norm(b_host) \
        < 1e-9


def test_powers_fewer_collectives_in_hlo():
    """The communication contract: with shards deep enough that the
    depth-s region stays within one neighbor (512 rows/shard, depth-4
    reach 256), the loop body carries s-fold fewer collective-permutes
    than the naive build — one exchange per block."""
    a = create_laplace_2d(64, 64)
    A = build_dist_matrix(a, n_devices=8)
    pp = build_powers_plan(a, A, s=4)
    b = A.to_dist(gaussian_bump(a.nrows))

    def body_permutes(fn, args):
        hlo = jax.jit(fn).lower(*args).compile().as_text()
        return len([
            m for m in re.finditer(
                r".*collective-permute(?:-start)?\(.*", hlo)
            if "while/body" in m.group(0)
        ])

    n_mpk = body_permutes(
        lambda A_, p_, bb: cg_sstep(
            A_.as_linear_operator(), bb, s=4, kmax=8, rtol=1e-30,
            lambda_bounds=(0.0, 8.0),
            basis_builder=lambda r, c, e: chebyshev_powers_basis(p_, r, c, e)),
        (A, pp, b))
    n_naive = body_permutes(
        lambda A_, bb: cg_sstep(A_.as_linear_operator(), bb, s=4, kmax=8,
                                rtol=1e-30, lambda_bounds=(0.0, 8.0)),
        (A, b))
    assert n_mpk * 4 <= n_naive, (n_mpk, n_naive)


def test_powers_basis_two_tier_mesh():
    """Depth-s plan over a (dcn, ici) two-tier mesh: the deep ghosts ride
    the dcn-first schedule; basis matches the naive two-tier matvec
    recurrence."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dcn", "ici"))
    a = create_laplace_2d(24, 24)
    A = build_dist_matrix(a, mesh=mesh)
    pp = build_powers_plan(a, A, s=4)
    x = A.to_dist(gaussian_bump(a.nrows))
    c, e = 4.0, 4.2
    V = jax.jit(lambda p_, x_: chebyshev_powers_basis(p_, x_, c, e))(pp, x)
    Vn = jax.jit(lambda A_, x_: _naive_basis(A_, x_, c, e, 4))(A, x)
    np.testing.assert_allclose(np.asarray(V), np.asarray(Vn), atol=1e-13)


def test_powers_split_preconditioned_cacg():
    """Fully communication-avoiding PRECONDITIONED CG: form the FSAI
    split operator M = G A G^T explicitly (host csr_matmul), distribute
    it, compile a powers plan on M — the solve then runs one exchange +
    one reduction per s iterations AND converges in fewer iterations
    than unpreconditioned s-step on A."""
    from spmv_tpu.formats.csr import csr_matmul
    from spmv_tpu.solvers.fsai import fsai_setup

    a = create_laplace_2d(24, 24)
    g = fsai_setup(a)
    m = csr_matmul(csr_matmul(g, a), g.transpose())
    M = build_dist_matrix(m, n_devices=4)
    G = build_dist_matrix(g, n_devices=4)
    Gt = G.transposed()
    ppm = build_powers_plan(m, M, s=4)
    b_host = gaussian_bump(a.nrows)
    b = G.matvec(M.to_dist(b_host))  # G b in the split system

    res = jax.jit(
        lambda M_, p_, bb: cg_sstep(
            M_.as_linear_operator(), bb, s=4, kmax=400, rtol=1e-10,
            basis_builder=lambda r, c, e: chebyshev_powers_basis(
                p_, r, c, e))
    )(M, ppm, b)
    x = Gt.matvec(res.x)  # x = G^T y
    x_host = M.from_dist(x)
    assert bool(res.converged)
    rel = np.linalg.norm(a.matvec(x_host) - b_host) / np.linalg.norm(b_host)
    assert rel < 1e-8
    A = build_dist_matrix(a, n_devices=4)
    plain = jax.jit(
        lambda A_, bb: cg_sstep(A_.as_linear_operator(), bb, s=4,
                                kmax=400, rtol=1e-10)
    )(A, A.to_dist(b_host))
    assert int(res.iterations) < int(plain.iterations)


@pytest.mark.parametrize("n_dev,s", [(1, 4), (4, 3), (8, 4)])
def test_powers_basis_dia_matches_ell(n_dev, s):
    """DIA realization of the extended operator (the chip-speed path):
    the affine-window DiaMatrix build equals the ELL build and the naive
    recurrence exactly."""
    a = create_laplace_2d(24, 24)
    A = build_dist_matrix(a, n_devices=n_dev, local_format="dia")
    pp = build_powers_plan(a, A, s=s)  # auto -> dia for DIA operators
    assert pp.local_format == "dia"
    ppe = build_powers_plan(a, A, s=s, local_format="ell")
    assert ppe.local_format == "ell"
    x = A.to_dist(gaussian_bump(a.nrows))
    c, e = 4.0, 4.2
    V = jax.jit(lambda p_, x_: chebyshev_powers_basis(p_, x_, c, e))(pp, x)
    Ve = jax.jit(lambda p_, x_: chebyshev_powers_basis(p_, x_, c, e))(ppe, x)
    Vn = jax.jit(lambda A_, x_: _naive_basis(A_, x_, c, e, s))(A, x)
    np.testing.assert_allclose(np.asarray(V), np.asarray(Ve), atol=1e-13)
    np.testing.assert_allclose(np.asarray(V), np.asarray(Vn), atol=1e-13)


def test_powers_basis_dia_two_tier():
    """DIA powers plan over a (dcn, ici) mesh: the deep ghosts ride the
    two-tier schedule while the local applies run on the window DIA."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dcn", "ici"))
    a = create_laplace_2d(24, 24)
    A = build_dist_matrix(a, mesh=mesh, local_format="dia")
    pp = build_powers_plan(a, A, s=4)
    assert pp.local_format == "dia"
    x = A.to_dist(gaussian_bump(a.nrows))
    c, e = 4.0, 4.2
    V = jax.jit(lambda p_, x_: chebyshev_powers_basis(p_, x_, c, e))(pp, x)
    Vn = jax.jit(lambda A_, x_: _naive_basis(A_, x_, c, e, 4))(A, x)
    np.testing.assert_allclose(np.asarray(V), np.asarray(Vn), atol=1e-13)


def test_powers_dia_strict_and_auto_fallback():
    """Scrambled sparsity has too many distinct diagonals for a window
    DIA: strict 'dia' raises, 'auto' on a DIA-local operator would fall
    back to ELL (here the operator itself is ELL, so auto is ELL)."""
    rng = np.random.default_rng(7)
    n = 256
    a = random_csr(n, n, 6, seed=11, symmetric=True, spd_shift=1.0)
    A = build_dist_matrix(a, n_devices=4)
    with pytest.raises(ValueError, match="distinct diagonals"):
        build_powers_plan(a, A, s=2, local_format="dia")
    pp = build_powers_plan(a, A, s=2)
    assert pp.local_format == "ell"
    x = A.to_dist(rng.standard_normal(n))
    c, e = 2.0, 2.5
    V = jax.jit(lambda p_, x_: chebyshev_powers_basis(p_, x_, c, e))(pp, x)
    Vn = jax.jit(lambda A_, x_: _naive_basis(A_, x_, c, e, 2))(A, x)
    np.testing.assert_allclose(np.asarray(V), np.asarray(Vn), atol=1e-12)


def test_powers_dia_cg_sstep_end_to_end():
    """cg_sstep riding the DIA powers basis: converges to the same count
    as the naive build."""
    a = create_laplace_2d(24, 24)
    A = build_dist_matrix(a, n_devices=8, local_format="dia")
    pp = build_powers_plan(a, A, s=4)
    assert pp.local_format == "dia"
    b_host = gaussian_bump(a.nrows)
    b = A.to_dist(b_host)
    r1 = jax.jit(
        lambda A_, p_, bb: cg_sstep(
            A_.as_linear_operator(), bb, s=4, kmax=400, rtol=1e-10,
            basis_builder=lambda r, c, e: chebyshev_powers_basis(p_, r, c, e))
    )(A, pp, b)
    assert bool(r1.converged)
    x = A.from_dist(r1.x)
    assert np.linalg.norm(a.matvec(x) - b_host) / np.linalg.norm(b_host) \
        < 1e-9


def test_powers_plan_validation():
    a = create_laplace_2d(8, 8)
    A = build_dist_matrix(a, n_devices=2)
    with pytest.raises(ValueError, match="s must be"):
        build_powers_plan(a, A, s=0)
    rect = random_csr(64, 32, 3, seed=1)
    Ar = build_dist_matrix(rect, n_devices=2)
    with pytest.raises(ValueError, match="square"):
        build_powers_plan(rect, Ar, s=2)
