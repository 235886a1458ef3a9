"""Algebraic multigrid preconditioner (solvers/amg.py).

The reference ships only a bit-rotted restrict/prolongate demo
(reference demos/restrictmain.cpp:60-91) and no multilevel solver; these
tests pin down the real thing: Galerkin consistency, transfer adjointness,
mesh-independent PCG counts, and distribution parity across mesh shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spmv_tpu.formats.csr import CSRHost
from spmv_tpu.gen import create_laplace_2d, gaussian_bump, random_csr
from spmv_tpu.parallel.dist_matrix import build_dist_matrix
from spmv_tpu.solvers.amg import (
    AMGHierarchy,
    _prolong,
    _restrict,
    amg_preconditioner,
    amg_setup,
)
from spmv_tpu.solvers.cg import cg


def _solve(A, b, h, kmax=100, rtol=1e-8):
    res = jax.jit(
        lambda A_, b_, h_: cg(A_.as_linear_operator(), b_, kmax=kmax,
                              rtol=rtol,
                              preconditioner=h_.as_preconditioner())
    )(A, A.to_dist(b), h)
    return res, A.from_dist(res.x)


@pytest.mark.parametrize("n_dev", [1, 8])
def test_amg_pcg_beats_plain_cg(n_dev):
    a = create_laplace_2d(48, 48, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=n_dev, dtype=np.float32)
    b = gaussian_bump(a.nrows, dtype=np.float32)
    h = amg_setup(a, A)
    res, x = _solve(A, b, h, rtol=1e-6)
    assert bool(res.converged)
    plain = jax.jit(
        lambda A_, b_: cg(A_.as_linear_operator(), b_, kmax=400, rtol=1e-6)
    )(A, A.to_dist(b))
    assert int(res.iterations) * 3 < int(plain.iterations)
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 5e-5, rel


def test_amg_mesh_independent_iterations():
    """Smoothed aggregation: iteration counts must not grow with
    resolution (the property that makes AMG optimal-order)."""
    iters = {}
    for nx in (64, 128):
        a = create_laplace_2d(nx, nx, dtype=np.float32)
        A = build_dist_matrix(a, n_devices=8, dtype=np.float32)
        h = amg_setup(a, A)
        res, _ = _solve(A, gaussian_bump(a.nrows, dtype=np.float32), h,
                        rtol=1e-6)
        assert bool(res.converged)
        iters[nx] = int(res.iterations)
    assert iters[128] <= iters[64] + 4, iters


def test_amg_unsmoothed_with_overcorrection():
    a = create_laplace_2d(48, 48, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=8, dtype=np.float32)
    h = amg_setup(a, A, smooth=False, passes=2, omega=1.7)
    # unsmoothed levels carry gather tables, not operators
    assert all(l.P is None and l.restrict_tab is not None for l in h.levels)
    res, x = _solve(A, gaussian_bump(a.nrows, dtype=np.float32), h,
                    rtol=1e-6)
    assert bool(res.converged) and int(res.iterations) <= 40
    b = gaussian_bump(a.nrows, dtype=np.float32)
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 5e-5, rel


def test_transfer_adjointness_and_galerkin():
    """<R r, xc> == <r, P xc> (P0 transfers are exact transposes) and the
    coarse operator equals P0^T A P0 computed densely on host."""
    a = create_laplace_2d(28, 28, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=4, dtype=np.float32)
    h = amg_setup(a, A, smooth=False, passes=2, coarse_max=8)
    lvl = h.levels[0]
    rng = np.random.default_rng(3)
    nc = h.levels[1].A.nrows_global if len(h.levels) > 1 else \
        h.coarse_A.nrows_global
    r_h = rng.standard_normal(a.nrows).astype(np.float32)
    xc_h = rng.standard_normal(nc).astype(np.float32)
    r = lvl.A.to_dist(r_h)
    A_c = h.levels[1].A if len(h.levels) > 1 else h.coarse_A
    xc = A_c.to_dist(xc_h)
    Rr = A_c.from_dist(jax.jit(lambda h_, v: _restrict(h_.levels[0], v))(h, r))
    Pxc = lvl.A.from_dist(jax.jit(lambda h_, v: _prolong(h_.levels[0], v))(h, xc))
    lhs = float(np.dot(Rr.astype(np.float64), xc_h))
    rhs = float(np.dot(r_h.astype(np.float64), Pxc))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1.0), (lhs, rhs)

    # Galerkin: A_c == P0^T A P0 densely, with P0 from the prolong table
    prolong = np.asarray(lvl.prolong_tab)  # (D, row_pad)
    nd, rp = prolong.shape
    from spmv_tpu.parallel.partition import owner_ranges
    ranges = owner_ranges(a.nrows, nd)
    ncs = A_c.nrows_global // nd
    p0 = np.zeros((a.nrows, A_c.nrows_global))
    for s in range(nd):
        for l in range(int(ranges[s + 1] - ranges[s])):
            p0[ranges[s] + l, s * ncs + prolong[s, l]] = 1.0
    want = p0.T @ a.to_dense().astype(np.float64) @ p0
    got = A_c_dense = _dist_to_dense(A_c)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _dist_to_dense(A):
    n = A.nrows_global
    cols = np.eye(n, dtype=np.float32)
    out = np.zeros((n, n), np.float64)
    mv = jax.jit(lambda A_, v: A_.matvec(v))
    for j in range(n):
        out[:, j] = A.from_dist(mv(A, A.to_dist(cols[:, j])))[:n]
    return out


def test_amg_smoothed_galerkin_consistency():
    """Smoothed path: the device coarse operator must equal P^T A P with
    the SAME P the device prolongation applies."""
    a = create_laplace_2d(24, 24, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=4, dtype=np.float32)
    h = amg_setup(a, A, smooth=True, passes=1, coarse_max=8)
    lvl = h.levels[0]
    assert lvl.P is not None and lvl.R is not None
    A_c = h.levels[1].A if len(h.levels) > 1 else h.coarse_A
    nc = A_c.nrows_global
    # dense P via prolongation applies
    p = np.zeros((a.nrows, nc))
    mv = jax.jit(lambda h_, v: _prolong(h_.levels[0], v))
    eye = np.eye(nc, dtype=np.float32)
    for j in range(nc):
        p[:, j] = lvl.A.from_dist(mv(h, A_c.to_dist(eye[:, j])))[: a.nrows]
    want = p.T @ a.to_dense().astype(np.float64) @ p
    got = _dist_to_dense(A_c)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_amg_two_tier_mesh():
    devs = jax.devices()[:8]
    mesh2 = Mesh(np.array(devs).reshape(2, 4), ("dcn", "ici"))
    a = create_laplace_2d(48, 48, dtype=np.float32)
    A = build_dist_matrix(a, mesh=mesh2, dtype=np.float32)
    h = amg_setup(a, A)
    b = gaussian_bump(a.nrows, dtype=np.float32)
    res, x = _solve(A, b, h, rtol=1e-6)
    assert bool(res.converged)
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 5e-5, rel


def test_amg_accelerates_f64_outer():
    """An f64 outer solve gets the f32 cycle via casts — and still reaches
    f64-class residuals (preconditioning never limits attainable rtol)."""
    a = create_laplace_2d(32, 32)  # f64 under x64
    A = build_dist_matrix(a, n_devices=4, dtype=np.float64)
    h = amg_setup(a, A)
    b = gaussian_bump(a.nrows)
    res, x = _solve(A, b, h, kmax=60, rtol=1e-12)
    assert bool(res.converged)
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-11, rel


def test_amg_chebyshev_coarse_fallback():
    """dense_cap=0 forces the reduction-free coarse fallback."""
    a = create_laplace_2d(32, 32, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=4, dtype=np.float32)
    h = amg_setup(a, A, dense_cap=0, coarse_iters=32)
    assert h.coarse_inv is None
    res, _ = _solve(A, gaussian_bump(a.nrows, dtype=np.float32), h,
                    kmax=200, rtol=1e-6)
    assert bool(res.converged)


def test_amg_wcycle_and_convenience():
    a = create_laplace_2d(32, 32, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=4, dtype=np.float32)
    apply_m, h = amg_preconditioner(a, A, cycle=2)
    assert isinstance(h, AMGHierarchy) and h.cycle == 2
    res = jax.jit(
        lambda A_, b_, h_: cg(A_.as_linear_operator(), b_, kmax=60,
                              rtol=1e-6,
                              preconditioner=h_.as_preconditioner())
    )(A, A.to_dist(gaussian_bump(a.nrows, dtype=np.float32)), h)
    assert bool(res.converged)


def test_amg_rejects_rectangular():
    rows = np.array([0, 1]); cols = np.array([0, 1])
    a = CSRHost.from_coo(rows, cols, np.ones(2), 2, 3)
    A = build_dist_matrix(create_laplace_2d(8, 8), n_devices=1)
    with pytest.raises(ValueError, match="square"):
        amg_setup(a, A)


def test_amg_general_spd_unstructured():
    """Not just stencils: a random SPD matrix (shifted symmetric random
    sparsity) through the default SA hierarchy."""
    a0 = random_csr(1500, 1500, 5, seed=11, symmetric=True, spd_shift=6.0)
    a = CSRHost(a0.rowptr, a0.colind, a0.values.astype(np.float32), a0.ncols)
    A = build_dist_matrix(a, n_devices=4, dtype=np.float32)
    h = amg_setup(a, A, coarse_max=256)
    b = gaussian_bump(a.nrows, dtype=np.float32)
    res, x = _solve(A, b, h, kmax=120, rtol=1e-6)
    assert bool(res.converged)
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-5, rel


def test_native_pairwise_pass_matches_numpy():
    """The native matching pass must reproduce the numpy tier exactly:
    same aggregates, same count — including on constant-weight graphs
    where only the (prio, last-occurrence) tie-breaking decides."""
    import spmv_tpu.native.lib as NL
    from spmv_tpu.solvers.amg import _pairwise_pass

    if not NL.native_available():
        pytest.skip("native tier unavailable")

    def coo(a):
        rows = np.repeat(np.arange(a.nrows, dtype=np.int64), a.row_nnz())
        return rows, a.colind.astype(np.int64), a.values.astype(np.float64)

    cases = [coo(create_laplace_2d(32)),
             coo(random_csr(500, 500, 5, seed=3, symmetric=True))]
    r3, c3, v3 = coo(create_laplace_2d(20))
    cases.append((r3, c3, np.ones_like(v3)))  # pure tie-breaking stress
    for k, (r, c, v) in enumerate(cases):
        n = int(max(r.max(), c.max())) + 1
        an, ncn = _pairwise_pass(r, c, v, n, seed=42)
        orig = NL.get_lib
        NL.get_lib = lambda: None
        try:
            ap, ncp = _pairwise_pass(r, c, v, n, seed=42)
        finally:
            NL.get_lib = orig
        assert ncn == ncp, (k, ncn, ncp)
        np.testing.assert_array_equal(an, ap, err_msg=f"case {k}")


# ---------------------------------------------------------------------------
# interval aggregation (aggregate="interval"): reshape transfers + implicit
# prolongator smoothing through the level's own kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_dev", [1, 8])
def test_amg_interval_pcg(n_dev):
    a = create_laplace_2d(49, 47, dtype=np.float32)  # odd, non-square grid
    A = build_dist_matrix(a, n_devices=n_dev, dtype=np.float32)
    b = gaussian_bump(a.nrows, dtype=np.float32)
    h = amg_setup(a, A, aggregate="interval", local_format="dia")
    assert all(lvl.interval == 2 for lvl in h.levels)
    res, x = _solve(A, b, h, rtol=1e-6)
    assert bool(res.converged)
    plain = jax.jit(
        lambda A_, b_: cg(A_.as_linear_operator(), b_, kmax=400, rtol=1e-6)
    )(A, A.to_dist(b))
    assert int(res.iterations) * 3 < int(plain.iterations)
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 5e-5, rel


def test_amg_interval_adjoint_and_galerkin_consistency():
    """The implicit transfers must satisfy R = P^T exactly (SPD M) and the
    assembled coarse operator must equal P^T A P with the SAME implicit P
    the cycle applies — the consistency that lets apply skip storing P."""
    a = create_laplace_2d(26, 26, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=4, dtype=np.float32)
    h = amg_setup(a, A, aggregate="interval", coarse_max=8)
    lvl = h.levels[0]
    assert lvl.interval == 2 and lvl.omega_p > 0
    assert lvl.P is None and lvl.prolong_tab is None
    A_c = h.levels[1].A if len(h.levels) > 1 else h.coarse_A
    nc = A_c.nrows_global
    rng = np.random.default_rng(5)
    r_h = rng.standard_normal(a.nrows).astype(np.float32)
    xc_h = rng.standard_normal(nc).astype(np.float32)
    Rr = A_c.from_dist(jax.jit(
        lambda h_, v: _restrict(h_.levels[0], v))(h, lvl.A.to_dist(r_h)))
    Pxc = lvl.A.from_dist(jax.jit(
        lambda h_, v: _prolong(h_.levels[0], v))(h, A_c.to_dist(xc_h)))
    lhs = float(np.dot(Rr.astype(np.float64), xc_h))
    rhs = float(np.dot(r_h.astype(np.float64), Pxc))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1.0), (lhs, rhs)

    # Galerkin: dense P from implicit prolongation applies
    p = np.zeros((a.nrows, nc))
    mv = jax.jit(lambda h_, v: _prolong(h_.levels[0], v))
    eye = np.eye(nc, dtype=np.float32)
    for j in range(nc):
        p[:, j] = lvl.A.from_dist(mv(h, A_c.to_dist(eye[:, j])))[: a.nrows]
    want = p.T @ a.to_dense().astype(np.float64) @ p
    got = _dist_to_dense(A_c)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# interval2d: 2-D grid-block aggregation (the headline bench config) —
# composed reshape transfers, bounded coarse stencils, mesh-independence
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_dev", [1, 8])
def test_amg_interval2d_pcg(n_dev):
    a = create_laplace_2d(73, 71, dtype=np.float32)  # odd, non-square grid
    A = build_dist_matrix(a, n_devices=n_dev, dtype=np.float32)
    b = gaussian_bump(a.nrows, dtype=np.float32)
    h = amg_setup(a, A, aggregate="interval2d", local_format="dia",
                  coarse_max=1200)
    assert h.levels[0].stride > 1  # grid detected -> 2-D blocks
    res, x = _solve(A, b, h, rtol=1e-6)
    assert bool(res.converged)
    rel = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 2e-4, rel  # fp32 recomputed true residual


def test_amg_interval2d_adjoint_and_galerkin_consistency():
    """R = P^T exactly and the assembled coarse operator equals
    P^T A P with the SAME implicit P the cycle applies — for the
    composed 2-D (y-strided then x-consecutive) reshape transfers."""
    a = create_laplace_2d(26, 26, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=4, dtype=np.float32)
    h = amg_setup(a, A, aggregate="interval2d", coarse_max=8)
    lvl = h.levels[0]
    assert lvl.stride > 1 and lvl.omega_p > 0
    A_c = h.levels[1].A if len(h.levels) > 1 else h.coarse_A
    nc = A_c.nrows_global
    rng = np.random.default_rng(6)
    r_h = rng.standard_normal(a.nrows).astype(np.float32)
    xc_h = rng.standard_normal(nc).astype(np.float32)
    Rr = A_c.from_dist(jax.jit(
        lambda h_, v: _restrict(h_.levels[0], v))(h, lvl.A.to_dist(r_h)))
    Pxc = lvl.A.from_dist(jax.jit(
        lambda h_, v: _prolong(h_.levels[0], v))(h, A_c.to_dist(xc_h)))
    lhs = float(np.dot(Rr.astype(np.float64), xc_h))
    rhs = float(np.dot(r_h.astype(np.float64), Pxc))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1.0), (lhs, rhs)

    p = np.zeros((a.nrows, nc))
    mv = jax.jit(lambda h_, v: _prolong(h_.levels[0], v))
    eye = np.eye(nc, dtype=np.float32)
    for j in range(nc):
        p[:, j] = lvl.A.from_dist(mv(h, A_c.to_dist(eye[:, j])))[: a.nrows]
    want = p.T @ a.to_dense().astype(np.float64) @ p
    got = _dist_to_dense(A_c)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_amg_interval2d_bounded_stencil():
    """Coarsening both directions per level keeps every Galerkin coarse
    operator's stencil bounded (~9-point) — the property one-direction
    semicoarsening lacked (measured 138 nnz/row by level 3)."""
    a = create_laplace_2d(256, 256, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=1, local_format="dia",
                          dtype=np.float32)
    h = amg_setup(a, A, aggregate="interval2d", interval_size=4,
                  local_format="dia")
    for lvl in h.levels[1:]:
        nnz_per_row = lvl.A.nnz_global / lvl.A.nrows_global
        assert nnz_per_row <= 15, nnz_per_row
    assert all(lvl.smoothed for lvl in h.levels)  # budget never trips


def test_amg_interval2d_3d_grid():
    """3-D grids: _detect_strides finds [nx, nx*ny] and the transfers run
    a three-stage (z, y, x) reshape chain; interval_size=4 keeps the
    smoothed stencil bounded in 3-D too (3/4 < 1 per direction)."""
    from spmv_tpu.corpus import stencil27_3d
    from spmv_tpu.solvers.amg import _detect_strides

    a = stencil27_3d(24)
    assert _detect_strides(a) == [24, 576]
    A = build_dist_matrix(a, n_devices=1, local_format="dia",
                          dtype=np.float32, dia_max_diags=64)
    h = amg_setup(a, A, aggregate="interval2d", interval_size=4, cycle=2,
                  local_format="dia", coarse_max=256)
    lvl = h.levels[0]
    assert lvl.stride == 24 and lvl.stride2 == 576
    res, x = _solve(A, gaussian_bump(a.nrows, dtype=np.float32), h,
                    rtol=1e-6, kmax=60)
    assert bool(res.converged)
    rel = np.linalg.norm(a.matvec(x) - gaussian_bump(
        a.nrows, dtype=np.float32)) / np.linalg.norm(
        gaussian_bump(a.nrows, dtype=np.float32))
    assert rel < 2e-4, rel


def test_amg_interval2d_3d_adjointness():
    """R = P^T for the three-stage transfer chain."""
    from spmv_tpu.corpus import stencil27_3d

    a = stencil27_3d(16)
    A = build_dist_matrix(a, n_devices=4, local_format="ell",
                          dtype=np.float32)
    h = amg_setup(a, A, aggregate="interval2d", interval_size=2,
                  coarse_max=8, max_levels=2, galerkin_budget=1e9)
    lvl = h.levels[0]
    assert lvl.stride2 > 1
    A_c = h.levels[1].A if len(h.levels) > 1 else h.coarse_A
    nc = A_c.nrows_global
    rng = np.random.default_rng(9)
    r_h = rng.standard_normal(a.nrows).astype(np.float32)
    xc_h = rng.standard_normal(nc).astype(np.float32)
    Rr = A_c.from_dist(jax.jit(
        lambda h_, v: _restrict(h_.levels[0], v))(h, lvl.A.to_dist(r_h)))
    Pxc = lvl.A.from_dist(jax.jit(
        lambda h_, v: _prolong(h_.levels[0], v))(h, A_c.to_dist(xc_h)))
    lhs = float(np.dot(Rr.astype(np.float64), xc_h))
    rhs = float(np.dot(r_h.astype(np.float64), Pxc))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1.0), (lhs, rhs)


def test_amg_interval2d_mesh_independent_1024():
    """VERDICT r4 item 3 'Done' criterion: mesh-independence of the EXACT
    bench config (interval2d, interval_size=4, cycle=2, dia) up to
    1024^2 — iteration counts must stay flat, not double per refinement
    (the round-4 interval config measured 22 -> 44 -> 97 here)."""
    iters = {}
    for nx in (256, 1024):
        a = create_laplace_2d(nx, nx, dtype=np.float32)
        A = build_dist_matrix(a, n_devices=1, local_format="dia",
                              dtype=np.float32)
        h = amg_setup(a, A, aggregate="interval2d", interval_size=4,
                      cycle=2, local_format="dia")
        res, _ = _solve(A, gaussian_bump(a.nrows, dtype=np.float32), h,
                        rtol=1e-6, kmax=60)
        assert bool(res.converged), nx
        iters[nx] = int(res.iterations)
    assert iters[1024] <= iters[256] + 4, iters
    assert iters[1024] <= 16, iters


def test_amg_interval_hybrid_smooth_levels():
    """smooth_levels caps prolongator smoothing depth: deeper levels use
    the unsmoothed P0 (bounded stencil) with a 1.7 over-relaxed
    correction, and the cycle still converges fast."""
    a = create_laplace_2d(64, 64, dtype=np.float32)
    A = build_dist_matrix(a, n_devices=4, dtype=np.float32)
    h = amg_setup(a, A, aggregate="interval", smooth_levels=1,
                  local_format="dia", coarse_max=256)
    assert h.levels[0].omega_p > 0 and h.levels[0].omega_c == 0.0
    assert any(lvl.omega_p == 0.0 and lvl.omega_c == 1.7
               for lvl in h.levels[1:])
    res, x = _solve(A, gaussian_bump(a.nrows, dtype=np.float32), h,
                    rtol=1e-6, kmax=120)
    assert bool(res.converged)
