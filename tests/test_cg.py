"""CG solver tests — coverage the reference never had (SURVEY.md section 4:
"What is NOT tested: CG")."""
import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats.dia import csr_to_dia
from spmv_tpu.formats.ell import csr_to_ell
from spmv_tpu.gen import create_laplace_1d, create_laplace_2d, gaussian_bump, random_csr
from spmv_tpu.ops.spmv_dia import spmv_dia
from spmv_tpu.ops.spmv_ell import spmv_ell
from spmv_tpu.solvers.cg import cg, cg_residual_history


def padded(b, n):
    return jnp.asarray(np.pad(b, (0, n - len(b))))


def test_cg_laplace_1d_to_reference_tolerance():
    """Demo-parity solve: rtol 1e-10, kmax 100 (reference demos/cg.cpp:64-65)."""
    a = create_laplace_1d(256, gamma=0.4)
    e = csr_to_ell(a)
    b = padded(gaussian_bump(256), e.nrows_pad)
    res = jax.jit(lambda bb: cg(lambda p: spmv_ell(e, p), bb, kmax=100, rtol=1e-10))(b)
    assert bool(res.converged)
    # verify residual independently, as demos/cg.cpp:76-96 recomputes r = Ax-b
    r = np.asarray(spmv_ell(e, res.x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-9
    assert int(res.iterations) < 100


def test_cg_laplace_2d_dia():
    a = create_laplace_2d(24, 24)
    d = csr_to_dia(a)
    b = padded(gaussian_bump(a.nrows), d.nrows_pad)
    res = cg(lambda p: spmv_dia(d, p), b, kmax=2000, rtol=1e-10)
    assert bool(res.converged)
    x_dense = np.linalg.solve(a.to_dense(), np.asarray(b)[: a.nrows])
    got = np.asarray(res.x)[: a.nrows]
    assert np.linalg.norm(got - x_dense) / np.linalg.norm(x_dense) < 1e-8


def test_cg_symmetric_storage_same_history():
    """Full and lower-triangle storage must produce identical CG trajectories."""
    a = random_csr(48, 48, 3, seed=21, symmetric=True, spd_shift=1.0)
    e_full = csr_to_ell(a)
    e_sym = csr_to_ell(a, symmetric=True)
    b = padded(np.random.default_rng(22).standard_normal(48), e_full.nrows_pad)
    _, h_full = cg_residual_history(lambda p: spmv_ell(e_full, p), b, 12)
    _, h_sym = cg_residual_history(lambda p: spmv_ell(e_sym, p), b, 12)
    # compare only while above the machine-precision floor
    h_full, h_sym = np.asarray(h_full), np.asarray(h_sym)
    keep = h_full > 1e-12 * h_full[0]
    np.testing.assert_allclose(h_full[keep], h_sym[keep], rtol=1e-6)


def test_cg_residual_history_matches_numpy_reference():
    """Residual-history parity against an independent numpy CG implementing
    the reference update order (spmv/cg.cpp:55-86)."""
    a = create_laplace_1d(100, gamma=0.2)
    dense = a.to_dense()
    b = gaussian_bump(100)

    # numpy CG, reference order
    x = np.zeros(100)
    r = b.copy()
    p = r.copy()
    rnorm2 = r @ r
    hist_np = []
    for _ in range(25):
        ap = dense @ p
        alpha = rnorm2 / (p @ ap)
        x = x + alpha * p
        r = r - alpha * ap
        rnorm2_new = r @ r
        beta = rnorm2_new / rnorm2
        p = r + beta * p
        rnorm2 = rnorm2_new
        hist_np.append(np.sqrt(rnorm2))

    e = csr_to_ell(a)
    bp = padded(b, e.nrows_pad)
    _, hist = cg_residual_history(lambda pv: spmv_ell(e, pv), bp, 25)
    np.testing.assert_allclose(np.asarray(hist), hist_np, rtol=1e-10)


def test_cg_fp32():
    a = create_laplace_1d(128, gamma=0.3)
    e = csr_to_ell(a, dtype=np.float32)
    b = padded(gaussian_bump(128, dtype=np.float32), e.nrows_pad)
    res = cg(lambda p: spmv_ell(e, p), b, kmax=200, rtol=1e-5)
    assert bool(res.converged)
    r = np.asarray(spmv_ell(e, res.x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-4


def test_cg_zero_rhs():
    a = create_laplace_1d(32)
    e = csr_to_ell(a)
    res = cg(lambda p: spmv_ell(e, p), jnp.zeros(e.nrows_pad))
    assert int(res.iterations) == 0
    np.testing.assert_allclose(np.asarray(res.x), 0)


def test_pcg_jacobi_converges_no_slower():
    """Jacobi-PCG (beyond reference parity) must converge and not exceed the
    unpreconditioned iteration count on a scaled SPD system."""
    import jax as _jax
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix

    # badly scaled diagonal: Jacobi should help a lot
    n = 80
    rng = np.random.default_rng(70)
    scale = 10.0 ** rng.uniform(-2, 2, size=n)
    base = create_laplace_1d(n, gamma=0.3).to_dense()
    dense = scale[:, None] * base * scale[None, :]
    from spmv_tpu.formats.csr import CSRHost
    a = CSRHost.from_dense(dense)

    A = build_dist_matrix(a, n_devices=4)
    b = A.to_dist(gaussian_bump(n))
    plain = cg(A.as_linear_operator(), b, kmax=2000, rtol=1e-10)
    pcg = cg(A.as_linear_operator(), b, kmax=2000, rtol=1e-10,
             preconditioner=A.jacobi_preconditioner())
    assert bool(pcg.converged)
    assert int(pcg.iterations) <= int(plain.iterations)
    x = A.from_dist(pcg.x)
    r = a.matvec(x) - gaussian_bump(n)
    assert np.linalg.norm(r) / np.linalg.norm(gaussian_bump(n)) < 1e-8


def test_pcg_identity_matches_plain_cg():
    """preconditioner=identity must reproduce plain CG exactly."""
    a = create_laplace_1d(64, gamma=0.2)
    from spmv_tpu.formats.ell import csr_to_ell
    e = csr_to_ell(a)
    b = padded(gaussian_bump(64), e.nrows_pad)
    mv = lambda p: spmv_ell(e, p)
    r1 = cg(mv, b, kmax=100, rtol=1e-10)
    r2 = cg(mv, b, kmax=100, rtol=1e-10, preconditioner=lambda r: r)
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), rtol=1e-12)


def test_cg_pipelined_matches_classic():
    """Single-reduction CG converges to the same solution (same math,
    different rounding) and within a similar iteration count."""
    from spmv_tpu.solvers.cg import cg, cg_pipelined

    a = create_laplace_2d(20, 20)
    d = csr_to_dia(a)
    b = jnp.asarray(np.pad(gaussian_bump(a.nrows), (0, d.nrows_pad - a.nrows)))
    mv = lambda p: spmv_dia(d, p)
    classic = cg(mv, b, kmax=600, rtol=1e-10)
    piped = cg_pipelined(mv, b, kmax=600, rtol=1e-10)
    assert bool(classic.converged) and bool(piped.converged)
    np.testing.assert_allclose(
        np.asarray(piped.x), np.asarray(classic.x), rtol=1e-7, atol=1e-9
    )
    assert abs(int(piped.iterations) - int(classic.iterations)) <= 5


def test_cg_pipelined_distributed():
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.cg import cg_pipelined

    a = create_laplace_2d(16, 16)
    A = build_dist_matrix(a, n_devices=4, symmetric=True)
    b_host = gaussian_bump(a.nrows)
    res = jax.jit(
        lambda A_, bb: cg_pipelined(A_.as_linear_operator(), bb,
                                    kmax=400, rtol=1e-10)
    )(A, A.to_dist(b_host))
    x_host = A.from_dist(res.x)
    r = a.matvec(x_host) - b_host
    assert np.linalg.norm(r) / np.linalg.norm(b_host) < 1e-9


def test_cg_pipelined_single_allreduce_in_hlo():
    """The two per-iteration dots must fuse into one collective: the
    compiled loop body contains exactly ONE all-reduce(+psum pair fusion)
    per iteration on a multi-device mesh."""
    from spmv_tpu.parallel.dist_matrix import build_dist_matrix
    from spmv_tpu.solvers.cg import cg, cg_pipelined

    a = create_laplace_2d(16, 16)
    A = build_dist_matrix(a, n_devices=4, symmetric=True)
    b = A.to_dist(gaussian_bump(a.nrows))

    def count_loop_allreduces(fn):
        hlo = jax.jit(fn).lower(A, b).compile().as_text()
        # the while-loop body computation holds the per-iteration collectives
        import re
        bodies = re.findall(r"%(?:wide\.)?body[^{]*\{(?:[^{}]|\{[^{}]*\})*\}",
                            hlo, re.S)
        text = max(bodies, key=len) if bodies else hlo
        return len(re.findall(r"all-reduce(?:-start)?\(", text))

    n_classic = count_loop_allreduces(
        lambda A_, bb: cg(A_.as_linear_operator(), bb, kmax=10, rtol=1e-30))
    n_piped = count_loop_allreduces(
        lambda A_, bb: cg_pipelined(A_.as_linear_operator(), bb,
                                    kmax=10, rtol=1e-30))
    assert n_piped < n_classic, (n_piped, n_classic)
