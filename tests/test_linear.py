"""Linear and eigen solver tests (mirrors ref test/linear_solvers/test_linear.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifurcationkit.jl_tpu.linalg import (ArnoldiEig, BiCGStab, DenseEig,
                                          DenseLS, FlatOperator, GMRES,
                                          ShiftInvertEig)


@pytest.fixture
def spd_system():
    rng = np.random.default_rng(0)
    n = 40
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


@pytest.fixture
def nonsym_system():
    rng = np.random.default_rng(1)
    n = 40
    A = 0.5 * rng.standard_normal((n, n)) + 5 * np.eye(n)
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_dense_ls(nonsym_system):
    A, b = nonsym_system
    sol, cv, it = DenseLS()(A, b)
    np.testing.assert_allclose(A @ sol, b, atol=1e-10)
    assert bool(cv)


def test_dense_ls_shifted(nonsym_system):
    A, b = nonsym_system
    # solve (2 I + 3 A) x = b  (ref `ls(J, rhs; a0, a1)`)
    sol, cv, _ = DenseLS()(A, b, a0=2.0, a1=3.0)
    np.testing.assert_allclose((2 * jnp.eye(40) + 3 * A) @ sol, b, atol=1e-9)


def test_dense_ls_two_rhs(nonsym_system):
    A, b = nonsym_system
    s1, s2, cv, _ = DenseLS().solve_two(A, b, 2 * b)
    np.testing.assert_allclose(A @ s1, b, atol=1e-10)
    np.testing.assert_allclose(A @ s2, 2 * b, atol=1e-10)


def test_gmres_matrix(nonsym_system):
    A, b = nonsym_system
    sol, cv, it = GMRES(restart=20, maxiter=200, rtol=1e-12)(A, b)
    assert bool(cv)
    np.testing.assert_allclose(A @ sol, b, atol=1e-8)


def test_gmres_operator(nonsym_system):
    A, b = nonsym_system
    op = lambda v: A @ v
    sol, cv, it = GMRES(restart=40, maxiter=200, rtol=1e-12)(op, b)
    assert bool(cv)
    np.testing.assert_allclose(A @ sol, b, atol=1e-8)


def test_gmres_under_jit(nonsym_system):
    A, b = nonsym_system
    ls = GMRES(restart=20, maxiter=100, rtol=1e-10)

    @jax.jit
    def solve(A, b):
        sol, cv, it = ls(A, b)
        return sol

    np.testing.assert_allclose(A @ solve(A, b), b, atol=1e-6)


def test_bicgstab(spd_system):
    A, b = spd_system
    sol, cv, it = BiCGStab(rtol=1e-12, maxiter=500)(A, b)
    assert bool(cv)
    np.testing.assert_allclose(A @ sol, b, atol=1e-7)


def test_dense_eig_ordering():
    # eigenvalues must come back sorted by decreasing real part
    # (ref test/linear_solvers/test_linear.jl:4-60)
    rng = np.random.default_rng(3)
    n = 30
    A = jnp.asarray(rng.standard_normal((n, n)))
    vals, vecs, cv, _ = DenseEig()(A, 5)
    assert vals.shape == (5,)
    assert np.all(np.diff(vals.real) <= 1e-12)
    # residual check A v = lambda v
    for i in range(5):
        r = A @ vecs[:, i] - vals[i] * vecs[:, i]
        assert np.linalg.norm(r) < 1e-8


def test_arnoldi_vs_dense():
    rng = np.random.default_rng(4)
    n = 60
    A = rng.standard_normal((n, n))
    A = A + A.T  # symmetric for well-separated real spectrum
    A = jnp.asarray(A)
    dvals, _, _, _ = DenseEig()(A, 3)
    avals, avecs, cv, _ = ArnoldiEig(krylov_dim=40, tol=1e-8)(A, 3)
    np.testing.assert_allclose(np.sort(avals.real), np.sort(dvals.real),
                               rtol=1e-6)


def test_arnoldi_matrix_free():
    rng = np.random.default_rng(5)
    n = 50
    M = rng.standard_normal((n, n))
    M = M + M.T
    A = jnp.asarray(M)
    op = FlatOperator(lambda v: A @ v, n)
    avals, _, cv, _ = ArnoldiEig(krylov_dim=40, tol=1e-8)(op, 2)
    dvals, _, _, _ = DenseEig()(A, 2)
    np.testing.assert_allclose(avals.real, dvals.real, rtol=1e-6)


def test_shift_invert():
    # eigenvalues of 1-D Laplacian: -4 sin^2(k pi / (2(n+1)))... use known matrix
    n = 50
    main = -2.0 * np.ones(n)
    off = np.ones(n - 1)
    A = np.diag(main) + np.diag(off, 1) + np.diag(off, -1)
    A = jnp.asarray(A)
    # rightmost eigenvalue nearest 0
    vals, vecs, cv, _ = ShiftInvertEig(
        sigma=0.1, eigsolver=ArnoldiEig(krylov_dim=30, tol=1e-9,
                                        which="LM"))(A, 3)
    exact = -4 * np.sin(np.arange(1, n + 1) * np.pi / (2 * (n + 1))) ** 2
    exact = np.sort(exact)[::-1]
    np.testing.assert_allclose(vals.real, exact[:3], rtol=1e-7)


def test_eig_under_jit():
    rng = np.random.default_rng(6)
    A = jnp.asarray(rng.standard_normal((20, 20)))

    @jax.jit
    def f(A):
        vals, vecs, cv, _ = DenseEig()(A, 4)
        return vals

    vals = f(A)
    ref = np.linalg.eigvals(np.asarray(A))
    ref = ref[np.lexsort((-ref.imag, -ref.real))]
    np.testing.assert_allclose(vals, ref[:4], atol=1e-10)


def test_iterative_refinement_dense_parity():
    """IR (f32 Krylov + f64 refinement) reaches f64-grade residuals."""
    import bifurcationkit.jl_tpu as bk

    rng = np.random.default_rng(0)
    n = 60
    A = np.diag(np.linspace(1.0, 8.0, n)) + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    ir = bk.IterativeRefinement(inner=bk.GMRES(restart=30, maxiter=120,
                                               rtol=1e-5), refinements=4,
                                rtol=1e-12)
    x, cv, _ = ir(jnp.asarray(A), jnp.asarray(b))
    assert bool(cv)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-10 * np.linalg.norm(b)


def test_iterative_refinement_newton_sh2d():
    """Mixed-precision Newton corrector on the flagship model matches the
    plain f64 GMRES solve (the TPU fast path; ref DefaultLS tolerances)."""
    import bifurcationkit.jl_tpu as bk
    from bifurcationkit.jl_tpu import models

    prob = models.swift_hohenberg_2d(Nx=64, Ny=48)
    ir = bk.IterativeRefinement(
        inner=bk.GMRES(restart=40, maxiter=160, rtol=1e-5,
                       precond=prob.spectral_precond),
        refinements=4, rtol=1e-11)
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-9, max_iterations=30,
                                       linsolver=ir))
    assert bool(sol.converged)
    r = np.linalg.norm(np.asarray(prob.residual(sol.u, prob.params)).ravel())
    assert r < 1e-9

    ls = bk.GMRES(restart=40, maxiter=300, rtol=1e-10,
                  precond=prob.spectral_precond)
    sol2 = bk.newton(prob, bk.NewtonPar(tol=1e-9, max_iterations=30,
                                        linsolver=ls))
    assert np.abs(np.asarray(sol.u) - np.asarray(sol2.u)).max() < 1e-8


def test_solve_bls_block_multi_border():
    """Generic k-border block elimination (ref solve_bls_block,
    src/LinearBorderSolver.jl:173-206) with dense and iterative inner
    solvers against the assembled (N+k) dense solve."""
    import numpy as _np

    from bifurcationkit.jl_tpu.linalg.bordered import solve_bls_block
    from bifurcationkit.jl_tpu.linalg.linear import DenseLS, GMRES

    rng = _np.random.default_rng(11)
    N, k = 20, 3
    J = jnp.asarray(rng.standard_normal((N, N)) + 4.0 * _np.eye(N))
    C = jnp.asarray(rng.standard_normal((N, k)))
    D = jnp.asarray(rng.standard_normal((k, N)))
    E = jnp.asarray(rng.standard_normal((k, k)))
    R = jnp.asarray(rng.standard_normal(N))
    s = jnp.asarray(rng.standard_normal(k))
    A = _np.block([[_np.asarray(J), _np.asarray(C)],
                   [_np.asarray(D), _np.asarray(E)]])
    ref = _np.linalg.solve(A, _np.concatenate([_np.asarray(R),
                                               _np.asarray(s)]))
    for solver in (DenseLS(), GMRES(restart=20, maxiter=200, rtol=1e-13)):
        x, y, cv, _ = solve_bls_block(solver, J, C, D, E, R, s)
        _np.testing.assert_allclose(_np.asarray(x), ref[:N], atol=1e-8)
        _np.testing.assert_allclose(_np.asarray(y), ref[N:], atol=1e-8)
        assert bool(cv)
