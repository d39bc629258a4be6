"""Device-native generalized EVP (VERDICT r1 #6): the TPU path must work
with host callbacks unavailable (the axon runtime rejects pure_callback).
Simulated here by monkeypatching jax.pure_callback to raise and forcing the
device branch of dense_gev."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.linalg import geig as geig_mod
from bifurcationkit.jl_tpu.linalg.geig import (_dense_gev_device, dense_gev,
                                               DenseGEig, IterativeGEig)


def _rand_pencil(n=14, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((n, n)))
    B = jnp.asarray(rng.standard_normal((n, n)) + 3.0 * np.eye(n))
    return A, B


def test_device_gev_matches_host_qz():
    A, B = _rand_pencil()
    w_host, _ = dense_gev(A, B)            # CPU: LAPACK QZ callback
    w_dev, _ = _dense_gev_device(A, B)     # the TPU branch, runnable anywhere
    np.testing.assert_allclose(np.asarray(w_dev), np.asarray(w_host),
                               atol=1e-7)


def test_device_gev_singular_B():
    """Rank-deficient B: the pencil has infinite eigenvalues; the device
    path must flag them (-inf) and keep the finite part accurate."""
    rng = np.random.default_rng(1)
    n, k = 10, 3                            # B has rank n - k
    A = jnp.asarray(rng.standard_normal((n, n)))
    Bh = rng.standard_normal((n, n - k))
    B = jnp.asarray(Bh @ rng.standard_normal((n - k, n)))
    w_host, _ = dense_gev(A, B)
    w_dev, _ = _dense_gev_device(A, B)
    wh = np.asarray(w_host)
    wd = np.asarray(w_dev)
    fin_h = np.sort_complex(wh[np.isfinite(wh.real)])
    fin_d = np.sort_complex(wd[np.isfinite(wd.real)])
    assert len(fin_d) == len(fin_h) == n - k
    np.testing.assert_allclose(fin_d, fin_h, atol=1e-6)


def test_device_gev_vectors_satisfy_pencil():
    A, B = _rand_pencil(seed=2)
    w, v = _dense_gev_device(A, B)
    Ac = np.asarray(A).astype(complex)
    Bc = np.asarray(B).astype(complex)
    for i in range(4):
        x = np.asarray(v[:, i])
        lam = complex(w[i])
        r = Ac @ x - lam * (Bc @ x)
        assert np.linalg.norm(r) < 1e-6 * (abs(lam) + 1) * np.linalg.norm(x)


def test_floquet_gev_without_callbacks(monkeypatch):
    """VERDICT #6 'Done' criterion: FloquetGEV parity passes with callbacks
    disabled (axon simulation)."""
    R0, MU, NU = 0.5, 0.2, 0.5
    prob = bk.models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Collocation(Ntst=20, m=4)
    RADIUS, OMEGA = np.sqrt(R0), MU - NU * R0
    PERIOD = 2 * np.pi / abs(OMEGA)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([RADIUS * np.cos(s * t), RADIUS * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, PERIOD, 2)
    sol, po = bk.newton_po(prob, disc, X0,
                           options=bk.NewtonPar(tol=1e-11,
                                                max_iterations=20))
    maps = disc.interval_maps(prob, sol.u, po.params)

    def no_callbacks(*a, **k):
        raise RuntimeError("pure_callback rejected (axon simulation)")

    monkeypatch.setattr(jax, "pure_callback", no_callbacks)
    # force the device branch of dense_gev
    monkeypatch.setattr(geig_mod.jax, "pure_callback", no_callbacks,
                        raising=False)
    orig = geig_mod.dense_gev
    monkeypatch.setattr(
        geig_mod, "dense_gev",
        lambda A, B, with_vectors=True: _dense_gev_device(A, B,
                                                          with_vectors))
    from bifurcationkit.jl_tpu.periodic import FloquetGEV

    expo, vecs, cv, _ = FloquetGEV()(maps, 2)
    mult = np.sort(np.abs(np.exp(np.asarray(expo))))[::-1]
    assert mult[0] == pytest.approx(1.0, abs=1e-6)
    assert mult[1] == pytest.approx(np.exp(-2 * R0 * PERIOD), rel=1e-4)


def test_matrix_free_gev_operator():
    """IterativeGEig on operators (no materialized matrices)."""
    from bifurcationkit.jl_tpu.linalg.eig import FlatOperator

    A, B = _rand_pencil(seed=3)
    opA = FlatOperator(lambda v: A @ v, A.shape[0], A.dtype)
    opB = FlatOperator(lambda v: B @ v, B.shape[0], B.dtype)
    ge = IterativeGEig(eigsolver=bk.ArnoldiEig(which="LR", krylov_dim=14,
                                               restarts=4),
                       linsolver=bk.GMRES(restart=14, maxiter=200,
                                          rtol=1e-12))
    w_mf, _, cv, _ = ge(opA, opB, 3)
    w_ref, _ = dense_gev(A, B)
    # which member of a conjugate pair lands in the top-3 window is
    # tie-break-ambiguous: compare real parts and |imag|
    got = np.asarray(w_mf)[:3]
    ref = np.asarray(w_ref)[:3]
    np.testing.assert_allclose(np.sort(got.real), np.sort(ref.real),
                               atol=1e-6)
    np.testing.assert_allclose(np.sort(np.abs(got.imag)),
                               np.sort(np.abs(ref.imag)), atol=1e-6)


def test_real_embedding_border_solve_matches_complex():
    """Hopf MA border solve via the 2(n+1) real embedding == native
    complex solve (VERDICT r1 #5)."""
    from bifurcationkit.jl_tpu.codim2.minaug import (_border_solve,
                                                     _border_solve_reim)

    rng = np.random.default_rng(5)
    n = 12
    J = jnp.asarray(rng.standard_normal((n, n)))
    a = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    b = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    omega = 0.83
    # reference: native complex solve
    M = jnp.zeros((n + 1, n + 1), jnp.complex128)
    M = M.at[:n, :n].set(J.astype(jnp.complex128)
                         - 1j * omega * jnp.eye(n))
    M = M.at[:n, n].set(a)
    M = M.at[n, :n].set(jnp.conj(b))
    rhs = jnp.zeros((n + 1,), jnp.complex128).at[n].set(1.0)
    ref = np.linalg.solve(np.asarray(M), np.asarray(rhs))
    vr, vi, sr, si = _border_solve_reim(J, a, b, jnp.zeros(()), -omega)
    np.testing.assert_allclose(np.asarray(vr) + 1j * np.asarray(vi),
                               ref[:n], atol=1e-10)
    np.testing.assert_allclose(complex(sr + 1j * si), complex(ref[n]),
                               atol=1e-12)
    # the complex-shift dispatch of _border_solve takes the same path
    v2, s2 = _border_solve(J, a, b, shift=-1j * omega)
    np.testing.assert_allclose(np.asarray(v2), ref[:n], atol=1e-8)


def test_device_gev_shift_collision_retry():
    """A pencil eigenvalue planted exactly at the first fixed shift must not
    silently corrupt the rotation: the ill-conditioning guard retries with
    the second shift (ref robustness contract,
    src/GeneralizedEigenSolver.jl:19-199)."""
    from bifurcationkit.jl_tpu.linalg.geig import _GEV_SIGMA

    rng = np.random.default_rng(11)
    n = 10
    vals = np.sort(rng.standard_normal(n))[::-1]
    vals[3] = _GEV_SIGMA                   # exact collision
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    A = jnp.asarray(Q @ np.diag(vals) @ Q.T)
    B = jnp.asarray(np.eye(n))
    w, v = _dense_gev_device(A, B)
    np.testing.assert_allclose(np.asarray(w).real,
                               np.sort(vals)[::-1], atol=1e-8)
    np.testing.assert_allclose(np.asarray(w).imag, 0.0, atol=1e-8)
    # eigenvectors still satisfy the pencil
    for i in range(n):
        x = np.asarray(v[:, i])
        r = np.asarray(A) @ x.real - np.asarray(w[i]).real * x.real
        assert np.linalg.norm(r) < 1e-6 * np.linalg.norm(x)
