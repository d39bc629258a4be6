"""Generalized eig, preconditioners, polynomial tangent, Multiple predictor,
map normal forms."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.linalg import (BlockJacobiPrecond, DenseGEig,
                                          IterativeGEig, PartialSchurPrecond)
from bifurcationkit.jl_tpu.normal_forms import (neimark_sacker_nf,
                                                period_doubling_nf)


def test_dense_gev():
    rng = np.random.default_rng(0)
    n = 20
    A = jnp.asarray(rng.standard_normal((n, n)))
    B = jnp.asarray(rng.standard_normal((n, n)) + 5 * np.eye(n))
    w, v, cv, _ = DenseGEig()(A, B, 5)
    for i in range(5):
        r = A @ v[:, i] - w[i] * (B @ v[:, i])
        assert np.linalg.norm(r) < 1e-8
    assert np.all(np.diff(w.real) <= 1e-12)


def test_iterative_gev_matches_dense():
    rng = np.random.default_rng(1)
    n = 30
    A = rng.standard_normal((n, n)); A = jnp.asarray(A + A.T)
    B = jnp.asarray(np.eye(n) * 2.0)
    wd, *_ = DenseGEig()(A, B, 3)
    wi, *_ = IterativeGEig()(A, B, 3)
    np.testing.assert_allclose(np.sort(wi.real), np.sort(wd.real), rtol=1e-6)


def test_partial_schur_precond():
    # J with two large eigenvalues; precond should cluster the spectrum
    rng = np.random.default_rng(2)
    n = 40
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    D = np.diag(np.concatenate([[50.0, 30.0], np.linspace(1.0, 2.0, n - 2)]))
    J = jnp.asarray(Q @ D @ Q.T)
    P = PartialSchurPrecond.from_matrix(J, nev=2)
    ls = bk.GMRES(restart=15, maxiter=60, rtol=1e-10, precond=P)
    b = jnp.asarray(rng.standard_normal(n))
    sol, cv, it = ls(J, b)
    assert bool(cv)
    np.testing.assert_allclose(J @ sol, b, atol=1e-6)
    # without precond the clustered solve should need >= as many matvecs
    sol2, cv2, it2 = bk.GMRES(restart=15, maxiter=60, rtol=1e-10)(J, b)
    assert int(it) <= int(it2)


def test_block_jacobi_precond():
    rng = np.random.default_rng(3)
    nb, bs = 10, 4
    blocks = jnp.asarray(rng.standard_normal((nb, bs, bs)) +
                         5 * np.eye(bs)[None])
    P = BlockJacobiPrecond.from_blocks(blocks)
    v = jnp.asarray(rng.standard_normal(nb * bs))
    out = P(v)
    # block-diagonal solve: check one block
    expect = np.linalg.solve(np.asarray(blocks[0]), np.asarray(v[:bs]))
    np.testing.assert_allclose(out[:bs], expect, atol=1e-10)


def test_polynomial_tangent_runs():
    def F(u, par):
        return u ** 3 - u - par["p"]

    prob = bk.BifurcationProblem(F, u0=jnp.array([-1.1]),
                                 params={"p": -0.3}, lens="p")
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-4, p_min=-1.0,
                            p_max=1.0, max_steps=150, detect_bifurcation=0,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.PALC(tangent=bk.Polynomial(n=2, k=6)), cp)
    folds = br.get_special_points("fold")
    assert len(folds) >= 1
    assert abs(abs(folds[0].param) - 2 / (3 * np.sqrt(3))) < 0.02


def test_multiple_predictor_runs():
    def F(u, par):
        return u ** 3 - u - par["p"]

    prob = bk.BifurcationProblem(F, u0=jnp.array([-1.1]),
                                 params={"p": -0.3}, lens="p")
    cp = bk.ContinuationPar(ds=0.005, dsmax=0.02, dsmin=1e-5, p_min=-1.0,
                            p_max=1.0, max_steps=200, detect_bifurcation=0,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.Multiple(nb=3), cp)
    folds = br.get_special_points("fold")
    assert len(folds) >= 1


def test_pd_normal_form_map():
    # logistic-like map: G(x) = -(1+eps) x + a x^3 at eps=0: multiplier -1,
    # restricted map xi -> -xi + a xi^3 => c = a
    a = -2.0

    def G(x, par):
        return jnp.array([-(1.0 + par["eps"]) * x[0] + a * x[0] ** 3])

    prob = bk.BifurcationProblem(G, u0=jnp.zeros(1), params={"eps": 0.0},
                                 lens="eps")
    pt = period_doubling_nf(prob, jnp.zeros(1), prob.params)
    assert pt.nf["c"] == pytest.approx(a, abs=1e-8)
    # c = a = -2 < 0: the 2-cycle xi^2 = eps/c exists only where the fixed
    # point is still stable (eps < 0) => SUBcritical flip
    assert pt.subtype == "SubCritical"


def test_ns_normal_form_map():
    # planar rotation with cubic contraction:
    # G(z) = e^{i th}(z + d z|z|^2): NS coefficient Re(e^{-i th} g21) = d
    th = 0.7
    d = -0.3

    def G(u, par):
        z = u[0] + 1j * u[1]
        out = np.exp(1j * th) * (z + d * z * (z * jnp.conj(z)))
        return jnp.array([jnp.real(out), jnp.imag(out)])

    prob = bk.BifurcationProblem(G, u0=jnp.zeros(2), params={"eps": 0.0},
                                 lens="eps")
    pt = neimark_sacker_nf(prob, jnp.zeros(2), prob.params)
    assert pt.omega == pytest.approx(th, abs=1e-8)
    # unit-norm eigenvector convention doubles the coefficient (same as the
    # Hopf b = 2*l1 convention checked in test_normal_forms)
    assert pt.nf["d"] == pytest.approx(2 * d, rel=1e-6)
    assert pt.subtype == "SuperCritical"
