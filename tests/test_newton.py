"""Newton solver tests (mirrors ref test/newton/test_newton.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk


def chan_problem(n=101, alpha=3.3, beta=0.01):
    """The 1D Chan BVP (ref examples/chan.jl) — the reference's canonical
    minimum end-to-end example."""
    from bifurcationkit.jl_tpu import models
    return models.chan(n=n, alpha=alpha, beta=beta)


def test_newton_scalar_quadratic():
    prob = bk.BifurcationProblem(
        lambda u, p: jnp.array([u[0] ** 2 - p["c"]]),
        u0=jnp.array([2.0]), params={"c": 2.0}, lens="c")
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-12))
    assert bool(sol.converged)
    assert float(sol.u[0]) == pytest.approx(np.sqrt(2.0), abs=1e-10)


def test_newton_chan_dense():
    prob = chan_problem()
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-11, max_iterations=20))
    assert bool(sol.converged)
    res = prob.residual(sol.u, prob.params)
    assert float(jnp.linalg.norm(res)) < 1e-10
    # quadratic convergence: few iterations from a decent guess
    assert int(sol.itnewton) <= 12


def test_newton_chan_gmres():
    prob = chan_problem(n=81)
    opts = bk.NewtonPar(tol=1e-9, max_iterations=25,
                        linsolver=bk.GMRES(restart=80, maxiter=400,
                                           rtol=1e-11))
    sol = bk.newton(prob, opts)
    assert bool(sol.converged)
    res = prob.residual(sol.u, prob.params)
    assert float(jnp.linalg.norm(res)) < 1e-8


def test_newton_matches_dense_vs_gmres():
    prob = chan_problem(n=41)
    s1 = bk.newton(prob, bk.NewtonPar(tol=1e-11))
    s2 = bk.newton(prob, bk.NewtonPar(
        tol=1e-11, linsolver=bk.GMRES(restart=41, maxiter=400, rtol=1e-13)))
    np.testing.assert_allclose(s1.u, s2.u, atol=1e-8)


def test_newton_callback_rejection():
    prob = bk.BifurcationProblem(
        lambda u, p: jnp.array([u[0] ** 2 - p["c"]]),
        u0=jnp.array([100.0]), params={"c": 2.0}, lens="c")
    # stop immediately if residual norm is huge
    sol = bk.newton(prob, bk.NewtonPar(), callback=bk.cb_max_norm(1.0))
    assert not bool(sol.converged)


def test_newton_pytree_state():
    # state as a dict pytree (ref test-cont-non-vector custom state types)
    def F(u, p):
        return {"x": u["x"] ** 3 - p["c"], "y": u["y"] - u["x"]}

    prob = bk.BifurcationProblem(F, u0={"x": jnp.array([1.5]),
                                        "y": jnp.array([0.0])},
                                 params={"c": 8.0}, lens="c")
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-12))
    assert bool(sol.converged)
    assert float(sol.u["x"][0]) == pytest.approx(2.0, abs=1e-10)
    assert float(sol.u["y"][0]) == pytest.approx(2.0, abs=1e-10)
