"""Unit tests for the state algebra, lenses and problem layer
(mirrors ref test/linear_solvers/bordered_arrays.jl + problems.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.core.state import (BorderedState, DotTheta,
                                              tree_axpy, tree_dot, tree_norm,
                                              tree_size, tree_sub, tree_vdot)


def test_bordered_state_algebra():
    a = BorderedState(u=jnp.arange(4.0), p=jnp.asarray(2.0))
    b = BorderedState(u=jnp.ones(4), p=jnp.asarray(1.0))
    c = a + 2.0 * b
    np.testing.assert_allclose(c.u, np.arange(4.0) + 2.0)
    assert float(c.p) == 4.0
    d = tree_sub(c, a)
    np.testing.assert_allclose(d.u, 2.0 * np.ones(4))
    assert tree_size(a) == 5


def test_tree_dots():
    x = {"a": jnp.array([1.0, 2.0]), "b": jnp.array([[3.0]])}
    y = {"a": jnp.array([4.0, 5.0]), "b": jnp.array([[6.0]])}
    assert float(tree_dot(x, y)) == pytest.approx(1 * 4 + 2 * 5 + 3 * 6)
    z = jnp.array([1.0 + 1j, 2.0])
    assert complex(tree_vdot(z, z)).real == pytest.approx(6.0)
    assert float(tree_norm(x)) == pytest.approx(np.sqrt(1 + 4 + 9))


def test_dot_theta_normalization():
    dt = DotTheta()
    u = jnp.ones(10)
    # theta * <u,u>/n + (1-theta) p^2 with theta=0.5, p=2 -> 0.5*1 + 0.5*4
    v = dt.dot_theta(u, u, 2.0, 2.0, 0.5, 10)
    assert float(v) == pytest.approx(0.5 + 2.0)


def test_lens_paths():
    params = {"a": 1.0, "nest": {"b": 2.0}, "arr": (3.0, 4.0)}
    assert bk.lens_get(params, "a") == 1.0
    assert bk.lens_get(params, ("nest", "b")) == 2.0
    p2 = bk.lens_set(params, ("nest", "b"), 7.0)
    assert p2["nest"]["b"] == 7.0 and params["nest"]["b"] == 2.0
    p3 = bk.lens_set(params, ("arr", 1), 9.0)
    assert p3["arr"][1] == 9.0


def test_problem_derivatives():
    # F(u, p) = [u0^2 - p, u0*u1]
    def F(u, par):
        return jnp.array([u[0] ** 2 - par["p"], u[0] * u[1]])

    prob = bk.BifurcationProblem(F, u0=jnp.array([1.0, 2.0]),
                                 params={"p": 1.0}, lens="p")
    u = jnp.array([1.5, -0.5])
    J = prob.jacobian(u, prob.params)
    np.testing.assert_allclose(J, [[3.0, 0.0], [-0.5, 1.5]])
    v = jnp.array([1.0, 1.0])
    np.testing.assert_allclose(prob.dF(u, prob.params, v), J @ v)
    np.testing.assert_allclose(prob.dFt(u, prob.params, v), J.T @ v)
    np.testing.assert_allclose(prob.dFdp(u, prob.params), [-1.0, 0.0])
    # d2F(u)[dx1,dx2] for F0 = u0^2 - p: 2*dx1_0*dx2_0
    d2 = prob.d2F(u, prob.params, v, v)
    np.testing.assert_allclose(d2, [2.0, 2.0])
    d3 = prob.d3F(u, prob.params, v, v, v)
    np.testing.assert_allclose(d3, [0.0, 0.0], atol=1e-12)


def test_problem_complex_multilinear():
    def F(u, par):
        return jnp.array([u[0] ** 2 + u[0] * u[1], u[1] ** 3])

    prob = bk.BifurcationProblem(F, u0=jnp.zeros(2), params={"p": 0.0},
                                 lens="p")
    u = jnp.array([0.3, -0.7])
    dx = jnp.array([1.0 + 2.0j, -1.0j])
    d2c = prob.d2F_complex(u, prob.params, dx, dx)
    # compare against analytic bilinear form B(x,y) = [2 x0 y0 + x0 y1/  sym, 6 u1 x1 y1]
    B = lambda x, y: jnp.array(
        [2 * x[0] * y[0] + 0.5 * (x[0] * y[1] + x[1] * y[0]) * 2 / 1,
         6 * u[1] * x[1] * y[1]])
    # direct complex evaluation of the bilinear map
    expect = jnp.array([2 * dx[0] * dx[0] + (dx[0] * dx[1] + dx[1] * dx[0]),
                        6 * u[1] * dx[1] * dx[1]])
    np.testing.assert_allclose(d2c, expect, atol=1e-10)
