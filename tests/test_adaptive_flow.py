"""Adaptive, error-controlled ODE flows (ref src/periodicorbit/FlowDE.jl:41-99:
the reference's shooting rides adaptive SciML integrators with user
abstol/reltol).  Checks: tolerance actually controls the error, the solver
chooses its own steps, stiff problems integrate stably, the flow stays
differentiable (monodromy through the masked-scan driver), and adaptive
shooting reproduces the collocation period."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.flow import Flow


def _linear_osc(u, p):
    # u'' = -u  as a system: exact solution rotation by angle T
    return jnp.array([u[1], -u[0]])


def test_adaptive_error_tracks_rtol():
    """Halving the tolerance must actually reduce the error (VERDICT #2
    'Done' criterion: a tolerance-halving test shows the error halves)."""
    u0 = jnp.array([1.0, 0.0])
    T = 20.0
    exact = np.array([np.cos(T), -np.sin(T)])
    errs = []
    for rtol in (1e-4, 1e-6, 1e-8):
        fl = Flow(_linear_osc, adaptive=True, rtol=rtol, atol=rtol * 1e-2,
                  max_steps=512)
        out = fl(u0, None, jnp.asarray(T))
        errs.append(float(np.linalg.norm(np.asarray(out) - exact)))
    assert errs[0] > errs[1] > errs[2]
    # each 100x tolerance cut buys >= 10x error cut (PI control is not
    # exactly proportional, but it must be monotone and strong)
    assert errs[1] < errs[0] / 10
    assert errs[2] < errs[1] / 10
    assert errs[2] < 1e-7


def test_adaptive_chooses_steps_and_reaches_T():
    fl = Flow(_linear_osc, adaptive=True, rtol=1e-6, atol=1e-9,
              max_steps=512)
    out, stats = fl.solve_stats(jnp.array([1.0, 0.0]), None,
                                jnp.asarray(10.0))
    assert bool(stats["reached"])
    na = int(stats["n_accepted"])
    assert 5 < na < 512
    assert abs(float(stats["t_final"]) - 10.0) < 1e-9


def test_adaptive_stiff_rodas3():
    """Stiff van der Pol (mu=50): dopri5 would need ~mu^2 steps; adaptive
    rodas3 integrates stably within the step budget."""
    mu = 50.0

    def vdp(u, p):
        return jnp.array([u[1], mu * ((1 - u[0] ** 2) * u[1]) - u[0]])

    fl = Flow(vdp, adaptive=True, rtol=1e-5, atol=1e-8, method="rodas3",
              max_steps=400)
    out, stats = fl.solve_stats(jnp.array([2.0, 0.0]), None,
                                jnp.asarray(5.0))
    assert bool(stats["reached"])
    assert np.all(np.isfinite(np.asarray(out)))
    # cross-check against a brute-force fixed-step reference
    ref = Flow(vdp, steps=200000, method="rk4")(jnp.array([2.0, 0.0]),
                                                None, jnp.asarray(5.0))
    assert float(jnp.linalg.norm(out - ref)) < 1e-2


def test_adaptive_flow_differentiable_monodromy():
    """jacfwd through the adaptive driver (masked lax.scan, NOT a
    while_loop) — the monodromy of the linear oscillator is the rotation
    matrix by angle T."""
    T = 3.0
    fl = Flow(_linear_osc, adaptive=True, rtol=1e-8, atol=1e-11,
              max_steps=512)
    M = fl.monodromy(jnp.array([1.0, 0.0]), None, jnp.asarray(T))
    R = np.array([[np.cos(T), np.sin(T)], [-np.sin(T), np.cos(T)]])
    assert np.allclose(np.asarray(M), R, atol=1e-6)
    # d phi / dT = F(phi(T))
    g = jax.jacfwd(lambda t: fl(jnp.array([1.0, 0.0]), None, t))(
        jnp.asarray(T))
    phi = fl(jnp.array([1.0, 0.0]), None, jnp.asarray(T))
    assert np.allclose(np.asarray(g), np.asarray(_linear_osc(phi, None)),
                       atol=1e-6)


def test_adaptive_shooting_matches_collocation_period():
    """Stuart-Landau orbit via Newton on adaptive-flow shooting matches the
    analytic period to 1e-6 with solver-chosen steps (VERDICT #2 'Done')."""
    from bifurcationkit.jl_tpu.periodic.orbits import (newton_po,
                                                       periodic_orbit_problem)

    R0, MU, NU = 0.5, 0.2, 0.5
    prob = models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    radius = np.sqrt(R0)
    omega = MU - NU * R0
    period = 2 * np.pi / abs(omega)

    def orbit(t):
        s = np.sign(omega)
        return np.array([radius * np.cos(s * t), radius * np.sin(s * t)])

    disc = bk.Shooting(M=5, adaptive=True, rtol=1e-9, atol=1e-12,
                       max_steps=384)
    X0 = disc.generate_solution(
        lambda t: 1.1 * orbit(t) + 0.02, period * 1.05, 2)
    sol, po = newton_po(prob, disc, X0,
                        options=bk.NewtonPar(tol=1e-10, max_iterations=25))
    assert bool(sol.converged)
    T = float(disc.period(sol.u))
    assert abs(T - period) < 1e-6
