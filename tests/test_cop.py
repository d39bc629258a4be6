"""COP solver tests: blocks match the AD jacobian, COP solve matches dense LU
(the reference's own strongest parity pattern, ref test/condensation_of_parameters/cop.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.cop import (COPLS,
                                                collocation_block_jacobian,
                                                cop_solve)
from bifurcationkit.jl_tpu.periodic.orbits import periodic_orbit_problem


R0, MU, NU = 0.5, 0.2, 0.5
RADIUS = np.sqrt(R0)
OMEGA = MU - NU * R0
PERIOD = 2 * np.pi / abs(OMEGA)


def _setup():
    prob = models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Collocation(Ntst=12, m=3)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([RADIUS * np.cos(s * t), RADIUS * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, PERIOD, 2)
    po = periodic_orbit_problem(prob, disc, X0)
    return prob, disc, X0, po


def test_cop_blocks_match_ad_jacobian():
    prob, disc, X0, po = _setup()
    blocks = collocation_block_jacobian(disc, prob, X0, po.params)
    J_ad = jax.jacfwd(lambda X: po.F(X, po.params))(X0)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(X0.shape[0]))
    np.testing.assert_allclose(blocks(v), J_ad @ v, atol=1e-9)


def test_cop_solve_matches_dense():
    prob, disc, X0, po = _setup()
    blocks = collocation_block_jacobian(disc, prob, X0, po.params)
    J_ad = np.asarray(jax.jacfwd(lambda X: po.F(X, po.params))(X0))
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.standard_normal(X0.shape[0]))
    x_cop = cop_solve(blocks, rhs)
    x_dense = np.linalg.solve(J_ad, np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x_cop), x_dense, atol=1e-7)


def test_newton_po_with_cop():
    prob = models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Collocation(Ntst=12, m=3)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([1.1 * RADIUS * np.cos(s * t),
                         1.1 * RADIUS * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, PERIOD * 1.05, 2)
    po = periodic_orbit_problem(prob, disc, X0, use_cop=True)
    sol = bk.newton(po, bk.NewtonPar(tol=1e-10, max_iterations=25,
                                     linsolver=bk.COPLS()))
    assert bool(sol.converged)
    assert float(disc.period(sol.u)) == pytest.approx(PERIOD, rel=1e-6)


def test_continuation_po_with_cop():
    """Full PALC continuation on the COP direct solver (auto-wired by
    use_cop=True): the branch tracks the exact SL orbit family."""
    from bifurcationkit.jl_tpu.periodic.orbits import continuation_po

    prob = models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Collocation(Ntst=12, m=3)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([RADIUS * np.cos(s * t), RADIUS * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, PERIOD, 2)
    cp = bk.ContinuationPar(ds=0.02, dsmax=0.05, dsmin=1e-6, p_min=0.1,
                            p_max=0.9, max_steps=8, detect_bifurcation=0,
                            detect_fold=False,
                            newton_options=bk.NewtonPar(tol=1e-9,
                                                        max_iterations=20))
    br = continuation_po(prob, disc, X0, cp, use_cop=True)
    tbl = br.gamma._table()
    # exact period at r: 2 pi / |mu - nu r|
    exact = 2 * np.pi / np.abs(MU - NU * np.asarray(tbl["param"]))
    np.testing.assert_allclose(np.asarray(tbl["period"]), exact, rtol=1e-6)
