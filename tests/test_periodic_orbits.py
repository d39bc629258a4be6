"""Periodic-orbit tests on Stuart-Landau (exact limit cycle |z| = sqrt(r),
frequency omega = mu - nu*r) — mirrors ref
test/periodic_orbits_function_fd/stuartLandau*.jl and *_sh*."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.floquet import floquet_multipliers


R0 = 0.5
MU = 0.2
NU = 0.5
# exact orbit: radius sqrt(r), omega = mu - nu*r
RADIUS = np.sqrt(R0)
OMEGA = MU - NU * R0
PERIOD = 2 * np.pi / abs(OMEGA)


def sl_problem():
    return models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)


def exact_orbit(t):
    # 2pi-periodic parameterization; rotation direction sign(omega)
    s = np.sign(OMEGA)
    return np.array([RADIUS * np.cos(s * t), RADIUS * np.sin(s * t)])


@pytest.mark.parametrize("disc", [
    bk.Trapeze(M=80),
    bk.Collocation(Ntst=20, m=4),
    bk.Shooting(M=4, steps_per_segment=100),
])
def test_po_residual_near_zero_on_exact_orbit(disc):
    """Residual ~ 0 on the analytic orbit
    (ref stuartLandauCollocation.jl:196)."""
    prob = sl_problem()
    X0 = disc.generate_solution(exact_orbit, PERIOD, 2)
    from bifurcationkit.jl_tpu.periodic.orbits import periodic_orbit_problem

    po = periodic_orbit_problem(prob, disc, X0)
    res = po.F(X0, po.params)
    tol = {"Trapeze": 2e-2, "Collocation": 1e-6, "Shooting": 1e-6}[
        type(disc).__name__]
    assert float(jnp.linalg.norm(res)) < tol


@pytest.mark.parametrize("disc", [
    bk.Trapeze(M=80),
    bk.Collocation(Ntst=20, m=4),
    bk.Shooting(M=3, steps_per_segment=120),
])
def test_newton_po_converges_and_period(disc):
    prob = sl_problem()
    # perturbed guess
    X0 = disc.generate_solution(
        lambda t: 1.12 * exact_orbit(t) + 0.02, PERIOD * 1.06, 2)
    sol, po = bk.newton_po(prob, disc, X0,
                           options=bk.NewtonPar(tol=1e-10,
                                                max_iterations=30))
    assert bool(sol.converged)
    T = float(disc.period(sol.u))
    # trapezoid is 2nd order: discretization error ~ (T/M)^2
    rel = {"Trapeze": 2e-3, "Collocation": 1e-6,
           "Shooting": 1e-6}[type(disc).__name__]
    assert T == pytest.approx(PERIOD, rel=rel)
    # orbit radius
    if not isinstance(disc, bk.PoincareShooting):
        dof = np.asarray(sol.u[:-1]).reshape(-1, 2)
        radii = np.linalg.norm(dof, axis=1)
        np.testing.assert_allclose(radii, RADIUS, rtol=max(rel, 1e-5) * 5)


def test_floquet_multipliers_stuart_landau():
    """The SL limit cycle has multipliers {1, exp(-2 r T)}
    (analytic: radial exponent = -2r)."""
    prob = sl_problem()
    disc = bk.Collocation(Ntst=25, m=4)
    X0 = disc.generate_solution(exact_orbit, PERIOD, 2)
    sol, po = bk.newton_po(prob, disc, X0,
                           options=bk.NewtonPar(tol=1e-11,
                                                max_iterations=20))
    assert bool(sol.converged)
    mult = floquet_multipliers(disc, prob, sol.u,
                               po.params)
    mult = np.sort(np.abs(mult))[::-1]
    assert mult[0] == pytest.approx(1.0, abs=1e-5)
    assert mult[1] == pytest.approx(np.exp(-2 * R0 * PERIOD), rel=1e-3)


def test_hopf_abs_to_po_collocation():
    """aBS from the Hopf of the 2d Hopf normal form -> PO branch with the
    exact amplitude sqrt(p) (ref PO branch checks)."""
    prob = models.hopf_normal_2d(p=-0.1, omega=1.0, l1=-1.0)
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-5, p_min=-0.2,
                            p_max=1.0, max_steps=100, detect_bifurcation=3,
                            nev=2, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.PALC(), cp)
    hopfs = br.get_special_points("hopf")
    assert len(hopfs) == 1
    idx = br.specialpoint.index(hopfs[0])

    cp_po = bk.ContinuationPar(ds=0.02, dsmax=0.08, dsmin=1e-5, p_min=0.0,
                               p_max=0.6, max_steps=60,
                               detect_bifurcation=0, detect_fold=False,
                               newton_options=bk.NewtonPar(
                                   tol=1e-9, max_iterations=25))
    br_po = bk.continuation_hopf_po(br, idx, cp_po,
                                    disc=bk.Collocation(Ntst=20, m=4))
    assert len(br_po) > 10
    tbl = br_po.gamma._table()
    mask = tbl["param"] > 0.05
    # amplitude of x-coordinate = 2 sqrt(p)
    np.testing.assert_allclose(tbl["amplitude"][mask],
                               2 * np.sqrt(tbl["param"][mask]), rtol=2e-3)
    # period stays 2 pi (omega = 1 independent of p for this normal form)
    np.testing.assert_allclose(tbl["period"][mask], 2 * np.pi, rtol=1e-3)


def test_po_continuation_stability_detection():
    """Continue the SL orbit in r across the (subcritical at c5<0...) — use
    Floquet exponents recorded along the branch: orbit is stable for r>0."""
    prob = sl_problem()
    disc = bk.Collocation(Ntst=16, m=4)
    X0 = disc.generate_solution(exact_orbit, PERIOD, 2)
    cp = bk.ContinuationPar(ds=0.02, dsmax=0.06, dsmin=1e-6, p_min=0.2,
                            p_max=1.0, max_steps=40, detect_bifurcation=2,
                            nev=2, tol_stability=1e-6,
                            newton_options=bk.NewtonPar(tol=1e-9,
                                                        max_iterations=25))
    br = bk.continuation_po(prob, disc, X0, cp)
    assert len(br) > 5
    # stable periodic orbit: no unstable Floquet exponent
    assert (br.gamma["n_unstable"] == 0).all()


def test_floquet_gev_matches_qad():
    """FloquetGEV pencil multipliers match the monodromy-product ones
    (and the analytic {1, exp(-2 r T)})."""
    prob = sl_problem()
    disc = bk.Collocation(Ntst=20, m=4)
    X0 = disc.generate_solution(exact_orbit, PERIOD, 2)
    sol, po = bk.newton_po(prob, disc, X0,
                           options=bk.NewtonPar(tol=1e-11,
                                                max_iterations=20))
    maps = disc.interval_maps(prob, sol.u, po.params)
    from bifurcationkit.jl_tpu.periodic import FloquetGEV

    expo, vecs, cv, _ = FloquetGEV()(maps, 2)
    mult = np.exp(np.asarray(expo))
    mult = np.sort(np.abs(mult))[::-1]
    assert mult[0] == pytest.approx(1.0, abs=1e-6)
    assert mult[1] == pytest.approx(np.exp(-2 * R0 * PERIOD), rel=1e-4)


def test_mesh_adaptation_runs():
    prob = sl_problem()
    disc = bk.Collocation(Ntst=14, m=3, adapt_mesh=True)
    X0 = disc.generate_solution(exact_orbit, PERIOD, 2)
    cp = bk.ContinuationPar(ds=0.02, dsmax=0.06, dsmin=1e-6, p_min=0.2,
                            p_max=0.9, max_steps=15, detect_bifurcation=0,
                            detect_fold=False,
                            newton_options=bk.NewtonPar(tol=1e-8,
                                                        max_iterations=25))
    br = bk.continuation_po(prob, disc, X0, cp)
    assert len(br) > 5
    # orbit quality preserved under adaptation: radius still sqrt(r)
    tbl = br.gamma._table()
    mask = tbl["param"] > 0.3
    np.testing.assert_allclose(tbl["amplitude"][mask],
                               2 * np.sqrt(tbl["param"][mask]), rtol=5e-3)


def test_poincare_shooting_event_driven():
    """Event-driven Poincare shooting (the reference formulation,
    PoincareShooting.jl:50): unknowns are ONLY hyperplane coordinates; the
    flow integrates to the section CROSSING.  On the exact SL orbit the
    residual vanishes, Newton reconverges from a perturbed guess, and the
    crossing times sum to the period."""
    from bifurcationkit.jl_tpu.periodic.orbits import periodic_orbit_problem

    prob = sl_problem()
    disc = bk.PoincareShooting(M=2, steps_per_segment=150,
                               event_driven=True)
    X0 = disc.generate_solution(exact_orbit, PERIOD, 2)
    assert X0.shape == (2,)            # M*(n-1) unknowns, no return times
    po = periodic_orbit_problem(prob, disc, X0)
    assert float(jnp.linalg.norm(po.F(X0, po.params))) < 1e-6
    # period = sum of event-located crossing times
    T = float(disc.period_par(prob, X0, po.params))
    assert T == pytest.approx(PERIOD, rel=1e-6)
    # Newton from a perturbed guess in the hyperplanes
    sol = bk.newton(po.re_make(u0=X0 + 0.05),
                    bk.NewtonPar(tol=1e-10, max_iterations=25))
    assert bool(sol.converged)
    # the discrete map's fixed point sits within the fixed-step RK error
    # of the analytic orbit
    assert float(jnp.linalg.norm(sol.u - X0)) < 1e-5
    # monodromy multipliers at the event-driven solution: {1, exp(-2 r T)}
    M = disc.monodromy(prob, sol.u, po.params)
    mult = np.sort(np.abs(np.linalg.eigvals(np.asarray(M))))[::-1]
    assert mult[0] == pytest.approx(1.0, abs=1e-5)
    assert mult[1] == pytest.approx(np.exp(-2 * R0 * PERIOD), rel=1e-3)


def test_poincare_shooting_newton():
    """Poincare shooting: residual ~ 0 on the exact SL orbit, Newton
    recovers the exact period (sum of return times)."""
    from bifurcationkit.jl_tpu.periodic.orbits import periodic_orbit_problem

    prob = sl_problem()
    disc = bk.PoincareShooting(M=2, steps_per_segment=150)
    X0 = disc.generate_solution(exact_orbit, PERIOD, 2)
    po = periodic_orbit_problem(prob, disc, X0)
    assert float(jnp.linalg.norm(po.F(X0, po.params))) < 1e-6
    sol = bk.newton(po, bk.NewtonPar(tol=1e-10, max_iterations=30))
    assert bool(sol.converged)
    assert float(disc.period(sol.u)) == pytest.approx(PERIOD, rel=1e-7)


def test_rodas3_stiff_flow():
    """RODAS3 fixed-step Rosenbrock (the stiff-flow replacement for the
    reference's Rodas4P/QNDF in brusselatorShooting.jl): 3rd-order accurate
    on a smooth flow, L-stable on a stiff one, and AD-differentiable
    (monodromy through the LU solves)."""
    from bifurcationkit.jl_tpu.periodic.flow import Flow

    def F(u, p):
        x, y = u[0], u[1]
        r2 = x * x + y * y
        return jnp.array([x - y - x * r2, x + y - y * r2])

    u0 = jnp.array([0.3, 0.1])
    ref = Flow(F, steps=20000, method="dopri5")(u0, None, 5.0)
    e1 = float(jnp.linalg.norm(Flow(F, steps=200, method="rodas3")(
        u0, None, 5.0) - ref))
    e2 = float(jnp.linalg.norm(Flow(F, steps=400, method="rodas3")(
        u0, None, 5.0) - ref))
    assert e1 < 2e-6
    assert e1 / e2 > 5.0          # -> 8 for order 3

    # L-stability: lambda*dt = 1e4 decays to 0 instead of exploding
    out = Flow(lambda u, p: -1e6 * u, steps=100,
               method="rodas3")(jnp.array([1.0]), None, 1.0)
    assert abs(float(out[0])) < 1e-12

    M = Flow(F, steps=60, method="rodas3").monodromy(u0, None, 2.0)
    Mref = Flow(F, steps=5000, method="dopri5").monodromy(u0, None, 2.0)
    assert float(jnp.abs(M - Mref).max()) < 1e-4


def test_monodromy_assoc_matches_seq_on_orbit():
    """associative-scan monodromy == sequential chain == the
    discretization's own monodromy, on a converged Stuart-Landau orbit."""
    from bifurcationkit.jl_tpu.periodic.floquet import monodromy_from_maps
    from bifurcationkit.jl_tpu.periodic.orbits import (newton_po,
                                                       periodic_orbit_problem)

    sl = models.stuart_landau()
    disc = bk.Collocation(Ntst=25, m=4)
    X0 = disc.generate_solution(
        lambda t: np.array([1.05 * np.cos(t), 1.05 * np.sin(t)]),
        5 * np.pi, 2)
    sol, pop = newton_po(sl, disc, X0,
                         options=bk.NewtonPar(tol=1e-10, max_iterations=15))
    assert bool(sol.converged)
    maps = disc.interval_maps(pop.prob_vf, sol.u, pop.params)
    M_seq = monodromy_from_maps(maps, method="seq")
    M_tree = monodromy_from_maps(maps, method="assoc")
    np.testing.assert_allclose(np.asarray(M_tree), np.asarray(M_seq),
                               atol=1e-10)
    mult = np.sort_complex(np.linalg.eigvals(np.asarray(M_tree)))
    # trivial multiplier 1 present
    assert np.abs(mult - 1.0).min() < 1e-6
