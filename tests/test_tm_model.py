"""Tsodyks-Markram neural-mass model: the reference's ODE tutorial workload
(ref examples/TMModel.jl) — equilibrium branch, Hopf curve in (E0, alpha),
and PO branching from a point ON the Hopf curve
(ref continuation_from_hopf_point, src/periodicorbit/PeriodicOrbits.jl:530).
"""
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.orbits import (
    continuation_from_hopf_point, get_periodic_orbit)


@pytest.fixture(scope="module")
def tm_branch():
    prob = models.tsodyks_markram()
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-6, p_min=-10.0,
                            p_max=1.0, max_steps=300, detect_bifurcation=3,
                            nev=3, n_inversion=8,
                            newton_options=bk.NewtonPar(tol=1e-10))
    return prob, bk.continuation(prob, bk.PALC(), cp, bothside=True)


def test_tm_special_points(tm_branch):
    """The S-shaped equilibrium branch carries two folds and two Hopfs
    (ref examples/TMModel.jl:25-27 and the reference tutorial plot)."""
    prob, br = tm_branch
    folds = sorted({round(sp.param, 3) for sp in br.specialpoint
                    if sp.type == "fold"})
    hopfs = sorted(sp.param for sp in br.specialpoint if sp.type == "hopf")
    assert len(folds) == 2
    assert abs(folds[0] - (-1.8652)) < 2e-3
    assert abs(folds[1] - (-1.4630)) < 2e-3
    assert len(hopfs) == 2
    assert abs(hopfs[0] - (-1.8501)) < 2e-3
    assert abs(hopfs[1] - (-1.1511)) < 2e-3
    # self-validating: at the detected Hopf the jacobian has a pair on the
    # imaginary axis
    sp = [s for s in br.specialpoint if s.type == "hopf"][-1]
    par = prob.set_lens_param(prob.params, sp.param)
    J = prob.jacobian(sp.x, par)
    vals = np.linalg.eigvals(np.asarray(J))
    i = np.argmin(np.abs(vals.real))
    assert abs(vals[i].real) < 1e-3
    assert abs(vals[i].imag) > 1.0


@pytest.fixture(scope="module")
def tm_hopf_curve(tm_branch):
    prob, br = tm_branch
    ih = [i for i, sp in enumerate(br.specialpoint)
          if sp.type == "hopf"][-1]
    cph = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-7, p_min=0.2,
                             p_max=5.0, max_steps=60, detect_bifurcation=2,
                             save_sol_every_step=1,
                             newton_options=bk.NewtonPar(tol=1e-9,
                                                         max_iterations=25))
    return bk.continuation_hopf(br, ih, "alpha", cph, bothside=True)


def test_tm_hopf_curve(tm_hopf_curve):
    """The Hopf curve continues in alpha (ref TMModel.jl:29-33) and each
    stored point keeps J - i*omega*I singular (self-validating MA check)."""
    g = tm_hopf_curve.gamma
    assert len(g.sol) > 30
    maprob = g.prob
    prob = maprob.inner_prob
    n = maprob.n_inner
    for idx in (5, len(g.sol) // 2, -5):
        X = np.asarray(g.sol[idx]["x"])
        x, p1, omega = X[:n], float(X[n]), float(X[n + 1])
        params = maprob.outer_lens.set(prob.params, float(g.sol[idx]["p"]))
        params = maprob.inner_lens.set(params, p1)
        J = np.asarray(prob.jacobian(maprob.unravel_inner(X[:n]), params))
        sv = np.linalg.svd(J - 1j * omega * np.eye(n), compute_uv=False)
        assert sv[-1] < 1e-6, (idx, sv[-1])


def test_tm_po_from_hopf_curve_point(tm_hopf_curve):
    """Branch to periodic orbits from a mid-curve Hopf point; the period of
    the small-amplitude orbit matches 2*pi/omega of that curve point
    (ref continuation_from_hopf_point, PeriodicOrbits.jl:530-601)."""
    g = tm_hopf_curve.gamma
    idx = len(g.sol) // 3
    X = np.asarray(g.sol[idx]["x"])
    omega = float(X[3 + 1])
    cpo = bk.ContinuationPar(ds=0.001, dsmax=0.01, dsmin=1e-7, p_min=0.2,
                             p_max=5.0, max_steps=8, detect_bifurcation=0,
                             save_sol_every_step=1,
                             newton_options=bk.NewtonPar(tol=1e-8,
                                                         max_iterations=20))
    brpo = continuation_from_hopf_point(tm_hopf_curve, idx, cpo,
                                        bk.Collocation(Ntst=25, m=4),
                                        delta_p=0.02)
    gp = brpo.gamma
    assert len(gp) >= 5
    orb = get_periodic_orbit(brpo, 0)
    assert abs(orb["period"] - 2 * np.pi / abs(omega)) < 0.05
    # orbit actually oscillates in E
    E = orb["u"][:, 0]
    assert E.max() - E.min() > 1e-4
