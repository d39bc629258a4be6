"""Event-system tests on the reference's event fixture
(ref test/events_user_function/event.jl:64-210): the Feve vector field with
events at known parameter values, checking counts, labels, and bisection
precision."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.detection.events import (ContinuousEvent,
                                                    DiscreteEvent,
                                                    PairOfEvents,
                                                    SetOfEvents,
                                                    bif_detect_event,
                                                    save_at_event)


def feve_problem():
    """ref Feve, event.jl:64-71 (k = 3)."""

    def F(X, par):
        x, y = X[0], X[1]
        p1 = par["p1"]
        return jnp.array([p1 + x - y - x ** 3 / 3,
                          p1 + y + x - 2 * y ** 3 / 3])

    return bk.BifurcationProblem(F, u0=-2 * jnp.ones(2),
                                 params={"p1": -3.0, "p2": -3.0}, lens="p1")


def _cp(**kw):
    base = dict(ds=0.001, dsmax=0.1, dsmin=1e-8, p_min=-3.0, p_max=4.0,
                max_steps=1000, detect_bifurcation=0, detect_fold=False,
                detect_event=2,
                newton_options=bk.NewtonPar(tol=1e-10, max_iterations=8))
    base.update(kw)
    return bk.ContinuationPar(**base)


def test_continuous_event_precise_location():
    """One continuous event p+2 = 0: located at p = -2 by bisection
    (ref event.jl:95-101)."""
    prob = feve_problem()
    ev = ContinuousEvent(nb=1, condition=lambda it, st: (st.p + 2.0,))
    br = bk.continuation(prob, bk.PALC(), _cp(), event=ev)
    pts = [sp for sp in br.specialpoint if sp.type not in ("endpoint",)]
    assert len(pts) >= 1
    assert pts[0].param == pytest.approx(-2.0, abs=1e-6)
    assert pts[0].interval[0] <= pts[0].param <= pts[0].interval[1]


def test_continuous_event_two_components_labels():
    """Two components with custom labels (ref event.jl:105-115)."""
    prob = feve_problem()
    ev = ContinuousEvent(
        nb=2,
        condition=lambda it, st: (st.p + 2.0, float(st.z.u[0]) - 1.0),
        labels=["User-2.0", "User1.0"])
    br = bk.continuation(prob, bk.PALC(), _cp(), event=ev)
    types = [sp.type for sp in br.specialpoint if sp.type != "endpoint"]
    assert "User-2.0" in types
    assert "User1.0" in types
    p_at = [sp.param for sp in br.specialpoint if sp.type == "User-2.0"]
    assert min(abs(p + 2.0) for p in p_at) < 1e-6


def test_discrete_event():
    """Discrete event p > -2 changes value at p = -2
    (ref event.jl:144-147)."""
    prob = feve_problem()
    ev = DiscreteEvent(nb=1,
                       condition=lambda it, st: (float(st.p > -2.0),))
    br = bk.continuation(prob, bk.PALC(), _cp(), event=ev)
    pts = [sp for sp in br.specialpoint if sp.type != "endpoint"]
    assert len(pts) >= 1
    assert abs(pts[0].param + 2.0) < 0.15   # located to within one step


def test_pair_of_events():
    """Continuous (p = 0) + discrete (p > -2) composite
    (ref event.jl:176-184)."""
    prob = feve_problem()
    ev = PairOfEvents(
        ContinuousEvent(nb=1, condition=lambda it, st: (st.p,),
                        labels=["pzero"]),
        DiscreteEvent(nb=1, condition=lambda it, st: (float(st.p > -2.0),),
                      labels=["pgt"]))
    br = bk.continuation(prob, bk.PALC(), _cp(), event=ev)
    types = [sp.type for sp in br.specialpoint if sp.type != "endpoint"]
    assert "pzero" in types
    assert "pgt" in types
    pz = [sp for sp in br.specialpoint if sp.type == "pzero"][0]
    assert abs(pz.param) < 1e-6


def test_save_at_event():
    """SaveAtEvent at several parameter values (ref event.jl:119-130)."""
    prob = feve_problem()
    ev = save_at_event((-2.0, 0.0, 1.0))
    br = bk.continuation(prob, bk.PALC(), _cp(), event=ev)
    saved = sorted(sp.param for sp in br.specialpoint
                   if sp.type.startswith("save"))
    # the S-shaped branch crosses p = -2 three times (the reference's own
    # SaveAtEvent((-2.,)) test records 3 points, event.jl:119-121), plus one
    # crossing each of 0 and 1
    assert len(saved) == 5
    np.testing.assert_allclose(saved, [-2.0, -2.0, -2.0, 0.0, 1.0],
                               atol=1e-6)


def test_bif_detect_event_matches_detection():
    """BifDetectEvent reproduces the standard detection's special points
    (ref event.jl:166-173)."""
    prob = feve_problem()
    cp0 = _cp(detect_bifurcation=3, detect_event=0, nev=2, n_inversion=8)
    br0 = bk.continuation(prob, bk.PALC(), cp0)
    types0 = [sp.type for sp in br0.specialpoint if sp.type != "endpoint"]
    assert len(types0) >= 1

    br = bk.continuation(prob, bk.PALC(),
                         _cp(detect_bifurcation=1, nev=2),
                         event=bif_detect_event())
    pts = [sp for sp in br.specialpoint if sp.type != "endpoint"]
    assert len(pts) >= len(types0)
    # every true bifurcation is matched by an event at the same parameter
    for sp0 in br0.specialpoint:
        if sp0.type == "endpoint":
            continue
        assert min(abs(sp.param - sp0.param) for sp in pts) < 5e-2
