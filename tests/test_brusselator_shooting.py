"""Hopf -> periodic orbits on the 1D Brusselator PDE via STANDARD SHOOTING
with the stiff RODAS3 flow (ref examples/brusselatorShooting.jl: Shooting +
Rodas4P + matrix-free Newton).  Cross-validated against the collocation+COP
discretization of the same branch — the reference's strongest test pattern
(same problem through independent discretizations must agree)."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.orbits import continuation_hopf_po

N_SITES = 20


@pytest.fixture(scope="module")
def bruss_branch():
    prob = models.brusselator_1d(n=N_SITES)
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.02, dsmin=1e-6, p_min=0.29,
                            p_max=0.8, max_steps=120, detect_bifurcation=3,
                            nev=10, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-9))
    br = bk.continuation(prob, bk.PALC(), cp)
    return br


def test_bruss_hopf_location(bruss_branch):
    hopfs = [sp.param for sp in bruss_branch.specialpoint
             if sp.type == "hopf"]
    # measured 0.48915 at n=20 (the reference's n=100 run has it near 0.51)
    assert hopfs and abs(hopfs[0] - 0.4892) < 1e-2


def test_bruss_shooting_po_vs_collocation(bruss_branch):
    """aBS from the Hopf with Shooting(rodas3) and with Collocation+COP;
    the two period curves agree to ~1e-4 on the overlap."""
    br = bruss_branch
    ih = [i for i, sp in enumerate(br.specialpoint)
          if sp.type == "hopf"][0]
    cpo = bk.ContinuationPar(ds=0.01, dsmax=0.02, dsmin=1e-6, p_min=0.29,
                             p_max=0.75, max_steps=4, detect_bifurcation=2,
                             nev=6, tol_stability=1e-3,
                             newton_options=bk.NewtonPar(
                                 tol=1e-7, max_iterations=20,
                                 linesearch=True))
    br_sh = continuation_hopf_po(
        br, ih, cpo, delta_p=0.02,
        disc=bk.Shooting(M=2, steps_per_segment=30, method="rodas3"))
    tab = br_sh.gamma._table()
    assert len(tab["param"]) >= 4
    # the small-amplitude orbits near onset are stable (supercritical Hopf)
    assert bool(np.asarray(tab["stable"])[0])
    # period near onset ~ 2pi/omega of the bifurcating Hopf pair
    sp = br.specialpoint[ih]
    ev = np.asarray(sp.eigenvals)
    omega = abs(float(np.imag(ev[np.argmin(np.abs(ev.real))])))
    assert abs(np.asarray(tab["period"])[0] - 2 * np.pi / omega) < 0.1

    br_cl = continuation_hopf_po(
        br, ih, cpo.replace(newton_options=cpo.newton_options.replace(
            linesearch=False)),
        delta_p=0.02, disc=bk.Collocation(Ntst=20, m=4), use_cop=True)
    tab2 = br_cl.gamma._table()

    p_sh, per_sh = np.asarray(tab["param"]), np.asarray(tab["period"])
    p_cl, per_cl = np.asarray(tab2["param"]), np.asarray(tab2["period"])
    o = np.argsort(p_sh)
    p_sh, per_sh = p_sh[o], per_sh[o]
    o = np.argsort(p_cl)
    p_cl, per_cl = p_cl[o], per_cl[o]
    lo = max(p_sh.min(), p_cl.min())
    hi = min(p_sh.max(), p_cl.max())
    assert hi > lo
    ps = np.linspace(lo, hi, 5)
    mism = np.abs(np.interp(ps, p_sh, per_sh)
                  - np.interp(ps, p_cl, per_cl)).max()
    assert mism < 1e-3
