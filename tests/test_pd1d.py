"""BVAM 1D reaction-diffusion (ref examples/pd-1d.jl, Aragon et al. PRE 86
026201): Turing-pattern oscillations with a period-doubling cascade — the
reference's PD-of-periodic-orbits PDE workload, run through collocation +
COP at n = 100."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.linalg.eig import dense_eig
from bifurcationkit.jl_tpu.periodic.codim2 import pd_branch_switch
from bifurcationkit.jl_tpu.periodic.orbits import (continuation_hopf_po,
                                                   get_periodic_orbit)


@pytest.fixture(scope="module")
def bvam_po_branch():
    prob = models.bvam_1d(N=50)
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-9, max_iterations=100))
    assert bool(sol.converged)
    cp = bk.ContinuationPar(ds=-0.001, dsmax=0.051, dsmin=1e-5, p_min=-1.8,
                            p_max=0.0, max_steps=40, detect_bifurcation=3,
                            nev=21, n_inversion=10,
                            newton_options=bk.NewtonPar(tol=1e-9,
                                                        max_iterations=25))
    br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
    ih = [i for i, sp in enumerate(br.specialpoint)
          if sp.type == "hopf"][0]
    cpo = bk.ContinuationPar(ds=0.01, dsmax=0.015, dsmin=1e-4, p_min=-1.8,
                             p_max=0.0, max_steps=40, detect_bifurcation=3,
                             n_inversion=6, tol_stability=1e-4,
                             newton_options=bk.NewtonPar(tol=1e-8,
                                                         max_iterations=20))
    brpo = continuation_hopf_po(br, ih, cpo, bk.Collocation(Ntst=30, m=4),
                                use_cop=True)
    return br, brpo


def test_bvam_hopf_location(bvam_po_branch):
    br, brpo = bvam_po_branch
    hopfs = [sp.param for sp in br.specialpoint if sp.type == "hopf"]
    assert hopfs and abs(hopfs[0] - (-0.867)) < 5e-3


def test_bvam_pd_cascade(bvam_po_branch):
    """PD points accumulate along the Turing-oscillation branch; the
    critical Floquet multiplier at the bisected location is -1."""
    br, brpo = bvam_po_branch
    pds = [sp for sp in brpo.gamma.specialpoint if sp.type == "pd"]
    assert len(pds) >= 2
    sp = pds[0]
    assert abs(sp.param - (-1.327)) < 2e-2
    po_prob = brpo.gamma.prob
    M = po_prob.disc.monodromy(po_prob.prob_vf, jnp.asarray(sp.x),
                               po_prob.set_lens_param(po_prob.params,
                                                      sp.param))
    mult, _ = dense_eig(M)
    i0 = int(np.argmin(np.abs(np.asarray(mult) + 1.0)))
    assert abs(np.asarray(mult)[i0] + 1.0) < 1e-2


def test_bvam_pd_branch_switch(bvam_po_branch):
    """aBS at the first PD lands on a genuine period-2 orbit: the two halves
    of the doubled orbit differ (a symmetric collapse would make them
    identical) and the period is ~2T."""
    br, brpo = bvam_po_branch
    ipd = [i for i, sp in enumerate(brpo.gamma.specialpoint)
           if sp.type == "pd"][0]
    sp = brpo.gamma.specialpoint[ipd]
    cpd = brpo.gamma.contparams.replace(
        ds=-0.005, max_steps=4, detect_bifurcation=0, save_sol_every_step=1,
        newton_options=bk.NewtonPar(tol=1e-9, max_iterations=40,
                                    linesearch=True))
    br2 = pd_branch_switch(brpo, ipd, cpd, ampfactor=0.02, use_cop=True)
    orb = get_periodic_orbit(br2, 0)
    u = orb["u"]
    half = u.shape[0] // 2
    assert np.abs(u[:half] - u[half:2 * half]).max() > 0.1
    assert abs(orb["period"] - 2 * float(sp.x[-1])) < 0.2


def test_bvam_pd_curve_functional_formulation(bvam_po_branch):
    """VERDICT r1 #4 'Done' criterion: PD curve continuation on the BVAM
    1D PDE at collocation scale through the FUNCTIONAL MA formulation —
    sigma on the discretized PO problem via COP condensation, Newton via
    one-pass bordered condensation (POMinAugLS).  At this size the MA
    unknown vector has (Ntst*m+1)*2N + 2 = 12102 entries: materializing
    the dense AD jacobian of the augmented system (the old
    dense-monodromy path) is infeasible, the condensation path is not."""
    from bifurcationkit.jl_tpu.periodic.codim2 import continuation_pd
    from bifurcationkit.jl_tpu.periodic.floquet import FloquetColl

    br, brpo = bvam_po_branch
    ipd = [i for i, sp in enumerate(brpo.gamma.specialpoint)
           if sp.type == "pd"][0]
    cp2 = bk.ContinuationPar(
        ds=2e-3, dsmax=5e-3, dsmin=1e-7, p_min=0.05, p_max=0.12,
        max_steps=3, detect_bifurcation=0, detect_event=0,
        save_sol_every_step=1,
        newton_options=bk.NewtonPar(tol=1e-7, max_iterations=30))
    brc = continuation_pd(brpo, ipd, "D", cp2, detect_codim3=0)
    tab = brc.gamma._table()
    assert len(tab["param"]) >= 3
    # the curve moved in the second parameter and p1 adjusted smoothly
    assert np.ptp(np.asarray(tab["param"])) > 5e-4
    assert np.all(np.abs(np.diff(np.asarray(tab["p1"]))) < 0.1)
    # the defining property holds along the curve: Floquet multiplier -1
    # at the last point, computed INDEPENDENTLY via FloquetColl
    po_prob = brpo.gamma.prob
    sol = brc.gamma.sol[-1]
    Y = np.asarray(sol["x"])
    nX = int(np.asarray(po_prob.u0).shape[0])
    from bifurcationkit.jl_tpu.core.lens import as_lens
    from bifurcationkit.jl_tpu.periodic.cop import (
        collocation_block_jacobian)

    maprob = brc.gamma.prob
    par = maprob.set_lens_param(maprob.params, float(sol["p"]))
    vf_lens = as_lens(po_prob.prob_vf.lens)
    po_par = {k: v for k, v in par.items() if k not in ("_a", "_b")}
    po_par["_inner"] = vf_lens.set(par["_inner"], float(Y[nX]))
    blocks = collocation_block_jacobian(po_prob.disc, po_prob.prob_vf,
                                        jnp.asarray(Y[:nX]), po_par)
    expo, _, _, _ = FloquetColl()(blocks, 4)
    mult = np.exp(np.asarray(expo))
    assert np.min(np.abs(mult + 1.0)) < 5e-2
