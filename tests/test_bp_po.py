"""Branch points of periodic orbits on the Freire oscillator
(ref test/periodic_orbits_bp_po/freire.jl): the PO branch from the first
Hopf carries branch points; switching at the second BP yields a branch
with NS and PD points (the reference's hard assertions)."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


@pytest.fixture(scope="module")
def freire_po_branch():
    prob = models.freire()
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-6, p_min=-1.0,
                            p_max=0.6, max_steps=200, detect_bifurcation=3,
                            nev=3, n_inversion=8,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.PALC(), cp)
    hopfs = br.get_special_points("hopf")
    assert len(hopfs) == 1
    assert hopfs[0].param == pytest.approx(-0.58933, abs=1e-4)

    cp_po = bk.ContinuationPar(ds=-0.001, dsmax=0.01, dsmin=1e-8,
                               p_min=-0.7, p_max=-0.4, max_steps=150,
                               detect_bifurcation=3, nev=4, n_inversion=6,
                               max_bisection_steps=15, tol_stability=1e-4,
                               newton_options=bk.NewtonPar(
                                   tol=1e-9, max_iterations=25))
    br_po = bk.continuation_hopf_po(br, br.specialpoint.index(hopfs[0]),
                                    cp_po, disc=bk.Collocation(Ntst=30, m=4),
                                    delta_p=0.001)
    return prob, br, br_po


def test_freire_po_branch_points(freire_po_branch):
    """Two BPs on the PO branch (ref freire.jl:44-45)."""
    prob, br, br_po = freire_po_branch
    bps = br_po.gamma.get_special_points("bp")
    params = sorted({round(b.param, 4) for b in bps})
    assert any(abs(p + 0.5843) < 2e-3 for p in params)
    assert any(abs(p + 0.5870) < 2e-3 for p in params)


def test_freire_bp_normal_form(freire_po_branch):
    """BP-of-PO normal form via the PRM fixed-point problem: a branch point
    (a01 ~ 0), with a pitchfork-like reduced equation (ref freire.jl:48-52;
    the reference's coefficient asserts are @test_skip, so only the robust
    invariants are pinned here)."""
    prob, br, br_po = freire_po_branch
    sps = br_po.gamma.specialpoint
    bp2 = [b for b in br_po.gamma.get_special_points("bp")
           if abs(b.param + 0.587) < 2e-3][0]
    pt = bk.get_normal_form_po(br_po, sps.index(bp2), verbose=True)
    assert type(pt).__name__ in ("Pitchfork", "Transcritical", "BranchPoint")
    assert abs(pt.nf["a01"]) < 1e-3          # it IS a branch point, not fold
    assert np.isfinite(pt.nf["b11"]) and abs(pt.nf["b11"]) > 1.0
    assert np.isfinite(pt.nf["b30"])


@pytest.fixture(scope="module")
def freire_switched_branch(freire_po_branch):
    prob, br, br_po = freire_po_branch
    sps = br_po.gamma.specialpoint
    bp2 = [b for b in br_po.gamma.get_special_points("bp")
           if abs(b.param + 0.587) < 2e-3][0]
    cp2 = bk.ContinuationPar(ds=-0.001, dsmax=0.005, dsmin=1e-8, p_min=-0.7,
                             p_max=-0.4, max_steps=80, detect_bifurcation=3,
                             nev=4, n_inversion=6, tol_stability=1e-4,
                             newton_options=bk.NewtonPar(tol=1e-8,
                                                         max_iterations=30))
    return bk.bp_po_branch_switch(br_po, sps.index(bp2), cp2,
                                  ampfactor=0.01, delta_p=-0.001)


def test_freire_bp_branch_switch_ns_pd(freire_switched_branch):
    """aBS at the second BP: the switched branch carries an NS then a PD
    point (ref freire.jl:61-62 hard assertions)."""
    br2 = freire_switched_branch
    types = [s.type for s in br2.gamma.specialpoint if s.type != "endpoint"]
    assert "ns" in types and "pd" in types
    ns = br2.gamma.get_special_points("ns")[0]
    pd = br2.gamma.get_special_points("pd")[0]
    assert ns.param == pytest.approx(-0.5917, abs=2e-3)
    assert pd.param == pytest.approx(-0.6150, abs=2e-3)
    # PD criticality on the switched branch (ref freire.jl:69 hard assert:
    # SuperCritical) via the Iooss flow form (b3 < 0)
    pt = bk.get_normal_form_po(br2, br2.gamma.specialpoint.index(pd),
                               method="iooss")
    assert pt.subtype == "SuperCritical"


def test_freire_ns_iooss_normal_form(freire_switched_branch):
    """NS normal form by Iooss periodic normalization: subcritical
    (ref freire.jl:65-66, ns SubCritical with Re b > 0), and the PRM route
    agrees on criticality."""
    br2 = freire_switched_branch
    ns = br2.gamma.get_special_points("ns")[0]
    idx = br2.gamma.specialpoint.index(ns)
    pt = bk.neimark_sacker_iooss(br2, idx, verbose=True)
    assert pt.subtype == "SubCritical"
    assert pt.nf["d"].real > 0
    assert np.isfinite(pt.nf["a"])
    assert 0 < pt.omega < np.pi
    pt_prm = bk.get_normal_form_po(br2, idx)
    assert pt_prm.subtype == "SubCritical"


def test_freire_ns_curve_functional(freire_switched_branch):
    """NS curve continuation in (nu, beta) through the FUNCTIONAL MA
    formulation (sigma on the discretized PO problem, k=2 block bordered
    condensation — ref MinAugNS.jl:36-236): along the curve the critical
    Floquet pair must stay ON the unit circle at the tracked angle."""
    from bifurcationkit.jl_tpu.periodic.codim2 import continuation_ns
    from bifurcationkit.jl_tpu.linalg.eig import dense_eig

    br2 = freire_switched_branch
    ns = br2.gamma.get_special_points("ns")[0]
    idx = br2.gamma.specialpoint.index(ns)
    cp2 = bk.ContinuationPar(
        ds=1e-3, dsmax=3e-3, dsmin=1e-8, p_min=0.3, p_max=0.7,
        max_steps=3, detect_bifurcation=0, detect_event=0,
        save_sol_every_step=1,
        newton_options=bk.NewtonPar(tol=1e-7, max_iterations=30))
    brc = continuation_ns(br2, idx, "beta", cp2, detect_codim3=0)
    tab = brc.gamma._table()
    assert len(tab["param"]) >= 3
    theta = np.asarray(tab["theta"])
    assert np.all((theta > 0) & (theta < np.pi))
    # independent check at the last point: a Floquet multiplier sits at
    # e^{i theta} (unit modulus) for the inner orbit
    po_prob = br2.gamma.prob
    sol = brc.gamma.sol[-1]
    Y = np.asarray(sol["x"])
    nX = int(np.asarray(po_prob.u0).shape[0])
    from bifurcationkit.jl_tpu.core.lens import as_lens

    maprob = brc.gamma.prob
    par = maprob.set_lens_param(maprob.params, float(sol["p"]))
    vf_lens = as_lens(po_prob.prob_vf.lens)
    po_par = {k: v for k, v in par.items() if k not in ("_a", "_b")}
    po_par["_inner"] = vf_lens.set(par["_inner"], float(Y[nX]))
    M = po_prob.disc.monodromy(po_prob.prob_vf, jnp.asarray(Y[:nX]), po_par)
    mult = np.asarray(dense_eig(M)[0])
    th_last = float(Y[nX + 1])
    target = np.exp(1j * th_last)
    assert np.min(np.abs(mult - target)) < 5e-3
