"""Mittelmann 2D Gelfand-Bratu problem (ref examples/mittleman.jl): the
reference's showcase for Nd branch points, `multicontinuation` and the
automatic bifurcation diagram.  Flat states solve u = lam*e^u exactly
(Neumann BCs), so the primary fold sits at lam = 1/e — a mesh-independent
gold value."""
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.normal_forms.branch_switch import (
    continuation_from_bp, multicontinuation)


@pytest.fixture(scope="module")
def mit_branch():
    prob = models.mittelmann(Nx=20, Ny=20)
    cp = bk.ContinuationPar(ds=0.005, dsmax=0.05, dsmin=1e-4, p_min=0.01,
                            p_max=3.5, max_steps=150, detect_bifurcation=3,
                            nev=16, n_inversion=6, tol_stability=1e-6,
                            newton_options=bk.NewtonPar(tol=1e-9,
                                                        max_iterations=20))
    return prob, bk.continuation(prob, bk.PALC(), cp)


def test_mittelmann_special_points(mit_branch):
    """Fold at lam = 1/e exactly; first three bifurcation points on the flat
    branch with 1d/2d/1d kernels (ref mittleman.jl tutorial; 30x30 values
    0.36788/0.27256/0.15215)."""
    prob, br = mit_branch
    folds = [sp.param for sp in br.specialpoint if sp.type == "fold"]
    assert folds and abs(folds[0] - np.exp(-1.0)) < 1e-4
    kinds = [(sp.type, round(sp.param, 3)) for sp in br.specialpoint
             if sp.type in ("bp", "nd")]
    # (bp at the fold), nd(2) from the square symmetry, then a simple bp
    assert ("nd", 0.273) in kinds
    assert any(t == "bp" and abs(p - 0.152) < 5e-3 for t, p in kinds)


def test_mittelmann_multicontinuation_d4(mit_branch):
    """The 2d branch point on the square splits into the D4 pattern: 4
    stripe roots on one side of lam, 4 diagonal roots on the other
    (ref multicontinuation, src/bifdiagram/BranchSwitching.jl:234-441)."""
    prob, br = mit_branch
    ind_nd = [i for i, sp in enumerate(br.specialpoint)
              if sp.type == "nd"][0]
    cp2 = br.contparams.replace(ds=0.001, max_steps=12, detect_bifurcation=0,
                                save_sol_every_step=1)
    nf, branches = multicontinuation(br, ind_nd, cp2)
    assert nf.N == 2
    assert len(branches) == 8
    # every switched branch converged away from the flat state: the field
    # must be non-constant
    for b in branches:
        x = np.asarray(b.gamma.sol[-1]["x"])
        assert np.ptp(x) > 1e-4


def test_mittelmann_simple_bp_switch(mit_branch):
    """aBS at the simple branch point near lam=0.152 yields a non-flat
    branch (symmetry-broken state)."""
    prob, br = mit_branch
    ind_bp = [i for i, sp in enumerate(br.specialpoint)
              if sp.type == "bp" and abs(sp.param - 0.152) < 5e-3][0]
    cp2 = br.contparams.replace(ds=0.001, max_steps=12, detect_bifurcation=0,
                                save_sol_every_step=1)
    b = continuation_from_bp(br, ind_bp, cp2)
    x = np.asarray(b.gamma.sol[-1]["x"])
    assert np.ptp(x) > 1e-4


def test_mittelmann_nd_nf_mf_parity(mit_branch):
    """Matrix-free Nd normal form (block bordered inverse iteration +
    N-border extended-operator projections — nothing materializes the
    jacobian) against the dense path at the D4 branch point.  The kernel
    basis carries a rotation freedom, so the comparison uses
    basis-INVARIANT quantities plus the (basis-independent) predicted
    branch states."""
    from bifurcationkit.jl_tpu.normal_forms.codim1_nd import (
        get_normal_form_nd, nd_branch_predictors)

    prob, br = mit_branch
    ind_nd = [i for i, sp in enumerate(br.specialpoint)
              if sp.type == "nd"][0]
    nf_d = get_normal_form_nd(prob, br, ind_nd)
    nf_m = get_normal_form_nd(prob, br, ind_nd, matrix_free=True)
    np.testing.assert_allclose(
        np.sort(np.linalg.eigvals(nf_m.nf["b11"]).real),
        np.sort(np.linalg.eigvals(nf_d.nf["b11"]).real), rtol=1e-8)
    assert np.linalg.norm(nf_m.nf["a01"]) < 1e-7   # pitchfork-type: a ~ 0
    pd_ = nd_branch_predictors(nf_d, 0.001)
    pm_ = nd_branch_predictors(nf_m, 0.001)
    assert len(pd_) == len(pm_) == 8               # D4: 4 stripes + 4 diags
    Xd = np.stack([p["x1"] for p in pd_])
    Xm = np.stack([p["x1"] for p in pm_])
    D = np.linalg.norm(Xd[:, None, :] - Xm[None, :, :], axis=2)
    assert np.max(np.sort(D.min(axis=1))) < 1e-8
