"""1D quintic Swift-Hohenberg (ref examples/SHpde_snaking.jl): the snaking
workload.  Gold values: flat-branch bifurcations at the exact discrete
dispersion thresholds (1 + mu_k)^2 (mu_k = Dirichlet second-difference
eigenvalues), and the roll fold at the amplitude-equation value
lam = -9 nu^2/40 = -0.9."""
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.normal_forms.branch_switch import \
    continuation_from_bp


@pytest.fixture(scope="module")
def sh1d_flat_branch():
    prob = models.swift_hohenberg_1d()
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.01, dsmin=1e-4, p_min=-1.0,
                            p_max=1.0, max_steps=120, detect_bifurcation=3,
                            nev=20, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-8,
                                                        max_iterations=30))
    return prob, bk.continuation(prob, bk.PALC(), cp)


def test_sh1d_flat_branch_thresholds(sh1d_flat_branch):
    """Bifurcations off u=0 at lam = (1 + mu_k)^2 exactly (discrete
    dispersion of the Dirichlet second difference) — cross-implementation
    gold values computed here from the numpy eigenvalue formula."""
    prob, br = sh1d_flat_branch
    n, l_dom = 200, 6.0
    h = 2 * l_dom / n
    k = np.arange(1, n + 1)
    mu = -(4 / h ** 2) * np.sin(k * np.pi / (2 * (n + 1))) ** 2
    lam_gold = np.sort((1 + mu) ** 2)
    lam_gold = lam_gold[lam_gold < 1.0]
    found = [sp.param for sp in br.specialpoint if sp.type == "bp"]
    assert len(found) == len(lam_gold) == 5
    np.testing.assert_allclose(sorted(found), lam_gold, atol=2e-3)


def test_sh1d_roll_fold_amplitude_equation(sh1d_flat_branch):
    """Branch switching at the first bp: the roll branch folds at
    lam = -9 nu^2 / 40 = -0.9 (quintic amplitude equation
    lam + (3/4) nu a^2 - (5/8) a^4 = 0, fold at a^2 = 3 nu / 5)."""
    prob, br = sh1d_flat_branch
    cp2 = br.contparams.replace(ds=-0.01, max_steps=250,
                                detect_bifurcation=0, detect_fold=True)
    b1 = continuation_from_bp(br, 0, cp2, delta_p=-0.005)
    folds = [sp.param for sp in b1.gamma.specialpoint if sp.type == "fold"]
    assert folds
    assert abs(folds[0] - (-0.9)) < 2e-2


def test_sh1d_deflated_continuation_coexistence(sh1d_flat_branch):
    """DefCont from the trivial state at lam=-0.1 discovers coexisting
    branches (trivial + rolls at least) (ref SHpde_snaking.jl:97-107)."""
    prob, br = sh1d_flat_branch
    algdc = bk.DefCont(deflation_operator=bk.DeflationOperator(
        power=2.0, alpha=1.0, max_roots=12), max_branches=8,
        perturb_factor=0.02)
    cpd = br.contparams.replace(ds=0.001, dsmax=0.005, max_steps=60,
                                p_max=0.25, p_min=-1.0,
                                detect_bifurcation=0,
                                newton_options=bk.NewtonPar(
                                    tol=1e-9, max_iterations=15))
    res = bk.deflated_continuation(prob, algdc, cpd)
    assert len(res) >= 2
