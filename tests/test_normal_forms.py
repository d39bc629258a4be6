"""Normal form tests with closed-form gold values
(mirrors ref test/normal_forms/testNF.jl)."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.detection.points import (Hopf, NdBranchPoint,
                                                    Pitchfork, Transcritical)


def _cp(**kw):
    base = dict(ds=0.01, dsmax=0.05, dsmin=1e-4, p_min=-1.0, p_max=1.0,
                max_steps=200, detect_bifurcation=3, nev=2, n_inversion=6,
                max_bisection_steps=30,
                newton_options=bk.NewtonPar(tol=1e-10))
    base.update(kw)
    return bk.ContinuationPar(**base)


def test_pitchfork_nf_coefficients():
    prob = models.pitchfork_1d(p=-0.5)
    br = bk.continuation(prob, bk.PALC(), _cp())
    nf = bk.get_normal_form(br, 0)
    assert isinstance(nf, Pitchfork)
    # F = p*u - u^3: a01 = 0, b11 = 1, b20 = 0, b30 = -6
    assert abs(nf.nf["a01"]) < 1e-6
    assert nf.nf["b11"] == pytest.approx(1.0, abs=1e-5)
    assert abs(nf.nf["b20"]) < 1e-6
    assert nf.nf["b30"] == pytest.approx(-6.0, abs=1e-4)


def test_transcritical_nf_coefficients():
    prob = models.transcritical_1d(p=-0.5)
    br = bk.continuation(prob, bk.PALC(), _cp())
    nf = bk.get_normal_form(br, 0)
    assert isinstance(nf, Transcritical)
    # F = p*u - u^2: b11 = 1, b20 = -2
    assert nf.nf["b11"] == pytest.approx(1.0, abs=1e-5)
    assert nf.nf["b20"] == pytest.approx(-2.0, abs=1e-4)


def test_hopf_nf_coefficients():
    # z' = (p + i*omega) z + l1 z|z|^2 with omega=1, l1=-1:
    # expect a = 1, b = -1 (supercritical)
    prob = models.hopf_normal_2d(p=-0.5, omega=1.0, l1=-1.0)
    br = bk.continuation(prob, bk.PALC(), _cp())
    hp = bk.get_normal_form(br, 0)
    assert isinstance(hp, Hopf)
    assert hp.omega == pytest.approx(1.0, abs=1e-4)
    assert hp.nf["a"].real == pytest.approx(1.0, abs=1e-4)
    # with unit-norm zeta the Lyapunov coefficient convention gives b = 2*l1
    # (hand-checked: orbit radius then matches sqrt(dp) exactly)
    assert hp.nf["b"].real == pytest.approx(-2.0, abs=1e-3)
    assert hp.subtype == "SuperCritical"
    # predictor: orbit x-amplitude = 2*|zeta_x|*amp = sqrt(ds) at p + ds;
    # reported amp = 2*sqrt(-ds*Re(a)/Re(b)) = 2*sqrt(ds/2)
    pred = bk.predictor(hp, 0.04)
    assert pred["dsfactor"] == 1
    assert pred["amp"] == pytest.approx(2 * np.sqrt(0.04 / 2), rel=1e-3)
    assert pred["period"] == pytest.approx(2 * np.pi, rel=1e-2)
    # the predicted orbit must lie on the true limit cycle |z| = sqrt(dp)
    orb0 = np.asarray(pred["orbit"](0.0))
    assert np.linalg.norm(orb0) == pytest.approx(np.sqrt(0.04), rel=0.05)


def test_branch_switching_pitchfork():
    prob = models.pitchfork_1d(p=-0.5)
    br = bk.continuation(prob, bk.PALC(), _cp())
    br2 = bk.continuation_from_bp(br, 0, _cp(detect_bifurcation=0), delta_p=0.02)
    assert len(br2) > 5
    # the bifurcated branch is u = ±sqrt(p): check |u| ≈ sqrt(p)
    tbl = br2.gamma._table()
    mask = tbl["param"] > 0.05
    assert mask.sum() > 3
    np.testing.assert_allclose(tbl["norm"][mask],
                               np.sqrt(tbl["param"][mask]), rtol=1e-4)


def test_nd_normal_form_and_multicontinuation():
    # decoupled double pitchfork: F = (p x - x^3, p y - y^3), 2d kernel at 0
    def F(u, par):
        return jnp.array([par["p"] * u[0] - u[0] ** 3,
                          par["p"] * u[1] - u[1] ** 3])

    prob = bk.BifurcationProblem(F, u0=jnp.zeros(2), params={"p": -0.5},
                                 lens="p")
    br = bk.continuation(prob, bk.PALC(), _cp(nev=2))
    nds = br.get_special_points("nd")
    assert len(nds) == 1
    nf = bk.get_normal_form(br, 0)
    assert isinstance(nf, NdBranchPoint)
    # b30[i,i,i,i] = -6, b11 = I
    np.testing.assert_allclose(nf.nf["b11"], np.eye(2), atol=1e-4)
    assert nf.nf["b30"][0, 0, 0, 0] == pytest.approx(-6.0, abs=1e-3)
    assert nf.nf["b30"][1, 1, 1, 1] == pytest.approx(-6.0, abs=1e-3)
    assert abs(nf.nf["b30"][0, 1, 1, 1]) < 1e-4

    from bifurcationkit.jl_tpu.normal_forms import nd_branch_predictors

    preds = nd_branch_predictors(nf, 0.02)
    # roots for dp>0: (±s,0),(0,±s),(±s,±s) -> 8 nontrivial
    assert len(preds) == 8

    nf2, branches = bk.multicontinuation(br, 0, _cp(detect_bifurcation=0))
    assert len(branches) >= 4


def test_bifurcation_diagram():
    prob = models.pitchfork_1d(p=-0.5)
    diag = bk.bifurcationdiagram(prob, bk.PALC(), level=2,
                                 contparams=_cp())
    # root branch + two-sided bifurcated branch(es)
    assert len(diag.children) >= 1
    child = diag.children[0]
    assert child.level == 2
    assert len(child.gamma) > 5
