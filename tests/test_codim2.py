"""Codim-2 continuation tests with closed-form fold/Hopf curves
(mirrors ref test/fold_codim_2 and test/hopf_codim_2)."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk


def cusp_model(p1=-1.0, p2=0.0):
    """F = u^3 + p1*u + p2: fold curve 4 p1^3 + 27 p2^2 = 0, cusp at (0,0)."""

    def F(u, par):
        return u ** 3 + par["p1"] * u + par["p2"]

    return bk.BifurcationProblem(F, u0=jnp.array([1.0]),
                                 params={"p1": p1, "p2": p2}, lens="p2")


def bt_model(b1=0.5, b2=1.0):
    """Bogdanov-Takens normal form: x'=y, y'=b1+b2*x+x^2-x*y.
    Fold curve b1 = b2^2/4 with a BT point at b2 = 0."""

    def F(u, par):
        x, y = u[0], u[1]
        return jnp.array([y, par["b1"] + par["b2"] * x + x * x - x * y])

    # equilibrium on the fold branch side: x = (-b2+sqrt(b2^2-4b1))/2
    x0 = (-b2 + np.sqrt(max(b2 * b2 - 4 * b1, 0.0) + 1e-9)) / 2
    return bk.BifurcationProblem(F, u0=jnp.array([x0, 0.0]),
                                 params={"b1": b1, "b2": b2}, lens="b1")


def _cp(**kw):
    base = dict(ds=0.01, dsmax=0.05, dsmin=1e-5, p_min=-1.0, p_max=1.0,
                max_steps=150, detect_bifurcation=3, nev=2, n_inversion=4,
                newton_options=bk.NewtonPar(tol=1e-10, max_iterations=30))
    base.update(kw)
    return bk.ContinuationPar(**base)


def test_fold_curve_cusp_model():
    # continue in p2 at p1=-1: folds of u^3 - u + p2 at p2 = ±2/(3 sqrt 3)
    prob = cusp_model(p1=-1.0)
    br = bk.continuation(prob, bk.PALC(), _cp(detect_bifurcation=0,
                                              detect_fold=True))
    folds = br.get_special_points("fold")
    assert len(folds) >= 1

    # fold curve continuation in p1 (lens2)
    cp2 = _cp(ds=0.01, dsmax=0.04, p_min=-1.2, p_max=-0.001, max_steps=120,
              detect_bifurcation=0, detect_fold=False, detect_event=0)
    brf = bk.continuation_fold(br, br.specialpoint.index(folds[0]), "p1",
                               cp2, detect_codim2_bifurcation=0)
    assert len(brf) > 10
    # verify the curve satisfies 4 p1^3 + 27 p2^2 = 0
    # (record key "p1" holds the state's fold parameter = model p2;
    #  "param" is the continuation parameter = model p1)
    tbl = brf.gamma._table()
    model_p2 = tbl["p1"]
    model_p1 = tbl["param"]
    resid = 4 * model_p1 ** 3 + 27 * model_p2 ** 2
    assert np.max(np.abs(resid)) < 1e-6


def test_fold_curve_cusp_detection():
    prob = cusp_model(p1=-1.0)
    br = bk.continuation(prob, bk.PALC(), _cp(detect_bifurcation=0,
                                              detect_fold=True))
    folds = br.get_special_points("fold")
    idx = br.specialpoint.index(folds[0])
    cp2 = _cp(ds=0.01, dsmax=0.04, p_min=-1.2, p_max=1.2, max_steps=200,
              detect_bifurcation=0, detect_fold=False)
    brf = bk.continuation_fold(br, idx, "p1", cp2,
                               detect_codim2_bifurcation=2)
    cusps = [sp for sp in brf.specialpoint if sp.type == "cusp"]
    assert len(cusps) >= 1
    # cusp at (p1, p2) = (0, 0)
    assert abs(cusps[0].param) < 5e-2


def test_bt_detection_on_fold_curve():
    prob = bt_model(b1=0.5, b2=2.0)
    # find the fold in b1 at fixed b2=2: fold at b1 = 1
    cp1 = _cp(ds=0.01, dsmax=0.05, p_min=0.2, p_max=1.5, max_steps=150,
              detect_bifurcation=2, detect_fold=True, nev=2)
    br = bk.continuation(prob, bk.PALC(), cp1)
    pts = [sp for sp in br.specialpoint if sp.type in ("fold", "bp")]
    assert len(pts) >= 1
    fold_p = pts[0].param
    assert abs(fold_p - 1.0) < 0.05

    idx = br.specialpoint.index(pts[0])
    cp2 = _cp(ds=-0.02, dsmax=0.05, p_min=-2.5, p_max=2.5, max_steps=250,
              detect_bifurcation=0, detect_fold=False)
    brf = bk.continuation_fold(br, idx, "b2", cp2,
                               detect_codim2_bifurcation=2)
    # fold curve must satisfy b1 = b2^2/4
    tbl = brf.gamma._table()
    np.testing.assert_allclose(tbl["p1"], tbl["param"] ** 2 / 4, atol=1e-6)
    bts = [sp for sp in brf.specialpoint if sp.type == "bt"]
    assert len(bts) >= 1
    assert abs(bts[0].param) < 5e-2  # BT at b2 = 0


def test_hopf_curve():
    # z' = (p + q + i) z - z|z|^2: hopf curve p = -q, omega = 1
    def F(u, par):
        x, y = u[0], u[1]
        mu = par["p"] + par["q"]
        r2 = x * x + y * y
        return jnp.array([mu * x - y - x * r2, x + mu * y - y * r2])

    prob = bk.BifurcationProblem(F, u0=jnp.zeros(2),
                                 params={"p": -0.5, "q": 0.0}, lens="p")
    br = bk.continuation(prob, bk.PALC(), _cp())
    hopfs = br.get_special_points("hopf")
    assert len(hopfs) == 1

    idx = br.specialpoint.index(hopfs[0])
    cp2 = _cp(ds=0.02, dsmax=0.05, p_min=-0.8, p_max=0.8, max_steps=100,
              detect_bifurcation=0, detect_fold=False)
    brh = bk.continuation_hopf(br, idx, "q", cp2,
                               detect_codim2_bifurcation=0)
    tbl = brh.gamma._table()
    # hopf curve: p1 = -q, omega = 1
    np.testing.assert_allclose(tbl["p1"], -tbl["param"], atol=1e-8)
    np.testing.assert_allclose(tbl["omega"], 1.0, atol=1e-8)


def test_newton_fold_refine():
    prob = cusp_model(p1=-1.0)
    br = bk.continuation(prob, bk.PALC(), _cp(detect_bifurcation=0,
                                              detect_fold=True))
    folds = br.get_special_points("fold")
    idx = br.specialpoint.index(folds[0])
    sol = bk.newton_fold(br, idx)
    assert bool(sol.converged)
    # exact fold of u^3 - u + p2: u = 1/sqrt(3), p2 = 2/(3 sqrt 3)
    u_f, p2_f = float(sol.u[0]), float(sol.u[1])
    assert abs(abs(u_f) - 1 / np.sqrt(3)) < 1e-8
    assert abs(abs(p2_f) - 2 / (3 * np.sqrt(3))) < 1e-8


def test_bt_normal_form_coefficients():
    # bt_model: y' = b1 + b2 x + x^2 - x y => a = 1, b = -1 at the BT
    prob = bt_model(b1=0.0, b2=0.0)
    pt = bk.bt_normal_form(prob, jnp.zeros(2), prob.params)
    assert pt.nf["a"] == pytest.approx(1.0, abs=1e-8)
    assert pt.nf["b"] == pytest.approx(-1.0, abs=1e-8)
    preds = bk.bt_predictors(pt, 0.1)
    f = preds["fold"](0.2)
    # fold curve beta1 = beta2^2/(4a)
    assert f["beta1"] == pytest.approx(0.2 ** 2 / 4)


def test_cusp_normal_form_coefficient():
    # cusp model u^3 + p1 u + p2 at the cusp (u=0, p1=0, p2=0): c = 1
    prob = cusp_model(p1=0.0, p2=0.0)
    pt = bk.cusp_normal_form(prob, jnp.zeros(1), prob.params)
    assert pt.nf["c"] == pytest.approx(1.0, abs=1e-8)
    assert abs(pt.nf["b20"]) < 1e-10


def test_codim2_nf_from_curve():
    # BT point detected on the fold curve of bt_model -> bt_normal_form
    prob = bt_model(b1=0.5, b2=2.0)
    cp1 = _cp(ds=0.01, dsmax=0.05, p_min=0.2, p_max=1.5, max_steps=150,
              detect_bifurcation=2, detect_fold=True, nev=2)
    br = bk.continuation(prob, bk.PALC(), cp1)
    pts = [sp for sp in br.specialpoint if sp.type in ("fold", "bp")]
    idx = br.specialpoint.index(pts[0])
    cp2 = _cp(ds=-0.02, dsmax=0.05, p_min=-2.5, p_max=2.5, max_steps=250,
              detect_bifurcation=0, detect_fold=False)
    brf = bk.continuation_fold(br, idx, "b2", cp2,
                               detect_codim2_bifurcation=2)
    bts = [sp for sp in brf.specialpoint if sp.type == "bt"]
    i = brf.gamma.specialpoint.index(bts[0])
    pt = bk.get_normal_form_codim2(brf, i)
    assert pt.nf["a"] == pytest.approx(1.0, abs=1e-2)
    assert pt.nf["b"] == pytest.approx(-1.0, abs=5e-2)


def test_newton_bt_refine():
    """BT refinement: the bt_model has its BT exactly at (b1, b2) = (0, 0)."""
    prob = bt_model(b1=0.5, b2=2.0)
    cp1 = _cp(ds=0.01, dsmax=0.05, p_min=0.2, p_max=1.5, max_steps=150,
              detect_bifurcation=2, detect_fold=True, nev=2)
    br = bk.continuation(prob, bk.PALC(), cp1)
    pts = [sp for sp in br.specialpoint if sp.type in ("fold", "bp")]
    idx = br.specialpoint.index(pts[0])
    cp2 = _cp(ds=-0.02, dsmax=0.05, p_min=-2.5, p_max=2.5, max_steps=250,
              detect_bifurcation=0, detect_fold=False)
    brf = bk.continuation_fold(br, idx, "b2", cp2,
                               detect_codim2_bifurcation=2)
    bts = [sp for sp in brf.specialpoint if sp.type == "bt"]
    i = brf.gamma.specialpoint.index(bts[0])
    sol = bk.newton_bt(brf, i)
    assert bool(sol.converged)
    p1, p2 = float(sol.u[-2]), float(sol.u[-1])
    assert abs(p1) < 1e-7 and abs(p2) < 1e-7


def test_bautin_l2_normal_form():
    """l2 on the exact Bautin normal form z' = i w z + i b z|z|^2 + e z|z|^4:
    l1 = 0, l2 = 4 Re(e) (unit-norm convention, cf. Hopf b = 2 l1)."""
    from bifurcationkit.jl_tpu.normal_forms import bautin_normal_form

    w = 1.3

    def make(b, e):
        def F(u, par):
            z = u[0] + 1j * u[1]
            zz = z * jnp.conj(z)
            out = 1j * w * z + b * z * zz + e * z * zz ** 2
            return jnp.array([jnp.real(out), jnp.imag(out)])

        return bk.BifurcationProblem(F, u0=jnp.zeros(2), params={"p": 0.0},
                                     lens="p")

    pt = bautin_normal_form(make(0.3j, -1.0), jnp.zeros(2), {"p": 0.0})
    assert abs(pt.nf["l1"]) < 1e-10
    assert pt.nf["l2"] == pytest.approx(-4.0, abs=1e-8)
    assert pt.subtype == "SuperCritical"
    pt2 = bautin_normal_form(make(-0.7j, 0.5 + 0.4j), jnp.zeros(2),
                             {"p": 0.0})
    assert pt2.nf["l2"] == pytest.approx(2.0, abs=1e-8)


def test_gh_normal_form_on_hopf_curve():
    """GH detected on the Lorenz-84 Hopf curve -> Bautin l2 from the curve."""
    from bifurcationkit.jl_tpu import models

    prob = models.lorenz84()
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.04, dsmin=1e-6, p_min=-1.0,
                            p_max=5.0, max_steps=300, detect_bifurcation=3,
                            nev=4, n_inversion=6,
                            newton_options=bk.NewtonPar(tol=1e-10,
                                                        max_iterations=30))
    br = bk.continuation(prob, bk.PALC(), cp)
    i = br.specialpoint.index(br.get_special_points("hopf")[0])
    cp2 = bk.ContinuationPar(ds=0.01, dsmax=0.03, dsmin=1e-6, p_min=0.0001,
                             p_max=3.0, max_steps=100, detect_bifurcation=0,
                             detect_fold=False,
                             newton_options=bk.NewtonPar(tol=1e-9,
                                                         max_iterations=30))
    brh = bk.continuation_hopf(br, i, "G", cp2, detect_codim2_bifurcation=2)
    # the l1 sign change on this curve happens where a real eigenvalue sits
    # near zero -> it is a zero-Hopf, and the relabeling must catch that
    # (the reference also finds :zh on Lorenz-84 Hopf curves).  Genuine GH
    # gold values are validated on the CO model (test_co_model.py).
    pts = [sp for sp in brh.specialpoint if sp.type in ("gh", "zh")]
    assert len(pts) >= 1
    assert any(sp.type == "zh" for sp in pts), [sp.type for sp in pts]
    zh = [sp for sp in pts if sp.type == "zh"][0]
    X = np.asarray(zh.x)
    params = {"a": 0.25, "b": 4.0, "G": float(zh.param), "F": float(X[4])}
    J = prob.jacobian(jnp.asarray(X[:4]), params)
    vals = np.linalg.eigvals(np.asarray(J))
    realzero = vals[np.abs(vals.imag) < 1e-6]
    assert np.min(np.abs(realzero.real)) < 2e-2


def test_zh_normal_form_coefficients():
    """ZH coefficients on the exact normal form
    x' = a x^2 + b|z|^2, z' = i w z + c x z:
    G200 = 2a, G011 = 2b (unit-norm q1), G110 = c."""
    a, b, c, w = 0.7, -1.3, 0.4 + 0.2j, 1.9

    def F(u, par):
        x = u[0]
        z = u[1] + 1j * u[2]
        dx = a * x * x + b * (z * jnp.conj(z))
        dz = 1j * w * z + c * x * z
        return jnp.array([dx, jnp.real(dz), jnp.imag(dz)])

    prob = bk.BifurcationProblem(F, u0=jnp.zeros(3), params={"p": 0.0},
                                 lens="p")
    pt = bk.zh_normal_form(prob, jnp.zeros(3), {"p": 0.0})
    assert pt.nf["G200"] == pytest.approx(2 * a, abs=1e-10)
    assert pt.nf["G011"] == pytest.approx(2 * b, abs=1e-10)
    assert pt.nf["G110"] == pytest.approx(c, abs=1e-10)
    assert pt.omega == pytest.approx(w, abs=1e-10)


def test_hh_normal_form_invariants():
    """HH coefficients on the constructed normal form (ref the testNF.jl
    Fhh model, :651-671, with polynomial |w|^2): individual G's depend on
    the eigenvector scale, but the Kuznetsov classification invariants
    delta = Re G1110 / Re G2100 and theta = Re G1011 / Re G0021 are exact,
    as are the criticality signs."""
    g2100, g1011, g1110, g0021 = 1.0, 2.0, 6.0, 7.0   # model coefficients
    w1, w2 = 0.1, 0.3

    def F(u, par):
        z1 = u[0] + 1j * u[1]
        z2 = u[2] + 1j * u[3]
        ua1 = u[0] ** 2 + u[1] ** 2
        ua2 = u[2] ** 2 + u[3] ** 2
        t1 = (par["b1"] + 1j * w1) * z1 + g2100 / 2 * z1 * ua1 \
            + g1011 * z1 * ua2
        t2 = (par["b2"] + 1j * w2) * z2 + g1110 * z2 * ua1 \
            + g0021 / 2 * z2 * ua2
        return jnp.array([jnp.real(t1), jnp.imag(t1),
                          jnp.real(t2), jnp.imag(t2)])

    prob = bk.BifurcationProblem(F, u0=jnp.zeros(4),
                                 params={"b1": 0.0, "b2": 0.0}, lens="b1")
    pt = bk.hh_normal_form(prob, jnp.zeros(4), prob.params, verbose=True)
    assert pt.omega1 == pytest.approx(w1, abs=1e-10)
    assert pt.omega2 == pytest.approx(w2, abs=1e-10)
    # basis-free invariants (model coefficient ratios)
    delta = pt.nf["G1110"].real / pt.nf["G2100"].real
    theta = pt.nf["G1011"].real / pt.nf["G0021"].real
    assert delta == pytest.approx(g1110 / (g2100 / 2), rel=1e-8)
    assert theta == pytest.approx(g1011 / (g0021 / 2), rel=1e-8)
    # criticality signs
    assert pt.nf["G2100"].real > 0 and pt.nf["G0021"].real > 0
    # imaginary parts vanish on this model
    assert abs(pt.nf["G2100"].imag) < 1e-10
    assert abs(pt.nf["G1011"].imag) < 1e-10


def test_switch_codim2_zh_to_fold():
    """ZH detected on the Lorenz-84 Hopf curve -> switch to the fold curve
    through the same point (ref the continuation(br_codim2, ind, ...)
    dispatch and the lorenz84 hp_from_zh flow, lorenz84.jl:350-360): the
    fold curve must carry an exact zero eigenvalue of the inner jacobian."""
    from bifurcationkit.jl_tpu import models

    prob = models.lorenz84()
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.04, dsmin=1e-6, p_min=-1.0,
                            p_max=5.0, max_steps=300, detect_bifurcation=3,
                            nev=4, n_inversion=6,
                            newton_options=bk.NewtonPar(tol=1e-10,
                                                        max_iterations=30))
    br = bk.continuation(prob, bk.PALC(), cp)
    i = br.specialpoint.index(br.get_special_points("hopf")[0])
    cp2 = bk.ContinuationPar(ds=0.01, dsmax=0.03, dsmin=1e-6, p_min=0.0001,
                             p_max=3.0, max_steps=100, detect_bifurcation=0,
                             detect_fold=False,
                             newton_options=bk.NewtonPar(tol=1e-9,
                                                         max_iterations=30))
    brh = bk.continuation_hopf(br, i, "G", cp2, detect_codim2_bifurcation=2)
    zh = [sp for sp in brh.gamma.specialpoint if sp.type == "zh"][0]
    idx = brh.gamma.specialpoint.index(zh)
    cp3 = cp2.replace(max_steps=25)
    br_fold = bk.switch_codim2(brh, idx, cp3)
    assert len(br_fold) >= 10
    sol = br_fold.gamma.sol[len(br_fold.gamma.sol) // 2]
    X = np.asarray(sol["x"])
    params = {"a": 0.25, "b": 4.0, "G": float(sol["p"]), "F": float(X[4])}
    J = prob.jacobian(jnp.asarray(X[:4]), params)
    vals = np.linalg.eigvals(np.asarray(J))
    assert float(np.min(np.abs(vals))) < 1e-10


def test_switch_codim2_hh_to_other_hopf():
    """HH detected by inner-spectrum counting along a Hopf curve; switching
    starts the SECOND Hopf curve (other frequency), which must track the
    analytic pair-2 locus b2 + 0.4 b1 = 0 at omega = w2 (ref hp_from_hh,
    lorenz84.jl:362-371)."""
    w1, w2 = 0.9, 1.7

    def F(u, par):
        z1 = u[0] + 1j * u[1]
        z2 = u[2] + 1j * u[3]
        ua1 = u[0] ** 2 + u[1] ** 2
        ua2 = u[2] ** 2 + u[3] ** 2
        t1 = ((par["b1"] + 1j * w1) * z1 - 0.5 * z1 * ua1 - 1.0 * z1 * ua2
              + 0.3 * z1 * z2 + 0.1 * z2 * jnp.conj(z1))
        t2 = ((par["b2"] + 0.4 * par["b1"] + 1j * w2) * z2 - 2.0 * z2 * ua1
              - 1.5 * z2 * ua2 + 0.2 * z1 * z1 + 0.15 * z1 * jnp.conj(z2))
        return jnp.array([jnp.real(t1), jnp.imag(t1),
                          jnp.real(t2), jnp.imag(t2)])

    prob = bk.BifurcationProblem(F, u0=jnp.zeros(4),
                                 params={"b1": -0.3, "b2": -0.2}, lens="b1")
    cp = bk.ContinuationPar(ds=0.02, dsmax=0.05, dsmin=1e-6, p_min=-0.5,
                            p_max=0.4, max_steps=80, detect_bifurcation=3,
                            nev=4, n_inversion=6,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.PALC(), cp)
    i = br.specialpoint.index(br.get_special_points("hopf")[0])
    cp2 = bk.ContinuationPar(ds=0.02, dsmax=0.05, dsmin=1e-6, p_min=-0.5,
                             p_max=0.5, max_steps=60, detect_bifurcation=3,
                             nev=4, n_inversion=4, detect_fold=False,
                             tol_stability=1e-6,
                             newton_options=bk.NewtonPar(tol=1e-10,
                                                         max_iterations=25))
    brh = bk.continuation_hopf(br, i, "b2", cp2, detect_codim2_bifurcation=2)
    hhs = [s for s in brh.gamma.specialpoint if s.type == "hh"]
    assert len(hhs) >= 1
    assert abs(hhs[0].param) < 2e-2         # HH at b2 = 0 (guess status)
    idx = brh.gamma.specialpoint.index(hhs[0])
    br2 = bk.switch_codim2(brh, idx,
                           cp2.replace(max_steps=15, detect_bifurcation=0))
    tbl = br2.gamma._table()
    om = np.asarray(tbl["omega"])
    np.testing.assert_allclose(om, w2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tbl["param"])
                               + 0.4 * np.asarray(tbl["p1"]), 0.0,
                               atol=1e-8)


def test_switch_codim2_bt_to_hopf():
    """BT on the bt_model fold curve -> the Hopf curve {b1 = 0, b2 < 0,
    omega = sqrt(-b2)} via 2D parameter probing (ref the BT aBS,
    codim2.jl:455-560)."""
    prob = bt_model(b1=0.5, b2=2.0)
    cp1 = _cp(ds=0.01, dsmax=0.05, p_min=0.2, p_max=1.5, max_steps=150,
              detect_bifurcation=2, detect_fold=True, nev=2)
    br = bk.continuation(prob, bk.PALC(), cp1)
    pts = [sp for sp in br.specialpoint if sp.type in ("fold", "bp")]
    idx = br.specialpoint.index(pts[0])
    cp2 = _cp(ds=-0.02, dsmax=0.05, p_min=-2.5, p_max=2.5, max_steps=250,
              detect_bifurcation=0, detect_fold=False)
    brf = bk.continuation_fold(br, idx, "b2", cp2,
                               detect_codim2_bifurcation=2)
    bts = [sp for sp in brf.gamma.specialpoint if sp.type == "bt"]
    i = brf.gamma.specialpoint.index(bts[0])
    brh = bk.switch_codim2(brf, i, cp2.replace(ds=-0.01, max_steps=25))
    tbl = brh.gamma._table()
    np.testing.assert_allclose(np.asarray(tbl["p1"]), 0.0, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(tbl["omega"]),
        np.sqrt(np.maximum(-np.asarray(tbl["param"]), 0.0)), atol=1e-7)
