"""CO-oxidation model: gold values from the reference's own test suite
(ref test/hopf_codim_2/COModel.jl:26-107)."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


@pytest.fixture(scope="module")
def co_branch():
    prob = models.co_oxidation()
    cp = bk.ContinuationPar(ds=0.002, dsmax=0.01, dsmin=1e-6, p_min=0.5,
                            p_max=2.3, max_steps=100, detect_bifurcation=3,
                            nev=3, n_inversion=6, max_bisection_steps=25,
                            newton_options=bk.NewtonPar(tol=1e-10))
    return prob, bk.continuation(prob, bk.PALC(), cp, bothside=True)


def test_co_branch_special_points(co_branch):
    """Special points at q2 ~ {1.041, 1.0422, 1.0516, 1.0522}
    (ref COModel.jl:31-34)."""
    prob, br = co_branch
    pts = sorted(sp.param for sp in br.specialpoint
                 if sp.type in ("bp", "hopf", "fold"))
    gold = [1.04099606, 1.04204851, 1.05158367, 1.05220029]
    assert len(pts) >= 4
    for g in gold:
        assert min(abs(p - g) for p in pts) < 2e-3, (g, pts)


@pytest.fixture(scope="module")
def co_fold_curve(co_branch):
    prob, br = co_branch
    folds = [sp for sp in br.specialpoint if sp.type in ("fold", "bp")]
    idx = br.specialpoint.index(folds[0])
    cp2 = bk.ContinuationPar(ds=-0.001, dsmax=0.05, dsmin=1e-7, p_min=0.0,
                             p_max=2.2, max_steps=150, detect_bifurcation=0,
                             detect_fold=False, n_inversion=8,
                             newton_options=bk.NewtonPar(tol=1e-9,
                                                         max_iterations=30))
    return bk.continuation_fold(br, idx, "k", cp2,
                                detect_codim2_bifurcation=2, bothside=True)


def test_co_bt_normal_form(co_fold_curve):
    """BT at q2 = 1.417628 with a = 0.083784, b = 2.1363 — exact gold
    values from the reference's own tests (ref COModel.jl:57,68-69);
    the second BT sits at q2 = 1.161199 (ref :59)."""
    prob = co_fold_curve.gamma.prob.inner_prob
    from bifurcationkit.jl_tpu.codim2.normal_forms import bt_normal_form

    brf = co_fold_curve
    found = {}
    for i, sp in enumerate(brf.gamma.specialpoint):
        if sp.type != "bt":
            continue
        sol = bk.newton_bt(brf, i)
        if not bool(sol.converged):
            continue
        Y = np.asarray(sol.u)
        q2r, kr = float(Y[3]), float(Y[4])
        params = dict(prob.params)
        params["q2"] = q2r
        params["k"] = kr
        pt = bt_normal_form(prob, jnp.asarray(Y[:3]), params)
        found[round(q2r, 4)] = pt
    assert 1.4176 in found, sorted(found)
    assert 1.1612 in found, sorted(found)
    pt = found[1.4176]
    assert abs(pt.nf["a"]) == pytest.approx(0.083784, rel=1e-3)
    assert abs(pt.nf["b"]) == pytest.approx(2.1363, rel=1e-3)


def test_co_cusp_normal_form(co_fold_curve):
    """Cusp coefficient |c| ~ 0.362 (ref COModel.jl:63)."""
    brf = co_fold_curve
    cusps = [sp for sp in brf.specialpoint if sp.type == "cusp"]
    if not cusps:
        pytest.skip("cusp outside the continued fold-curve segment")
    i = brf.gamma.specialpoint.index(cusps[0])
    pt = bk.get_normal_form_codim2(brf, i)
    assert abs(pt.nf["c"]) == pytest.approx(0.362, rel=1e-1)


def test_co_gh_l2(co_branch):
    """Bautin l2 near the reference's gold GH (q2 ~ 0.896-0.924,
    l2 ~ -776.89; ref COModel.jl:100-107).

    The GH sits in a near-BT region (omega ~ 0.06), where event-based
    localization needs the reference's 1e-12 bisection; here we bisect the
    Bautin l1 directly along the Hopf curve (fixed-p2 MA Newton solves) and
    check l2's sign and magnitude."""
    from bifurcationkit.jl_tpu.normal_forms import bautin_normal_form
    from bifurcationkit.jl_tpu.continuation.engine import ContIterable

    prob, br = co_branch
    hopfs = br.get_special_points("hopf")
    idx = br.specialpoint.index(hopfs[0])
    cp2 = bk.ContinuationPar(ds=-0.0001, dsmax=0.02, dsmin=1e-6, p_min=0.0,
                             p_max=2.8, max_steps=150, detect_bifurcation=0,
                             detect_fold=False,
                             newton_options=bk.NewtonPar(tol=1e-9,
                                                         max_iterations=30))
    brh = bk.continuation_hopf(br, idx, "k", cp2,
                               detect_codim2_bifurcation=0, bothside=True)
    gamma = brh.gamma
    maprob = gamma.prob
    it = ContIterable(maprob, bk.PALC(), cp2)

    def l1l2_at(k, Xg):
        X, cv, *_ = it.kernels.newton_fixed(jnp.asarray(Xg),
                                            jnp.asarray(k), maprob.params)
        assert bool(cv)
        Xn = np.asarray(X)
        params = dict(prob.params)
        params["q2"] = float(Xn[3])
        params["k"] = float(k)
        pt = bautin_normal_form(prob, jnp.asarray(Xn[:3]), params)
        return X, pt

    # bracket: curve samples whose bautin-l1 changes sign in the gold
    # q2-region
    cand = [(s["p"], s["x"]) for s in gamma.sol
            if 0.80 < float(np.asarray(s["x"])[3]) < 1.00]
    assert len(cand) >= 2
    vals = []
    for k, X in cand:
        _, pt = l1l2_at(k, X)
        vals.append(pt.nf["l1"])
    sign_change = [i for i in range(len(vals) - 1)
                   if np.sign(vals[i]) != np.sign(vals[i + 1])]
    assert sign_change, f"no l1 sign change found; l1 = {vals}"
    i = sign_change[0]
    (ka, Xa), (kb, _) = cand[i], cand[i + 1]
    la = vals[i]
    X = Xa
    for _ in range(50):
        km = 0.5 * (ka + kb)
        X, pt = l1l2_at(km, X)
        if abs(pt.nf["l1"]) < 1e-8 or abs(kb - ka) < 1e-12:
            break
        if np.sign(pt.nf["l1"]) == np.sign(la):
            ka, la = km, pt.nf["l1"]
        else:
            kb = km
    q2_gh = float(np.asarray(X)[3])
    assert (abs(q2_gh - 0.924255) < 3e-2 or abs(q2_gh - 0.896099) < 3e-2), \
        (q2_gh, pt.nf)
    # gold l2 = -776.89: same sign and order of magnitude
    assert pt.nf["l2"] < 0
    assert 150 < abs(pt.nf["l2"]) < 4000, pt.nf["l2"]
