"""Continuation engine tests (mirrors ref test/continuation/simple_continuation.jl
and test/continuation/test_bif_detection.jl)."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


def _cp(**kw):
    base = dict(ds=0.01, dsmax=0.05, dsmin=1e-4, p_min=-1.0, p_max=1.0,
                max_steps=200, detect_bifurcation=3, nev=2, n_inversion=6,
                max_bisection_steps=30,
                newton_options=bk.NewtonPar(tol=1e-10))
    base.update(kw)
    return bk.ContinuationPar(**base)


def test_palc_simple_branch():
    # F(u, p) = u^3 - u - p : smooth fold-containing branch
    def F(u, par):
        return u ** 3 - u - par["p"]

    prob = bk.BifurcationProblem(F, u0=jnp.array([-1.1]),
                                 params={"p": -0.3}, lens="p")
    br = bk.continuation(prob, bk.PALC(), _cp(detect_bifurcation=0,
                                              detect_fold=True))
    assert len(br) > 10
    # the cubic has folds at p = ±2/(3 sqrt(3)) ≈ ±0.3849
    folds = br.get_special_points("fold")
    assert len(folds) >= 1
    assert abs(abs(folds[0].param) - 2 / (3 * np.sqrt(3))) < 0.02


def test_palc_monotone_branch_natural_match():
    # monotone branch continued by both algorithms must agree
    def F(u, par):
        return jnp.array([jnp.tanh(u[0]) + u[0] - par["p"]])

    prob = bk.BifurcationProblem(F, u0=jnp.zeros(1), params={"p": 0.0},
                                 lens="p")
    cp = _cp(detect_bifurcation=0, detect_fold=False, p_min=-0.9, p_max=0.9)
    br1 = bk.continuation(prob, bk.PALC(), cp)
    br2 = bk.continuation(prob, bk.Natural(), cp)
    # compare solutions at a matching parameter by interpolation
    p_test = 0.5
    i1 = np.argmin(np.abs(br1.param - p_test))
    i2 = np.argmin(np.abs(br2.param - p_test))
    n1 = br1["norm"][i1]
    n2 = br2["norm"][i2]
    assert abs(n1 - n2) < 5e-2
    # both should reach the upper bound
    assert br1.param.max() > 0.89
    assert br2.param.max() > 0.89


def test_bordered_tangent_palc():
    def F(u, par):
        return u ** 3 - u - par["p"]

    prob = bk.BifurcationProblem(F, u0=jnp.array([-1.1]),
                                 params={"p": -0.3}, lens="p")
    br = bk.continuation(prob, bk.PALC(tangent=bk.Bordered()),
                         _cp(detect_bifurcation=0))
    folds = br.get_special_points("fold")
    assert len(folds) >= 1


def test_bifurcation_detection_pitchfork():
    prob = models.pitchfork_1d(p=-0.5)
    br = bk.continuation(prob, bk.PALC(), _cp())
    bps = br.get_special_points("bp")
    assert len(bps) == 1
    bp = bps[0]
    # bisection localizes the BP at p = 0
    assert abs(bp.param) < 3e-3
    # interval invariant (ref test_bif_detection.jl:47)
    assert bp.interval[0] <= bp.param <= bp.interval[1]
    assert bp.status in ("converged", "guess", "guessL")


def test_bifurcation_detection_hopf():
    prob = models.hopf_normal_2d(p=-0.5)
    br = bk.continuation(prob, bk.PALC(), _cp())
    hopfs = br.get_special_points("hopf")
    assert len(hopfs) == 1
    hp = hopfs[0]
    assert abs(hp.param) < 3e-3
    assert hp.interval[0] <= hp.param <= hp.interval[1]
    # delta records two eigenvalues crossing with imaginary parts
    assert abs(hp.delta[0]) == 2


def test_stability_recorded():
    prob = models.pitchfork_1d(p=-0.5)
    br = bk.continuation(prob, bk.PALC(), _cp())
    stable = br["stable"]
    n_un = br["n_unstable"]
    # trivial branch: stable for p<0, unstable for p>0
    assert stable[br.param < -0.01].all()
    assert (n_un[br.param > 0.01] > 0).all()


def test_chan_continuation_folds():
    # the Chan problem continued in alpha shows a fold near 3.33
    # (ref examples/chan.jl)
    prob = models.chan(n=101, alpha=3.0)
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.12, dsmin=1e-5, p_min=0.0,
                            p_max=4.25, max_steps=150, detect_bifurcation=0,
                            detect_fold=True,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.PALC(), cp)
    folds = br.get_special_points("fold")
    # S-shaped branch: two folds (verified against an independent dense-Newton
    # parameter sweep: the lower-branch fold is at alpha = 4.04116)
    assert len(folds) >= 2
    assert abs(folds[0].param - 4.0412) < 0.02
    assert abs(folds[1].param - 3.155) < 0.02
    # the branch turned: param decreased after the first fold
    assert br.param[np.argmax(br.param) + 2] < folds[0].param


def test_moore_penrose():
    def F(u, par):
        return u ** 3 - u - par["p"]

    prob = bk.BifurcationProblem(F, u0=jnp.array([-1.1]),
                                 params={"p": -0.3}, lens="p")
    br = bk.continuation(prob, bk.MoorePenrose(),
                         _cp(detect_bifurcation=0))
    folds = br.get_special_points("fold")
    assert len(folds) >= 1


def test_moore_penrose_pinv():
    """pInv mode (least-norm pseudo-inverse update, ref MoorePenrose.jl
    pInv): rounds the same fold as the direct mode."""
    from bifurcationkit.jl_tpu.continuation.algorithms import MoorePenroseLS

    def F(u, par):
        return u ** 3 - u - par["p"]

    prob = bk.BifurcationProblem(F, u0=jnp.array([-1.1]),
                                 params={"p": -0.3}, lens="p")
    br = bk.continuation(prob, bk.MoorePenrose(method=MoorePenroseLS.pInv),
                         _cp(detect_bifurcation=0))
    folds = br.get_special_points("fold")
    assert len(folds) >= 1
    # from u = -1.1 increasing p, the first fold is at u = -1/sqrt(3),
    # p = +2/sqrt(27)
    assert folds[0].param == pytest.approx(2 / np.sqrt(27), abs=1e-3)


def test_bothside():
    prob = models.pitchfork_1d(p=-0.5)
    br = bk.continuation(prob, bk.PALC(), _cp(), bothside=True)
    # parameter range must span both directions from -0.5
    assert br.param.min() < -0.9
    assert br.param.max() > 0.5
    # steps relabelled monotonically
    steps = br["step"]
    assert (np.diff(steps) >= 0).all()


def test_event_detection():
    prob = models.pitchfork_1d(p=-0.5)
    ev = bk.save_at_event([-0.25, 0.25])
    br = bk.continuation(prob, bk.PALC(),
                         _cp(detect_bifurcation=1, detect_event=2),
                         event=ev)
    pts = [sp for sp in br.specialpoint if sp.type.startswith("save")]
    assert len(pts) == 2
    assert abs(pts[0].param - (-0.25)) < 0.05
    assert abs(pts[1].param - 0.25) < 0.05


def test_autoswitch():
    # steep fold-containing branch: AutoSwitch must engage PALC and turn
    def F(u, par):
        return u ** 3 - u - par["p"]

    prob = bk.BifurcationProblem(F, u0=jnp.array([-1.1]),
                                 params={"p": -0.3}, lens="p")
    br = bk.continuation(prob, bk.AutoSwitch(tol_param=0.5),
                         _cp(detect_bifurcation=0))
    folds = br.get_special_points("fold")
    assert len(folds) >= 1


def test_manual_iteration_api():
    """The iterator protocol is public (the checkpointing surface —
    ref iterate_from_two_points, src/Continuation.jl:408)."""
    prob = models.pitchfork_1d(p=-0.5)
    it = bk.ContIterable(prob, bk.PALC(), _cp(detect_bifurcation=0))
    state = it.init_state()
    ps = [state.p]
    for _ in range(10):
        it.iterate(state)
        assert state.converged
        ps.append(state.p)
    assert ps[-1] > ps[0]
    # resume from the same state object: continue further
    for _ in range(5):
        it.iterate(state)
    assert state.p > ps[-1]


def test_newton_callback_in_palc():
    # a callback that always rejects is threaded into every corrector:
    # the very first Newton solve must already fail
    def reject(d, **k):
        return jnp.array(False)

    def F(u, par):
        return u ** 3 - u - par["p"]

    prob = bk.BifurcationProblem(F, u0=jnp.array([-1.1]),
                                 params={"p": -0.3}, lens="p")
    it = bk.ContIterable(prob, bk.PALC(), _cp(detect_bifurcation=0),
                         callback_newton=reject)
    with pytest.raises(RuntimeError, match="Newton failed"):
        it.init_state()


def test_continuation_pytree_state():
    """Full continuation + detection with a dict pytree state (the L0
    genericity the reference tests with custom vector types,
    ref test/continuation/test-cont-non-vector.jl)."""
    def F(u, par):
        x = u["x"]
        y = u["y"]
        return {"x": x ** 3 - x - par["p"] + 0.1 * y, "y": y - x * x}

    prob = bk.BifurcationProblem(
        F, u0={"x": jnp.array([-1.1]), "y": jnp.array([1.2])},
        params={"p": -0.3}, lens="p")
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-6, p_min=-1,
                            p_max=1, max_steps=150, detect_bifurcation=3,
                            nev=2, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.PALC(), cp)
    folds = br.get_special_points("fold")
    assert len(folds) == 2
    # the perturbed cubic's folds bracket the unperturbed +-2/sqrt(27)
    ps = sorted(f.param for f in folds)
    assert -0.6 < ps[0] < -0.2 and 0.2 < ps[1] < 0.6
    # solutions stay dict pytrees
    assert set(br.sol[0]["x"].keys()) == {"x", "y"}


def test_chan_spectral_matches_fd_folds():
    """Chebyshev-spectral Chan (the chan-af.jl analog: dense spectral
    differentiation instead of the FD stencil) reproduces the FD folds to
    ~2e-4 at a third of the dofs — the non-array-discretization genericity
    check."""
    folds = {}
    for name, prob in (("fd", models.chan()),
                       ("spectral", models.chan_spectral(N=31))):
        sol = bk.newton(prob, bk.NewtonPar(tol=1e-11, max_iterations=30))
        assert bool(sol.converged)
        cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-4, p_min=0.0,
                                p_max=4.2, max_steps=200,
                                detect_bifurcation=3, nev=6,
                                newton_options=bk.NewtonPar(tol=1e-10))
        br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
        folds[name] = sorted(sp.param for sp in br.specialpoint
                             if sp.type == "fold")
    assert len(folds["fd"]) == len(folds["spectral"]) == 2
    for a, b in zip(folds["fd"], folds["spectral"]):
        assert abs(a - b) < 1e-3
