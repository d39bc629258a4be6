"""Codim-2 normal forms (ref src/codim2/NormalForms.jl).

* Bogdanov-Takens: Jordan pair (q0, q1) + adjoint pair, quadratic
  coefficients of  xi0' = xi1, xi1' = a xi0^2 + b xi0 xi1
  (ref :141-506; Kuznetsov 8.4), with local fold/Hopf curve predictors.
* Cusp: cubic coefficient c of the reduced equation on the fold curve
  (ref :15-141).
* Bautin / Zero-Hopf / Hopf-Hopf: point records with eigen-data; the l2
  coefficient lives in normal_forms/bautin.py and the ZH/HH coupling
  coefficients in codim2/zh_hh.py.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..detection.points import (Bautin, BogdanovTakens, Cusp, HopfHopf,
                                ZeroHopf)
from ..linalg.eig import dense_eig
from ..normal_forms.codim1 import _FlatProblem, _inner


def _bt_basis(J):
    """Jordan chain q0, q1 (J q0 = 0, J q1 = q0) and adjoint chain p1, p0
    (J' p1 = 0, J' p0 = p1) normalized so <p0,q0> = <p1,q1> = 1,
    <p1,q0> = <p0,q1> = 0 (ref :170-260)."""
    J = np.asarray(J)
    n = J.shape[0]
    # null vector via SVD (robust for the near-defective jacobian)
    U, S, Vh = np.linalg.svd(J)
    q0 = Vh[-1].real
    q0 /= np.linalg.norm(q0)
    p1 = U[:, -1].real
    p1 /= np.linalg.norm(p1)
    # generalized eigenvector: J q1 = q0, solved in the least-squares sense
    # with the singular direction projected out
    q1, *_ = np.linalg.lstsq(J, q0, rcond=None)
    # J' p0 = p1
    p0, *_ = np.linalg.lstsq(J.T, p1, rcond=None)

    # gauge fix (Kuznetsov / reference convention, MinAugBT.jl): q0 unit,
    # q1 orthogonal to q0 (J q1 = q0 is preserved: q0 in ker J), then the
    # adjoint chain biorthonormalized: <p1,q1> = <p0,q0> = 1, <p0,q1> = 0
    q1 = q1 - np.dot(q0, q1) * q0
    s = np.dot(p1, q1)
    if abs(s) < 1e-12:
        raise RuntimeError("BT basis: <p1, q1> ~ 0; point is not a clean BT")
    p1 = p1 / s
    p0 = p0 - np.dot(p0, q1) * p1
    s0 = np.dot(p0, q0)
    if abs(s0) < 1e-12:
        raise RuntimeError("BT basis: <p0, q0> ~ 0")
    p0 = p0 / s0
    return (jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(p0),
            jnp.asarray(p1))


def _bt_basis_mf(fp, prob, params, precond=None,
                 gmres_opts=None, seed=None, sweeps: int = 3):
    """Matrix-free BT Jordan chains through the bordered-solver abstraction
    (ref the reference computing the same objects via `bls`,
    src/codim2/NormalForms.jl:148-262).  At a bisection-located BT the
    zero eigenvalue is DEFECTIVE up to a residual delta: the two nearby
    eigenvalues +-sqrt(delta) make plain inverse iteration O(sqrt(delta))
    inaccurate, so q0/p1 come from SINGULAR-vector iteration (alternating
    J^T/J bordered solves — the matrix-free analog of the dense path's
    SVD, O(delta) like it), and the generalized vectors solve
    [J, p1; q0^T, 0] [q1; s] = [q0; 0] (the border row enforces the
    q0-orthogonal gauge directly)."""
    from .minaug_mf import _make_ma_gmres, solve_bordered_ext
    from ..core.state import ravel as _ravel

    n = fp.n
    if precond is None:
        precond = getattr(prob, "spectral_precond", None)
    gm = _make_ma_gmres(precond, n, 1, gmres_opts)
    Jd = lambda d: fp.dF(d)                       # noqa: E731
    Jtd = lambda d: _ravel(prob.dFt(              # noqa: E731
        fp.unravel(fp.flat0), params, fp.unravel(d)))[0]

    @jax.jit
    def _null_sweep(q0e, p1e):
        # at a BT the [0; 1]-driven deflated solve returns the null vector
        # EXACTLY in one application: the scalar slot must vanish (the
        # border column has a p1-component, the zero rhs-top has none), so
        # J v = 0 with <q0e, v> = 1  ->  v in ker(J) = span(q0).  Iterating
        # with re-anchored borders polishes a bisection-located (near-BT)
        # point, where the accuracy is O(sqrt(delta)) in the eigenvalue
        # residual delta — matched to the MA curve's own localization.
        v, _, _ = solve_bordered_ext(Jd, p1e, q0e, gm)
        w, _, _ = solve_bordered_ext(Jtd, q0e, p1e, gm)
        return v / jnp.linalg.norm(v), w / jnp.linalg.norm(w)

    if seed is None:
        rng = np.random.default_rng(29)
        seed = rng.standard_normal(n)
    q0 = jnp.asarray(np.asarray(seed, np.asarray(fp.flat0).dtype))
    q0 = q0 / jnp.linalg.norm(q0)
    p1 = q0
    for _ in range(sweeps):
        q0, p1 = _null_sweep(q0, p1)

    @jax.jit
    def _gen_vectors(q0, p1):
        q1, _, _ = solve_bordered_ext(Jd, p1, q0, gm, rhs_top=q0,
                                      rhs_bot=0.0)
        p0, _, _ = solve_bordered_ext(Jtd, q0, p1, gm, rhs_top=p1,
                                      rhs_bot=0.0)
        return q1, p0

    q1, p0 = _gen_vectors(q0, p1)
    # same gauge as the dense _bt_basis: q0 unit, q1 orthogonal to q0
    # (enforced by the border row), then biorthonormalize the adjoints
    q0n, q1n = np.asarray(q0), np.asarray(q1)
    p0n, p1n = np.asarray(p0), np.asarray(p1)
    q1n = q1n - np.dot(q0n, q1n) * q0n
    s = np.dot(p1n, q1n)
    if abs(s) < 1e-12:
        raise RuntimeError("BT basis (mf): <p1, q1> ~ 0; not a clean BT")
    p1n = p1n / s
    p0n = p0n - np.dot(p0n, q1n) * p1n
    s0 = np.dot(p0n, q0n)
    if abs(s0) < 1e-12:
        raise RuntimeError("BT basis (mf): <p0, q0> ~ 0")
    p0n = p0n / s0
    return (jnp.asarray(q0n), jnp.asarray(q1n), jnp.asarray(p0n),
            jnp.asarray(p1n))


def bt_normal_form(prob, x0, params, verbose: bool = False,
                   matrix_free: bool = False, precond=None,
                   gmres_opts=None, seed=None):
    """BT quadratic coefficients a, b (ref :141-340):
    a = <p1, B(q0,q0)>/2,  b = <p1, B(q0,q1)> + <p0, B(q0,q0)>.

    `matrix_free=True` computes the Jordan chains through bordered
    singular-vector iteration + preconditioned extended solves — the
    PDE-scale route for BT points on MF fold curves (nothing materializes
    the jacobian)."""
    fp = _FlatProblem(prob, x0, params)
    if matrix_free:
        q0, q1, p0, p1 = _bt_basis_mf(fp, prob, params, precond=precond,
                                      gmres_opts=gmres_opts, seed=seed)
    else:
        J = fp.jacobian()
        q0, q1, p0, p1 = _bt_basis(J)
    B = lambda u, v: fp.d2F(u, v)
    Bq0q0 = B(q0, q0)
    Bq0q1 = B(q0, q1)
    a = float(jnp.dot(p1, Bq0q0)) / 2.0
    b = float(jnp.dot(p1, Bq0q1) + jnp.dot(p0, Bq0q0))
    # (a, b) ~ (-a, -b) under the basis flip (q0,q1,p0,p1) -> -(...);
    # fix the convention a > 0 (the invariant is sign(a*b) and magnitudes)
    if a < 0:
        a, b = -a, -b
        q0, q1, p0, p1 = -q0, -q1, -p0, -p1
    pt = BogdanovTakens(x0=fp.flat0, p=None, params=params, lens=prob.lens,
                        zeta=(q0, q1), zeta_star=(p0, p1),
                        nf={"a": a, "b": b}, prob=prob)
    if verbose:
        print(f"BT normal form: a = {a:.6g}, b = {b:.6g}")
    return pt


def bt_predictors(bt: BogdanovTakens, ds: float):
    """Local curve predictors emanating from a BT point in normal-form
    coordinates (beta1, beta2) (ref :342-506):
      fold curve:  beta1 = -a s^2,  beta2 free ~ 0 (parabola 4 a beta1 =
                   -(beta2)^2 shape after unfolding)
      Hopf curve:  beta1 = 0-side with omega^2 = beta... in NF coordinates
                   the Hopf curve is beta1 = 0, beta2 < 0 for a>0, b<0.
    Returns dict of parameterizations s -> (beta1, beta2)."""
    a, b = bt.nf["a"], bt.nf["b"]

    # unfolding eta1' = eta2, eta2' = beta1 + beta2 eta1 + a eta1^2
    #                                 + b eta1 eta2:
    # equilibria: a eta1^2 + beta2 eta1 + beta1 = 0
    def fold(s):
        """Fold curve: discriminant zero, beta1 = beta2^2 / (4a)."""
        return {"beta2": s, "beta1": s * s / (4.0 * a)}

    def hopf(s):
        """Hopf curve: the eta1 = 0 equilibrium with det = -beta2 > 0:
        {beta1 = 0, beta2 = -|s|}."""
        return {"beta1": 0.0, "beta2": -abs(s)}

    return {"fold": fold, "hopf": hopf}


def cusp_normal_form(prob, x0, params, verbose: bool = False,
                     matrix_free: bool = False, precond=None,
                     gmres_opts=None, seed=None):
    """Cubic coefficient at a cusp (ref :15-141): with q, p the null pair of
    J (b20 = 0 at the cusp), c = <p, C(q,q,q) + 3 B(q, h2)>/6 where
    L h2 = -E(B(q,q)).

    `matrix_free=True`: the null pair by bordered inverse iteration and h2
    through the preconditioned extended bordered operator — the PDE-scale
    route for cusp points on MF fold curves."""
    fp = _FlatProblem(prob, x0, params)
    n = fp.n
    B = lambda u, v: fp.d2F(u, v)
    C = lambda u, v, w: fp.d3F(u, v, w)
    if matrix_free:
        from ..codim2.unfolding import _mf_solver_set
        from ..codim2.minaug_mf import solve_bordered_ext
        from ..normal_forms.codim1 import null_basis_iter

        Jd, Jtd, gm1, _, _ = _mf_solver_set(fp, prob, params, precond,
                                            gmres_opts)
        dt = np.asarray(fp.flat0).dtype
        if seed is None:
            seed = np.random.default_rng(31).standard_normal(n)
        q, p = null_basis_iter(Jd, Jtd,
                               jnp.asarray(np.asarray(seed, dt)), gm1)
        q = q / jnp.linalg.norm(q)
        p = p / jnp.dot(p, q)
        Bqq = B(q, q)
        b20 = float(jnp.dot(p, Bqq))
        E = lambda x: x - jnp.dot(p, x) * q
        h2, _, _ = solve_bordered_ext(Jd, p, q, gm1, rhs_top=E(-Bqq),
                                      rhs_bot=0.0)
        c = float(jnp.dot(p, C(q, q, q) + 3.0 * B(q, h2))) / 6.0
        pt = Cusp(x0=fp.flat0, p=None, params=params, lens=prob.lens,
                  zeta=q, zeta_star=p, nf={"c": c, "b20": b20}, prob=prob)
        if verbose:
            print(f"Cusp normal form (mf): c = {c:.6g} (b20 = {b20:.3g})")
        return pt
    J = fp.jacobian()
    vals, vecs = dense_eig(J)
    i0 = int(np.argmin(np.abs(np.asarray(vals).real)))
    q = jnp.asarray(np.real(np.asarray(vecs)[:, i0]))
    q = q / jnp.linalg.norm(q)
    valsT, vecsT = dense_eig(J.T)
    iT = int(np.argmin(np.abs(np.asarray(valsT).real)))
    p = jnp.asarray(np.real(np.asarray(vecsT)[:, iT]))
    p = p / jnp.dot(p, q)

    Bqq = B(q, q)
    b20 = float(jnp.dot(p, Bqq))
    # bordered solve for h2: [J p; q' 0][h2; s] = [E(-Bqq); 0]
    E = lambda x: x - jnp.dot(p, x) * q
    A = jnp.zeros((n + 1, n + 1))
    A = A.at[:n, :n].set(J).at[:n, n].set(p).at[n, :n].set(q)
    rhs = jnp.concatenate([E(-Bqq), jnp.zeros(1)])
    h2 = jnp.linalg.solve(A, rhs)[:n]
    c = float(jnp.dot(p, C(q, q, q) + 3.0 * B(q, h2))) / 6.0
    pt = Cusp(x0=fp.flat0, p=None, params=params, lens=prob.lens,
              zeta=q, zeta_star=p, nf={"c": c, "b20": b20}, prob=prob)
    if verbose:
        print(f"Cusp normal form: c = {c:.6g} (b20 = {b20:.3g})")
    return pt


def newton_bt(br_codim2, ind_bif: int, lens2=None, options=None,
              verbose: bool = False):
    """Newton refinement of a Bogdanov-Takens point in (x, p1, p2)
    (ref newton_bt, src/codim2/MinAugBT.jl:277-440).

    Augmented system G(x, p1, p2) = (F, sigma, <w, v>) where sigma is the
    fold minimally-augmented test and <w, v> the BT test (both from
    differentiable bordered solves), solved with AD Newton."""
    from ..codim2.minaug import _adjoint_border_solve, _border_solve
    from ..core.params import NewtonPar
    from ..newton import newton as _newton
    from ..core.problem import BifurcationProblem

    gamma = getattr(br_codim2, "gamma", br_codim2)
    sp = gamma.specialpoint[ind_bif]
    maprob = gamma.prob
    inner = maprob.inner_prob
    n = maprob.n_inner
    unravel = maprob.unravel_inner
    inner_lens = maprob.inner_lens
    lens2_optic = maprob.lens         # optic over the MA param dict

    Xsp = jnp.asarray(sp.x)
    x0, p1_0 = Xsp[:n], float(Xsp[n])
    p2_0 = sp.param
    base_inner = gamma.prob.params["_inner"]

    # anchor borders at the starting point
    par0 = inner_lens.set(base_inner, p1_0)
    par0 = lens2_optic.set({"_inner": par0}, p2_0)["_inner"]
    J0 = inner.jacobian(unravel(x0), par0)
    q0, q1, p0v, p1v = _bt_basis(J0)
    a = jnp.asarray(p1v) / jnp.linalg.norm(p1v)
    b = jnp.asarray(q0) / jnp.linalg.norm(q0)

    def G(Y, par):
        x, pp1, pp2 = Y[:n], Y[n], Y[n + 1]
        params = inner_lens.set(par["_inner"], pp1)
        params = lens2_optic.set({"_inner": params}, pp2)["_inner"]
        from ..core.state import ravel as _ravel

        F = _ravel(inner.F(unravel(x), params))[0]
        J = inner.jacobian(unravel(x), params)
        v, sigma = _border_solve(J, par["_a"], par["_b"])
        w, _ = _adjoint_border_solve(J, par["_a"], par["_b"])
        v = v / jnp.linalg.norm(v)
        w = w / jnp.linalg.norm(w)
        bt = jnp.real(jnp.vdot(w, v))
        return jnp.concatenate([F, jnp.real(sigma)[None], bt[None]])

    prob_bt = BifurcationProblem(
        G, u0=jnp.concatenate([x0, jnp.asarray([p1_0, p2_0])]),
        params={"_inner": base_inner, "_a": a, "_b": b}, lens=None)
    options = options or NewtonPar(tol=1e-10, max_iterations=30)
    sol = _newton(prob_bt, options)
    if verbose:
        print(f"newton_bt: converged={bool(sol.converged)} "
              f"(p1, p2) = ({float(sol.u[n]):.8g}, {float(sol.u[n+1]):.8g})")
    return sol


def _curve_omega(X, n, maprob):
    """Hopf frequency stored in the extended MA state (hopf curves only)."""
    if getattr(maprob, "ma_kind", None) == "hopf" and X.shape[0] > n + 1:
        return abs(float(X[n + 1]))
    return None


def get_normal_form_codim2(br_codim2, ind_bif: int, verbose: bool = False,
                           matrix_free=None, **nf_kwargs):
    """Normal form at a detected codim-2 special point on a fold/hopf MA
    curve (bt/cusp/gh/zh/hh).  On a MATRIX-FREE MA curve the bt/cusp/gh/zh
    normal forms all default to the bordered/iterative route (nothing
    materialized; gh = the full MF Bautin l2 through shifted/bordered
    extended solves); pass `matrix_free=False` to force the dense path."""
    gamma = getattr(br_codim2, "gamma", br_codim2)
    sp = gamma.specialpoint[ind_bif]
    maprob = gamma.prob
    inner = maprob.inner_prob
    n = maprob.n_inner
    X = jnp.asarray(sp.x)
    x = maprob.unravel_inner(X[:n])
    p1 = float(X[n])
    # set p1 through lens1 and the curve parameter p2 through the MA
    # problem's own (lens2) optic
    par_dict = {"_inner": maprob.inner_lens.set(
        gamma.prob.params["_inner"], p1)}
    par_dict = maprob.lens.set(par_dict, sp.param)
    params = par_dict["_inner"]

    if sp.type == "bt":
        mf = matrix_free
        if mf is None:
            mf = bool(getattr(maprob, "ma_mf", False))
        kw = dict(nf_kwargs)
        if mf:
            kw.setdefault("precond", getattr(maprob, "precond", None))
            # seed the singular-vector iteration with the curve's own
            # anchors (at the BT they ARE the fold null pair)
            if "_b" in gamma.prob.params:
                kw.setdefault("seed",
                              np.asarray(gamma.prob.params["_b"]))
        pt = bt_normal_form(inner, x, params, verbose=verbose,
                            matrix_free=mf, **kw)
        pt.p = (p1, sp.param)
        return pt
    mf = matrix_free
    if mf is None:
        mf = bool(getattr(maprob, "ma_mf", False))
    mf_kw = {}
    if mf:
        mf_kw = dict(matrix_free=True,
                     precond=getattr(maprob, "precond", None))
    if sp.type == "cusp":
        kw = dict(nf_kwargs)
        if mf and "_b" in gamma.prob.params:
            # seed the null iteration with the curve's own anchor
            kw.setdefault("seed", np.asarray(gamma.prob.params["_b"]))
        pt = cusp_normal_form(inner, x, params, verbose=verbose,
                              **mf_kw, **kw)
        pt.p = (p1, sp.param)
        return pt
    if sp.type == "gh":
        from ..normal_forms.bautin import bautin_normal_form

        kw = dict(nf_kwargs)
        if mf:
            # target the curve's own Hopf frequency
            om = _curve_omega(X, n, maprob)
            if om is not None:
                kw.setdefault("omega", om)
        pt = bautin_normal_form(inner, maprob.unravel_inner(X[:n]), params,
                                verbose=verbose, **mf_kw, **kw)
        pt.p = (p1, sp.param)
        return pt
    if sp.type == "zh":
        from .zh_hh import zh_normal_form

        kw = dict(nf_kwargs)
        if mf:
            om = _curve_omega(X, n, maprob)
            if om is not None:
                kw.setdefault("omega", om)
        pt = zh_normal_form(inner, maprob.unravel_inner(X[:n]), params,
                            verbose=verbose, **mf_kw, **kw)
        pt.p = (p1, sp.param)
        return pt
    if sp.type == "hh":
        # hh_normal_form is available but its coefficient conventions are
        # still experimental; return the record with eigen-data
        return HopfHopf(x0=X[:n], p=(p1, sp.param), params=params,
                        lens=inner.lens, prob=inner)
    raise ValueError(f"point {ind_bif} has type {sp.type!r}; expected a "
                     "codim-2 type (bt/cusp/gh/zh/hh)")
