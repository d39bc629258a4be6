"""Codim-2 minimally-augmented continuation (ref src/codim2/*).

Fold curve: unknown X = (x, p1), functional G = (F(x, p1), sigma(x, p1))
where sigma comes from the bordered solve [J a; b' 0][v; sigma] = [0; 1]
(ref FoldMinimallyAugmentedFormulation, src/codim2/MinAugFold.jl:15-52).

Hopf curve: unknown X = (x, p1, omega), complex shift [J + i*omega*I a; b' 0]
and G = (F, Re sigma, Im sigma) (ref src/codim2/MinAugHopf.jl:19-80).

TPU design: G is a pure JAX function (the sigma solve is an (n+1) dense solve,
differentiable), so the augmented problem is an ordinary `BifurcationProblem`
and the whole PALC/detection stack applies unchanged with AD jacobians — the
reference's `MinAugMatrixBased` realization (src/jacobianTypes.jl:100-108),
which on TPU is also the fastest: one fused LU per corrector iteration on the
MXU instead of the reference's four hand-scheduled solves.

The border vectors (a, b) live in the parameter pytree, so the re-anchoring
update! hook (ref MinAugFold.jl:280-314) never retraces the kernels.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..continuation.algorithms import PALC
from ..continuation.driver import continuation
from ..continuation.results import Branch, ContResult
from ..core.lens import Lens, as_lens
from ..core.params import ContinuationPar, NewtonPar
from ..core.problem import BifurcationProblem
from ..core.state import ravel
from ..detection.events import ContinuousEvent, PairOfEvents, DiscreteEvent
from ..detection.points import SpecialPoint
from ..linalg.eig import dense_eig
from ..newton import newton


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _border_solve(J, a, b, shift=None):
    """Solve [J + shift*I, a; b', 0][v; sigma] = [0; 1]; returns (v, sigma).
    (ref test_ma / _compute_bordered_vectors, src/codim2/MinAugFold.jl:44-80)

    A complex shift over a REAL jacobian routes through the 2(n+1)
    real-block embedding (TPU-safe, f64-grade — see _border_solve_reim)."""
    if (shift is not None and not jnp.iscomplexobj(J)
            and (jnp.iscomplexobj(jnp.asarray(shift))
                 or jnp.iscomplexobj(a))):
        from ..linalg.eig import _complex_dtype

        sh = jnp.asarray(shift)
        vr, vi, sr, si = _border_solve_reim(
            J, a, b, jnp.real(sh).astype(J.dtype),
            jnp.imag(sh).astype(J.dtype))
        cdtype = _complex_dtype()
        rdt = jnp.float32 if cdtype == jnp.complex64 else jnp.float64
        v = jax.lax.complex(vr.astype(rdt), vi.astype(rdt))
        sig = jax.lax.complex(sr.astype(rdt), si.astype(rdt))
        return v, sig
    n = J.shape[0]
    dtype = jnp.result_type(J, a, b, *([shift] if shift is not None else []))
    A = jnp.zeros((n + 1, n + 1), dtype)
    Js = J.astype(dtype)
    if shift is not None:
        Js = Js + shift * jnp.eye(n, dtype=dtype)
    A = A.at[:n, :n].set(Js)
    A = A.at[:n, n].set(a.astype(dtype))
    A = A.at[n, :n].set(jnp.conj(b).astype(dtype))
    rhs = jnp.zeros((n + 1,), dtype).at[n].set(1.0)
    sol = jnp.linalg.solve(A, rhs)
    return sol[:n], sol[n]


def _adjoint_border_solve(J, a, b, shift=None):
    """Same for the adjoint system: [J' b; a' 0][w; sigma*] = [0; 1]."""
    Jt = jnp.conj(J).T if jnp.iscomplexobj(J) else J.T
    sh = None if shift is None else jnp.conj(shift)
    return _border_solve(Jt, b, a, sh)


def _border_solve_reim(J, a, b, shift_re, shift_im):
    """Complex bordered solve [J + (sr + i si) I, a; b^H, 0][v; sig] = [0; 1]
    in REAL arithmetic via the 2(n+1) block embedding
    [[Mr, -Mi], [Mi, Mr]] — f64-grade sigma on TPU, where native complex
    caps at c64 (VERDICT r1 #5; SURVEY 'Hard parts: complex arithmetic';
    ref the same device trick in linalg.eig.inverse_iteration_vectors).
    J must be real.  Returns (v_re, v_im, sig_re, sig_im) at J.dtype."""
    from ..linalg.linear import dense_solve

    n = J.shape[0]
    dt = J.dtype
    ar = jnp.real(a).astype(dt)
    ai = jnp.imag(a).astype(dt)
    br = jnp.real(b).astype(dt)
    bi = jnp.imag(b).astype(dt)
    eye = jnp.eye(n, dtype=dt)
    Mr = jnp.zeros((n + 1, n + 1), dt)
    Mr = Mr.at[:n, :n].set(J + shift_re * eye)
    Mr = Mr.at[:n, n].set(ar)
    Mr = Mr.at[n, :n].set(br)          # Re(b^H) row
    Mi = jnp.zeros((n + 1, n + 1), dt)
    Mi = Mi.at[:n, :n].set(shift_im * eye)
    Mi = Mi.at[:n, n].set(ai)
    Mi = Mi.at[n, :n].set(-bi)         # Im(b^H) row = -Im(b)^T
    big = jnp.block([[Mr, -Mi], [Mi, Mr]])
    rhs = jnp.zeros((2 * (n + 1),), dt).at[n].set(1.0)
    sol = dense_solve(big, rhs)
    return sol[:n], sol[n + 1:2 * n + 1], sol[n], sol[2 * n + 1]


# ---------------------------------------------------------------------------
# Fold MA problem
# ---------------------------------------------------------------------------


def fold_ma_problem(prob: BifurcationProblem, lens1, lens2,
                    a0, b0) -> BifurcationProblem:
    inner_lens = as_lens(lens1)
    outer_lens = as_lens(lens2)
    flat0, unravel = ravel(prob.u0)
    n = flat0.shape[0]

    def split(X):
        return X[:n], X[n]

    def G(X, par):
        x, p1 = split(X)
        params = inner_lens.set(par["_inner"], p1)
        F = ravel(prob.F(unravel(x), params))[0]
        J = prob.jacobian(unravel(x), params)
        _, sigma, = _border_solve(J, par["_a"], par["_b"])
        return jnp.concatenate([F, jnp.real(sigma)[None]])

    lens = Lens(
        get=lambda par: outer_lens.get(par["_inner"]),
        set=lambda par, v: {**par, "_inner": outer_lens.set(par["_inner"], v)},
        name=f"fold-ma/{outer_lens.name}")

    def record(X, p2, **k):
        x, p1 = split(X)
        return {"param": p2, "p1": p1, "norm": jnp.linalg.norm(x)}

    def eig_jacobian(X, par):
        x, p1 = split(X)
        params = inner_lens.set(par["_inner"], p1)
        return prob.jacobian(unravel(x), params)

    maprob = BifurcationProblem(
        G, u0=None,
        params={"_inner": prob.params, "_a": flat0 * 0 + 1.0,
                "_b": flat0 * 0 + 1.0},
        lens=lens, record_from_solution=record, delta=prob.delta,
        update=_make_minaug_update(prob, inner_lens, n, unravel,
                                   is_hopf=False))
    object.__setattr__(maprob, "eig_jacobian", eig_jacobian)
    object.__setattr__(maprob, "inner_prob", prob)
    object.__setattr__(maprob, "inner_lens", inner_lens)
    object.__setattr__(maprob, "n_inner", n)
    object.__setattr__(maprob, "unravel_inner", unravel)
    object.__setattr__(maprob, "ma_kind", "fold")
    object.__setattr__(maprob, "outer_lens", outer_lens)
    return maprob


# ---------------------------------------------------------------------------
# Hopf MA problem
# ---------------------------------------------------------------------------


def hopf_ma_problem(prob: BifurcationProblem, lens1, lens2,
                    a0, b0) -> BifurcationProblem:
    inner_lens = as_lens(lens1)
    outer_lens = as_lens(lens2)
    flat0, unravel = ravel(prob.u0)
    n = flat0.shape[0]

    def split(X):
        return X[:n], X[n], X[n + 1]

    def G(X, par):
        x, p1, omega = split(X)
        params = inner_lens.set(par["_inner"], p1)
        F = ravel(prob.F(unravel(x), params))[0]
        J = prob.jacobian(unravel(x), params)
        # lambda = +i*omega convention: J - i*omega*I is the singular
        # operator with right null vector zeta (ref MinAugHopf.jl:19-80,
        # which uses the conjugate convention).  The complex-shifted
        # bordered solve runs in the 2(n+1) REAL embedding so sigma keeps
        # full working precision on TPU (complex there is c64-only).
        _, _, sig_re, sig_im = _border_solve_reim(
            J, par["_a"], par["_b"], jnp.zeros((), J.dtype), -omega)
        return jnp.concatenate([F, sig_re[None], sig_im[None]])

    lens = Lens(
        get=lambda par: outer_lens.get(par["_inner"]),
        set=lambda par, v: {**par, "_inner": outer_lens.set(par["_inner"], v)},
        name=f"hopf-ma/{outer_lens.name}")

    def record(X, p2, **k):
        x, p1, omega = split(X)
        return {"param": p2, "p1": p1, "omega": omega,
                "norm": jnp.linalg.norm(x)}

    def eig_jacobian(X, par):
        x, p1, _ = split(X)
        params = inner_lens.set(par["_inner"], p1)
        return prob.jacobian(unravel(x), params)

    from ..linalg.eig import _complex_dtype
    cdtype = _complex_dtype()
    maprob = BifurcationProblem(
        G, u0=None,
        params={"_inner": prob.params,
                "_a": (flat0 * 0 + 1.0).astype(cdtype),
                "_b": (flat0 * 0 + 1.0).astype(cdtype)},
        lens=lens, record_from_solution=record, delta=prob.delta,
        update=_make_minaug_update(prob, inner_lens, n, unravel,
                                   is_hopf=True))
    object.__setattr__(maprob, "eig_jacobian", eig_jacobian)
    object.__setattr__(maprob, "inner_prob", prob)
    object.__setattr__(maprob, "inner_lens", inner_lens)
    object.__setattr__(maprob, "n_inner", n)
    object.__setattr__(maprob, "unravel_inner", unravel)
    object.__setattr__(maprob, "ma_kind", "hopf")
    object.__setattr__(maprob, "outer_lens", outer_lens)
    return maprob


def _make_minaug_update(prob, inner_lens, n, unravel, is_hopf: bool,
                        every: int = 1):
    """Re-anchor the border vectors to the current null vectors
    (ref update a,b every update_minaug_every_step, MinAugFold.jl:280-314)."""

    def update(it, state):
        if every <= 0 or state.step % every != 0:
            return None
        par = it.current_params
        X = ravel(state.z.u)[0]
        x = X[:n]
        p1 = X[n]
        params = inner_lens.set(par["_inner"], p1)
        J = prob.jacobian(unravel(x), params)
        shift = -1j * X[n + 1] if is_hopf else None
        v, _ = _border_solve(J, par["_a"], par["_b"], shift)
        w, _ = _adjoint_border_solve(J, par["_a"], par["_b"], shift)
        v = v / jnp.linalg.norm(v)
        w = w / jnp.linalg.norm(w)
        new = dict(par)
        new["_b"] = v.astype(par["_b"].dtype)
        new["_a"] = w.astype(par["_a"].dtype)
        if is_hopf and float(X[n + 1]) < 0:
            # pin omega > 0: (x, p1, -omega) is the conjugate solution; flip
            # it back so the BT test (omega -> 0) only fires at genuine BTs
            Xf = X.at[n + 1].set(-X[n + 1])
            state.z = dataclasses.replace(state.z, u=Xf)
            new["_a"] = jnp.conj(new["_a"])
            new["_b"] = jnp.conj(new["_b"])
        return new

    return update


_MA_ATTRS = ("eig_jacobian", "inner_prob", "inner_lens", "n_inner",
             "unravel_inner", "ma_kind", "outer_lens")


def _with_ma_attrs(src, dst):
    """dataclasses.replace drops the non-field MA attributes; restore them."""
    for name in _MA_ATTRS:
        object.__setattr__(dst, name, getattr(src, name))
    return dst


# ---------------------------------------------------------------------------
# starting data from a codim-1 branch point
# ---------------------------------------------------------------------------


def _fold_start(br, ind_bif):
    sp = br.specialpoint[ind_bif]
    if sp.type not in ("fold", "bp"):
        raise ValueError(f"point {ind_bif} is a {sp.type!r}, not fold/bp")
    prob = br.prob
    p1 = sp.param
    params = prob.set_lens_param(prob.params, p1)
    x_flat, unravel = ravel(sp.x)
    J = prob.jacobian(sp.x, params)
    vals, vecs = dense_eig(J)
    vals_np = np.asarray(vals)
    i0 = int(np.argmin(np.abs(vals_np.real)))
    zeta = np.array(np.real(np.asarray(vecs)[:, i0]))
    zeta /= np.linalg.norm(zeta)
    valsT, vecsT = dense_eig(J.T)
    iT = int(np.argmin(np.abs(np.asarray(valsT).real)))
    zeta_ad = np.array(np.real(np.asarray(vecsT)[:, iT]))
    zeta_ad /= np.linalg.norm(zeta_ad)
    return x_flat, p1, jnp.asarray(zeta), jnp.asarray(zeta_ad)


def _hopf_start(br, ind_bif):
    sp = br.specialpoint[ind_bif]
    if sp.type != "hopf":
        raise ValueError(f"point {ind_bif} is a {sp.type!r}, not hopf")
    prob = br.prob
    p1 = sp.param
    params = prob.set_lens_param(prob.params, p1)
    x_flat, _ = ravel(sp.x)
    J = prob.jacobian(sp.x, params)
    vals, vecs = dense_eig(J)
    vals_np = np.asarray(vals)
    cand = np.where(vals_np.imag > 1e-10)[0]
    if len(cand) == 0:
        raise RuntimeError("no complex eigenvalue found at the Hopf point")
    i0 = cand[np.argmin(np.abs(vals_np.real[cand]))]
    lam = vals_np[i0]
    omega = float(lam.imag)
    zeta = np.array(np.asarray(vecs)[:, i0])
    zeta /= np.linalg.norm(zeta)
    valsT, vecsT = dense_eig(J.T)
    valsT_np = np.asarray(valsT)
    iT = int(np.argmin(np.abs(valsT_np - np.conj(lam))))
    zeta_ad = np.array(np.asarray(vecsT)[:, iT])
    zeta_ad /= np.linalg.norm(zeta_ad)
    return x_flat, p1, omega, jnp.asarray(zeta), jnp.asarray(zeta_ad)


# ---------------------------------------------------------------------------
# codim-2 test functions as events (BT/cusp/ZH on fold; BT/GH on hopf)
# ---------------------------------------------------------------------------


def _fold_codim2_event(maprob):
    n = maprob.n_inner
    inner = maprob.inner_prob
    inner_lens = maprob.inner_lens
    unravel = maprob.unravel_inner

    def cond(it, state):
        # inject the CURRENT curve parameter p2: current_params holds the
        # base pytree only (the engine sets the lens value when evaluating
        # F) — a stale p2 freezes the test function on models where p2
        # enters it directly
        par = it.prob.set_lens_param(it.current_params, float(state.p))
        X = ravel(state.z.u)[0]
        x, p1 = X[:n], X[n]
        params = inner_lens.set(par["_inner"], p1)
        J = inner.jacobian(unravel(x), params)
        v, _ = _border_solve(J, par["_a"], par["_b"])
        w, _ = _adjoint_border_solve(J, par["_a"], par["_b"])
        v = v / jnp.linalg.norm(v)
        w = w / jnp.linalg.norm(w)
        bt = float(jnp.real(jnp.vdot(w, v)))
        # cusp = fold of the fold curve in the continuation parameter
        # (ref CP = getp(state.tau), MinAugFold.jl:574)
        cp = float(state.tau.p)
        return (bt, cp)

    cont = ContinuousEvent(nb=2, condition=cond, labels=["bt", "cusp"])

    def zh_cond(it, state):
        """ZH: count of eigenvalues beyond the fold eigenvalue with nonzero
        imaginary part (ref test_zh, MinAugFold.jl:539-549)."""
        if state.eigvals is None:
            return (0,)
        eps = it.contparams.tol_stability
        rho = np.min(np.abs(state.eigvals.real))
        cnt = int(np.sum((state.eigvals.real > rho)
                         & (state.eigvals.imag > eps)))
        return (cnt,)

    disc = DiscreteEvent(nb=1, condition=zh_cond, labels=["zh"])
    return PairOfEvents(cont, disc)


def _hopf_codim2_event(maprob, with_gh: bool = True):
    n = maprob.n_inner
    l1_fn = _make_l1_kernel(maprob) if with_gh else None

    def cond(it, state):
        X = ravel(state.z.u)[0]
        omega = float(X[n + 1])
        vals = [omega]
        if with_gh:
            # current curve parameter p2 must be set (see _fold_codim2_event)
            par = it.prob.set_lens_param(it.current_params, float(state.p))
            vals.append(float(l1_fn(X, par["_inner"])))
        return tuple(vals)

    labels = ["bt"] + (["gh"] if with_gh else [])
    return ContinuousEvent(nb=1 + int(with_gh), condition=cond,
                           labels=labels)


def _make_l1_kernel(maprob):
    """One jitted first-Lyapunov evaluation along the Hopf MA curve
    (the per-step GH test; unjitted AD chains are ~100x slower)."""
    import jax as _jax

    inner = maprob.inner_prob
    inner_lens = maprob.inner_lens
    n = maprob.n_inner
    unravel = maprob.unravel_inner

    @_jax.jit
    def l1_fn(X, par_inner):
        x = X[:n]
        p1 = X[n]
        omega = X[n + 1]
        params = inner_lens.set(par_inner, p1)
        xs = unravel(x)
        J = inner.jacobian(xs, params)
        vals, vecs = dense_eig(J)
        lam_t = 1j * omega
        # right eigenvector closest to i*omega
        i0 = jnp.argmin(jnp.abs(vals - lam_t))
        zeta = vecs[:, i0]
        zeta = zeta / jnp.linalg.norm(zeta)
        valsT, vecsT = dense_eig(J.T)
        iT = jnp.argmin(jnp.abs(valsT - jnp.conj(lam_t)))
        zeta_ad = vecsT[:, iT]
        zeta_ad = zeta_ad / jnp.sum(jnp.conj(zeta) * zeta_ad)

        czeta = jnp.conj(zeta)

        def d2c(a, b):
            outs = []
            for fa in (jnp.real(a), jnp.imag(a)):
                for fb in (jnp.real(b), jnp.imag(b)):
                    outs.append(inner.d2F(xs, params, unravel(fa),
                                          unravel(fb)))
            rr, ri, ir, ii = [ravel(o)[0] for o in outs]
            return (rr - ii) + 1j * (ri + ir)

        def d3c(a, b, c):
            out = 0.0
            for sa, fa in ((1.0, jnp.real(a)), (1j, jnp.imag(a))):
                for sb, fb in ((1.0, jnp.real(b)), (1j, jnp.imag(b))):
                    for sc, fc in ((1.0, jnp.real(c)), (1j, jnp.imag(c))):
                        t = ravel(inner.d3F(xs, params, unravel(fa),
                                            unravel(fb), unravel(fc)))[0]
                        out = out + sa * sb * sc * t
            return out

        R2 = lambda a, b: d2c(a, b) / 2.0
        R3 = lambda a, b, c: d3c(a, b, c) / 6.0
        Jc = J.astype(jnp.complex128)
        eye = jnp.eye(n, dtype=jnp.complex128)
        Psi200 = jnp.linalg.solve(2j * omega * eye - Jc, R2(zeta, zeta))
        Psi110 = jnp.linalg.solve(-Jc, 2.0 * R2(zeta, czeta))
        bv = (2.0 * R2(zeta, Psi110) + 2.0 * R2(czeta, Psi200)
              + 3.0 * R3(zeta, zeta, czeta))
        return jnp.real(jnp.sum(jnp.conj(bv) * zeta_ad))

    return l1_fn


def _hopf_l1(maprob, it, state):
    """First Lyapunov coefficient along the Hopf curve (GH test,
    ref MinAugHopf.jl:598-635)."""
    from ..normal_forms.codim1 import _FlatProblem, _inner

    n = maprob.n_inner
    inner = maprob.inner_prob
    par = it.current_params
    X = np.asarray(ravel(state.z.u)[0])
    x, p1, omega = X[:n], float(X[n]), float(X[n + 1])
    params = maprob.inner_lens.set(par["_inner"], p1)
    fp = _FlatProblem(inner, maprob.unravel_inner(jnp.asarray(x)), params)
    J = fp.jacobian()
    vals, vecs = dense_eig(J)
    vals_np = np.asarray(vals)
    cand = np.where(vals_np.imag > 1e-12)[0]
    if len(cand) == 0:
        return np.nan
    i0 = cand[np.argmin(np.abs(vals_np[cand] - 1j * omega))]
    lam = vals_np[i0]
    zeta = jnp.asarray(np.asarray(vecs)[:, i0])
    zeta = zeta / jnp.linalg.norm(zeta)
    valsT, vecsT = dense_eig(J.T)
    iT = int(np.argmin(np.abs(np.asarray(valsT) - np.conj(lam))))
    zeta_ad = jnp.asarray(np.asarray(vecsT)[:, iT])
    zeta_ad = zeta_ad / _inner(zeta, zeta_ad)

    czeta = jnp.conj(zeta)
    R2 = lambda a, b: fp.d2F(a, b) / 2.0
    R3 = lambda a, b, c: fp.d3F(a, b, c) / 6.0
    Psi001 = jnp.linalg.solve(J, -fp.dFdp_at(p1))
    A200 = 2j * omega * jnp.eye(n) - J.astype(jnp.complex128)
    Psi200 = jnp.linalg.solve(A200, R2(zeta, zeta).astype(jnp.complex128))
    Psi110 = jnp.linalg.solve(-J.astype(jnp.complex128),
                              (2.0 * R2(zeta, czeta)).astype(jnp.complex128))
    bv = 2.0 * R2(zeta, Psi110) + 2.0 * R2(czeta, Psi200) \
        + 3.0 * R3(zeta, zeta, czeta)
    return float(np.real(_inner(bv, zeta_ad)))


# ---------------------------------------------------------------------------
# entry points (ref continuation_fold :369 / continuation_hopf :425)
# ---------------------------------------------------------------------------


def continuation_fold(br, ind_bif: int, lens2,
                      contparams: ContinuationPar,
                      alg=None, detect_codim2_bifurcation: int = 2,
                      update_minaug_every_step: int = 1,
                      jacobian_ma: str = "dense",
                      **kwargs) -> Branch:
    if jacobian_ma in ("minaug", "mf", "iterative"):
        # operator path: sigma/corrector/anchors/spectrum all iterative —
        # the reference's `jacobian_ma = MinAug()` + BorderingBLS PDE mode
        # (ref examples/SH2d-fronts.jl:97-115)
        from .minaug_mf import continuation_fold_mf

        return continuation_fold_mf(
            br, ind_bif, lens2, contparams, alg=alg,
            detect_codim2_bifurcation=detect_codim2_bifurcation,
            update_minaug_every_step=update_minaug_every_step, **kwargs)
    prob = br.prob
    alg = alg or PALC()
    x_flat, p1, zeta, zeta_ad = _fold_start(br, ind_bif)
    maprob = fold_ma_problem(prob, prob.lens, lens2, zeta_ad, zeta)
    X0 = jnp.concatenate([x_flat, jnp.asarray(p1)[None]])
    params = dict(maprob.params)
    params["_a"] = zeta_ad
    params["_b"] = zeta
    maprob = _with_ma_attrs(maprob, maprob.re_make(u0=X0, params=params))
    event = (_fold_codim2_event(maprob)
             if detect_codim2_bifurcation > 0 else None)
    cp = contparams
    if event is not None and cp.detect_event == 0:
        # detect_bifurcation > 1 stays on: eigenvalue-count crossings of the
        # INNER jacobian along the curve are codim-2 points themselves
        # (bp -> bt, hopf -> zh; ref conversion, src/codim2/codim2.jl:566)
        cp = cp.replace(detect_event=min(detect_codim2_bifurcation, 2),
                        detect_bifurcation=cp.detect_bifurcation
                        if cp.detect_bifurcation > 1 else 0)
    gamma = continuation(maprob, alg, cp, kind="FoldCont", event=event,
                         **kwargs)
    _relabel_codim2(gamma, maprob)
    return Branch(gamma=gamma, bp=br.specialpoint[ind_bif])


def continuation_hopf(br, ind_bif: int, lens2,
                      contparams: ContinuationPar,
                      alg=None, detect_codim2_bifurcation: int = 2,
                      update_minaug_every_step: int = 1,
                      compute_lyapunov: bool = True,
                      jacobian_ma: str = "dense",
                      **kwargs) -> Branch:
    if jacobian_ma in ("minaug", "mf", "iterative"):
        from .minaug_mf import continuation_hopf_mf

        return continuation_hopf_mf(
            br, ind_bif, lens2, contparams, alg=alg,
            detect_codim2_bifurcation=detect_codim2_bifurcation,
            update_minaug_every_step=update_minaug_every_step,
            compute_lyapunov=compute_lyapunov, **kwargs)
    prob = br.prob
    alg = alg or PALC()
    x_flat, p1, omega, zeta, zeta_ad = _hopf_start(br, ind_bif)
    maprob = hopf_ma_problem(prob, prob.lens, lens2, zeta_ad, zeta)
    X0 = jnp.concatenate([x_flat, jnp.asarray(p1)[None],
                          jnp.asarray(omega)[None]])
    params = dict(maprob.params)
    # left-null of (J - i*omega*I) is zeta_ad itself, so a = zeta_ad
    params["_a"] = zeta_ad
    params["_b"] = zeta
    maprob = _with_ma_attrs(maprob, maprob.re_make(u0=X0, params=params))
    event = (_hopf_codim2_event(maprob, with_gh=compute_lyapunov)
             if detect_codim2_bifurcation > 0 else None)
    cp = contparams
    if event is not None and cp.detect_event == 0:
        # bisection-precise localization (the earlier guess-level default
        # worked around an event-bisection direction bug, since fixed);
        # located points can still be refined with refine_gh / newton_bt.
        # detect_bifurcation > 1 stays on: inner-spectrum crossings are
        # zh (bp) / hh (hopf) (ref conversion, src/codim2/codim2.jl:568)
        cp = cp.replace(detect_event=min(detect_codim2_bifurcation, 2),
                        detect_bifurcation=cp.detect_bifurcation
                        if cp.detect_bifurcation > 1 else 0)
    gamma = continuation(maprob, alg, cp, kind="HopfCont", event=event,
                         **kwargs)
    _relabel_codim2(gamma, maprob)
    return Branch(gamma=gamma, bp=br.specialpoint[ind_bif])


def _relabel_codim2(gamma: ContResult, maprob=None):
    """Map event labels to canonical codim-2 point types.

    A 'gh' label on a Hopf curve is demoted to 'zh' when the inner jacobian
    carries a real eigenvalue at zero: the first-Lyapunov test function has a
    POLE there (h11 = -J^{-1}B blows up), so its sign change marks a
    zero-Hopf point, not a Bautin point."""
    for sp in gamma.specialpoint:
        if sp.type == "gh" and maprob is not None \
                and getattr(maprob, "ma_mf", False):
            # MF curves never materialize J: use the saved iterative
            # spectrum at the point for the pole check; when none was
            # saved (detect_bifurcation downgraded to 0), recompute a few
            # inner eigenvalues iteratively at the point (ADVICE r4:
            # silently keeping 'gh' misses every ZH on an MF Hopf curve)
            vals = sp.eigenvals
            if vals is None:
                try:
                    from ..linalg.eig import ArnoldiEig

                    par = maprob.set_lens_param(dict(gamma.prob.params),
                                                float(sp.param))
                    op = maprob.eig_jacobian(jnp.asarray(sp.x), par)
                    w, _, cv, _ = ArnoldiEig(krylov_dim=40, restarts=3,
                                             which="LR")(op, 8)
                    vals = np.asarray(w) if bool(cv) else None
                except Exception:
                    vals = None
            if vals is not None:
                vals = np.asarray(vals)
                if np.any((np.abs(vals.imag) < 1e-6)
                          & (np.abs(vals.real) < 1e-2)):
                    sp.type = "zh"
            else:
                import warnings

                warnings.warn(
                    "gh label on a matrix-free Hopf curve could not be "
                    "verified against the inner spectrum (no saved "
                    "eigenvalues and the iterative recompute failed); a "
                    "zero-Hopf point would carry the same sign change",
                    RuntimeWarning)
            continue
        if sp.type == "gh" and maprob is not None:
            n = maprob.n_inner
            X = jnp.asarray(sp.x)
            x = X[:n]
            p1 = float(X[n])
            par_dict = {"_inner": maprob.inner_lens.set(
                gamma.prob.params["_inner"], p1)}
            par_dict = maprob.lens.set(par_dict, sp.param)
            J = maprob.inner_prob.jacobian(maprob.unravel_inner(x),
                                           par_dict["_inner"])
            vals = np.asarray(np.linalg.eigvals(np.asarray(J)))
            real_zero = np.any((np.abs(vals.imag) < 1e-6)
                               & (np.abs(vals.real) < 1e-2))
            if real_zero:
                sp.type = "zh"
            continue
        if sp.type in ("bt", "cusp", "zh", "gh"):
            continue
        if sp.type in ("userC", "userD"):
            sp.type = "codim2"
            continue
        # inner-spectrum crossings along the curve (ref conversion dicts,
        # src/codim2/codim2.jl:566-568)
        kind = getattr(maprob, "ma_kind", None) if maprob is not None \
            else None
        conv = {"fold": {"bp": "bt", "hopf": "zh", "fold": "cusp"},
                "hopf": {"bp": "zh", "hopf": "hh", "fold": "nd"}}.get(kind,
                                                                      {})
        if sp.type in conv:
            sp.type = conv[sp.type]


def switch_codim2(br_c2, ind: int, contparams: ContinuationPar,
                  to: Optional[str] = None, **kwargs) -> Branch:
    """Start the OTHER codim-2 curve from a codim-2 point detected along an
    MA curve (ref the `continuation(br_codim2, ind, opts)` dispatch,
    src/codim2/codim2.jl:400-560; exercised by the lorenz84 flows
    `hp_from_zh` / `hp_from_hh`, test/hopf_codim_2/lorenz84.jl:350-371):

      zh on a fold curve  -> the Hopf curve through the same point
      hh on a hopf curve  -> the OTHER Hopf curve (second frequency)
      bt on a hopf curve  -> the fold curve through the same point

    Both curves pass through the point, so no predictor step is needed —
    the new MA problem starts exactly there with the eigen data of the
    target eigenvalue pair."""
    from types import SimpleNamespace

    gamma = br_c2.gamma if isinstance(br_c2, Branch) else br_c2
    sp = gamma.specialpoint[ind]
    maprob = gamma.prob
    if getattr(maprob, "ma_mf", False):
        # matrix-free curves switch through the operator path: target MA
        # problem built at the same point, anchors seeded from the
        # iterative spectrum (ref the jacobian_ma-generic dispatch,
        # src/codim2/codim2.jl:400-560)
        from .minaug_mf import switch_codim2_mf

        return switch_codim2_mf(br_c2, ind, contparams, to=to, **kwargs)
    inner = maprob.inner_prob
    n = maprob.n_inner
    X = jnp.asarray(sp.x)
    x = X[:n]
    p1 = float(X[n])
    p2 = float(sp.param)
    omega_cur = float(X[n + 1]) if maprob.ma_kind == "hopf" else None

    if to is None:
        to = {"zh": "hopf" if maprob.ma_kind == "fold" else "fold",
              "hh": "hopf",
              "bt": "fold" if maprob.ma_kind == "hopf" else "hopf"
              }.get(sp.type)
    if to is None:
        raise ValueError(f"no switch target for a {sp.type!r} point on a "
                         f"{maprob.ma_kind} curve")

    # inner problem anchored at the codim-2 point (p2 frozen into params)
    par_full = maprob.lens.set(dict(maprob.params), p2)
    par_inner = maprob.inner_lens.set(par_full["_inner"], p1)
    x_in = maprob.unravel_inner(x)
    prob2 = inner.re_make(u0=x_in, params=par_inner)
    lens2 = maprob.outer_lens

    if to == "fold":
        shim = SimpleNamespace(
            prob=prob2,
            specialpoint=[SpecialPoint(type="fold", param=p1, x=x_in)])
        return continuation_fold(shim, 0, lens2, contparams, **kwargs)

    if to == "hopf" and sp.type == "bt":
        # the Hopf curve leaves the BT tangentially to the fold curve; the
        # eigenvalue pair only complexifies on ONE side.  Probe p2 on both
        # sides, reconverge the equilibrium, and hand the complexified pair
        # to the Hopf MA (its own init Newton refines (x, p1, omega))
        # (ref the BT aBS via the normal-form predictor, codim2.jl:455-560 —
        # here done by direct probing, which needs no beta-parameter map).
        scale = max(abs(p2), abs(p1), 1e-2)
        last_err = None
        dirs = [(1, 0), (-1, 0), (0, 1), (0, -1),
                (1, 1), (-1, -1), (1, -1), (-1, 1)]
        for frac in (1e-2, 5e-2, 2e-1):
            for d1, d2 in dirs:
                p1_try = p1 + d1 * frac * scale
                p2_try = p2 + d2 * frac * scale
                par_try = maprob.lens.set(dict(maprob.params), p2_try)
                par_try = maprob.inner_lens.set(par_try["_inner"], p1_try)
                sol = newton(inner.re_make(u0=x_in, params=par_try),
                             contparams.newton_options)
                if not bool(sol.converged):
                    continue
                Jp = inner.jacobian(sol.u, par_try)
                vp = np.asarray(dense_eig(Jp)[0])
                pair = vp[np.abs(vp.imag) > 1e-8]
                if len(pair) == 0:
                    continue
                lam_t = pair[np.argmin(np.abs(pair.real))]
                if abs(lam_t.real) > 0.5 * abs(lam_t.imag):
                    continue     # not near a Hopf yet
                prob_t = inner.re_make(u0=sol.u, params=par_try)
                shim = SimpleNamespace(
                    prob=prob_t,
                    specialpoint=[SpecialPoint(type="hopf", param=p1_try,
                                               x=sol.u)])
                try:
                    out = continuation_hopf(shim, 0, lens2, contparams,
                                            **kwargs)
                except RuntimeError as err:
                    last_err = err
                    continue
                # reject a collapse onto the omega = 0 family (which IS the
                # fold curve we came from)
                om = np.asarray(out.gamma._table()["omega"])
                if np.max(np.abs(om)) < 1e-6:
                    last_err = RuntimeError("collapsed onto omega = 0")
                    continue
                return out
        raise RuntimeError(f"bt -> hopf probing failed around "
                           f"(p1, p2) = ({p1}, {p2})"
                           + (f" (last: {last_err})" if last_err else ""))

    # hopf target: pick the eigenvalue pair — at an HH point, the pair
    # FARTHEST in frequency from the current curve's omega
    J = prob2.jacobian(x_in, par_inner)
    vals, vecs = dense_eig(J)
    vals_np = np.asarray(vals)
    cand = np.where(vals_np.imag > 1e-10)[0]
    if len(cand) == 0:
        raise RuntimeError("no complex pair at the switch point")
    if sp.type == "hh" and omega_cur is not None:
        i0 = cand[np.argmax(np.abs(vals_np[cand].imag - abs(omega_cur)))]
    else:
        i0 = cand[np.argmin(np.abs(vals_np.real[cand]))]
    lam = vals_np[i0]
    zeta = np.asarray(vecs)[:, i0]
    zeta = zeta / np.linalg.norm(zeta)
    valsT, vecsT = dense_eig(J.T)
    iT = int(np.argmin(np.abs(np.asarray(valsT) - np.conj(lam))))
    zeta_ad = np.asarray(vecsT)[:, iT]
    zeta_ad = zeta_ad / np.linalg.norm(zeta_ad)

    shim = SimpleNamespace(
        prob=prob2,
        specialpoint=[SpecialPoint(type="hopf", param=p1, x=x_in,
                                   eigenvals=vals_np,
                                   eigenvecs=np.asarray(vecs),
                                   ind_ev=int(i0) + 1)])
    # continuation_hopf recomputes the eigen data through _hopf_start; at a
    # plain ZH that picks the same pair, but at an HH it would be ambiguous
    # — pass the chosen pair by overriding the start
    x_flat, _ = ravel(x_in)
    maprob2 = hopf_ma_problem(prob2, prob2.lens, lens2,
                              jnp.asarray(zeta_ad), jnp.asarray(zeta))
    X0 = jnp.concatenate([x_flat, jnp.asarray(p1)[None],
                          jnp.asarray(float(lam.imag))[None]])
    params = dict(maprob2.params)
    params["_a"] = jnp.asarray(zeta_ad)
    params["_b"] = jnp.asarray(zeta)
    maprob2 = _with_ma_attrs(maprob2, maprob2.re_make(u0=X0, params=params))
    event = _hopf_codim2_event(maprob2, with_gh=True)
    cp = contparams
    if cp.detect_event == 0:
        cp = cp.replace(detect_event=1,
                        detect_bifurcation=min(cp.detect_bifurcation, 1))
    alg = kwargs.pop("alg", None) or PALC()
    gamma2 = continuation(maprob2, alg, cp, kind="HopfCont", event=event,
                          **kwargs)
    _relabel_codim2(gamma2, maprob2)
    return Branch(gamma=gamma2, bp=sp)


def newton_fold(br, ind_bif: int, options: Optional[NewtonPar] = None,
                **kwargs):
    """Refine a fold point at fixed p2 by Newton on the MA functional
    (ref newton_fold, src/codim2/MinAugFold.jl:211)."""
    prob = br.prob
    options = options or br.contparams.newton_options
    x_flat, p1, zeta, zeta_ad = _fold_start(br, ind_bif)
    maprob = fold_ma_problem(prob, prob.lens, prob.lens, zeta_ad, zeta)
    X0 = jnp.concatenate([x_flat, jnp.asarray(p1)[None]])
    params = dict(maprob.params)
    params["_a"] = zeta_ad
    params["_b"] = zeta
    return newton(_with_ma_attrs(maprob, maprob.re_make(u0=X0, params=params)),
                  options, **kwargs)


def newton_hopf(br, ind_bif: int, options: Optional[NewtonPar] = None,
                **kwargs):
    """ref newton_hopf, src/codim2/MinAugHopf.jl:256."""
    prob = br.prob
    options = options or br.contparams.newton_options
    x_flat, p1, omega, zeta, zeta_ad = _hopf_start(br, ind_bif)
    maprob = hopf_ma_problem(prob, prob.lens, prob.lens, zeta_ad, zeta)
    X0 = jnp.concatenate([x_flat, jnp.asarray(p1)[None],
                          jnp.asarray(omega)[None]])
    params = dict(maprob.params)
    # left-null of (J - i*omega*I) is zeta_ad itself, so a = zeta_ad
    params["_a"] = zeta_ad
    params["_b"] = zeta
    return newton(_with_ma_attrs(maprob, maprob.re_make(u0=X0, params=params)),
                  options, **kwargs)


def refine_gh(br_hopf, ind_sp: int, tol_l1: float = 1e-8,
              max_steps: int = 60, verbose: bool = False):
    """Refine a GH guess on a Hopf MA curve: bisect the first Lyapunov
    coefficient in the curve's continuation parameter p2, re-solving the MA
    Newton at each trial p2 (more robust than replaying the PALC iterator).

    Returns (X, p2) at the refined GH point."""
    gamma = br_hopf.gamma if hasattr(br_hopf, "gamma") else br_hopf
    maprob = gamma.prob
    sp = gamma.specialpoint[ind_sp]
    if sp.type not in ("gh", "zh"):
        raise ValueError(f"point {ind_sp} has type {sp.type!r}")
    # the l1 kernel must see the TRIAL p2 (ADVICE r4: evaluating it at the
    # curve-start params while solve_at solves the MA system at p2 = pm
    # computes the Lyapunov sign at an inconsistent point and can bisect
    # to a wrong GH when the guess lies far along the curve — the event
    # path already did this correctly via set_lens_param)
    if getattr(maprob, "ma_mf", False):
        from .minaug_mf import make_l1_kernel_mf

        _l1_raw = make_l1_kernel_mf(maprob)

        def l1_of(X, p2):
            par = maprob.set_lens_param(maprob.params, float(p2))
            return float(_l1_raw(jnp.asarray(X), par))
    else:
        _l1_raw = _make_l1_kernel(maprob)

        def l1_of(X, p2):
            par = maprob.set_lens_param(maprob.params, float(p2))
            return float(_l1_raw(jnp.asarray(X), par["_inner"]))
    from ..continuation.engine import ContIterable
    from ..continuation.algorithms import PALC as _PALC

    it = ContIterable(maprob, _PALC(), gamma.contparams)
    it.current_params = gamma.prob.params

    X0 = jnp.asarray(sp.x)
    pa, pb = sp.interval
    if pa == pb:
        pa, pb = sp.param - 5e-3, sp.param + 5e-3

    def solve_at(p2, Xg):
        u, cv, itn, itl, res = it.kernels.newton_fixed(
            Xg, jnp.asarray(p2), maprob.params)
        return u, bool(cv)

    Xa, cva = solve_at(pa, X0)
    Xb, cvb = solve_at(pb, X0)
    if not (cva and cvb):
        return X0, sp.param
    la = l1_of(Xa, pa)
    lb = l1_of(Xb, pb)
    if la * lb > 0:
        # widen once
        pa, pb = pa - (pb - pa), pb + (pb - pa)
        Xa, cva = solve_at(pa, X0)
        Xb, cvb = solve_at(pb, X0)
        la = l1_of(Xa, pa)
        lb = l1_of(Xb, pb)
        if la * lb > 0:
            return X0, sp.param
    X = X0
    for _ in range(max_steps):
        pm = 0.5 * (pa + pb)
        X, cv = solve_at(pm, X)
        if not cv:
            break
        lm = l1_of(X, pm)
        if verbose:
            print(f"  [refine_gh] p2={pm:.10f} l1={lm:+.3e}")
        if abs(lm) < tol_l1 or (pb - pa) < 1e-12:
            return X, pm
        if la * lm <= 0:
            pb, lb = pm, lm
        else:
            pa, la = pm, lm
    return X, 0.5 * (pa + pb)
