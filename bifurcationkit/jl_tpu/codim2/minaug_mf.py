"""Matrix-free (PDE-scale) minimally-augmented codim-2 continuation.

The dense path (minaug.py) materializes the (n+1)^2 bordered matrix — one
fused LU on the MXU, unbeatable at ODE scale but impossible at the
reference's own PDE legs: the fold curve of the 15,100-dof SH2d model
(ref examples/SH2d-fronts.jl:97-115) and the Hopf/fold curves of the
1,722-dof cGL2d model with `jacobian_ma = MinAug()` + `BorderingBLS`
(ref examples/cGL2d.jl:115-160).  This module is the operator-path
realization of the same functionals (ref FoldMinimallyAugmentedFormulation
solving sigma through the BLS abstraction, src/codim2/MinAugFold.jl:15-52,
119-208; MinAugHopf.jl:19-212):

* sigma comes from preconditioned GMRES on the EXTENDED flat operator

      [J v + sigma a; <b, v>] = [0; 1]          (fold, size n+1)

  which is nonsingular along the fold curve even where J itself is exactly
  singular — no block-elimination breakdown, and the inner spectral
  preconditioner extends blockwise (identity on the scalar slots).
* the MA corrector jacobian is the exact Govaerts operator

      J_G [dx; dp1] = [J dx + F_p1 dp1; sigma_x . dx + sigma_p1 dp1]
      sigma_x = -grad_x <w, J(x) v>    (ONE vjp -> explicit row vector)

  so each J_G application costs one jvp plus a dot product, and the PALC
  bordered solves run GMRES on J_G through the unchanged BorderingBLS
  stack (ref FoldLinearSolverMinAug, src/codim2/MinAugFold.jl:119-208 —
  there realized as four hand-scheduled solves; here one preconditioned
  Krylov solve of the extended operator).
* border re-anchoring and the codim-2 test functions (BT/cusp/ZH on fold
  curves, BT/GH on Hopf curves) reuse the same bordered solves, and the
  per-step inner spectrum runs through the engine's iterative eigensolver
  (`eig_jacobian` hands over a FlatOperator) — no dense_eig anywhere
  (ref FoldEig/HopfEig, src/codim2/MinAugFold.jl:579-601, MinAugHopf.jl:637).

The Hopf functional runs entirely in REAL arithmetic via the 2(n+1)+2
block embedding of the complex-shifted bordered system — f64-grade on TPU,
where native complex caps at c64.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..continuation.algorithms import PALC
from ..continuation.driver import continuation
from ..continuation.results import Branch
from ..core.lens import Lens, as_lens
from ..core.params import ContinuationPar
from ..core.problem import BifurcationProblem
from ..core.state import ravel
from ..detection.events import ContinuousEvent, DiscreteEvent, PairOfEvents
from ..linalg.eig import FlatOperator
from ..linalg.linear import GMRES


# ---------------------------------------------------------------------------
# extended-operator bordered solves (flat, preconditioned GMRES)
# ---------------------------------------------------------------------------


def ext_precond(precond, n: int):
    """Extend an inner preconditioner (flat size-n vectors) to the bordered
    flat vector: P on the leading n entries, identity on the scalar tail."""
    if precond is None:
        return None

    def pext(v):
        head = ravel(precond(v[:n]))[0]
        return jnp.concatenate([head, v[n:]])

    return pext


def ext_precond2(precond, n: int):
    """Blockdiag(P, P, I) preconditioner for the real-embedded complex
    bordered system (size 2n + 2)."""
    if precond is None:
        return None

    def pext(v):
        h1 = ravel(precond(v[:n]))[0]
        h2 = ravel(precond(v[n:2 * n]))[0]
        return jnp.concatenate([h1, h2, v[2 * n:]])

    return pext


def _ir_solve(op_hi, op_lo, rhs, gm_lo, lo, refinements: int = 2,
              rtol: float = 1e-11, atol: float = 1e-14):
    """Mixed-precision solve of op_hi x = rhs: all Krylov matvecs run the
    low-precision twin (native f32 on TPU, where f64 is ~10x emulated),
    a couple of f64 residual corrections restore full accuracy — the
    IterativeRefinement pattern applied to the MA extended operators.

    Each low-precision correction is finite-guarded: an f32 Krylov
    breakdown (possible when the extended system is f32-singular, e.g.
    anchors exactly on the null pair) contributes nothing instead of
    poisoning the f64 iterate — the next refinement pass retries from the
    current x."""
    def _san(v):
        return jnp.where(jnp.isfinite(v), v, 0.0)

    x0, _, _ = gm_lo(op_lo, rhs.astype(lo))
    x = _san(ravel(x0)[0]).astype(rhs.dtype)
    bn = jnp.linalg.norm(rhs)
    tol = jnp.maximum(rtol * bn, atol)

    def body(c):
        x, _, k = c
        r = rhs - op_hi(x)
        d, _, _ = gm_lo(op_lo, r.astype(lo))
        x = x + _san(ravel(d)[0]).astype(rhs.dtype)
        return x, jnp.linalg.norm(rhs - op_hi(x)), k + 1

    def cond(c):
        _, rn, k = c
        return jnp.logical_and(rn > tol, k < refinements)

    x, rn, _ = jax.lax.while_loop(
        cond, body, (x, jnp.linalg.norm(rhs - op_hi(x)), jnp.array(0)))
    return x, rn <= tol


def solve_bordered_ext(Jd, col, row, gmres, rhs_top=None, rhs_bot=1.0,
                       Jd_lo=None, gm_lo=None, lo=None):
    """Solve [J col; row^T 0][v; s] = [rhs_top; rhs_bot] by GMRES on the
    extended flat operator (TPU-robust where J is singular: the extended
    operator is not).  `Jd` is a flat matvec; the default RHS [0; 1] is the
    MA null-vector system.  With (`Jd_lo`, `gm_lo`, `lo`) the Krylov work
    runs the low-precision twin + f64 refinement (`_ir_solve`).
    Returns (v, s, converged)."""
    n = col.shape[0]

    def op(z):
        return jnp.concatenate([Jd(z[:n]) + z[n] * col,
                                jnp.dot(row, z[:n])[None]])

    if rhs_top is None:
        rhs_top = jnp.zeros((n,), col.dtype)
    rhs = jnp.concatenate([rhs_top,
                           jnp.asarray(rhs_bot, col.dtype)[None]])
    if Jd_lo is not None:
        col_lo, row_lo = col.astype(lo), row.astype(lo)

        def op_lo(z):
            return jnp.concatenate([Jd_lo(z[:n]) + z[n] * col_lo,
                                    jnp.dot(row_lo, z[:n])[None]])

        sol, cv = _ir_solve(op, op_lo, rhs, gm_lo, lo)
        return sol[:n], sol[n], cv
    sol, cv, _ = gmres(op, rhs)
    return sol[:n], sol[n], cv


def solve_bordered_ext_cplx(Jd, Omega, cr, ci, dr, di, gmres2,
                            Jd_lo=None, gm_lo=None, lo=None,
                            rhs_top=None):
    """Real-block embedding of the complex bordered solve

        [K c; d^H 0][v; s] = [t; 0],   K = J + i*Omega*I  (J real)

    on the flat (2n+2) vector [vr; vi; sr; si].  Returns
    (vr, vi, sr, si, converged).  Forward Hopf system: Omega = -omega,
    c = a, d = b; adjoint: Jd = J^T (vjp), Omega = +omega, c = b, d = a
    (ref the same embedding in minaug._border_solve_reim; SURVEY 'Hard
    parts: complex arithmetic').  (`Jd_lo`, `gm_lo`, `lo`) = the
    mixed-precision route (see solve_bordered_ext).  The default RHS
    (rhs_top=None) is the MA null-vector system [0; 1]; `rhs_top=(tr,
    ti)` gives the deflected-inverse solve with complex top RHS t and
    zero scalar RHS (the codim-2 normal-form projections)."""
    n = cr.shape[0]

    def make_op(Jx, crx, cix, drx, dix, Om):
        def op(z):
            vr, vi = z[:n], z[n:2 * n]
            sr, si = z[2 * n], z[2 * n + 1]
            r1 = Jx(vr) - Om * vi + sr * crx - si * cix
            r2 = Jx(vi) + Om * vr + sr * cix + si * crx
            r3 = jnp.dot(drx, vr) + jnp.dot(dix, vi)
            r4 = jnp.dot(drx, vi) - jnp.dot(dix, vr)
            return jnp.concatenate([r1, r2, r3[None], r4[None]])

        return op

    op = make_op(Jd, cr, ci, dr, di, Omega)
    if rhs_top is None:
        rhs = jnp.zeros((2 * n + 2,), cr.dtype).at[2 * n].set(1.0)
    else:
        tr, ti = rhs_top
        rhs = jnp.concatenate([tr, ti, jnp.zeros((2,), cr.dtype)])
    if Jd_lo is not None:
        op_lo = make_op(Jd_lo, cr.astype(lo), ci.astype(lo),
                        dr.astype(lo), di.astype(lo),
                        jnp.asarray(Omega).astype(lo))
        sol, cv = _ir_solve(op, op_lo, rhs, gm_lo, lo)
        return sol[:n], sol[n:2 * n], sol[2 * n], sol[2 * n + 1], cv
    sol, cv, _ = gmres2(op, rhs)
    return sol[:n], sol[n:2 * n], sol[2 * n], sol[2 * n + 1], cv


def solve_shifted_cplx(Jd, sig_re, sig_im, rhs_re, rhs_im, gm2n):
    """Solve (sigma I - J) x = b for complex sigma and b over a REAL
    operator J via the 2n real-block embedding — the matrix-free analog of
    the codim-2 normal forms' shifted dense solves, e.g.
    (2 i omega - L) h020 = B(q1, q1) (ref src/codim2/NormalForms.jl
    computing them through the linear-solver abstraction).  Nonsingular
    whenever sigma is not an eigenvalue of J.  Returns (xr, xi, cv)."""
    n = rhs_re.shape[0]

    def op(z):
        zr, zi = z[:n], z[n:]
        return jnp.concatenate([sig_re * zr - sig_im * zi - Jd(zr),
                                sig_re * zi + sig_im * zr - Jd(zi)])

    sol, cv, _ = gm2n(op, jnp.concatenate([rhs_re, rhs_im]))
    return sol[:n], sol[n:], cv


def _cast_tree(tree, dt):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if (hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating))
        else a, tree)


def _make_ma_gmres(precond, n: int, k: int, opts: Optional[dict]):
    o = dict(restart=40, maxiter=240, rtol=1e-10, atol=1e-14)
    if opts:
        o.update(opts)
    pext = ext_precond(precond, n) if k == 1 else ext_precond2(precond, n)
    return GMRES(precond=pext, **o)


# ---------------------------------------------------------------------------
# Fold MA problem, operator path
# ---------------------------------------------------------------------------


def fold_ma_problem_mf(prob: BifurcationProblem, lens1, lens2,
                       precond=None, gmres_opts: Optional[dict] = None,
                       eig_compute_dtype=None,
                       update_every: int = 1,
                       low_dtype=None) -> BifurcationProblem:
    """Matrix-free fold MA problem: unknown X = (x, p1), G = (F, sigma)
    with sigma from the preconditioned extended bordered solve and the
    Govaerts operator jacobian (ref src/codim2/MinAugFold.jl:15-208).

    `low_dtype=jnp.float32` = mixed-precision internals: every extended
    bordered solve runs its Krylov iterations on a low-precision twin of
    the jvp operator (native MXU/VPU speed on TPU) with f64 residual
    refinement, and `jac_op` returns a PairedOperator so the corrector's
    IterativeRefinement reuses the same twin — the measured chip win is
    ~6x per continuation step at unchanged tolerances (docs/PERF.md)."""
    inner_lens = as_lens(lens1)
    outer_lens = as_lens(lens2)
    flat0, unravel = ravel(prob.u0)
    n = flat0.shape[0]
    gm_ext = _make_ma_gmres(precond, n, 1, gmres_opts)
    lo = low_dtype
    gm_lo = None
    if lo is not None:
        lo_opts = dict(gmres_opts or {})
        lo_opts["rtol"] = max(float(lo_opts.get("rtol", 1e-10)), 3e-5)
        # rtol-only: an absolute floor would no-op the refinement solves
        # (their rhs is the shrinking f64 residual)
        lo_opts["atol"] = 0.0
        gm_lo = _make_ma_gmres(precond, n, 1, lo_opts)

    def _lo_twins(xs, params, X):
        """Low-precision jvp/vjp twins at cast primals (None when mixed
        precision is off or the primals are already low — e.g. jac_op
        re-entered through the corrector's own low twin)."""
        if lo is None or X.dtype == lo:
            return None, None
        xs_lo = _cast_tree(xs, lo)
        params_lo = _cast_tree(params, lo)
        Jd_lo = lambda d: ravel(prob.dF(xs_lo, params_lo,   # noqa: E731
                                        unravel(d)))[0]
        Jtd_lo = lambda d: ravel(prob.dFt(xs_lo, params_lo,  # noqa: E731
                                          unravel(d)))[0]
        return Jd_lo, Jtd_lo

    def split(X):
        return X[:n], X[n]

    def par_inner(par, p1):
        return inner_lens.set(par["_inner"], p1)

    def _Jd(xs, params):
        return lambda d: ravel(prob.dF(xs, params, unravel(d)))[0]

    def _Jtd(xs, params):
        return lambda d: ravel(prob.dFt(xs, params, unravel(d)))[0]

    def _v_only(X, par):
        x, p1 = split(X)
        params = par_inner(par, p1)
        xs = unravel(x)
        Jd_lo, _ = _lo_twins(xs, params, X)
        v, sig, cv = solve_bordered_ext(_Jd(xs, params), par["_a"],
                                        par["_b"], gm_ext,
                                        Jd_lo=Jd_lo, gm_lo=gm_lo, lo=lo)
        return v, sig, cv

    def _vw(X, par):
        x, p1 = split(X)
        params = par_inner(par, p1)
        xs = unravel(x)
        Jd_lo, Jtd_lo = _lo_twins(xs, params, X)
        v, sig, _ = solve_bordered_ext(_Jd(xs, params), par["_a"],
                                       par["_b"], gm_ext,
                                       Jd_lo=Jd_lo, gm_lo=gm_lo, lo=lo)
        w, _, _ = solve_bordered_ext(_Jtd(xs, params), par["_b"],
                                     par["_a"], gm_ext,
                                     Jd_lo=Jtd_lo, gm_lo=gm_lo, lo=lo)
        return v, sig, w

    def G(X, par):
        x, p1 = split(X)
        params = par_inner(par, p1)
        F = ravel(prob.F(unravel(x), params))[0]
        _, sig, _ = _v_only(X, par)
        return jnp.concatenate([F, sig[None]])

    def jac_op(X, par):
        x, p1 = split(X)
        params = par_inner(par, p1)
        xs = unravel(x)
        v, sig, w = _vw(X, par)

        # sigma_x = -grad_x <w, J(x) v>: one vjp through the jvp gives the
        # full row vector (ref the Govaerts hessian terms,
        # src/codim2/MinAugFold.jl:119-208 — exact AD, no FD fallback)
        def g(xf):
            return jnp.dot(w, ravel(prob.dF(unravel(xf), params,
                                            unravel(v)))[0])

        sigma_x = -jax.grad(g)(x)

        one = jnp.ones_like(jnp.asarray(p1))

        def h(pp):
            return jnp.dot(w, ravel(prob.dF(xs, par_inner(par, pp),
                                            unravel(v)))[0])

        _, dh = jax.jvp(h, (p1,), (one,))
        sigma_p1 = -dh

        def f_of_p1(pp):
            return ravel(prob.F(xs, par_inner(par, pp)))[0]

        _, Fp1 = jax.jvp(f_of_p1, (p1,), (one,))

        def apply(d):
            dx, dp1 = d[:n], d[n]
            top = ravel(prob.dF(xs, params, unravel(dx)))[0] + dp1 * Fp1
            bot = jnp.dot(sigma_x, dx) + sigma_p1 * dp1
            return jnp.concatenate([top, bot[None]])

        Jd_lo, _ = _lo_twins(xs, params, X)
        if Jd_lo is None:
            return apply
        from ..linalg.eig import FlatOperator as _FO
        from ..linalg.linear import PairedOperator

        Fp1_lo = Fp1.astype(lo)
        sx_lo = sigma_x.astype(lo)
        sp1_lo = sigma_p1.astype(lo)

        def apply_lo(d):
            dx, dp1 = d[:n], d[n]
            top = Jd_lo(dx) + dp1 * Fp1_lo
            bot = jnp.dot(sx_lo, dx) + sp1_lo * dp1
            return jnp.concatenate([top, bot[None]])

        return PairedOperator(apply, _FO(apply_lo, n + 1, lo))

    def dFdp_user(X, par):
        """d G / d p2 at fixed X: (dF/dp2, -<w, (d J/d p2) v>)."""
        x, p1 = split(X)
        xs = unravel(x)
        v, sig, w = _vw(X, par)
        p2 = outer_lens.get(par["_inner"])
        one = jnp.ones_like(jnp.asarray(p2))

        def at_p2(pp):
            return inner_lens.set(outer_lens.set(par["_inner"], pp), p1)

        def pf(pp):
            return ravel(prob.F(xs, at_p2(pp)))[0]

        _, Fp2 = jax.jvp(pf, (p2,), (one,))

        def hs(pp):
            return jnp.dot(w, ravel(prob.dF(xs, at_p2(pp), unravel(v)))[0])

        _, dhs = jax.jvp(hs, (p2,), (one,))
        return jnp.concatenate([Fp2, (-dhs)[None]])

    lens = Lens(
        get=lambda par: outer_lens.get(par["_inner"]),
        set=lambda par, v: {**par, "_inner": outer_lens.set(par["_inner"],
                                                            v)},
        name=f"fold-ma-mf/{outer_lens.name}")

    def record(X, p2, **k):
        x, p1 = split(X)
        return {"param": p2, "p1": p1, "norm": jnp.linalg.norm(x)}

    def eig_jacobian(X, par):
        """Inner-jacobian spectrum operator (ref FoldEig stripping the
        border, src/codim2/MinAugFold.jl:579-601) — a FlatOperator so the
        engine's ITERATIVE eigensolvers run at PDE scale (VERDICT r3 #7)."""
        x, p1 = split(X)
        params = par_inner(par, p1)
        ed = eig_compute_dtype
        if ed is not None:
            xs = _cast_tree(unravel(x), ed)
            params_e = _cast_tree(params, ed)
            return FlatOperator(
                lambda d: ravel(prob.dF(xs, params_e, unravel(d)))[0], n, ed)
        xs = unravel(x)
        return FlatOperator(_Jd(xs, params), n, flat0.dtype)

    @jax.jit
    def _anchors_raw(X, par):
        v, sig, w = _vw(X, par)
        v = v / jnp.linalg.norm(v)
        w = w / jnp.linalg.norm(w)
        return v, w, sig

    # host-level memo: the update! hook and the BT/cusp event kernels both
    # evaluate the anchors at the SAME converged state each step — one
    # identity-keyed slot (strong refs, so ids cannot be recycled) halves
    # the per-step extended-solve count (VERDICT r4 weak #1 headroom).
    # Host-side only: G/jac_op are traced into jitted programs where XLA
    # CSE already dedupes; a Python cache there would leak tracers.
    _acache = {}

    def anchors_kernel(X, par):
        if isinstance(X, jax.core.Tracer):
            return _anchors_raw(X, par)   # traced context: no host memo
        objs = _acache.get("objs")
        if objs is not None and objs[0] is X \
                and objs[1] is par.get("_a") and objs[2] is par.get("_b"):
            return _acache["val"]
        val = _anchors_raw(X, par)
        _acache["objs"] = (X, par.get("_a"), par.get("_b"))
        _acache["val"] = val
        return val

    def update(it, state):
        if update_every <= 0 or state.step % update_every != 0:
            return None
        par = it.current_params
        X = ravel(state.z.u)[0]
        v, w, _ = anchors_kernel(X, par)
        new = dict(par)
        new["_b"] = v
        new["_a"] = w
        return new

    maprob = BifurcationProblem(
        G, u0=None,
        params={"_inner": prob.params, "_a": flat0 * 0 + 1.0,
                "_b": flat0 * 0 + 1.0},
        lens=lens, jac_op=jac_op, dFdp_user=dFdp_user,
        record_from_solution=record, delta=prob.delta, update=update)
    object.__setattr__(maprob, "eig_jacobian", eig_jacobian)
    object.__setattr__(maprob, "inner_prob", prob)
    object.__setattr__(maprob, "inner_lens", inner_lens)
    object.__setattr__(maprob, "n_inner", n)
    object.__setattr__(maprob, "unravel_inner", unravel)
    object.__setattr__(maprob, "ma_kind", "fold")
    object.__setattr__(maprob, "ma_mf", True)
    object.__setattr__(maprob, "fuse_step", False)
    object.__setattr__(maprob, "jac_op_paired", low_dtype is not None)
    object.__setattr__(maprob, "outer_lens", outer_lens)
    object.__setattr__(maprob, "anchors_kernel", anchors_kernel)
    object.__setattr__(maprob, "gm_ext", gm_ext)
    object.__setattr__(maprob, "precond", precond)
    return maprob


# ---------------------------------------------------------------------------
# Hopf MA problem, operator path (real-embedded complex bordered solves)
# ---------------------------------------------------------------------------


def hopf_ma_problem_mf(prob: BifurcationProblem, lens1, lens2,
                       precond=None, gmres_opts: Optional[dict] = None,
                       eig_compute_dtype=None,
                       update_every: int = 1,
                       low_dtype=None) -> BifurcationProblem:
    """Matrix-free Hopf MA problem: unknown X = (x, p1, omega),
    G = (F, Re sigma, Im sigma) with sigma from the real-embedded extended
    bordered solve of [J - i omega I, a; b^H, 0] and the Govaerts operator
    jacobian (ref src/codim2/MinAugHopf.jl:19-212).  Border vectors are
    stored as real pairs (_ar, _ai, _br, _bi): TPU-safe f64, no complex
    device arrays."""
    inner_lens = as_lens(lens1)
    outer_lens = as_lens(lens2)
    flat0, unravel = ravel(prob.u0)
    n = flat0.shape[0]
    gm2 = _make_ma_gmres(precond, n, 2, gmres_opts)
    lo = low_dtype
    gm2_lo = None
    if lo is not None:
        lo_opts = dict(gmres_opts or {})
        lo_opts["rtol"] = max(float(lo_opts.get("rtol", 1e-10)), 3e-5)
        # rtol-only: an absolute floor would no-op the refinement solves
        # (their rhs is the shrinking f64 residual)
        lo_opts["atol"] = 0.0
        gm2_lo = _make_ma_gmres(precond, n, 2, lo_opts)

    def _lo_twins(xs, params, X):
        if lo is None or X.dtype == lo:
            return None, None
        xs_lo = _cast_tree(xs, lo)
        params_lo = _cast_tree(params, lo)
        Jd_lo = lambda d: ravel(prob.dF(xs_lo, params_lo,   # noqa: E731
                                        unravel(d)))[0]
        Jtd_lo = lambda d: ravel(prob.dFt(xs_lo, params_lo,  # noqa: E731
                                          unravel(d)))[0]
        return Jd_lo, Jtd_lo

    def split(X):
        return X[:n], X[n], X[n + 1]

    def par_inner(par, p1):
        return inner_lens.set(par["_inner"], p1)

    def _Jd(xs, params):
        return lambda d: ravel(prob.dF(xs, params, unravel(d)))[0]

    def _Jtd(xs, params):
        return lambda d: ravel(prob.dFt(xs, params, unravel(d)))[0]

    def _v_only(X, par):
        x, p1, om = split(X)
        params = par_inner(par, p1)
        xs = unravel(x)
        Jd_lo, _ = _lo_twins(xs, params, X)
        vr, vi, sr, si, cv = solve_bordered_ext_cplx(
            _Jd(xs, params), -om, par["_ar"], par["_ai"],
            par["_br"], par["_bi"], gm2,
            Jd_lo=Jd_lo, gm_lo=gm2_lo, lo=lo)
        return vr, vi, sr, si

    def _vw(X, par):
        x, p1, om = split(X)
        params = par_inner(par, p1)
        xs = unravel(x)
        Jd_lo, Jtd_lo = _lo_twins(xs, params, X)
        vr, vi, sr, si, _ = solve_bordered_ext_cplx(
            _Jd(xs, params), -om, par["_ar"], par["_ai"],
            par["_br"], par["_bi"], gm2,
            Jd_lo=Jd_lo, gm_lo=gm2_lo, lo=lo)
        # adjoint: (J - i om I)^H = J^T + i om I; borders swap roles
        wr, wi, _, _, _ = solve_bordered_ext_cplx(
            _Jtd(xs, params), om, par["_br"], par["_bi"],
            par["_ar"], par["_ai"], gm2,
            Jd_lo=Jtd_lo, gm_lo=gm2_lo, lo=lo)
        return vr, vi, sr, si, wr, wi

    def G(X, par):
        x, p1, om = split(X)
        params = par_inner(par, p1)
        F = ravel(prob.F(unravel(x), params))[0]
        _, _, sr, si = _v_only(X, par)
        return jnp.concatenate([F, sr[None], si[None]])

    def _sigma_rows(X, par):
        """Explicit Govaerts row data: sigma_x (re/im row vectors), and the
        (p1, omega) partials.  sigma_dot = -<w, M_dot v> with
        M = J - i omega I (see the derivation in the module docstring of
        minaug.py; ref MinAugHopf.jl:117-212)."""
        x, p1, om = split(X)
        params = par_inner(par, p1)
        xs = unravel(x)
        vr, vi, sr, si, wr, wi = _vw(X, par)

        def g_re(xf):
            xs2 = unravel(xf)
            return (jnp.dot(wr, ravel(prob.dF(xs2, params, unravel(vr)))[0])
                    + jnp.dot(wi, ravel(prob.dF(xs2, params,
                                                unravel(vi)))[0]))

        def g_im(xf):
            xs2 = unravel(xf)
            return (jnp.dot(wr, ravel(prob.dF(xs2, params, unravel(vi)))[0])
                    - jnp.dot(wi, ravel(prob.dF(xs2, params,
                                                unravel(vr)))[0]))

        sigx_re = -jax.grad(g_re)(x)
        sigx_im = -jax.grad(g_im)(x)

        one = jnp.ones_like(jnp.asarray(p1))

        def hv(pp):
            par2 = par_inner(par, pp)
            return jnp.stack([ravel(prob.dF(xs, par2, unravel(vr)))[0],
                              ravel(prob.dF(xs, par2, unravel(vi)))[0]])

        _, t = jax.jvp(hv, (p1,), (one,))
        tr, ti = t[0], t[1]
        sigp1_re = -(jnp.dot(wr, tr) + jnp.dot(wi, ti))
        sigp1_im = -(jnp.dot(wr, ti) - jnp.dot(wi, tr))

        # d/d omega (J - i omega I) = -i I  ->  sigma_dot = i <w, v>_H
        A = jnp.dot(wr, vr) + jnp.dot(wi, vi)    # Re(w^H v)
        B = jnp.dot(wr, vi) - jnp.dot(wi, vr)    # Im(w^H v)
        sigom_re = -B
        sigom_im = A
        return (xs, params, sigx_re, sigx_im, sigp1_re, sigp1_im,
                sigom_re, sigom_im, vr, vi, wr, wi)

    def jac_op(X, par):
        x, p1, om = split(X)
        (xs, params, sigx_re, sigx_im, sigp1_re, sigp1_im,
         sigom_re, sigom_im, *_rest) = _sigma_rows(X, par)

        one = jnp.ones_like(jnp.asarray(p1))

        def f_of_p1(pp):
            return ravel(prob.F(xs, par_inner(par, pp)))[0]

        _, Fp1 = jax.jvp(f_of_p1, (p1,), (one,))

        def apply(d):
            dx, dp1, dom = d[:n], d[n], d[n + 1]
            top = ravel(prob.dF(xs, params, unravel(dx)))[0] + dp1 * Fp1
            r_re = (jnp.dot(sigx_re, dx) + sigp1_re * dp1 + sigom_re * dom)
            r_im = (jnp.dot(sigx_im, dx) + sigp1_im * dp1 + sigom_im * dom)
            return jnp.concatenate([top, r_re[None], r_im[None]])

        Jd_lo, _ = _lo_twins(xs, params, X)
        if Jd_lo is None:
            return apply
        from ..linalg.eig import FlatOperator as _FO
        from ..linalg.linear import PairedOperator

        Fp1_lo = Fp1.astype(lo)
        rows_lo = [a.astype(lo) for a in
                   (sigx_re, sigx_im, sigp1_re, sigp1_im,
                    sigom_re, sigom_im)]

        def apply_lo(d):
            dx, dp1, dom = d[:n], d[n], d[n + 1]
            top = Jd_lo(dx) + dp1 * Fp1_lo
            r_re = (jnp.dot(rows_lo[0], dx) + rows_lo[2] * dp1
                    + rows_lo[4] * dom)
            r_im = (jnp.dot(rows_lo[1], dx) + rows_lo[3] * dp1
                    + rows_lo[5] * dom)
            return jnp.concatenate([top, r_re[None], r_im[None]])

        return PairedOperator(apply, _FO(apply_lo, n + 2, lo))

    def dFdp_user(X, par):
        x, p1, om = split(X)
        xs = unravel(x)
        vr, vi, sr, si, wr, wi = _vw(X, par)
        p2 = outer_lens.get(par["_inner"])
        one = jnp.ones_like(jnp.asarray(p2))

        def at_p2(pp):
            return inner_lens.set(outer_lens.set(par["_inner"], pp), p1)

        def pf(pp):
            return ravel(prob.F(xs, at_p2(pp)))[0]

        _, Fp2 = jax.jvp(pf, (p2,), (one,))

        def hv(pp):
            par2 = at_p2(pp)
            return jnp.stack([ravel(prob.dF(xs, par2, unravel(vr)))[0],
                              ravel(prob.dF(xs, par2, unravel(vi)))[0]])

        _, t = jax.jvp(hv, (p2,), (one,))
        tr, ti = t[0], t[1]
        sigp2_re = -(jnp.dot(wr, tr) + jnp.dot(wi, ti))
        sigp2_im = -(jnp.dot(wr, ti) - jnp.dot(wi, tr))
        return jnp.concatenate([Fp2, sigp2_re[None], sigp2_im[None]])

    lens = Lens(
        get=lambda par: outer_lens.get(par["_inner"]),
        set=lambda par, v: {**par, "_inner": outer_lens.set(par["_inner"],
                                                            v)},
        name=f"hopf-ma-mf/{outer_lens.name}")

    def record(X, p2, **k):
        x, p1, omega = split(X)
        return {"param": p2, "p1": p1, "omega": omega,
                "norm": jnp.linalg.norm(x)}

    def eig_jacobian(X, par):
        x, p1, _ = split(X)
        params = par_inner(par, p1)
        ed = eig_compute_dtype
        if ed is not None:
            xs = _cast_tree(unravel(x), ed)
            params_e = _cast_tree(params, ed)
            return FlatOperator(
                lambda d: ravel(prob.dF(xs, params_e, unravel(d)))[0], n, ed)
        xs = unravel(x)
        return FlatOperator(_Jd(xs, params), n, flat0.dtype)

    @jax.jit
    def _anchors_raw(X, par):
        vr, vi, sr, si, wr, wi = _vw(X, par)
        nv = jnp.sqrt(jnp.dot(vr, vr) + jnp.dot(vi, vi))
        nw = jnp.sqrt(jnp.dot(wr, wr) + jnp.dot(wi, wi))
        return (vr / nv, vi / nv, wr / nw, wi / nw,
                jnp.sqrt(sr * sr + si * si))

    # host-level identity memo (see the fold variant above): the update!
    # hook and the BT event evaluate the anchors at the same state
    _acache = {}

    def anchors_kernel(X, par):
        if isinstance(X, jax.core.Tracer):
            return _anchors_raw(X, par)   # traced context: no host memo
        objs = _acache.get("objs")
        if objs is not None and objs[0] is X \
                and objs[1] is par.get("_ar") and objs[2] is par.get("_br"):
            return _acache["val"]
        val = _anchors_raw(X, par)
        _acache["objs"] = (X, par.get("_ar"), par.get("_br"))
        _acache["val"] = val
        return val

    def update(it, state):
        if update_every <= 0 or state.step % update_every != 0:
            return None
        par = it.current_params
        X = ravel(state.z.u)[0]
        vr, vi, wr, wi, _ = anchors_kernel(X, par)
        new = dict(par)
        new["_br"], new["_bi"] = vr, vi
        new["_ar"], new["_ai"] = wr, wi
        if float(X[n + 1]) < 0:
            # pin omega > 0: (x, p1, -omega) is the conjugate solution (see
            # minaug._make_minaug_update) — flip omega and conjugate anchors
            Xf = np.array(X)
            Xf[n + 1] = -Xf[n + 1]
            state.z = dataclasses.replace(state.z, u=jnp.asarray(Xf))
            new["_ai"] = -new["_ai"]
            new["_bi"] = -new["_bi"]
        return new

    maprob = BifurcationProblem(
        G, u0=None,
        params={"_inner": prob.params,
                "_ar": flat0 * 0 + 1.0, "_ai": flat0 * 0,
                "_br": flat0 * 0 + 1.0, "_bi": flat0 * 0},
        lens=lens, jac_op=jac_op, dFdp_user=dFdp_user,
        record_from_solution=record, delta=prob.delta, update=update)
    object.__setattr__(maprob, "eig_jacobian", eig_jacobian)
    object.__setattr__(maprob, "inner_prob", prob)
    object.__setattr__(maprob, "inner_lens", inner_lens)
    object.__setattr__(maprob, "n_inner", n)
    object.__setattr__(maprob, "unravel_inner", unravel)
    object.__setattr__(maprob, "ma_kind", "hopf")
    object.__setattr__(maprob, "ma_mf", True)
    object.__setattr__(maprob, "fuse_step", False)
    object.__setattr__(maprob, "jac_op_paired", low_dtype is not None)
    object.__setattr__(maprob, "outer_lens", outer_lens)
    object.__setattr__(maprob, "anchors_kernel", anchors_kernel)
    object.__setattr__(maprob, "gm2", gm2)
    object.__setattr__(maprob, "precond", precond)
    return maprob


# ---------------------------------------------------------------------------
# codim-2 test functions along MF curves (no dense_eig anywhere)
# ---------------------------------------------------------------------------


def fold_codim2_event_mf(maprob):
    """BT (<w, v> -> 0), cusp (fold of the fold curve) and ZH (complex
    crossing of the iterative inner spectrum) along an MF fold curve
    (ref test_bt_cusp/test_zh, src/codim2/MinAugFold.jl:539-577)."""
    anchors = maprob.anchors_kernel

    def cond(it, state):
        par = it.prob.set_lens_param(it.current_params, float(state.p))
        X = ravel(state.z.u)[0]
        # host-level anchors call: hits the identity memo shared with the
        # update! hook (same X, par each step) instead of re-tracing the
        # two extended solves inside a private jitted kernel
        v, w, _ = anchors(X, par)
        bt = float(jnp.dot(w, v))
        cp = float(state.tau.p)
        return (bt, cp)

    cont = ContinuousEvent(nb=2, condition=cond, labels=["bt", "cusp"])

    def zh_cond(it, state):
        if state.eigvals is None:
            return (0,)
        eps = it.contparams.tol_stability
        vals = np.asarray(state.eigvals)
        # exclude the fold's OWN zero mode explicitly: the smallest-|lambda|
        # (near-)real eigenvalue (ADVICE r4: the old min|Re| proxy breaks
        # when a loose iterative spectrum puts another mode closer to the
        # imaginary axis than the fold eigenvalue), then count complex
        # modes in the right half plane (up to tolerance)
        realish = np.abs(vals.imag) <= eps
        mask = np.ones(len(vals), bool)
        if np.any(realish):
            idx = np.where(realish)[0]
            mask[idx[np.argmin(np.abs(vals[idx]))]] = False
        cnt = int(np.sum(mask & (vals.real > -eps) & (vals.imag > eps)))
        return (cnt,)

    disc = DiscreteEvent(nb=1, condition=zh_cond, labels=["zh"])
    return PairOfEvents(cont, disc)


def make_l1_kernel_mf(maprob):
    """First-Lyapunov coefficient along an MF Hopf curve — the GH test at
    PDE scale (ref MinAugHopf.jl:598-635).  (zeta, zeta*) come from the
    bordered solves already computed for the functional (on the curve the
    bordered null vectors ARE the Hopf eigenvectors); the two linear
    solves ((2 i omega - J) and -J) run preconditioned GMRES in the real
    embedding.  All complex arithmetic is real-split on device."""
    prob = maprob.inner_prob
    inner_lens = maprob.inner_lens
    n = maprob.n_inner
    unravel = maprob.unravel_inner
    precond = maprob.precond
    gm_n = GMRES(restart=40, maxiter=240, rtol=1e-9, atol=1e-13,
                 precond=(lambda v: ravel(precond(v))[0])
                 if precond is not None else None)

    def pre2(v):
        if precond is None:
            return v
        return jnp.concatenate([ravel(precond(v[:n]))[0],
                                ravel(precond(v[n:]))[0]])

    gm_2n = GMRES(restart=40, maxiter=240, rtol=1e-9, atol=1e-13,
                  precond=pre2 if precond is not None else None)

    @jax.jit
    def l1_fn(X, par):
        x, p1, om = X[:n], X[n], X[n + 1]
        params = inner_lens.set(par["_inner"], p1)
        xs = unravel(x)

        def Jd(d):
            return ravel(prob.dF(xs, params, unravel(d)))[0]

        # (zeta, zeta*) from the MA bordered solves
        vr, vi, sr, si, wr, wi = maprob_vw(X, par)
        nz = jnp.sqrt(jnp.dot(vr, vr) + jnp.dot(vi, vi))
        zr, zi = vr / nz, vi / nz
        # normalize zeta_ad so <zeta, zeta_ad> = 1 (VI.inner convention)
        cr = jnp.dot(zr, wr) + jnp.dot(zi, wi)
        ci = jnp.dot(zr, wi) - jnp.dot(zi, wr)
        c2 = cr * cr + ci * ci
        ar = (wr * cr + wi * ci) / c2
        ai = (wi * cr - wr * ci) / c2

        def d2(a, b):
            return ravel(prob.d2F(xs, params, unravel(a), unravel(b)))[0]

        def d3(a, b, c):
            return ravel(prob.d3F(xs, params, unravel(a), unravel(b),
                                  unravel(c)))[0]

        # R2(z, z) complex: (d2[zr,zr] - d2[zi,zi]) + i(2 d2[zr,zi]), /2
        R20_r = 0.5 * (d2(zr, zr) - d2(zi, zi))
        R20_i = d2(zr, zi)
        # R2(z, conj z) is REAL: (d2[zr,zr] + d2[zi,zi]) / 2
        R11 = 0.5 * (d2(zr, zr) + d2(zi, zi))

        # Psi200: (2 i om I - J) Psi = R20  (real embedding)
        def op2(zv):
            pr, pi = zv[:n], zv[n:]
            return jnp.concatenate([-Jd(pr) - 2 * om * pi,
                                    -Jd(pi) + 2 * om * pr])

        sol2, _, _ = gm_2n(op2, jnp.concatenate([R20_r, R20_i]))
        P200_r, P200_i = sol2[:n], sol2[n:]

        # Psi110: -J Psi = 2 R11  (real system)
        P110, _, _ = gm_n(lambda d: -Jd(d), 2.0 * R11)

        # bv = 2 R2(z, Psi110) + 2 R2(conj z, Psi200) + 3 R3(z, z, conj z)
        bv_r = (d2(zr, P110)
                + (d2(zr, P200_r) + d2(zi, P200_i))
                + 0.5 * (d3(zr, zr, zr) + d3(zi, zi, zr)))
        bv_i = (d2(zi, P110)
                + (d2(zr, P200_i) - d2(zi, P200_r))
                + 0.5 * (d3(zr, zr, zi) + d3(zi, zi, zi)))
        # l1 = Re <bv, zeta_ad> = Re(sum(conj(bv) * zeta_ad))
        return jnp.dot(bv_r, ar) + jnp.dot(bv_i, ai)

    # the MA problem's _vw closure is not exported; rebuild it here from
    # the stored pieces (same traced code -> XLA CSE dedupes when fused)
    gm2 = maprob.gm2

    def maprob_vw(X, par):
        x, p1, om = X[:n], X[n], X[n + 1]
        params = inner_lens.set(par["_inner"], p1)
        xs = unravel(x)

        def Jd(d):
            return ravel(prob.dF(xs, params, unravel(d)))[0]

        def Jtd(d):
            return ravel(prob.dFt(xs, params, unravel(d)))[0]

        vr, vi, sr, si, _ = solve_bordered_ext_cplx(
            Jd, -om, par["_ar"], par["_ai"], par["_br"], par["_bi"], gm2)
        wr, wi, _, _, _ = solve_bordered_ext_cplx(
            Jtd, om, par["_br"], par["_bi"], par["_ar"], par["_ai"], gm2)
        return vr, vi, sr, si, wr, wi

    return l1_fn


def hopf_codim2_event_mf(maprob, with_gh: bool = True,
                         gh_every: int = 1):
    """BT (omega -> 0) and GH (l1 -> 0) monitoring along an MF Hopf curve.

    `gh_every=k` probes the full l1 kernel — six extended bordered solves
    plus two preconditioned GMRES solves, by far the costliest per-step
    work at PDE scale (VERDICT r4 weak #2) — only every k-th step,
    holding the last value in between: a GH sign change is then seen at
    most k steps late with a wider bracketing interval, and event
    BISECTION always evaluates the full kernel (state.in_bisection), so
    the localized point is exact.  The reference's analogous cost knob is
    `update_minaug_every_step` (ref src/codim2/MinAugFold.jl:280-314)."""
    n = maprob.n_inner
    l1_fn = make_l1_kernel_mf(maprob) if with_gh else None
    last = {"l1": 0.0, "step": None}

    def cond(it, state):
        X = ravel(state.z.u)[0]
        omega = float(X[n + 1])
        vals = [omega]
        if with_gh:
            probe = (gh_every <= 1 or state.in_bisection
                     or state.step % gh_every == 0
                     or last["step"] is None)
            if probe:
                par = it.prob.set_lens_param(it.current_params,
                                             float(state.p))
                last["l1"] = float(l1_fn(X, par))
                last["step"] = state.step
            vals.append(last["l1"])
        return tuple(vals)

    labels = ["bt"] + (["gh"] if with_gh else [])
    return ContinuousEvent(nb=1 + int(with_gh), condition=cond,
                           labels=labels)


# ---------------------------------------------------------------------------
# starters: anchor bootstrap by bordered inverse iteration (no dense_eig)
# ---------------------------------------------------------------------------


def _null_seed(sp, n, flat_x=None):
    """Best available seed for the critical eigenvector: the special
    point's saved eigenvector, else a deterministic random direction."""
    if sp.eigenvecs is not None:
        ind = max(int(sp.ind_ev) - 1, 0)
        col = np.asarray(sp.eigenvecs)[:, ind]
        return np.real(col), np.imag(col)
    rng = np.random.default_rng(13)
    return rng.standard_normal(n), np.zeros(n)


def bootstrap_fold_anchors(maprob, X0, params, iters: int = 3,
                           seed=None):
    """Refine the MA border vectors by bordered inverse iteration: at a fold
    point J is singular, so one bordered solve with ANY reasonable border
    concentrates v onto the null vector; re-anchoring and repeating
    converges quadratically.  Replaces the dense starter's dense_eig
    (ref the eigenvector-based start, src/codim2/codim2.jl:86-106)."""
    par = dict(params)
    if seed is not None:
        s = jnp.asarray(seed, dtype=par["_a"].dtype)
        s = s / jnp.linalg.norm(s)
        par["_a"] = s
        par["_b"] = s
    for _ in range(iters):
        v, w, sig = maprob.anchors_kernel(X0, par)
        par["_b"] = v
        par["_a"] = w
    return par


def bootstrap_hopf_anchors(maprob, X0, params, iters: int = 3,
                           seed=None):
    par = dict(params)
    if seed is not None:
        s_r = jnp.asarray(seed[0], dtype=par["_ar"].dtype)
        s_i = jnp.asarray(seed[1], dtype=par["_ar"].dtype)
        nrm = jnp.sqrt(jnp.dot(s_r, s_r) + jnp.dot(s_i, s_i))
        par["_ar"], par["_ai"] = s_r / nrm, s_i / nrm
        par["_br"], par["_bi"] = s_r / nrm, s_i / nrm
    for _ in range(iters):
        vr, vi, wr, wi, sig = maprob.anchors_kernel(X0, par)
        par["_br"], par["_bi"] = vr, vi
        par["_ar"], par["_ai"] = wr, wi
    return par


# ---------------------------------------------------------------------------
# codim-2 -> codim-2 switching from MF curves
# ---------------------------------------------------------------------------


def _iter_spectrum_at(maprob, X, par, nev: int = 10, with_vectors=True):
    """Iterative inner spectrum at a point of an MF MA curve: warm Arnoldi
    on the jvp FlatOperator the problem already exposes (eig_jacobian) —
    the PDE-scale stand-in for the dense path's dense_eig at the switch
    point (ref the eigen start of the codim-2 switch dispatch,
    src/codim2/codim2.jl:400-560)."""
    from ..linalg.eig import ArnoldiEig

    op = maprob.eig_jacobian(jnp.asarray(X), par)
    eig = ArnoldiEig(krylov_dim=max(4 * nev, 48), restarts=4, which="LR")
    vals, vecs, cv, _ = eig(op, nev)
    return np.asarray(vals), (np.asarray(vecs) if with_vectors else None), \
        bool(cv)


def _bt_to_hopf_probe_mf(maprob, sp, contparams, lens2, nev: int = 10,
                         **kwargs):
    """bt -> hopf from an MF fold curve: the Hopf curve leaves the BT
    tangentially to the fold curve and the near-zero eigenvalue pair only
    complexifies on ONE side, so probe (p1, p2) around the point,
    reconverge the equilibrium with the (iterative) inner Newton, and test
    the INNER spectrum through the operator path — the matrix-free twin of
    the dense two-sided probe (minaug.py switch_codim2; ref the BT aBS of
    the codim-2 dispatch, src/codim2/codim2.jl:455-560)."""
    from types import SimpleNamespace

    from ..detection.points import SpecialPoint
    from ..newton import newton

    inner = maprob.inner_prob
    n = maprob.n_inner
    X = np.asarray(sp.x)
    x_in = maprob.unravel_inner(jnp.asarray(X[:n]))
    p1 = float(X[n])
    p2 = float(sp.param)

    # 2-dim Jordan-subspace basis at the BT: against a stiff PDE spectrum
    # the near-zero pair is INVISIBLE to plain Krylov (it hides under the
    # dominant modes), but it lives in span(q0, q1) of the BT Jordan chain
    # — the bordered solves of the MF BT normal form deliver exactly that
    # basis, and a 2x2 oblique projection <p_i, J q_j> tracks how the
    # double eigenvalue splits at each probe point (O(eps^2)-accurate)
    basis = None
    try:
        from .normal_forms import bt_normal_form

        par_bt = maprob.lens.set(dict(maprob.params), p2)
        par_bt_in = maprob.inner_lens.set(par_bt["_inner"], p1)
        pt_bt = bt_normal_form(
            inner, x_in, par_bt_in, matrix_free=True,
            precond=getattr(inner, "spectral_precond", None))
        q0b, q1b = (np.asarray(v) for v in pt_bt.zeta)
        p0b, p1b = (np.asarray(v) for v in pt_bt.zeta_star)
        basis = (q0b, q1b, p0b, p1b)
    except Exception:
        basis = None     # fall back to the Arnoldi scan per probe

    scale = max(abs(p2), abs(p1), 1e-2)
    last_err = None
    dirs = [(1, 0), (-1, 0), (0, 1), (0, -1),
            (1, 1), (-1, -1), (1, -1), (-1, 1)]
    for frac in (1e-2, 5e-2, 2e-1):
        for d1, d2 in dirs:
            p1_try = p1 + d1 * frac * scale
            p2_try = p2 + d2 * frac * scale
            par_try = maprob.lens.set(dict(maprob.params), p2_try)
            par_in = maprob.inner_lens.set(par_try["_inner"], p1_try)
            sol = newton(inner.re_make(u0=x_in, params=par_in),
                         contparams.newton_options)
            if not bool(sol.converged):
                continue
            x_flat = ravel(sol.u)[0]
            if basis is not None:
                q0b, q1b, p0b, p1b = basis
                Jq0 = np.asarray(ravel(inner.dF(
                    sol.u, par_in, maprob.unravel_inner(
                        jnp.asarray(q0b, x_flat.dtype))))[0])
                Jq1 = np.asarray(ravel(inner.dF(
                    sol.u, par_in, maprob.unravel_inner(
                        jnp.asarray(q1b, x_flat.dtype))))[0])
                A2 = np.array([[p0b @ Jq0, p0b @ Jq1],
                               [p1b @ Jq0, p1b @ Jq1]])
                w2, v2 = np.linalg.eig(A2)
                icx = np.where(w2.imag > 1e-10)[0]
                if len(icx) == 0:
                    continue
                lam = w2[icx[0]]
                if abs(lam.real) > 0.5 * abs(lam.imag):
                    continue
                c = v2[:, icx[0]]
                zeta = c[0] * q0b + c[1] * q1b
                zeta = zeta / np.linalg.norm(zeta)
                vals = np.array([lam, np.conj(lam)])
                vecs = np.stack([zeta, np.conj(zeta)], axis=1)
                i0 = 0
            else:
                # ODE-scale fallback: iterative spectrum at the probe point
                # through the MA problem's own FlatOperator
                X_try = jnp.concatenate(
                    [x_flat, jnp.asarray(p1_try, x_flat.dtype)[None]])
                vals, vecs, _cv = _iter_spectrum_at(maprob, X_try, par_try,
                                                    nev=nev)
                cand = np.where(vals.imag > 1e-8)[0]
                if len(cand) == 0:
                    continue
                i0 = cand[np.argmin(np.abs(vals.real[cand]))]
                lam = vals[i0]
                if abs(lam.real) > 0.5 * abs(lam.imag):
                    continue     # complexified but not near a Hopf yet
            prob_t = inner.re_make(u0=sol.u, params=par_in)
            pt = SpecialPoint(type="hopf", param=p1_try, x=sol.u,
                              eigenvals=vals, eigenvecs=vecs,
                              ind_ev=int(i0) + 1)
            shim = SimpleNamespace(prob=prob_t, specialpoint=[pt])
            try:
                out = continuation_hopf_mf(shim, 0, lens2, contparams,
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


def switch_codim2_mf(br_c2, ind: int, contparams: ContinuationPar,
                     to: Optional[str] = None, nev: int = 10,
                     **kwargs) -> Branch:
    """Start the OTHER matrix-free codim-2 curve from a codim-2 point
    detected along an MF MA curve (VERDICT r4 missing #3; ref the generic
    `continuation(br_codim2, ind, opts)` dispatch,
    src/codim2/codim2.jl:400-560 — which works for any jacobian_ma
    including MinAug()):

      zh on an MF fold curve -> the MF Hopf curve through the same point
      zh/bt on an MF Hopf curve -> the MF fold curve through the point
      hh on an MF Hopf curve -> the OTHER MF Hopf curve (second frequency)
      bt on an MF fold curve -> the MF Hopf curve, by the two-sided probe
      (_bt_to_hopf_probe_mf: the pair only complexifies on one side)

    Both curves pass through the point, so the new MA problem starts
    exactly there; the target eigenpair comes from the point's SAVED
    iterative spectrum when present, else a fresh warm Arnoldi on the
    operator — nothing materializes a matrix."""
    from types import SimpleNamespace

    from ..detection.points import SpecialPoint

    gamma = br_c2.gamma if isinstance(br_c2, Branch) else br_c2
    sp = gamma.specialpoint[ind]
    maprob = gamma.prob
    if not getattr(maprob, "ma_mf", False):
        raise ValueError("switch_codim2_mf needs a matrix-free MA curve")
    inner = maprob.inner_prob
    n = maprob.n_inner
    X = np.asarray(sp.x)
    x = jnp.asarray(X[:n])
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
    if to == "hopf" and sp.type == "bt":
        return _bt_to_hopf_probe_mf(maprob, sp, contparams,
                                    maprob.outer_lens, nev=nev, **kwargs)

    # inner problem anchored at the point (p2 frozen into params); same
    # state shape -> re_make carries the capability hooks (spectral_precond)
    par_full = maprob.lens.set(dict(maprob.params), p2)
    par_inner = maprob.inner_lens.set(par_full["_inner"], p1)
    x_in = maprob.unravel_inner(x)
    prob2 = inner.re_make(u0=x_in, params=par_inner)
    lens2 = maprob.outer_lens

    # target eigen data: saved point spectrum, else fresh warm Arnoldi
    vals = None if sp.eigenvals is None else np.asarray(sp.eigenvals)
    vecs = None if sp.eigenvecs is None else np.asarray(sp.eigenvecs)
    if vals is None or (to == "hopf" and vecs is None):
        vals, vecs, cv = _iter_spectrum_at(maprob, jnp.asarray(X), par_full,
                                           nev=nev)
        if not cv:
            import warnings

            warnings.warn("iterative spectrum at the switch point did not "
                          "fully converge; anchors will be refined by the "
                          "bootstrap inverse iteration", RuntimeWarning)

    shim_kw = {}
    if to == "fold":
        # the fold eigenvalue: smallest |lambda| among the (near-)real ones
        realish = np.where(np.abs(vals.imag) < 1e-6)[0]
        if len(realish):
            i0 = realish[np.argmin(np.abs(vals[realish]))]
            shim_kw = dict(eigenvals=vals, ind_ev=int(i0) + 1)
            if vecs is not None:
                shim_kw["eigenvecs"] = vecs
        pt = SpecialPoint(type="fold", param=p1, x=x_in, **shim_kw)
        shim = SimpleNamespace(prob=prob2, specialpoint=[pt])
        return continuation_fold_mf(shim, 0, lens2, contparams, **kwargs)

    cand = np.where(vals.imag > 1e-10)[0]
    if len(cand) == 0:
        raise RuntimeError("no complex pair in the iterative spectrum at "
                           "the switch point (raise nev)")
    if sp.type == "hh" and omega_cur is not None:
        # at an HH both pairs sit on the axis: the target is the pair
        # FARTHEST in frequency from the current curve's omega
        i0 = cand[np.argmax(np.abs(vals[cand].imag - abs(omega_cur)))]
    else:
        i0 = cand[np.argmin(np.abs(vals.real[cand]))]
    pt = SpecialPoint(type="hopf", param=p1, x=x_in, eigenvals=vals,
                      eigenvecs=vecs, ind_ev=int(i0) + 1)
    shim = SimpleNamespace(prob=prob2, specialpoint=[pt])
    return continuation_hopf_mf(shim, 0, lens2, contparams, **kwargs)


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


_MA_MF_ATTRS = ("ma_mf", "anchors_kernel", "gm_ext", "gm2", "precond",
                "fuse_step", "jac_op_paired")


def _remake_ma_mf(maprob, **kwargs):
    """`re_make` (dataclasses.replace) drops the non-field MA attributes;
    restore both the shared set and the MF-only set."""
    from .minaug import _MA_ATTRS

    new = maprob.re_make(**kwargs)
    for name in _MA_ATTRS + _MA_MF_ATTRS:
        if hasattr(maprob, name):
            object.__setattr__(new, name, getattr(maprob, name))
    return new


def _ma_eigsolver(nopts, contparams):
    """The MF eig_jacobian hands over a FlatOperator: a dense eigensolver
    would raise (VERDICT r3 weak #5 — PDE codim-2 detection must be
    iterative).  Swap a DenseEig default for warm-started Arnoldi."""
    from ..linalg.eig import ArnoldiEig, DenseEig

    eig = nopts.eigsolver
    if isinstance(eig, DenseEig) and contparams.detect_bifurcation > 1:
        return nopts.replace(eigsolver=ArnoldiEig(
            krylov_dim=max(2 * contparams.nev + 12, 40), restarts=3))
    return nopts


def _ma_palc(alg, ls_ma):
    """PALC over the MA operator: plain block elimination, NO conditional
    refinement pass — the MA corrector program already nests several Krylov
    loops per iteration (sigma solves + Govaerts rows + the two bordered
    ls solves); the cond-gated BEC refinement roughly doubles it, which has
    crashed the TPU compile helper at 15k dof.  The refinement is
    unnecessary here: ls_ma solves J_G to rtol ~1e-9 directly."""
    from ..linalg.bordered import BorderingBLS

    if isinstance(alg, PALC) and getattr(alg, "bls", None) is None:
        return dataclasses.replace(
            alg, bls=BorderingBLS(solver=ls_ma, check_precision=False))
    return alg


def _ma_linsolver(precond, n, k, user_ls, low_dtype=None):
    """Corrector linear solver for the (n+k)-dim MA operator: GMRES with
    the inner preconditioner extended by identity scalar slots.  Settings
    are inherited from the user's GMRES when one was configured.  With
    `low_dtype`, an IterativeRefinement wrapper runs the Krylov work on
    the jac_op's low-precision twin (PairedOperator) + f64 corrections."""
    from ..linalg.linear import IterativeRefinement

    o = {}
    if isinstance(user_ls, GMRES):
        o = dict(restart=user_ls.restart, maxiter=user_ls.maxiter,
                 rtol=user_ls.rtol, atol=user_ls.atol)
    elif isinstance(user_ls, IterativeRefinement) and             isinstance(user_ls.inner, GMRES):
        o = dict(restart=user_ls.inner.restart,
                 maxiter=user_ls.inner.maxiter)
    o.setdefault("restart", 40)
    o.setdefault("maxiter", 240)
    o.setdefault("rtol", 1e-9)
    o.setdefault("atol", 1e-13)
    pext = ext_precond(precond, n)
    if low_dtype is not None:
        inner = GMRES(precond=pext, restart=o["restart"],
                      maxiter=o["maxiter"], rtol=3e-5, atol=0.0)
        return IterativeRefinement(inner=inner, low_dtype=low_dtype,
                                   refinements=4, rtol=o["rtol"],
                                   atol=o["atol"])
    return GMRES(precond=pext, **o)


def continuation_fold_mf(br, ind_bif: int, lens2,
                         contparams: ContinuationPar,
                         alg=None, detect_codim2_bifurcation: int = 2,
                         update_minaug_every_step: int = 1,
                         precond=None, gmres_opts: Optional[dict] = None,
                         bootstrap_iters: int = 3, low_dtype="auto",
                         **kwargs) -> Branch:
    """Operator-path fold-curve continuation: the reference's own PDE leg
    (`continuation_fold` with `jacobian_ma = MinAug()` + BorderingBLS,
    ref src/codim2/MinAugFold.jl:369-538, examples/SH2d-fronts.jl:97-115).

    Newton/PALC solve the MA operator with preconditioned GMRES; sigma,
    anchors, test functions and the per-step inner spectrum are all
    iterative — nothing materializes an (n+1)^2 matrix."""
    prob = br.prob
    alg = alg or PALC()
    sp = br.specialpoint[ind_bif]
    if sp.type not in ("fold", "bp"):
        raise ValueError(f"point {ind_bif} is a {sp.type!r}, not fold/bp")
    if precond is None:
        precond = getattr(prob, "spectral_precond", None)
    if low_dtype == "auto":
        # mixed precision pays only where f64 is emulated (TPU)
        low_dtype = jnp.float32 if jax.default_backend() == "tpu" else None
    nopts = contparams.newton_options
    eig_dtype = getattr(nopts.eigsolver, "compute_dtype", None)

    maprob = fold_ma_problem_mf(prob, prob.lens, lens2, precond=precond,
                                gmres_opts=gmres_opts,
                                eig_compute_dtype=eig_dtype,
                                update_every=update_minaug_every_step,
                                low_dtype=low_dtype)
    x_flat, _ = ravel(sp.x)
    p1 = float(sp.param)
    X0 = jnp.concatenate([x_flat, jnp.asarray(p1, x_flat.dtype)[None]])
    seed_r, _ = _null_seed(sp, maprob.n_inner)
    params = bootstrap_fold_anchors(maprob, X0, dict(maprob.params),
                                    iters=bootstrap_iters, seed=seed_r)
    maprob = _remake_ma_mf(maprob, u0=X0, params=params)

    ls_ma = _ma_linsolver(precond, maprob.n_inner, 1, nopts.linsolver,
                          low_dtype=low_dtype)
    cp = contparams.replace(
        newton_options=_ma_eigsolver(nopts, contparams).replace(
            linsolver=ls_ma))
    alg = _ma_palc(alg, ls_ma)

    event = (fold_codim2_event_mf(maprob)
             if detect_codim2_bifurcation > 0 else None)
    if event is not None and cp.detect_event == 0:
        cp = cp.replace(detect_event=min(detect_codim2_bifurcation, 2),
                        detect_bifurcation=cp.detect_bifurcation
                        if cp.detect_bifurcation > 1 else 0)
    gamma = continuation(maprob, alg, cp, kind="FoldCont", event=event,
                         **kwargs)
    from .minaug import _relabel_codim2

    _relabel_codim2(gamma, maprob)
    return Branch(gamma=gamma, bp=sp)


def continuation_hopf_mf(br, ind_bif: int, lens2,
                         contparams: ContinuationPar,
                         alg=None, detect_codim2_bifurcation: int = 2,
                         update_minaug_every_step: int = 1,
                         compute_lyapunov: bool = True,
                         gh_every: int = 2,
                         precond=None, gmres_opts: Optional[dict] = None,
                         bootstrap_iters: int = 3, low_dtype="auto",
                         **kwargs) -> Branch:
    """Operator-path Hopf-curve continuation with BT/GH monitoring — the
    reference's cGL2d leg (`jacobian_ma = MinAug()`,
    ref examples/cGL2d.jl:115-160; src/codim2/MinAugHopf.jl:425-523)."""
    prob = br.prob
    alg = alg or PALC()
    sp = br.specialpoint[ind_bif]
    if sp.type != "hopf":
        raise ValueError(f"point {ind_bif} is a {sp.type!r}, not hopf")
    if precond is None:
        precond = getattr(prob, "spectral_precond", None)
    nopts = contparams.newton_options
    eig_dtype = getattr(nopts.eigsolver, "compute_dtype", None)

    # omega from the saved eigenvalue at the Hopf point
    if sp.eigenvals is None:
        raise ValueError("Hopf special point carries no eigenvalues; rerun "
                         "with detect_bifurcation >= 2")
    ind = max(int(sp.ind_ev) - 1, 0)
    lam = np.asarray(sp.eigenvals)[ind]
    omega = abs(float(np.imag(lam)))
    if omega == 0.0:
        cand = np.asarray(sp.eigenvals)
        cand = cand[np.abs(cand.imag) > 1e-10]
        if len(cand) == 0:
            raise RuntimeError("no complex eigenvalue at the Hopf point")
        lam = cand[np.argmin(np.abs(cand.real))]
        omega = abs(float(np.imag(lam)))

    if low_dtype == "auto":
        low_dtype = jnp.float32 if jax.default_backend() == "tpu" else None
    maprob = hopf_ma_problem_mf(prob, prob.lens, lens2, precond=precond,
                                gmres_opts=gmres_opts,
                                eig_compute_dtype=eig_dtype,
                                update_every=update_minaug_every_step,
                                low_dtype=low_dtype)
    x_flat, _ = ravel(sp.x)
    p1 = float(sp.param)
    X0 = jnp.concatenate([x_flat,
                          jnp.asarray(p1, x_flat.dtype)[None],
                          jnp.asarray(omega, x_flat.dtype)[None]])
    seed = _null_seed(sp, maprob.n_inner)
    if float(np.imag(lam)) < 0:
        # omega > 0 convention: conjugate the seed so the bootstrap anchors
        # select the +i*omega pair, not its conjugate
        seed = (seed[0], -seed[1])
    params = bootstrap_hopf_anchors(maprob, X0, dict(maprob.params),
                                    iters=bootstrap_iters, seed=seed)
    maprob = _remake_ma_mf(maprob, u0=X0, params=params)

    ls_ma = _ma_linsolver(precond, maprob.n_inner, 2, nopts.linsolver,
                          low_dtype=low_dtype)
    cp = contparams.replace(
        newton_options=_ma_eigsolver(nopts, contparams).replace(
            linsolver=ls_ma))
    alg = _ma_palc(alg, ls_ma)

    event = (hopf_codim2_event_mf(maprob, with_gh=compute_lyapunov,
                                  gh_every=gh_every)
             if detect_codim2_bifurcation > 0 else None)
    if event is not None and cp.detect_event == 0:
        cp = cp.replace(detect_event=min(detect_codim2_bifurcation, 2),
                        detect_bifurcation=cp.detect_bifurcation
                        if cp.detect_bifurcation > 1 else 0)
    gamma = continuation(maprob, alg, cp, kind="HopfCont", event=event,
                         **kwargs)
    from .minaug import _relabel_codim2

    _relabel_codim2(gamma, maprob)
    return Branch(gamma=gamma, bp=sp)
