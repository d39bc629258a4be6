"""Jitted per-step kernels for the continuation engine.

Each kernel is a single XLA computation: predictor, bordered-Newton
corrector, tangent, and eigensolve all run device-side; the host engine
only orchestrates (step-size control, detection, bisection, recording) on
scalars (ref control flow: src/Continuation.jl:349-504).
"""
from __future__ import annotations

import dataclasses
from types import SimpleNamespace
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import ContinuationPar
from ..core.state import (BorderedState, DotTheta, tree_axpy, tree_norm,
                          tree_scale, tree_size, tree_sub, tree_vdot,
                          tree_zeros_like)
from ..linalg.bordered import BorderingBLS, MatrixBLS, MatrixFreeBLS
from ..linalg.eig import ArnoldiEig, DenseEig, FlatOperator
from ..linalg.linear import (DenseLS, IterativeRefinement, PairedOperator,
                             is_operator)
from .algorithms import PALC, MoorePenrose, MoorePenroseLS, Natural
from .tangents import Bordered, Polynomial, Secant


def default_bls(alg, newton_opts):
    """Choose/complete the bordered linear solver: inject the Newton linear
    solver (ref `update(alg, contParams, linear_algo)`, Palc.jl:100-110)."""
    bls = getattr(alg, "bls", None)
    if bls is None:
        return BorderingBLS(solver=newton_opts.linsolver)
    if getattr(bls, "solver", "missing") is None:
        return dataclasses.replace(bls, solver=newton_opts.linsolver)
    return bls


def _cast_floats(tree, dt):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if (hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating))
        else a, tree)


def _pick_jac(prob, linsolver):
    if isinstance(linsolver, DenseLS) or getattr(linsolver, "needs_matrix",
                                                 False):
        return prob.jacobian
    if isinstance(linsolver, IterativeRefinement):
        # problems whose jac_op ALREADY returns a PairedOperator (the MF
        # minimally-augmented functionals) supply their own low twin —
        # building one here via dF would re-enter the sigma solves at cast
        # primals, doubling the per-iteration bordered-solve count
        if getattr(prob, "jac_op_paired", False):
            return prob.jacobian_operator
        # mixed-precision refinement: pair the accurate jvp operator with a
        # twin built at cast (low-precision) primals, so the inner Krylov
        # runs natively at that precision on TPU
        lo = linsolver.low_dtype
        n_state = tree_size(prob.u0)

        def jac(x, par):
            low = FlatOperator(
                _flat_op(prob, _cast_floats(x, lo), _cast_floats(par, lo),
                         out_dtype=lo), n_state, lo)
            return PairedOperator(prob.jacobian_operator(x, par), low)

        return jac
    return prob.jacobian_operator


def make_kernels(prob, alg, contparams: ContinuationPar,
                 norm: Callable = tree_norm, dot_theta: DotTheta = None,
                 callback: Callable = None, nev: int = None):
    """Build the jitted kernels for one (problem, algorithm, options) triple.

    `nev` overrides contparams.nev — the engine rebuilds (memoized) with a
    larger request when a branch destabilizes in more directions than the
    current spectrum window (ref the nev auto-raise, src/Utils.jl:67-105)."""
    nopts = contparams.newton_options
    theta = float(getattr(alg, "theta", 0.5))
    dot_t = dot_theta or DotTheta()
    n_state = tree_size(prob.u0)
    bls = default_bls(alg, nopts)
    jac = _pick_jac(prob, nopts.linsolver)
    p_min, p_max = contparams.p_min, contparams.p_max

    def dotp(x, y):
        d = jnp.real(tree_vdot(x, y))
        return d / n_state if dot_t.normalize else d

    def set_p(params, p):
        return prob.set_lens_param(params, p)

    # ------------------------------------------------------------------
    # plain Newton at fixed parameter (init & Natural corrector)
    # ------------------------------------------------------------------
    @jax.jit
    def newton_fixed(u, p, params):
        par = set_p(params, p)
        ls = nopts.linsolver
        res_f0 = prob.residual(u, par)
        res0 = norm(res_f0)

        def cond(c):
            x, rf, r, k, itl, keep = c
            return jnp.logical_and(
                jnp.logical_and(r > nopts.tol, k < nopts.max_iterations),
                keep)

        def body(c):
            x, rf, r, k, itl, keep = c
            J = jac(x, par)
            du, cv, itlin = ls(J, rf)
            if nopts.linesearch:
                # Armijo halving (ref the linesearch branch of _newton,
                # src/Newton.jl): halve the damping until the residual
                # decreases (or alpha_min); accept the last trial otherwise
                x1 = tree_axpy(-nopts.alpha, du, x)
                rf1 = prob.residual(x1, par)
                r1 = norm(rf1)

                def cond_a(s):
                    alpha, xa, rfa, ra = s
                    return jnp.logical_and(ra >= r,
                                           alpha > nopts.alpha_min)

                def body_a(s):
                    alpha, xa, rfa, ra = s
                    alpha = alpha * 0.5
                    xa = tree_axpy(-alpha, du, x)
                    rfa = prob.residual(xa, par)
                    return alpha, xa, rfa, norm(rfa)

                _, x, rf, r = jax.lax.while_loop(
                    cond_a, body_a, (jnp.asarray(nopts.alpha), x1, rf1, r1))
            else:
                x = tree_sub(x, du)
                rf = prob.residual(x, par)
                r = norm(rf)
            if callback is not None:
                keep = callback({"x": x, "residual": rf,
                                 "residual_norm": r, "p": p,
                                 "step": k + 1})
            return x, rf, r, k + 1, itl + itlin, keep

        x, rf, r, k, itl, _ = jax.lax.while_loop(
            cond, body, (u, res_f0, res0, jnp.array(0), jnp.array(0),
                         jnp.array(True)))
        return x, r <= nopts.tol, k, itl, r

    # ------------------------------------------------------------------
    # PALC bordered-Newton corrector (ref newton_palc, Palc.jl:187-305)
    # ------------------------------------------------------------------
    @jax.jit
    def palc_corrector(z_pred: BorderedState, z0: BorderedState,
                       tau: BorderedState, ds, params,
                       decay_alpha=jnp.inf):
        """decay_alpha < inf aborts Newton early unless the residual decays
        by that factor each iteration — the pmcont predictor-acceptance
        criterion (ref the Multiple callback, Multiple.jl:52-65)."""
        def N_eq(u, p):
            # theta <u - z0.u, tau.u>/n + (1-theta)(p - z0.p) tau.p - ds
            du = tree_sub(u, z0.u)
            return (dotp(du, tau.u) * theta
                    + (p - z0.p) * tau.p * (1.0 - theta) - ds)

        def full_res(u, p):
            par = set_p(params, p)
            rf = prob.residual(u, par)
            rn = N_eq(u, p)
            return rf, rn, jnp.maximum(norm(rf), jnp.abs(rn))

        rf0, rn0, r0 = full_res(z_pred.u, z_pred.p)

        def cond(c):
            u, p, rf, rn, r, r_prev, k, itl, ok = c
            decays = jnp.logical_or(
                jnp.logical_or(k < 1, r <= nopts.tol),
                r <= decay_alpha * r_prev)
            return jnp.logical_and(
                jnp.logical_and(
                    jnp.logical_and(r > nopts.tol,
                                    k < nopts.max_iterations), ok),
                decays)

        def body(c):
            u, p, rf, rn, r, r_prev, k, itl, ok = c
            par = set_p(params, p)
            dFdp = prob.dFdp(u, par)
            J = jac(u, par)
            du, dp, cv_l, itlin = bls(J, dFdp, tau.u, tau.p, rf, rn,
                                      theta, 1.0 - theta, dotp=dotp)
            u = tree_sub(u, du)
            p = jnp.clip(p - dp, p_min, p_max)
            r_prev = r
            rf, rn, r = full_res(u, p)
            if callback is not None:
                ok = callback({"x": u, "residual": rf, "residual_norm": r,
                               "p": p, "step": k + 1})
            return u, p, rf, rn, r, r_prev, k + 1, itl + itlin, ok

        u, p, rf, rn, r, _, k, itl, _ = jax.lax.while_loop(
            cond, body,
            (z_pred.u, jnp.asarray(z_pred.p), rf0, rn0, r0, r0,
             jnp.array(0), jnp.array(0), jnp.array(True)))
        return (BorderedState(u=u, p=p), r <= nopts.tol, k, itl, r)

    # ------------------------------------------------------------------
    # Moore-Penrose corrector (ref newton_moore_penrose, MoorePenrose.jl:129)
    # Gauss-Newton on the extended system with the tangent as the extra row;
    # the tangent itself is updated from the bordered solve each iteration.
    # ------------------------------------------------------------------
    @jax.jit
    def mp_corrector(z_pred: BorderedState, z0: BorderedState,
                     tau0: BorderedState, ds, params):
        def res_only(u, p):
            par = set_p(params, p)
            rf = prob.residual(u, par)
            return rf, norm(rf)

        rf0, r0 = res_only(z_pred.u, z_pred.p)

        def cond(c):
            u, p, tu, tp, rf, r, k, itl = c
            return jnp.logical_and(r > nopts.tol, k < nopts.max_iterations)

        def body(c):
            u, p, tu, tp, rf, r, k, itl = c
            par = set_p(params, p)
            dFdp = prob.dFdp(u, par)
            J = jac(u, par)
            # solve [J dFdp; tau'][du; dp] = [rf; 0]
            du, dp, cv_l, itlin = bls(J, dFdp, tu, tp, rf,
                                      jnp.asarray(0.0), theta, 1.0 - theta,
                                      dotp=dotp)
            # update tangent: solve [J dFdp; tau'][tu'; tp'] = [0; 1]
            ntu, ntp, _, _ = bls(J, dFdp, tu, tp, tree_zeros_like(u),
                                 jnp.asarray(1.0), theta, 1.0 - theta,
                                 dotp=dotp)
            nrm = jnp.sqrt(dotp(ntu, ntu) * theta
                           + ntp * ntp * (1.0 - theta))
            ntu = tree_scale(ntu, 1.0 / nrm)
            ntp = ntp / nrm
            u = tree_sub(u, du)
            p = jnp.clip(p - dp, p_min, p_max)
            rf, r = res_only(u, p)
            return u, p, ntu, ntp, rf, r, k + 1, itl + itlin

        u, p, tu, tp, rf, r, k, itl = jax.lax.while_loop(
            cond, body, (z_pred.u, jnp.asarray(z_pred.p), tau0.u,
                         jnp.asarray(tau0.p), rf0, r0, jnp.array(0),
                         jnp.array(0)))
        return (BorderedState(u=u, p=p), BorderedState(u=tu, p=tp),
                r <= nopts.tol, k, itl, r)

    if isinstance(alg, MoorePenrose) and alg.method == MoorePenroseLS.pInv:
        @jax.jit
        def mp_corrector(z_pred: BorderedState, z0: BorderedState,  # noqa: F811
                         tau0: BorderedState, ds, params):
            """pInv mode: least-norm update dz = pinv([J dFdp]) @ rf and
            tangent = theta-normalized projection of the previous tangent
            onto null([J dFdp]) (ref MoorePenrose pInv,
            src/continuation/MoorePenrose.jl:23-127).  Requires a flat
            array state and a dense jacobian."""
            def res_only(u, p):
                par = set_p(params, p)
                rf = prob.residual(u, par)
                return rf, norm(rf)

            rf0, r0 = res_only(z_pred.u, z_pred.p)

            def cond(c):
                u, p, tu, tp, rf, r, k, itl = c
                return jnp.logical_and(r > nopts.tol,
                                       k < nopts.max_iterations)

            def body(c):
                u, p, tu, tp, rf, r, k, itl = c
                par = set_p(params, p)
                J = jac(u, par)
                dFdp = prob.dFdp(u, par)
                G = jnp.concatenate([J, dFdp[:, None]], axis=1)  # (n, n+1)
                Gp = jnp.linalg.pinv(G)
                dz = Gp @ rf
                u = u - dz[:-1]
                p = jnp.clip(p - dz[-1], p_min, p_max)
                t = jnp.concatenate([tu, jnp.asarray(tp)[None]])
                t = t - Gp @ (G @ t)           # project onto null(G)
                nrm = jnp.sqrt(dotp(t[:-1], t[:-1]) * theta
                               + t[-1] ** 2 * (1.0 - theta))
                t = t / nrm
                rf, r = res_only(u, p)
                return u, p, t[:-1], t[-1], rf, r, k + 1, itl + 1

            u, p, tu, tp, rf, r, k, itl = jax.lax.while_loop(
                cond, body, (z_pred.u, jnp.asarray(z_pred.p), tau0.u,
                             jnp.asarray(tau0.p), rf0, r0, jnp.array(0),
                             jnp.array(0)))
            return (BorderedState(u=u, p=p), BorderedState(u=tu, p=tp),
                    r <= nopts.tol, k, itl, r)

    # ------------------------------------------------------------------
    # tangents
    # ------------------------------------------------------------------
    @jax.jit
    def secant_tangent(z_new: BorderedState, z_old: BorderedState, ds):
        d = tree_sub(z_new, z_old)
        nrm = dot_t.norm_bs(d, theta, n_state)
        alpha = jnp.sign(ds) / jnp.maximum(nrm, float(jnp.finfo(nrm.dtype).tiny))
        return BorderedState(u=tree_scale(d.u, alpha), p=d.p * alpha)

    @jax.jit
    def bordered_tangent(z: BorderedState, tau_prev: BorderedState, params):
        par = set_p(params, z.p)
        dFdp = prob.dFdp(z.u, par)
        J = jac(z.u, par)
        tu, tp, cv, _ = bls(J, dFdp, tau_prev.u, tau_prev.p,
                            tree_zeros_like(z.u), jnp.asarray(1.0),
                            theta, 1.0 - theta, dotp=dotp)
        nrm = jnp.sqrt(dotp(tu, tu) * theta + tp * tp * (1.0 - theta))
        orient = jnp.sign(dotp(tau_prev.u, tu) * theta
                          + tau_prev.p * tp * (1.0 - theta))
        alpha = orient / jnp.maximum(nrm, float(jnp.finfo(nrm.dtype).tiny))
        return BorderedState(u=tree_scale(tu, alpha), p=tp * alpha)

    # ------------------------------------------------------------------
    # eigen-elements (ref compute_eigenvalues, src/Utils.jl:67-105)
    # ------------------------------------------------------------------
    eigsolver = nopts.eigsolver
    nev = min(contparams.nev if nev is None else nev, n_state)
    eigsolver = _widen_eigsolver(eigsolver, nev)

    # dense-matrix eigensolvers get jacfwd; iterative ones get a jvp operator
    from .. import linalg as _linalg

    eig_needs_matrix = (
        isinstance(eigsolver, DenseEig)
        or (isinstance(eigsolver, _linalg.ShiftInvertEig)
            and eigsolver.linsolver is None))

    # augmented (codim-2 / PO) problems provide the spectrum-defining inner
    # jacobian separately (ref FoldEig stripping the border,
    # src/codim2/MinAugFold.jl:579-601)
    eig_jac = getattr(prob, "eig_jacobian", None)

    # reduced-precision stability sweep: build the J.v operator at the
    # eigensolver's compute_dtype so the whole jvp traces at that precision
    # (on TPU, f32 jvp is native MXU/VPU; f64 is ~10x emulated).  Newton /
    # PALC residuals are untouched.
    eig_dtype = getattr(eigsolver, "compute_dtype", None)

    # Arnoldi-family solvers warm-start from the previous step's Ritz
    # directions (the spectrum moves little along a branch, so a warm solve
    # usually converges in ONE factorization and the cond-gated restart is
    # skipped).  The seed is a flat device array threaded through the step.
    eig_accepts_v0 = (isinstance(eigsolver, (ArnoldiEig,
                                             _linalg.ShiftInvertEig,
                                             _linalg.LOBPCGEig))
                      or bool(getattr(eigsolver, "accepts_v0", False)))
    seed_dtype = eig_dtype or (jnp.float64 if jax.config.jax_enable_x64
                               else jnp.float32)
    # blocked solvers (LOBPCG) warm-start from the full eigenvector block;
    # Arnoldi-family solvers from a single recombined Ritz direction
    _seed_cols_fn = getattr(eigsolver, "seed_cols", None)
    n_seed_cols = _seed_cols_fn(nev) if callable(_seed_cols_fn) else None

    # the eig operator may act on a SMALLER space than the full state:
    # Floquet monodromy operators act on the n_vf slice space, codim-2 MA
    # spectra on the inner problem (the border rows are stripped)
    n_eig_state = n_state
    if eig_jac is not None:
        n_eig_state = (getattr(prob, "n_vf", None)
                       or getattr(prob, "n_inner", None) or n_state)

    seed0_shape = ((n_eig_state, n_seed_cols) if n_seed_cols
                   else (n_eig_state,))  # plain tuple: shape checks stay free

    def eig_seed0():
        return jnp.zeros(seed0_shape, seed_dtype)  # zero -> random start

    # two-stage eig for structured-jacobian Floquet solvers at PDE scale:
    # building the blocks (per-interval jacfwd) and eigensolving them
    # (COP stage-1 + product + device Francis-QR) in ONE program blows the
    # TPU compile helper (observed SIGABRT at 15k+ PO unknowns); two
    # dispatches compile fine and cost one extra launch per sweep
    eig_two_stage = bool(getattr(prob, "eig_two_stage", False)
                         and eig_jac is not None)

    @jax.jit
    def _eig_blocks(u, p, params):
        return eig_jac(u, set_p(params, p))

    @jax.jit
    def _eig_from_blocks(J, eig_seed):
        vals, vecs, cv, _ = eigsolver(J, nev)
        if not contparams.save_eigenvectors:
            vecs = None
        return vals, vecs, cv, eig_seed

    # device-reduce/host-eig split (FloquetColl): the device does the
    # O(Ntst n^3) stage-1 + product reduction, the host the (n, n) dense
    # eig in full f64 — cheaper than the sequential device Francis-QR on a
    # latency-bound tunneled chip, and exact f64 instead of the TPU's
    # complex64 cap
    eig_host_split = callable(getattr(eigsolver, "device_reduce", None)) \
        and callable(getattr(eigsolver, "host_eig", None))

    @jax.jit
    def _eig_reduce(J):
        return eigsolver.device_reduce(J)

    @jax.jit
    def _eig_device(u, p, params, eig_seed):
        par = set_p(params, p)
        J_hi = None
        if eig_jac is not None:
            J = eig_jac(u, par)
        elif eig_needs_matrix:
            J = prob.jacobian(u, par)
        else:
            if eig_dtype is not None:
                u_e = _cast_floats(u, eig_dtype)
                par_e = _cast_floats(par, eig_dtype)
                J = FlatOperator(_flat_op(prob, u_e, par_e, out_dtype=eig_dtype),
                                 n_state, eig_dtype)
                # mixed-precision LOBPCG refines its reduced-precision
                # subspace on the full-precision operator (eig.py::_refine)
                if getattr(eigsolver, "refine_iters", 0) > 0:
                    J_hi = FlatOperator(_flat_op(prob, u, par), n_state)
            else:
                J = FlatOperator(_flat_op(prob, u, par), n_state)
        if J_hi is not None:
            vals, vecs, cv, _ = eigsolver(J, nev, v0=eig_seed, J_hi=J_hi)
        elif eig_accepts_v0:
            vals, vecs, cv, _ = eigsolver(J, nev, v0=eig_seed)
        else:
            vals, vecs, cv, _ = eigsolver(J, nev)
        seed_new = eig_seed
        if eig_accepts_v0 and vecs is not None:
            if n_seed_cols:
                mk = getattr(eigsolver, "make_seed", None)
                if callable(mk):
                    blk = mk(vecs, n_seed_cols).astype(seed_dtype)
                else:
                    blk = jnp.real(vecs[:, :n_seed_cols]).astype(seed_dtype)
                pad = n_seed_cols - blk.shape[1]
                if pad > 0:
                    blk = jnp.pad(blk, ((0, 0), (0, pad)))
                seed_new = blk
            else:
                seed_new = jnp.real(jnp.sum(vecs, axis=1)).astype(seed_dtype)
        if not contparams.save_eigenvectors:
            vecs = None
        return vals, vecs, cv, seed_new

    def _split_cplx(x):
        # complex arrays cannot cross the TPU tunnel (axon device->host
        # transfer of c64/c128 is unimplemented): jitted kernels hand out
        # (re, im) float pairs and the host wrapper reassembles
        return (jnp.real(x), jnp.imag(x)) if x is not None else None

    def _join_cplx(pair):
        if pair is None:
            return None
        return np.asarray(pair[0]) + 1j * np.asarray(pair[1])

    @jax.jit
    def _eig_kernel_split(u, p, params, eig_seed):
        vals, vecs, cv, seed = _eig_device(u, p, params, eig_seed)
        return _split_cplx(vals), _split_cplx(vecs), cv, seed

    def eig_kernel(u, p, params, eig_seed=None):
        """Host-facing eig: returns NUMPY complex (vals, vecs) + cv + the
        device-side warm-start seed for the next call."""
        if eig_seed is None or tuple(eig_seed.shape) != seed0_shape:
            eig_seed = eig_seed0()   # shape change = nev was auto-raised
        if eig_two_stage:
            J = _eig_blocks(u, p, params)
            if eig_host_split:
                reduced = _eig_reduce(J)
                vals, vecs, cv, _ = eigsolver.host_eig(
                    *[np.asarray(r) for r in reduced], nev,
                    with_vectors=contparams.save_eigenvectors)
                return vals, vecs, np.bool_(cv), eig_seed
            vals, vecs, cv, seed = _eig_from_blocks(J, eig_seed)
            return (_join_cplx((jnp.real(vals), jnp.imag(vals))),
                    _join_cplx((jnp.real(vecs), jnp.imag(vecs)))
                    if vecs is not None else None, cv, seed)
        vals_p, vecs_p, cv, seed = _eig_kernel_split(u, p, params, eig_seed)
        return _join_cplx(vals_p), _join_cplx(vecs_p), cv, seed

    # ------------------------------------------------------------------
    # fused full PALC step: predictor + corrector + secant tangent + eig in
    # ONE dispatch (per-call latency over the TPU tunnel dominates the host
    # loop otherwise)
    # ------------------------------------------------------------------
    compute_eig_in_step = contparams.compute_eigenelements

    @jax.jit
    def _palc_full_step_split(z: BorderedState, tau: BorderedState, ds,
                              params, eig_seed):
        z_pred = BorderedState(u=tree_axpy(ds, tau.u, z.u),
                               p=z.p + ds * tau.p)
        z_new, cv, itn, itl, res = palc_corrector(z_pred, z, tau, ds, params)
        z_acc = jax.tree_util.tree_map(
            lambda a, b: jnp.where(cv, a, b), z_new, z)
        tau_new = secant_tangent(z_acc, z, ds)
        tau_acc = jax.tree_util.tree_map(
            lambda a, b: jnp.where(cv, a, b), tau_new, tau)
        if compute_eig_in_step:
            vals, vecs, cv_eig, seed = _eig_device(z_acc.u, z_acc.p, params,
                                                   eig_seed)
        else:
            vals, vecs, cv_eig, seed = (jnp.zeros((0,)), None,
                                        jnp.array(True), eig_seed)
        return (z_acc, tau_acc, cv, itn, itl, res, _split_cplx(vals),
                _split_cplx(vecs), cv_eig, seed)

    def palc_full_step(z, tau, ds, params, eig_seed=None):
        """Host-facing fused step: complex eig outputs as numpy."""
        if eig_seed is None or tuple(eig_seed.shape) != seed0_shape:
            eig_seed = eig_seed0()   # shape change = nev was auto-raised
        (z_acc, tau_acc, cv, itn, itl, res, vals_p, vecs_p,
         cv_eig, seed) = _palc_full_step_split(z, tau, ds, params, eig_seed)
        return (z_acc, tau_acc, cv, itn, itl, res, _join_cplx(vals_p),
                _join_cplx(vecs_p), cv_eig, seed)

    def palc_full_step_raw(z, tau, ds, params, eig_seed=None):
        """Fused step WITHOUT host transfers: everything stays on device
        (complex outputs as (re, im) pairs) so the engine can fetch all
        step scalars in one batched device_get — on a tunneled TPU every
        separate transfer is a full RTT."""
        if eig_seed is None or tuple(eig_seed.shape) != seed0_shape:
            eig_seed = eig_seed0()   # shape change = nev was auto-raised
        return _palc_full_step_split(z, tau, ds, params, eig_seed)

    return SimpleNamespace(
        newton_fixed=newton_fixed,
        palc_full_step=palc_full_step,
        palc_full_step_raw=palc_full_step_raw,
        join_cplx=_join_cplx,
        palc_corrector=palc_corrector,
        mp_corrector=mp_corrector,
        secant_tangent=secant_tangent,
        bordered_tangent=bordered_tangent,
        eig=eig_kernel,
        eig_seed0=eig_seed0,
        theta=theta,
        n_state=n_state,
        nev=nev,
        bls=bls,
        dotp=dotp,
        dot_t=dot_t,
        is_floquet=getattr(eigsolver, "is_floquet", False),
    )


def _widen_eigsolver(eig, nev):
    """Ensure an iterative eigensolver's Krylov space can actually hold
    `nev` converged Ritz pairs (needed once the engine auto-raises nev)."""
    if isinstance(eig, ArnoldiEig) and eig.krylov_dim < nev + 8:
        return dataclasses.replace(eig, krylov_dim=nev + 12)
    inner = getattr(eig, "eigsolver", None)
    if inner is not None:
        widened = _widen_eigsolver(inner, nev)
        if widened is not inner:
            return dataclasses.replace(eig, eigsolver=widened)
    return eig


def _flat_op(prob, u, par, out_dtype=None):
    from ..core.state import ravel

    flat0, unravel = ravel(u)

    def op(v):
        # keep the pipeline at the requested dtype even if the model embeds
        # strongly-typed f64 constants (np scalars) that promote internally
        if out_dtype is not None:
            v = v.astype(out_dtype)
        out = prob.dF(u, par, unravel(v))
        of, _ = ravel(out)
        return of if out_dtype is None else of.astype(out_dtype)

    return op
