"""Continuation engine (ref src/Continuation.jl).

The reference drives a Julia iterator (`ContIterable`/`ContState`/`iterate`,
ref :27-39,140-182,349-504).  Here the same shape becomes: device-resident
state (`BorderedState` z, tangent tau) advanced by jitted step kernels, with
a thin host loop doing step-size control, detection, bisection and recording
on scalars.  A continuation of a PDE never ships the state to the host
unless solution-saving is enabled.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import ContinuationPar
from ..core.state import BorderedState, tree_axpy, tree_norm
from ..detection.points import SpecialPoint
from .algorithms import PALC, AutoSwitch, MoorePenrose, Multiple, Natural
from .kernels import make_kernels
from .results import Branch, ContResult, merge_branches
from .tangents import Bordered, Polynomial, Secant


@dataclasses.dataclass
class ContState:
    """Host orchestration state (ref `ContState`, src/Continuation.jl:140).
    z/tau are device pytrees; scalars live on host for control flow."""

    z: BorderedState = None          # last converged point
    z_old: BorderedState = None      # previous converged point
    tau: BorderedState = None        # unit tangent (theta-norm)
    ds: float = 0.01
    step: int = 0
    converged: bool = True
    itnewton: int = 0
    itlinear: int = 0
    res: float = 0.0
    eigvals: Optional[np.ndarray] = None
    eigvecs: Any = None
    converged_eig: bool = True
    n_unstable: Tuple[int, int] = (-1, -1)   # (current, previous)
    n_imag: Tuple[int, int] = (-1, -1)
    stopcontinuation: bool = False
    stepsizecontrol: bool = True
    in_bisection: bool = False
    event_values: Optional[tuple] = None     # (current, previous)
    eig_seed: Any = None                     # Arnoldi warm-start (device)

    _p_cache: Any = None
    _p_old_cache: Any = None
    _tau_p_cache: Any = None

    # invalidate the scalar caches at EVERY assignment of the field they
    # shadow: id()-keyed caches alone are unsafe because CPython can reuse a
    # freed object's address, silently serving a stale value
    _CACHE_FOR = {"z": "_p_cache", "z_old": "_p_old_cache",
                  "tau": "_tau_p_cache"}

    def __setattr__(self, name, value):
        object.__setattr__(self, name, value)
        cache = self._CACHE_FOR.get(name)
        if cache is not None:
            object.__setattr__(self, cache, None)

    def copy(self) -> "ContState":
        return dataclasses.replace(self)

    # the scalar parameter is read many times per host-loop iteration; each
    # float() is a device->host transfer (a full RTT on a tunneled TPU), so
    # cache the fetched value (cleared on assignment by __setattr__)
    @property
    def p(self) -> float:
        if self._p_cache is None:
            object.__setattr__(self, "_p_cache", float(self.z.p))
        return self._p_cache

    @property
    def p_old(self) -> float:
        if self._p_old_cache is None:
            object.__setattr__(self, "_p_old_cache", float(self.z_old.p))
        return self._p_old_cache

    @property
    def tau_p(self) -> float:
        if self._tau_p_cache is None:
            object.__setattr__(self, "_tau_p_cache", float(self.tau.p))
        return self._tau_p_cache


class ContIterable:
    """Everything needed to run one continuation (ref src/Continuation.jl:27)."""

    def __init__(self, prob, alg, contparams: ContinuationPar,
                 norm: Callable = tree_norm,
                 finalise_solution: Optional[Callable] = None,
                 callback_newton: Optional[Callable] = None,
                 event=None,
                 verbosity: int = 0,
                 kind: str = "EquilibriumCont"):
        self.prob = prob
        self.alg = alg
        self.contparams = contparams
        self.norm = norm
        self.finalise_solution = finalise_solution
        self.callback_newton = callback_newton
        self.event = event
        self.verbosity = verbosity
        self.kind = kind
        base_alg = alg.alg if isinstance(alg, (AutoSwitch, Multiple)) else alg
        self.base_alg = base_alg
        self.kernels = make_kernels(prob, base_alg, contparams, norm,
                                    callback=callback_newton)
        # AutoSwitch dynamic mode: 'natural' | 'palc'
        self._autoswitch_mode = ("natural" if isinstance(alg, AutoSwitch)
                                 else None)
        # current (possibly updated along the branch) parameter pytree; the
        # problem's update! hook may replace it (ref update_problem!,
        # src/Continuation.jl:251)
        self.current_params = prob.params

    # ------------------------------------------------------------------
    # initialization: two Newton solves + secant tangent
    # (ref iterate(it) first point, src/Continuation.jl:349-446)
    # ------------------------------------------------------------------
    def init_state(self, x0=None, params=None) -> ContState:
        cp = self.contparams
        if params is not None:
            self.current_params = params
        params = self.current_params
        x0 = self.prob.u0 if x0 is None else x0
        p0 = float(self.prob.get_lens_param(params))
        ds = cp.ds

        u0, cv0, it0, itl0, res0 = self.kernels.newton_fixed(
            x0, jnp.asarray(p0), params)
        if not bool(cv0):
            raise RuntimeError(
                f"Newton failed to converge on the initial guess at p = {p0} "
                f"(residual {float(res0):.3e})")

        # second point at p0 + ds / eta for the secant tangent
        p1 = p0 + ds / cp.eta
        u1, cv1, _, _, res1 = self.kernels.newton_fixed(
            u0, jnp.asarray(p1), params)
        if not bool(cv1):
            raise RuntimeError(
                f"Newton failed on the second point at p = {p1}")

        z0 = BorderedState(u=u0, p=jnp.asarray(p0))
        z1 = BorderedState(u=u1, p=jnp.asarray(p1))
        tau = self.kernels.secant_tangent(z1, z0, jnp.asarray(ds))
        state = ContState(z=z0, z_old=z0, tau=tau, ds=ds, step=0,
                          converged=True, itnewton=int(it0), res=float(res0))
        if cp.compute_eigenelements:
            self.compute_eig(state)
            state.n_unstable = (state.n_unstable[0], state.n_unstable[0])
            state.n_imag = (state.n_imag[0], state.n_imag[0])
        return state

    # ------------------------------------------------------------------
    # eigen-elements + stability counters (ref is_stable, Bifurcations.jl:5)
    # ------------------------------------------------------------------
    def compute_eig(self, state: ContState):
        vals, vecs, cv, seed = self.kernels.eig(state.z.u, state.z.p,
                                                self._params(),
                                                state.eig_seed)
        state.eig_seed = seed
        vals_np = np.asarray(vals)
        tol = self.contparams.tol_stability
        n_unstable = int(np.sum(vals_np.real > tol))
        n_imag = int(np.sum((np.abs(vals_np.imag) > tol)
                            & (vals_np.real > tol)))
        state.eigvals = vals_np
        state.eigvecs = vecs
        state.converged_eig = bool(cv)
        state.n_unstable = (n_unstable, state.n_unstable[0])
        state.n_imag = (n_imag, state.n_imag[0])
        self._maybe_raise_nev(state)

    def _maybe_raise_nev(self, state: ContState):
        """Grow the eigensolve window to n_unstable + 5 (ref the nev
        auto-raise in compute_eigenvalues!, src/Utils.jl:67-105) so a
        branch destabilizing in more than `nev` directions never saturates
        the detection counts.  Kernels are memoized per nev (rounded up to
        a multiple of 4 to bound recompiles)."""
        kn = self.kernels
        need = state.n_unstable[0] + 5
        # structured-jacobian problems (Floquet) bound the spectrum by the
        # vector-field dimension, not the full unknown count: cap there so
        # the raise never triggers a useless rebuild (ADVICE r3)
        cap = min(kn.n_state, getattr(self.prob, "eig_max_nev", kn.n_state))
        if need <= kn.nev or kn.nev >= cap:
            return
        new_nev = min(int(-(-need // 4) * 4), cap)
        cache = self.__dict__.setdefault("_kernels_by_nev", {kn.nev: kn})
        if new_nev not in cache:
            cache[new_nev] = make_kernels(
                self.prob, self.base_alg, self.contparams, self.norm,
                callback=self.callback_newton, nev=new_nev)
        self.kernels = cache[new_nev]

    def _params(self):
        return self.current_params

    # ------------------------------------------------------------------
    # one continuation step (ref iterate(it, state), src/Continuation.jl:458)
    # ------------------------------------------------------------------
    def iterate(self, state: ContState):
        cp = self.contparams
        ds = state.ds
        tau_p = state.tau_p
        p_pred = state.p + ds * tau_p

        use_natural = isinstance(self.alg, Natural)
        if self._autoswitch_mode is not None:
            # AutoSwitch: shallow branch (param-dominated tangent) -> Natural,
            # steep (fold-approaching, |tau_p| small) -> PALC
            # (ref corrector! dispatch, src/continuation/AutoSwitch.jl:58-74)
            use_natural = ((1.0 - self.kernels.theta) * abs(tau_p)
                           > getattr(self.alg, "tol_param", 0.5)
                           and not state.in_bisection)
            self._autoswitch_mode = "natural" if use_natural else "palc"

        if use_natural:
            p_new = float(np.clip(state.p + ds, cp.p_min, cp.p_max))
            u_new, cv, itn, itl, res = self.kernels.newton_fixed(
                state.z.u, jnp.asarray(p_new), self._params())
            z_new = BorderedState(u=u_new, p=jnp.asarray(p_new))
        elif p_pred <= cp.p_min or p_pred >= cp.p_max:
            # PALC fallback to Natural at the parameter-domain boundary
            # (ref corrector! dispatch, src/continuation/Palc.jl:157-166)
            p_clamped = float(np.clip(p_pred, cp.p_min, cp.p_max))
            u_pred = tree_axpy(ds, state.tau.u, state.z.u)
            u_new, cv, itn, itl, res = self.kernels.newton_fixed(
                u_pred, jnp.asarray(p_clamped), self._params())
            z_new = BorderedState(u=u_new, p=jnp.asarray(p_clamped))
        elif isinstance(self.base_alg, MoorePenrose):
            z_pred = BorderedState(
                u=tree_axpy(ds, state.tau.u, state.z.u),
                p=state.z.p + ds * state.tau.p)
            z_new, tau_new, cv, itn, itl, res = self.kernels.mp_corrector(
                z_pred, state.z, state.tau, jnp.asarray(ds), self._params())
            if bool(cv):
                state.tau = tau_new
        elif isinstance(self.alg, Multiple):
            # pmcont: try predictors at i*ds for i = nb..1, accept the first
            # converged corrector (ref src/continuation/Multiple.jl:54-67)
            accepted = False
            for i in range(self.alg.nb, 0, -1):
                dsi = ds * i
                z_pred = BorderedState(
                    u=tree_axpy(dsi, state.tau.u, state.z.u),
                    p=state.z.p + dsi * state.tau.p)
                # far predictors (i > 1) must show residual decay by factor
                # alpha each Newton iteration or be abandoned early
                # (ref the Multiple callback, Multiple.jl:52-65)
                decay = self.alg.alpha if i > 1 else jnp.inf
                z_new, cv, itn, itl, res = self.kernels.palc_corrector(
                    z_pred, state.z, state.tau, jnp.asarray(dsi),
                    self._params(), jnp.asarray(decay))
                if bool(cv):
                    accepted = True
                    break
            if not accepted:
                cv = jnp.asarray(False)
        elif self._can_fuse(state):
            # single-dispatch fused step (predictor+corrector+tangent+eig)
            (z_new, tau_new, cv, itn, itl, res, vals_p, vecs_p,
             cv_eig, eig_seed) = self.kernels.palc_full_step_raw(
                state.z, state.tau, jnp.asarray(ds), self._params(),
                state.eig_seed)
            state.eig_seed = eig_seed
            # ONE batched device->host transfer for every scalar the host
            # loop needs this step (each separate fetch is a full RTT on a
            # tunneled TPU; the eigenvector block stays on device)
            fetch = [cv, itn, itl, res, cv_eig, z_new.p, tau_new.p]
            if vals_p is not None:
                fetch += [vals_p[0], vals_p[1]]
            out = jax.device_get(fetch)
            cv, itn, itl, res, cv_eig, p_new, tau_p_new = out[:7]
            state.converged = bool(cv)
            state.itnewton = int(itn)
            state.itlinear = int(itl)
            state.res = float(res)
            if state.converged:
                p_prev = state.p      # fill the cache before z is replaced
                state.z_old = state.z
                state.z = z_new
                # the scalars already crossed in the batched fetch above —
                # write the caches so the host loop never re-fetches them
                object.__setattr__(state, "_p_old_cache", p_prev)
                object.__setattr__(state, "_p_cache", float(p_new))
                state.tau = tau_new
                object.__setattr__(state, "_tau_p_cache", float(tau_p_new))
                self._poly_push(state)
                if cp.compute_eigenelements:
                    vals_np = np.asarray(out[7]) + 1j * np.asarray(out[8])
                    tol = cp.tol_stability
                    state.eigvals = vals_np
                    state.eigvecs = self.kernels.join_cplx(vecs_p)
                    state.converged_eig = bool(cv_eig)
                    state.n_unstable = (int(np.sum(vals_np.real > tol)),
                                        state.n_unstable[0])
                    state.n_imag = (int(np.sum(
                        (np.abs(vals_np.imag) > tol)
                        & (vals_np.real > tol))), state.n_imag[0])
                    self._maybe_raise_nev(state)
            if state.stepsizecontrol:
                self.step_size_control(state)
            state.step += 1
            return state
        else:
            z_pred = self._palc_predictor(state, ds)
            z_new, cv, itn, itl, res = self.kernels.palc_corrector(
                z_pred, state.z, state.tau, jnp.asarray(ds), self._params())

        state.converged = bool(cv)
        state.itnewton = int(itn)
        state.itlinear = int(itl)
        state.res = float(res)
        if state.converged:
            state.z_old = state.z
            state.z = z_new
            self._poly_push(state)
            if cp.compute_eigenelements:
                self.compute_eig(state)
        if state.stepsizecontrol:
            self.step_size_control(state)
        self.update_predictor(state)
        state.step += 1
        return state

    def _can_fuse(self, state) -> bool:
        """Fused single-dispatch step applies for plain PALC + Secant
        (and not for two-stage eig problems, whose eigensolve must stay a
        separate dispatch — see kernels.eig_two_stage; problems whose
        residual/jacobian already embed iterative solves — the MF MA
        functionals — set fuse_step=False: one program holding corrector
        + tangent + eig on top of their nested Krylov loops has crashed
        the TPU compile helper at PDE scale)."""
        return (isinstance(self.alg, PALC)
                and isinstance(getattr(self.alg, "tangent", None), Secant)
                and not getattr(self.prob, "eig_two_stage", False)
                and getattr(self.prob, "fuse_step", True))

    # ------------------------------------------------------------------
    # predictors
    # ------------------------------------------------------------------
    def _palc_predictor(self, state: ContState, ds: float) -> BorderedState:
        """Tangent predictor z + ds*tau, or polynomial extrapolation in
        arclength when enough points are buffered
        (ref Polynomial, src/continuation/Tangents.jl:126-233).

        The point buffer and the least-squares fit live ON DEVICE (one
        jitted kernel): a PDE-sized state never crosses to the host."""
        tangent = getattr(self.alg, "tangent", None)
        if isinstance(tangent, Polynomial) and not state.in_bisection:
            buf_s = self.__dict__.get("_poly_s", [])
            if len(buf_s) >= max(tangent.n + 2, 4):
                from ..core.state import ravel as _ravel

                kernel = self.__dict__.get("_poly_kernel")
                if kernel is None:
                    deg = tangent.n

                    @jax.jit
                    def kernel(Z, t, t_new):
                        # masked Vandermonde least squares, (k, deg+1)
                        A = t[:, None] ** jnp.arange(deg + 1)[None, :]
                        G = A.T @ A + 1e-12 * jnp.eye(deg + 1, dtype=Z.dtype)
                        coef = jnp.linalg.solve(G, A.T @ Z)  # (deg+1, N+1)
                        return (t_new ** jnp.arange(deg + 1)) @ coef

                    self.__dict__["_poly_kernel"] = kernel
                ss = np.asarray(buf_s)
                s0, sc = ss.mean(), max(ss.std(), 1e-12)
                Z = self.__dict__["_poly_Z"]               # (k, N+1) device
                z_new_flat = kernel(Z, jnp.asarray((ss - s0) / sc),
                                    jnp.asarray((ss[-1] + ds - s0) / sc))
                flat, unravel = _ravel(state.z.u)
                return BorderedState(
                    u=unravel(z_new_flat[:-1]),
                    p=z_new_flat[-1])
        return BorderedState(u=tree_axpy(ds, state.tau.u, state.z.u),
                             p=state.z.p + ds * state.tau.p)

    def _poly_push(self, state: ContState):
        tangent = getattr(self.alg, "tangent", None)
        if not isinstance(tangent, Polynomial) or state.in_bisection:
            return
        from ..core.state import ravel as _ravel

        buf_s = self.__dict__.setdefault("_poly_s", [])
        s_prev = buf_s[-1] if buf_s else 0.0
        flat, _ = _ravel(state.z.u)
        rec = jnp.concatenate([flat, state.z.p[None]])     # stays on device
        rows = self.__dict__.get("_poly_rows", [])
        rows.append(rec)
        buf_s.append(s_prev + abs(state.ds))
        if len(rows) > tangent.k:
            rows.pop(0)
            buf_s.pop(0)
        self.__dict__["_poly_rows"] = rows
        self.__dict__["_poly_Z"] = jnp.stack(rows)

    # ------------------------------------------------------------------
    # step-size control (ref _step_size_control!, Contbase.jl:77-160)
    # ------------------------------------------------------------------
    def step_size_control(self, state: ContState):
        cp = self.contparams
        ds = state.ds
        if not state.converged:
            if abs(ds) <= cp.dsmin:
                state.stopcontinuation = True
                if self.verbosity > 0:
                    print(f"!! Newton failed at dsmin — stopping at step "
                          f"{state.step}")
                return
            dsnew = np.sign(ds) * max(abs(ds) / 2, cp.dsmin)
        else:
            nmax = cp.newton_options.max_iterations
            factor = (nmax - state.itnewton) / nmax
            dsnew = ds * (1 + cp.a * factor ** 2)
        state.ds = float(np.sign(dsnew) *
                         np.clip(abs(dsnew), cp.dsmin, cp.dsmax))
        state.stopcontinuation = False

    # ------------------------------------------------------------------
    # predictor / tangent update (ref getpredictor!, Palc.jl:125)
    # ------------------------------------------------------------------
    def update_predictor(self, state: ContState):
        tangent = getattr(self.alg, "tangent", Secant())
        if isinstance(self.base_alg, MoorePenrose):
            return  # tangent updated inside the corrector
        if isinstance(tangent, Bordered) and state.converged:
            state.tau = self.kernels.bordered_tangent(
                state.z, state.tau, self._params())
        else:
            # Secant (and Polynomial fallback until implemented on-device)
            if state.z is not state.z_old:
                state.tau = self.kernels.secant_tangent(
                    state.z, state.z_old, jnp.asarray(state.ds))

    # ------------------------------------------------------------------
    # recording (ref save!/get_state_summary, src/Continuation.jl:259-305)
    # ------------------------------------------------------------------
    def record(self, state: ContState) -> dict:
        par = self.prob.set_lens_param(self._params(), state.z.p)
        rec = self.prob.record_from_solution(state.z.u, state.p)
        if not isinstance(rec, dict):
            rec = {"record": rec}
        rec = {k: np.asarray(v)
               for k, v in jax.device_get(rec).items()}
        rec.update({
            "param": state.p,
            "itnewton": state.itnewton,
            "itlinear": state.itlinear,
            "ds": state.ds,
            "n_unstable": state.n_unstable[0],
            "n_imag": state.n_imag[0],
            "stable": state.n_unstable[0] == 0,
            "step": state.step,
        })
        return rec

    def save(self, res: ContResult, state: ContState):
        cp = self.contparams
        res.append(self.record(state))
        if cp.compute_eigenelements and state.eigvals is not None and \
                state.step % cp.save_eig_every_step == 0:
            res.eig.append({
                "eigenvals": state.eigvals.copy(),
                "eigenvecs": (np.asarray(state.eigvecs)
                              if (cp.save_eigenvectors and
                                  state.eigvecs is not None) else None),
                "step": state.step,
                "converged": state.converged_eig,
            })
        if cp.save_sol_every_step > 0 and \
                state.step % cp.save_sol_every_step == 0:
            x = state.z.u
            if self.prob.save_solution is not None:
                par = self.prob.set_lens_param(self._params(), state.z.p)
                x = self.prob.save_solution(x, par)
            res.sol.append({"x": x, "p": state.p, "step": state.step})

    # ------------------------------------------------------------------
    def done(self, state: ContState) -> bool:
        cp = self.contparams
        if state.stopcontinuation:
            return True
        if state.step >= cp.max_steps:
            return True
        # stalled at a parameter bound: previous and current point both
        # clamped to the same boundary value
        if state.step > 1 and state.converged:
            for bound in (cp.p_min, cp.p_max):
                if (abs(state.p - bound) < 1e-13 and
                        abs(state.p_old - bound) < 1e-13):
                    return True
        return False
