"""Flows — JAX ODE integrators for shooting methods
(replaces the reference's SciML-backed flows, ref src/periodicorbit/Flow.jl,
FlowDE.jl).

Fixed-step Runge-Kutta in a `lax.scan` — static shapes, differentiable via
`jacfwd` (monodromy), batchable via `vmap` (the M shooting segments evolve as
one batched trajectory = the reference's EnsembleProblem parallelism,
ref FlowDE.jl:86-99, mapped onto the TPU's batch dimension).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _rk4_step(f, u, t, dt, params):
    k1 = f(u, params)
    k2 = f(u + 0.5 * dt * k1, params)
    k3 = f(u + 0.5 * dt * k2, params)
    k4 = f(u + dt * k3, params)
    return u + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def _rodas3_step(f, u, t, dt, params):
    """One fixed-step RODAS3 step: 4-stage, order-3, L-stable, stiffly
    accurate linearly-implicit Rosenbrock (coefficients per Sandu et al.
    1997).  Replaces the reference's stiff SciML solvers (Rodas4P/QNDF in
    examples/brusselatorShooting.jl:165-171) for shooting on stiff PDE
    flows.  One dense LU of (I/(dt*gamma) - J) per step + four back-solves
    — MXU-friendly and vmap/jacfwd-compatible (monodromy via forward AD
    goes through the LU solves)."""
    gamma = 0.5
    n = u.shape[0]
    from ..linalg.linear import dense_factor, dense_factor_solve

    J = jax.jacfwd(lambda x: f(x, params))(u)
    W = jnp.eye(n, dtype=u.dtype) / (dt * gamma) - J
    fac = dense_factor(W)

    def solve(rhs):
        return dense_factor_solve(fac, rhs)

    f1 = f(u, params)
    k1 = solve(f1)
    k2 = solve(f1 + (4.0 / dt) * k1)
    f3 = f(u + 2.0 * k1, params)
    k3 = solve(f3 + (k1 - k2) / dt)
    f4 = f(u + 2.0 * k1 + k3, params)
    k4 = solve(f4 + (k1 - k2 - (8.0 / 3.0) * k3) / dt)
    return u + 2.0 * k1 + k3 + k4


def _get_step(method: str):
    steppers = {"dopri5": _dopri5_step, "rk4": _rk4_step,
                "rodas3": _rodas3_step}
    if method not in steppers:
        raise ValueError(f"unknown flow method '{method}' "
                         f"(available: {sorted(steppers)})")
    return steppers[method]


def _dopri5_step(f, u, t, dt, params):
    """One Dormand-Prince 5(4) step (fixed step, 5th-order solution)."""
    u5, _ = _dopri5_step_err(f, u, t, dt, params, with_err=False)
    return u5


def _dopri5_step_err(f, u, t, dt, params, with_err=True):
    """Dormand-Prince 5(4) step returning (u5, err) with the embedded
    4th-order error estimate (ref the adaptive SciML integrators the
    reference's shooting rides, src/periodicorbit/FlowDE.jl:41-99)."""
    a21 = 1 / 5
    a31, a32 = 3 / 40, 9 / 40
    a41, a42, a43 = 44 / 45, -56 / 15, 32 / 9
    a51, a52, a53, a54 = 19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729
    a61, a62, a63, a64, a65 = (9017 / 3168, -355 / 33, 46732 / 5247,
                               49 / 176, -5103 / 18656)
    b1, b3, b4, b5, b6 = 35 / 384, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84
    k1 = f(u, params)
    k2 = f(u + dt * a21 * k1, params)
    k3 = f(u + dt * (a31 * k1 + a32 * k2), params)
    k4 = f(u + dt * (a41 * k1 + a42 * k2 + a43 * k3), params)
    k5 = f(u + dt * (a51 * k1 + a52 * k2 + a53 * k3 + a54 * k4), params)
    k6 = f(u + dt * (a61 * k1 + a62 * k2 + a63 * k3 + a64 * k4 + a65 * k5),
           params)
    u5 = u + dt * (b1 * k1 + b3 * k3 + b4 * k4 + b5 * k5 + b6 * k6)
    if not with_err:
        return u5, None
    # b - bhat rows of the embedded 4th-order solution (k7 = f(u5): the
    # FSAL stage, recomputed here — the masked-scan driver cannot carry it)
    e1, e3, e4, e5, e6, e7 = (71 / 57600, -71 / 16695, 71 / 1920,
                              -17253 / 339200, 22 / 525, -1 / 40)
    k7 = f(u5, params)
    err = dt * (e1 * k1 + e3 * k3 + e4 * k4 + e5 * k5 + e6 * k6 + e7 * k7)
    return u5, err


def _rodas3_step_err(f, u, t, dt, params):
    """RODAS3 step returning (u3, err): the scheme is stiffly accurate with
    embedded order-2 solution u + 2 k1 + k3, so err = k4 exactly."""
    gamma = 0.5
    n = u.shape[0]
    from ..linalg.linear import dense_factor, dense_factor_solve

    J = jax.jacfwd(lambda x: f(x, params))(u)
    W = jnp.eye(n, dtype=u.dtype) / (dt * gamma) - J
    fac = dense_factor(W)

    def solve(rhs):
        return dense_factor_solve(fac, rhs)

    f1 = f(u, params)
    k1 = solve(f1)
    k2 = solve(f1 + (4.0 / dt) * k1)
    f3 = f(u + 2.0 * k1, params)
    k3 = solve(f3 + (k1 - k2) / dt)
    f4 = f(u + 2.0 * k1 + k3, params)
    k4 = solve(f4 + (k1 - k2 - (8.0 / 3.0) * k3) / dt)
    return u + 2.0 * k1 + k3 + k4, k4


_ERR_STEPPERS = {"dopri5": (_dopri5_step_err, 5),
                 "rodas3": (_rodas3_step_err, 3)}


def _adaptive_integrate(method, f, u0, params, T, rtol, atol, max_steps,
                        dt0=None, with_stats=False):
    """Error-controlled integration to time T as a MASKED `lax.scan` over a
    static `max_steps` bound: accept/reject + PI step control per iteration,
    no-op once t reaches T.  A scan (not while_loop) keeps the flow
    differentiable under jacfwd/jacrev — the monodromy and every shooting
    jacobian go through here (ref FlowDE.jl:41-99 for the semantics;
    tolerances are the user-facing abstol/reltol of the reference).

    Step-size *choice* is wrapped in stop_gradient (control flow, not
    solution); d(solution)/dT still flows through the final-step clipping
    dt_eff = min(dt, T - t), reproducing dphi/dT = F(phi)."""
    if method not in _ERR_STEPPERS:
        raise ValueError(f"adaptive flow needs an embedded-pair method "
                         f"(got '{method}'; available: "
                         f"{sorted(_ERR_STEPPERS)})")
    step_err, order = _ERR_STEPPERS[method]
    tiny = 1e-12
    if dt0 is None:
        # Hairer's starting-step heuristic: h0 = 0.01 ||y0||_sc / ||f0||_sc
        f0 = f(u0, params)
        sc0 = atol + rtol * jnp.abs(u0)
        d0 = jnp.sqrt(jnp.mean((u0 / sc0) ** 2))
        d1 = jnp.sqrt(jnp.mean((f0 / sc0) ** 2))
        dt_init = 0.01 * jnp.maximum(d0, 1e-6) / jnp.maximum(d1, 1e-6)
        dt_init = jax.lax.stop_gradient(
            jnp.clip(dt_init, tiny * jnp.abs(T), T / 2.0))
    else:
        dt_init = jnp.asarray(dt0)

    def body(carry, _):
        u, t, dt, errprev, done, nacc, nrej = carry
        rem = T - t
        dt_eff = jnp.minimum(dt, rem)
        dt_eff = jnp.maximum(dt_eff, tiny * jnp.abs(T))
        u_new, err = step_err(f, u, t, dt_eff, params)
        sc = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
        enorm = jnp.sqrt(jnp.mean((err / sc) ** 2))
        enorm = jnp.maximum(enorm, 1e-16)
        accept = jax.lax.stop_gradient(enorm) <= 1.0
        # PI controller (Gustafsson): fac = 0.9 e^{-0.7/k} e_prev^{0.4/k}
        en = jax.lax.stop_gradient(enorm)
        fac = 0.9 * en ** (-0.7 / order) * errprev ** (0.4 / order)
        fac = jnp.clip(fac, 0.2, 5.0)
        dt_next = jax.lax.stop_gradient(dt_eff) * fac
        upd = accept & ~done
        u_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(upd, b, a), u, u_new)
        t_out = jnp.where(upd, t + dt_eff, t)
        errprev_out = jnp.where(upd, en, errprev)
        done_out = done | (jax.lax.stop_gradient(t_out)
                           >= jax.lax.stop_gradient(T) * (1.0 - 1e-12))
        dt_out = jnp.where(done, dt, dt_next)
        nacc = nacc + jnp.where(upd, 1, 0)
        nrej = nrej + jnp.where(~accept & ~done, 1, 0)
        return (u_out, t_out, dt_out, errprev_out, done_out, nacc, nrej), None

    zero = jnp.zeros((), u0.dtype) if hasattr(u0, "dtype") else 0.0
    init = (u0, zero * T, dt_init, jnp.asarray(1.0),
            jnp.asarray(False), jnp.asarray(0), jnp.asarray(0))
    (u, t, dt, _, done, nacc, nrej), _ = jax.lax.scan(
        body, init, None, length=max_steps)
    # unconditional closing step over the remaining time: lands exactly on
    # t = T (so d phi/dT always flows through `rem`), and degrades
    # gracefully — if the budget ran out, one big step is an approximation
    # at T rather than a silent partial integration (check solve_stats'
    # `reached` flag to detect budget exhaustion)
    rem = jnp.maximum(T - t, tiny * jnp.abs(T))
    u = _get_step(method)(f, u, t, rem, params)
    if with_stats:
        return u, {"n_accepted": nacc, "n_rejected": nrej, "t_final": t,
                   "reached": done}
    return u


@dataclasses.dataclass(frozen=True)
class Flow:
    """Flow phi(u0, T) of u' = F(u, params), differentiable in
    (u0, T, params).

    Fixed-step mode (default): `steps` integration steps regardless of T.
    Adaptive mode (`adaptive=True`): embedded-pair error control to the
    user's (rtol, atol) with PI step-size selection, `max_steps` static
    bound — the reference's SciML abstol/reltol semantics
    (ref src/periodicorbit/FlowDE.jl:41-99).  Requires T > 0 and an
    embedded-pair method (dopri5 or rodas3)."""

    F: Callable
    steps: int = 100
    method: str = "dopri5"
    adaptive: bool = False
    rtol: float = 1e-7
    atol: float = 1e-9
    max_steps: int = 256

    def __call__(self, u0, params, T):
        if self.adaptive:
            return _adaptive_integrate(self.method, self.F, u0, params, T,
                                       self.rtol, self.atol, self.max_steps)
        step = _get_step(self.method)
        dt = T / self.steps

        def body(u, i):
            return step(self.F, u, i * dt, dt, params), None

        out, _ = jax.lax.scan(body, u0, jnp.arange(self.steps))
        return out

    def solve_stats(self, u0, params, T):
        """Adaptive solve returning (u(T), stats) with accepted/rejected
        step counts — the observability hook for tolerance studies."""
        if not self.adaptive:
            return self(u0, params, T), {"n_accepted": self.steps,
                                         "n_rejected": 0}
        return _adaptive_integrate(self.method, self.F, u0, params, T,
                                   self.rtol, self.atol, self.max_steps,
                                   with_stats=True)

    def trajectory(self, u0, params, T, n_save: int):
        """Orbit samples at n_save+1 equispaced times in [0, T]."""
        sub = self.steps // n_save
        step = _get_step(self.method)
        dt = T / (sub * n_save)

        def seg(u, i):
            def inner(v, j):
                return step(self.F, v, 0.0, dt, params), None

            u2, _ = jax.lax.scan(inner, u, jnp.arange(sub))
            return u2, u2

        uT, path = jax.lax.scan(seg, u0, jnp.arange(n_save))
        return jnp.concatenate([u0[None], path], axis=0)

    def monodromy(self, u0, params, T):
        """d phi / d u0 via forward-mode AD through the integrator
        (the matrix-free variational flow, ref Floquet.jl:89-109)."""
        return jax.jacfwd(lambda v: self(v, params, T))(u0)
