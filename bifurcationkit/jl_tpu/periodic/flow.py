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


_STEPPERS = {"dopri5": None, "rk4": _rk4_step, "rodas3": _rodas3_step}


def _get_step(method: str):
    if method == "dopri5":
        return _dopri5_step
    if method not in _STEPPERS:
        raise ValueError(f"unknown flow method '{method}' "
                         f"(available: {sorted(_STEPPERS)})")
    return _STEPPERS[method]


def _dopri5_step(f, u, t, dt, params):
    """One Dormand-Prince 5(4) step (fixed step, 5th-order solution)."""
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
    return u + dt * (b1 * k1 + b3 * k3 + b4 * k4 + b5 * k5 + b6 * k6)


@dataclasses.dataclass(frozen=True)
class Flow:
    """Fixed-step flow phi(u0, T) of u' = F(u, params).

    `steps` integration steps regardless of T (T is typically O(period));
    differentiable in (u0, T, params).
    """

    F: Callable
    steps: int = 100
    method: str = "dopri5"

    def __call__(self, u0, params, T):
        step = _get_step(self.method)
        dt = T / self.steps

        def body(u, i):
            return step(self.F, u, i * dt, dt, params), None

        out, _ = jax.lax.scan(body, u0, jnp.arange(self.steps))
        return out

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
