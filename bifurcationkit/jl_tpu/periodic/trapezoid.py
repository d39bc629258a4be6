"""Trapezoid (finite-difference) periodic-orbit discretization
(ref src/periodicorbit/PeriodicOrbitTrapeze.jl).

Unknown X = [u_0, ..., u_{M-1} (flattened (M, n)), T]; rows:
  * periodicity  u_0 - u_{M-1}                               (ref :70-107)
  * trapezoid    u_i - u_{i-1} - T*h/2 (F(u_i) + F(u_{i-1})) for i = 1..M-1
  * phase        (1/M) sum_i <u_i - uref_i, phi_i>           (ref :209-292)

All M slice evaluations of F are one `vmap` — the time axis is the batch
axis, so the residual is a single fused kernel (the reference's per-slice
loops become MXU/VPU batch work).  The reference orbit and phase gradient
live in the parameter pytree and are refreshed by the update! hook without
retracing (ref updatesection!).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Trapeze:
    """Discretization config (ref `Trapeze`, PeriodicOrbitTrapeze.jl:70)."""

    M: int = 50
    time_mesh: Any = None   # optional (M-1,) step fractions, sum = 1
                            # (ref TimeMesh, src/TimeMesh.jl:9)

    def steps(self):
        if self.time_mesh is not None:
            return jnp.asarray(self.time_mesh)
        return jnp.full((self.M - 1,), 1.0 / (self.M - 1))

    def unknown_size(self, n: int) -> int:
        return self.M * n + 1

    def split(self, X, n: int):
        u = X[:-1].reshape(self.M, n)
        T = X[-1]
        return u, T

    def pack(self, u, T):
        return jnp.concatenate([u.ravel(), jnp.asarray(T)[None]])

    def period(self, X):
        return X[-1]

    def residual(self, prob_vf, X, po_par):
        """po_par = {"_inner": model params, "_uref": (M,n), "_phi": (M,n)}."""
        M = self.M
        params = po_par["_inner"]
        n = po_par["_uref"].shape[1]
        u, T = self.split(X, n)
        h = self.steps()[:, None]

        Fu = jax.vmap(lambda x: prob_vf.F(x, params))(u)
        # trapezoid rows for i = 1..M-1 (non-uniform mesh supported)
        rows = (u[1:] - u[:-1]) - (T * h / 2.0) * (Fu[1:] + Fu[:-1])
        # periodicity row
        per = u[0] - u[M - 1]
        # phase condition <u - uref, phi> integrated over the mesh
        phase = jnp.sum((u - po_par["_uref"]) * po_par["_phi"]) / M
        return jnp.concatenate([per, rows.ravel(), phase[None]])

    def monodromy(self, prob_vf, X, po_par):
        """Floquet monodromy as the sequential product of per-slice maps
        (I - T h/2 J_i)^{-1} (I + T h/2 J_{i-1}) (ref `FloquetQaD` for
        Trapeze, Floquet.jl:255-318): batched per-slice factorizations +
        a `lax.scan` chain product."""
        M = self.M
        params = po_par["_inner"]
        n = po_par["_uref"].shape[1]
        u, T = self.split(X, n)
        h = self.steps()[:, None, None]

        Js = jax.vmap(lambda x: prob_vf.jacobian(x, params))(u)  # (M, n, n)
        eye = jnp.eye(n, dtype=Js.dtype)
        A = eye[None] + (T * h / 2.0) * Js[:-1]       # explicit parts
        B = eye[None] - (T * h / 2.0) * Js[1:]        # implicit parts
        # batched LU of all B_i at once, then the ordered chain product
        from ..linalg.linear import dense_factor, dense_factor_solve
        fac = jax.vmap(dense_factor)(B)

        def chain(Mn, i):
            step = dense_factor_solve(
                jax.tree_util.tree_map(lambda x: x[i], fac), A[i])
            return step @ Mn, None

        Mn, _ = jax.lax.scan(chain, eye, jnp.arange(M - 1))
        return Mn

    def monodromy_operator(self, prob_vf, X, po_par, linsolver=None):
        """MATRIX-FREE monodromy v -> M v for the trapeze scheme (ref the
        MF FloquetQaD operator for Trapeze, Floquet.jl:89-109,255-318):
        per slice, apply the explicit half with a jvp and invert the
        implicit half (I - T h/2 J_{i+1}) with an (iterative) linear solve
        — no (n, n) matrix ever forms, so PDE-scale trapeze stability is
        feasible.  `linsolver` defaults to plain GMRES; pass a
        preconditioned one for stiff operators."""
        from ..linalg.eig import FlatOperator
        from ..linalg.linear import GMRES

        ls = linsolver or GMRES(restart=30, maxiter=120, rtol=1e-9)
        params = po_par["_inner"]
        n = po_par["_uref"].shape[1]
        u, T = self.split(X, n)
        h = self.steps()

        def Mv(v):
            def slice_step(vc, dat):
                x_prev, x_next, hi = dat
                rhs = vc + (T * hi / 2.0) * prob_vf.dF(x_prev, params, vc)

                def Bop(w):
                    return w - (T * hi / 2.0) * prob_vf.dF(x_next, params, w)

                sol, _, _ = ls(Bop, rhs)
                return sol, None

            out, _ = jax.lax.scan(slice_step, v, (u[:-1], u[1:], h))
            return out

        return FlatOperator(Mv, n, X.dtype)

    def generate_solution(self, orbit_fn, T, n: int):
        """Sample a time-periodic function guess onto the M-slice mesh
        (ref generate_solution, PeriodicOrbits.jl:74)."""
        ts = np.linspace(0, 2 * np.pi, self.M)
        u = jnp.stack([jnp.asarray(orbit_fn(t)) for t in ts])
        return self.pack(u, T)

    def phase_data(self, prob_vf, u, params):
        """Reference orbit + phase gradient phi = F(uref) for the Poincare
        phase condition."""
        phi = jax.vmap(lambda x: prob_vf.F(x, params))(u)
        return u, phi
