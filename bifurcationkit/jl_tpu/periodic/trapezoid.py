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

    def phase_data(self, prob_vf, u, params):
        """Reference orbit + phase gradient phi = F(uref) for the Poincare
        phase condition."""
        phi = jax.vmap(lambda x: prob_vf.F(x, params))(u)
        return u, phi

    def generate_solution(self, orbit_fn, T, n: int):
        """Sample a time-periodic function guess onto the M-slice mesh
        (ref generate_solution, PeriodicOrbits.jl:74)."""
        ts = np.linspace(0, 2 * np.pi, self.M)
        u = jnp.stack([jnp.asarray(orbit_fn(t)) for t in ts])
        return self.pack(u, T)

    def spectral_precond(self, n, sym_blocks, to_modes, from_modes, T0,
                         delta: float = 1e-2):
        """Space-time spectral preconditioner for the trapeze PO operator —
        the TPU-native replacement for the reference's ILU of the sparse
        trapeze jacobian ("~1 sec" setup at the cGL2d size,
        ref examples/cGL2d.jl:211).  Freeze the vector-field jacobian at
        its spectrally-diagonalizable linear part: per spatial mode k with
        (c, c) symbol L_k, the trapeze rows decouple into an M-slice CYCLIC
        block-bidiagonal system

            v_0 - v_{M-1} = b_per
            (I - c_i L_k) v_i - (I + c_i L_k) v_{i-1} = b_i,  c_i = T0 h_i/2

        solved exactly per mode by two `lax.scan` sweeps over the slice
        maps S_i = B_i^{-1} A_i (A-stable: |S| <= 1 for Re lambda <= 0) and
        one closed (c, c) solve of ((1+delta) I - Phi) v_0 = b_per + g
        (Phi = S_{M-1}...S_1; delta keeps the critical Hopf mode — whose
        Phi is a full rotation, the trivial-multiplier direction the
        phase/period border handles in the TRUE jacobian — bounded).
        Everything batches over the K modes; setup is a handful of (K, c, c)
        inverses on device (milliseconds vs the reference's ILU second).

        `sym_blocks`: (K, c, c) frozen per-mode linearization;
        `to_modes(flat_slice) -> (K, c)` / `from_modes` its inverse;
        `T0` the frozen period (precondition quality degrades gracefully as
        the period drifts — rebuild if it moves by ~10%).
        Returns P^{-1} acting on the full (M n + 1) residual vector
        (identity on the period/phase border slot)."""
        M = self.M
        lo = jnp.float32
        # the cyclic solve is a ~M-step CHAIN of tiny matmuls: TPU's
        # default (bf16-pass) matmul precision accumulates ~1e-2 relative
        # error through the chain, silently capping the preconditioned
        # Krylov floor and stalling the mixed-precision corrector — pin
        # full f32 precision (the (K, c, c) contractions cost nothing)
        hi = jax.lax.Precision.HIGHEST
        Lk = jnp.asarray(sym_blocks, lo)
        K, c = Lk.shape[0], Lk.shape[-1]
        eye = jnp.eye(c, dtype=lo)
        ci = jnp.asarray(float(T0) * np.asarray(self.steps()) / 2.0, lo)
        B = eye[None, None] - ci[:, None, None, None] * Lk[None]
        A = eye[None, None] + ci[:, None, None, None] * Lk[None]
        Binv = jnp.linalg.inv(B)                      # (M-1, K, c, c)
        S = jnp.matmul(Binv, A, precision=hi)

        def _mul(Phi, Si):
            return jnp.matmul(Si, Phi, precision=hi), None

        Phi, _ = jax.lax.scan(_mul, jnp.broadcast_to(eye, (K, c, c)), S)
        Minv = jnp.linalg.inv((1.0 + delta) * eye[None] - Phi)

        def apply(v):
            dt = v.dtype
            b0 = to_modes(v[:n].astype(lo))                      # (K, c)
            rows = v[n:-1].reshape(M - 1, n)
            bi = jax.vmap(lambda r: to_modes(r.astype(lo)))(rows)
            t = jnp.einsum("ikab,ikb->ika", Binv, bi, precision=hi)

            def acc(g, dat):
                Si, ti = dat
                return jnp.einsum("kab,kb->ka", Si, g,
                                  precision=hi) + ti, None

            g, _ = jax.lax.scan(acc, jnp.zeros_like(b0), (S, t))
            v0 = jnp.einsum("kab,kb->ka", Minv, b0 + g, precision=hi)

            def fwd(vprev, dat):
                Si, ti = dat
                vi = jnp.einsum("kab,kb->ka", Si, vprev,
                                precision=hi) + ti
                return vi, vi

            _, vrest = jax.lax.scan(fwd, v0, (S, t))
            vall = jnp.concatenate([v0[None], vrest], 0)         # (M, K, c)
            out = jax.vmap(from_modes)(vall)                     # (M, n)
            return jnp.concatenate([out.reshape(-1),
                                    v[-1:]]).astype(dt)

        return apply


def slice_spectral_precond(sym_blocks, to_modes, from_modes, c0):
    """(I - c0 L_k)^{-1} per spatial mode — preconditions the implicit
    half-step solves inside the matrix-free trapeze monodromy
    (`Trapeze.monodromy_operator`; ref the per-slice inversions in
    FloquetQaD, Floquet.jl:255-318)."""
    lo = jnp.float32
    Lk = jnp.asarray(sym_blocks, lo)
    c = Lk.shape[-1]
    eye = jnp.eye(c, dtype=lo)
    Binv = jnp.linalg.inv(eye[None] - float(c0) * Lk)
    hi = jax.lax.Precision.HIGHEST

    def apply(v):
        dt = v.dtype
        w = to_modes(v.astype(lo))
        w = jnp.einsum("kab,kb->ka", Binv, w, precision=hi)
        return from_modes(w).astype(dt)

    return apply
