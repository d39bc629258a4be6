"""Linear solver abstraction (ref src/LinearSolver.jl:8-414).

A linear solver is a frozen-dataclass callable

    ls(J, rhs, a0=0.0, a1=1.0) -> (sol, converged, n_iter)

solving ``(a0 * I + a1 * J) x = rhs``.  ``J`` may be

* a dense 2-D jax array,
* a ``LinearOperator`` / any callable ``v -> J @ v`` acting on pytrees.

Solvers are hashable static configuration; all numeric work happens in
jit-compatible pure functions so the Newton / PALC / Krylov loops stay inside
one XLA computation on the TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..core.state import ravel, tree_axpby


# ---------------------------------------------------------------------------
# Operator utilities
# ---------------------------------------------------------------------------


def is_operator(J) -> bool:
    return callable(J) and not isinstance(J, jnp.ndarray)


def apply_J(J, v):
    """Apply a jacobian representation (matrix or callable) to pytree v."""
    if is_operator(J):
        return J(v)
    flat, unravel = ravel(v)
    return unravel(J @ flat)


def shifted_apply(J, v, a0, a1):
    """(a0 I + a1 J) v   (ref `_axpy_op`, src/LinearSolver.jl:55-76)."""
    Jv = apply_J(J, v)
    return tree_axpby(a0, v, a1, Jv)


def materialize_shift(J: jnp.ndarray, a0, a1) -> jnp.ndarray:
    if a0 == 0 and a1 == 1:
        return J
    n = J.shape[0]
    return a1 * J + a0 * jnp.eye(n, dtype=J.dtype)


# ---------------------------------------------------------------------------
# Dense direct solver
# ---------------------------------------------------------------------------


def _factor_uses_qr(dtype):
    """f64-on-TPU routes through QR: the TPU compiler's
    LuDecompositionExpander rejects F64.  Static at trace time, and
    derivable from the factor arrays alone (LU is never chosen for
    f64-on-TPU), so the handle can be a plain array tuple — vmap-able."""
    return jax.default_backend() == "tpu" and dtype == jnp.float64


def dense_factor(A):
    """Backend-aware dense factorization handle for repeated solves:
    (lu, piv) everywhere except f64-on-TPU, where it is (Q, R)
    (2x flops, still MXU-tiled, same backward-stability class)."""
    if _factor_uses_qr(A.dtype):
        return jnp.linalg.qr(A)
    return jax.scipy.linalg.lu_factor(A)


def dense_factor_solve(fac, b):
    """Solve with a `dense_factor` handle (vmap/jit/AD-compatible)."""
    if _factor_uses_qr(fac[0].dtype):
        Q, R = fac
        return jax.scipy.linalg.solve_triangular(R, Q.T @ b)
    return jax.scipy.linalg.lu_solve(fac, b)


def dense_solve(A, b):
    """One-shot backend-aware dense solve (use instead of
    jnp.linalg.solve on any path that can run on TPU in f64)."""
    return dense_factor_solve(dense_factor(A), b)


@dataclasses.dataclass(frozen=True)
class DenseLS:
    """Direct dense solve via LU (ref `DefaultLS`, src/LinearSolver.jl:94-117).

    On TPU the LU factorization runs through XLA's blocked getrf, which tiles
    onto the MXU; for the (n+1) bordered systems of PALC the factorization is
    shared between the two right-hand sides (`solve_two`).
    """

    def __call__(self, J, rhs, a0=0.0, a1=1.0):
        A = materialize_shift(J, a0, a1)
        flat, unravel = ravel(rhs)
        sol = dense_solve(A, flat)
        return unravel(sol), jnp.array(True), jnp.array(1)

    def solve_two(self, J, r1, r2, a0=0.0, a1=1.0):
        """Solve with two RHS sharing one factorization
        (ref src/LinearSolver.jl:119-131)."""
        A = materialize_shift(J, a0, a1)
        f1, unravel1 = ravel(r1)
        f2, unravel2 = ravel(r2)
        fac = dense_factor(A)
        s1 = dense_factor_solve(fac, f1)
        s2 = dense_factor_solve(fac, f2)
        return unravel1(s1), unravel2(s2), jnp.array(True), (jnp.array(1), jnp.array(1))


# ---------------------------------------------------------------------------
# GMRES — single JAX Krylov engine with preallocated basis
# (replaces IterativeSolvers/KrylovKit/Krylov.jl deps; the preallocated-basis
#  strategy mirrors `KrylovLSInplace`, "great for GPU", src/LinearSolver.jl:351)
# ---------------------------------------------------------------------------


def _vmapped_solve_two(solver, J, r1, r2, a0=0.0, a1=1.0):
    """Solve two RHS in one vmapped dispatch: the lanes share every traced
    matvec (J is linear, so batching is exact) and the while_loops run to
    max(it1, it2) sequential steps instead of it1 + it2 — the TPU analogue
    of the reference's shared-factorization 2-RHS solve
    (ref src/LinearSolver.jl:119-131)."""
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), r1, r2)
    sols, cvs, its = jax.vmap(lambda r: solver(J, r, a0=a0, a1=a1))(stacked)
    s1 = jax.tree_util.tree_map(lambda a: a[0], sols)
    s2 = jax.tree_util.tree_map(lambda a: a[1], sols)
    return s1, s2, jnp.logical_and(cvs[0], cvs[1]), (its[0], its[1])


@dataclasses.dataclass(frozen=True)
class GMRES:
    """Restarted GMRES with fixed-shape `lax.while_loop` iteration.

    The Krylov basis is a preallocated `(restart+1, n)` array that lives in
    device memory across the whole solve; the Hessenberg least-squares is
    solved incrementally with Givens rotations.  All shapes are static so the
    entire solver jit-compiles once and runs without host round-trips.
    """

    restart: int = 30
    maxiter: int = 200           # total matvecs bound
    rtol: float = 1e-8
    atol: float = 1e-12
    precond: Optional[Callable] = None   # left preconditioner: v -> M^{-1} v
    precond_side: str = "left"

    def __call__(self, J, rhs, a0=0.0, a1=1.0):
        flat_rhs, unravel = ravel(rhs)

        def matvec(xf):
            out = shifted_apply(J, unravel(xf), a0, a1)
            of, _ = ravel(out)
            return of

        if self.precond is not None:
            prec = self.precond

            def matvec_p(xf):
                mf = matvec(xf)
                pf, _ = ravel(prec(unravel(mf)))
                return pf

            pb, _ = ravel(prec(unravel(flat_rhs)))
            sol, res, it = _gmres_flat(matvec_p, pb, self.restart,
                                       self.maxiter, self.rtol, self.atol)
        else:
            sol, res, it = _gmres_flat(matvec, flat_rhs, self.restart,
                                       self.maxiter, self.rtol, self.atol)
        b_norm = jnp.linalg.norm(flat_rhs)
        converged = res <= jnp.maximum(self.rtol * b_norm, self.atol)
        return unravel(sol), converged, it

    def solve_two(self, J, r1, r2, a0=0.0, a1=1.0):
        return _vmapped_solve_two(self, J, r1, r2, a0=a0, a1=a1)


def _gmres_flat(matvec, b, restart, maxiter, rtol, atol):
    """Flat-vector restarted GMRES.  Returns (x, final_resnorm, n_matvec)."""
    n = b.shape[0]
    dtype = b.dtype
    # dtype-aware division guard: the f64 habit of 1e-300 UNDERFLOWS TO
    # ZERO in f32, turning every Krylov breakdown (h_{j+1,j} -> 0, i.e.
    # the happy exact-solve case) into w / 0 = NaN
    tiny = float(jnp.finfo(dtype).tiny)
    m = min(restart, n)
    b_norm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * b_norm, atol)
    n_cycles = max(1, -(-maxiter // m))

    def cycle(carry):
        x, _, nmv, _ = carry
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype)
        # H stored column-wise: H[j] holds the j-th Hessenberg column (m+1)
        H = jnp.zeros((m, m + 1), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        V = V.at[0].set(jnp.where(beta > 0, r / jnp.maximum(beta, tiny), r))

        def arnoldi_step(state):
            j, V, H, cs, sn, g, res = state
            w = matvec(V[j])
            # classical Gram-Schmidt with reorthogonalization (CGS2): rows
            # of V beyond j are exactly zero within a cycle, so two (m+1, n)
            # matmuls project onto the filled basis — replacing 2(m+1)
            # sequential dot/axpy pairs, which are latency-bound on TPU.
            # CGS2 orthogonality is the same class as two-pass MGS.
            h1 = V.conj() @ w
            w = w - V.T @ h1
            h2 = V.conj() @ w
            w = w - V.T @ h2
            h = h1 + h2
            hlast = jnp.linalg.norm(w)
            h = h.at[j + 1].set(hlast)
            V = V.at[j + 1].set(jnp.where(hlast > tiny,
                                          w / jnp.maximum(hlast, tiny),
                                          0.0))

            # apply previous Givens rotations to the new column
            def rot(i, h):
                hi = cs[i] * h[i] + sn[i] * h[i + 1]
                hip = -sn[i] * h[i] + cs[i] * h[i + 1]
                return h.at[i].set(jnp.where(i < j, hi, h[i])).at[i + 1].set(
                    jnp.where(i < j, hip, h[i + 1]))

            h = jax.lax.fori_loop(0, m, rot, h)

            # new rotation to zero h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c = jnp.where(denom > 0, h[j] / jnp.maximum(denom, tiny), 1.0)
            s = jnp.where(denom > 0, h[j + 1] / jnp.maximum(denom, tiny), 0.0)
            h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)
            cs2 = cs.at[j].set(c)
            sn2 = sn.at[j].set(s)
            gj1 = -s * g[j]
            g2 = g.at[j + 1].set(gj1).at[j].set(c * g[j])
            H2 = H.at[j].set(h)
            return j + 1, V, H2, cs2, sn2, g2, jnp.abs(gj1)

        def arnoldi_cond(state):
            j, *_, res = state
            return jnp.logical_and(j < m, res > tol)

        j, V, H, cs, sn, g, res = jax.lax.while_loop(
            arnoldi_cond, arnoldi_step,
            (jnp.array(0), V, H, cs, sn, g, beta))

        # back-substitution on the j x j triangular system (masked to m)
        R = H[:, :m].T  # (m, m): R[i, jcol] = H[jcol, i]
        # mask out unused columns to identity to keep the solve well posed
        idx = jnp.arange(m)
        mask = idx < j
        Rm = jnp.where(mask[None, :] & mask[:, None], R, 0.0)
        Rm = Rm + jnp.diag(jnp.where(mask, 0.0, 1.0))
        y = jax.scipy.linalg.solve_triangular(Rm, jnp.where(mask, g[:m], 0.0))
        dx = V[:m].T @ y
        return x + dx, res, nmv + j + 1, res <= tol

    def cond(carry):
        _, res, nmv, done = carry
        return jnp.logical_and(~done, nmv < maxiter)

    x0 = jnp.zeros_like(b)
    x, res, nmv, _ = jax.lax.while_loop(
        cond, cycle, (x0, b_norm, jnp.array(0), b_norm <= tol))
    return x, res, nmv


# ---------------------------------------------------------------------------
# BiCGStab — cheaper per-iteration alternative for non-symmetric systems
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BiCGStab:
    maxiter: int = 500
    rtol: float = 1e-8
    atol: float = 1e-12
    precond: Optional[Callable] = None

    def __call__(self, J, rhs, a0=0.0, a1=1.0):
        flat_rhs, unravel = ravel(rhs)

        def matvec(xf):
            out = shifted_apply(J, unravel(xf), a0, a1)
            if self.precond is not None:
                out = self.precond(out)
            of, _ = ravel(out)
            return of

        b = flat_rhs
        if self.precond is not None:
            b, _ = ravel(self.precond(unravel(flat_rhs)))
        b_norm = jnp.linalg.norm(b)
        tol = jnp.maximum(self.rtol * b_norm, self.atol)
        tiny = float(jnp.finfo(b.dtype).tiny)   # f32-safe division guard

        x0 = jnp.zeros_like(b)
        r0 = b
        rhat = r0

        def body(carry):
            x, r, p, v, rho, alpha, omega, k, _ = carry
            rho1 = jnp.vdot(rhat, r)
            beta = (rho1 / jnp.where(rho == 0, tiny, rho)) * (
                alpha / jnp.where(omega == 0, tiny, omega))
            p = r + beta * (p - omega * v)
            v = matvec(p)
            alpha = rho1 / jnp.where(jnp.vdot(rhat, v) == 0, tiny,
                                     jnp.vdot(rhat, v))
            s = r - alpha * v
            t = matvec(s)
            tt = jnp.vdot(t, t)
            omega = jnp.vdot(t, s) / jnp.where(tt == 0, tiny, tt)
            x = x + alpha * p + omega * s
            r = s - omega * t
            res = jnp.linalg.norm(r)
            return x, r, p, v, rho1, alpha, omega, k + 1, res

        def cond(carry):
            *_, k, res = carry
            return jnp.logical_and(res > tol, k < self.maxiter)

        one = jnp.asarray(1.0, b.dtype)
        init = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
                jnp.array(0), b_norm)
        x, *_, k, res = jax.lax.while_loop(cond, body, init)
        return unravel(x), res <= tol, k


# ---------------------------------------------------------------------------
# Mixed-precision iterative refinement — the TPU-idiomatic way to reach f64
# Newton tolerances without running the Krylov iteration in emulated f64
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class IterativeRefinement:
    """Solve (a0 I + a1 J) x = rhs to f64 accuracy with all Krylov work in a
    low precision (default f32, TPU-native) and a handful of f64 residual
    corrections:

        repeat:  r = rhs - A x   (accurate dtype, ONE matvec)
                 d = inner_solve(A_low, r_low)   (all matvecs low precision)
                 x = x + d

    Classic iterative refinement: each pass gains ~inner-solve-accuracy
    digits, so 2-4 passes reach 1e-12 residuals from a 1e-5 inner solve.
    This replaces the reference's UMFPACK-grade direct solves on problems
    where the TPU's f64 is emulated (~10x slower than f32).

    The low-precision operator comes from `J.low` when the jacobian carries
    one (the continuation kernels attach a true f32-built jvp operator —
    see kernels._pick_jac); otherwise the accurate operator is wrapped with
    casts (correct, but without the compute saving).
    """

    inner: Any = dataclasses.field(
        default_factory=lambda: GMRES(restart=40, maxiter=160, rtol=1e-5))
    low_dtype: Any = jnp.float32
    refinements: int = 4            # max outer passes (static bound)
    rtol: float = 1e-10
    atol: float = 1e-13

    def __call__(self, J, rhs, a0=0.0, a1=1.0):
        flat_rhs, unravel = ravel(rhs)
        lo = self.low_dtype

        J_low = getattr(J, "low", None)
        if J_low is None:
            # cast-wrapped fallback: correct, but the matvec still computes
            # at the accurate dtype (no speedup without a true J.low)
            def J_low(v_lo):
                out = apply_J(J, unravel(v_lo.astype(flat_rhs.dtype)))
                of, _ = ravel(out)
                return of.astype(lo)

        def matvec_acc(xf):
            out = shifted_apply(J, unravel(xf), a0, a1)
            of, _ = ravel(out)
            return of

        b_norm = jnp.linalg.norm(flat_rhs)
        tol = jnp.maximum(self.rtol * b_norm, self.atol)

        def body(carry):
            x, _, k, itl = carry
            r = flat_rhs - matvec_acc(x)
            d_lo, _, it = self.inner(J_low, r.astype(lo), a0=a0, a1=a1)
            d_flat, _ = ravel(d_lo)
            x = x + d_flat.astype(flat_rhs.dtype)
            rn = jnp.linalg.norm(flat_rhs - matvec_acc(x))
            return x, rn, k + 1, itl + it

        def cond(carry):
            _, rn, k, _ = carry
            return jnp.logical_and(rn > tol, k < self.refinements)

        x0 = jnp.zeros_like(flat_rhs)
        x, rn, k, itl = jax.lax.while_loop(
            cond, body, (x0, b_norm, jnp.array(0), jnp.array(0)))
        return unravel(x), rn <= tol, itl

    def solve_two(self, J, r1, r2, a0=0.0, a1=1.0):
        return _vmapped_solve_two(self, J, r1, r2, a0=a0, a1=a1)


class PairedOperator:
    """Accurate matvec closure carrying a low-precision twin as `.low`
    (a flat-vector operator built at cast primals).  Consumed by
    `IterativeRefinement`; behaves as the accurate operator everywhere else."""

    __slots__ = ("op", "low")

    def __init__(self, op, low):
        self.op = op
        self.low = low

    def __call__(self, v):
        return self.op(v)
