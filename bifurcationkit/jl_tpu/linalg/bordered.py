"""Bordered linear solvers (ref src/LinearBorderSolver.jl).

Solve the (N+1) x (N+1) block system

    | shift*I + J    dR  | |dX|   |R|
    | xi_u * dzu^T  xi_p*dzp | |dl| = |n|

the numerical heart of PALC, codim-2 minimally-augmented functionals and
normal-form projections.  Three strategies, composed from the L1 solvers:

* `BorderingBLS` — Govaerts' block elimination BEC + k iterative refinement
  (ref src/LinearBorderSolver.jl:59-166).  Two inner linear solves sharing a
  factorization plus a handful of dot products — the dots become `psum`s on a
  sharded mesh, nothing else changes.
* `MatrixBLS`   — assemble the full (N+1)^2 dense matrix and solve directly
  (ref src/LinearBorderSolver.jl:217-264); right choice for small/dense J on
  the MXU.
* `MatrixFreeBLS` — Krylov on the extended operator acting on
  BorderedState(u, p) (ref src/LinearBorderSolver.jl:299-450).

All return `(dX, dl, converged, n_iter)`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..core.state import (BorderedState, ravel, tree_axpy, tree_norm,
                          tree_size, tree_sub, tree_vdot)
from .linear import DenseLS, GMRES, apply_J, is_operator, shifted_apply


def _default_dotp(x, y):
    """Normalized dot used by PALC (ref `NormalisedDot`, Palc.jl:1-5)."""
    return jnp.real(tree_vdot(x, y)) / tree_size(x)


@dataclasses.dataclass(frozen=True)
class BorderingBLS:
    """Block-elimination bordered solver BEC+k (Govaerts 1991;
    ref src/LinearBorderSolver.jl:59-166)."""

    solver: Any = dataclasses.field(default_factory=DenseLS)
    tol: float = 1e-12
    check_precision: bool = True
    k: int = 1

    def __call__(self, J, dR, dzu, dzp, R, n, xi_u=1.0, xi_p=1.0,
                 shift=None, dotp: Callable = _default_dotp):
        def bec(Rb, nb):
            return _bec_step(self.solver, J, dR, dzu, dzp, Rb, nb,
                             xi_u, xi_p, shift, dotp)

        dX, dl, cv, itl = bec(R, n)

        # BEC + k iterative refinement: statically unrolled k passes
        # (jit-friendly; ref while loop at src/LinearBorderSolver.jl:118-130).
        # The two refinement solves are gated behind lax.cond so a pass
        # whose residual already meets tol costs one matvec, not two solves.
        if self.check_precision:
            from ..core.state import tree_zeros_like

            for _ in range(self.k):
                dres_X, dres_l = _bec_residual(J, dR, dzu, dzp, R, n, dX, dl,
                                               xi_u, xi_p, shift, dotp)
                fail = jnp.logical_or(tree_norm(dres_X) > self.tol,
                                      jnp.abs(dres_l) > self.tol)

                def _refine(args):
                    rX, rl = args
                    dX1, dl1, _, _ = bec(rX, rl)
                    return dX1, jnp.asarray(dl1)

                def _skip(args):
                    rX, rl = args
                    return tree_zeros_like(rX), jnp.zeros_like(jnp.asarray(rl))

                dX1, dl1 = jax.lax.cond(fail, _refine, _skip,
                                        (dres_X, dres_l))
                dX = jax.tree_util.tree_map(lambda a, b: a + b, dX, dX1)
                dl = dl + dl1
        return dX, dl, cv, itl


def _bec_step(solver, J, dR, dzu, dzp, R, n, xi_u, xi_p, shift, dotp):
    a0 = 0.0 if shift is None else shift
    if hasattr(solver, "solve_two") and shift is None:
        x1, x2, cv, itl = solver.solve_two(J, R, dR)
        itl = itl[0] + itl[1]
    else:
        x1, cv1, it1 = solver(J, R, a0=a0)
        x2, cv2, it2 = solver(J, dR, a0=a0)
        cv = jnp.logical_and(cv1, cv2)
        itl = it1 + it2
    dl = (n - dotp(dzu, x1) * xi_u) / (dzp * xi_p - dotp(dzu, x2) * xi_u)
    dX = tree_axpy(-dl, x2, x1)
    return dX, dl, cv, itl


def _bec_residual(J, dR, dzu, dzp, R, n, dX, dl, xi_u, xi_p, shift, dotp):
    JdX = apply_J(J, dX)
    if shift is not None:
        JdX = tree_axpy(shift, dX, JdX)
    top = tree_sub(R, tree_axpy(dl, dR, JdX))
    bot = n - xi_p * dzp * dl - xi_u * dotp(dzu, dX)
    return top, bot


@dataclasses.dataclass(frozen=True)
class MatrixBLS:
    """Assemble the extended (N+1) x (N+1) matrix and solve dense
    (ref src/LinearBorderSolver.jl:217-264)."""

    solver: Any = dataclasses.field(default_factory=DenseLS)

    def __call__(self, J, dR, dzu, dzp, R, n, xi_u=1.0, xi_p=1.0,
                 shift=None, dotp: Callable = _default_dotp):
        if is_operator(J):
            raise TypeError("MatrixBLS needs a dense matrix jacobian; use "
                            "BorderingBLS or MatrixFreeBLS for operators")
        dR_flat, _ = ravel(dR)
        dzu_flat, _ = ravel(dzu)
        R_flat, unravel = ravel(R)
        N = J.shape[0]
        A = J if shift is None else J + shift * jnp.eye(N, dtype=J.dtype)
        # the xi_u row must reproduce xi_u * dotp(dzu, .); with the default
        # normalized dot that is xi_u / N * dzu^T
        norm_factor = _dotp_row_scale(dotp, dzu, N)
        bottom = jnp.concatenate(
            [xi_u * norm_factor * dzu_flat,
             jnp.asarray(xi_p * dzp, dtype=J.dtype)[None]])
        top = jnp.concatenate([A, dR_flat[:, None]], axis=1)
        Aext = jnp.concatenate([top, bottom[None, :]], axis=0)
        rhs = jnp.concatenate([R_flat, jnp.asarray(n, J.dtype)[None]])
        sol, cv, itl = self.solver(Aext, rhs)
        return unravel(sol[:N]), sol[N], cv, itl


def _dotp_row_scale(dotp, dzu, N):
    """Infer the linear row scaling s so that dotp(dzu, x) = s * dzu^T x.
    Works for the standard and normalized dots (the only linear ones used)."""
    if dotp is _default_dotp:
        return 1.0 / N
    # probe with a basis-free trick: dotp(dzu, dzu) / <dzu, dzu>
    flat, _ = ravel(dzu)
    denom = jnp.vdot(flat, flat)
    return jnp.real(dotp(dzu, dzu)) / jnp.where(denom == 0, 1.0, denom)


@dataclasses.dataclass(frozen=True)
class MatrixFreeBLS:
    """Krylov solve of the extended operator on BorderedState
    (ref src/LinearBorderSolver.jl:299-450)."""

    solver: Any = dataclasses.field(
        default_factory=lambda: GMRES(restart=50, maxiter=500, rtol=1e-10))

    def __call__(self, J, dR, dzu, dzp, R, n, xi_u=1.0, xi_p=1.0,
                 shift=None, dotp: Callable = _default_dotp):
        def ext_op(z: BorderedState):
            Ju = apply_J(J, z.u)
            if shift is not None:
                Ju = tree_axpy(shift, z.u, Ju)
            top = tree_axpy(z.p, dR, Ju)
            bot = xi_u * dotp(dzu, z.u) + xi_p * dzp * z.p
            return BorderedState(u=top, p=jnp.asarray(bot))

        rhs = BorderedState(u=R, p=jnp.asarray(n))
        sol, cv, itl = self.solver(ext_op, rhs)
        return sol.u, sol.p, cv, itl


def solve_bls_block(solver, J, C, D, E, R, s, shift=None):
    """Explicit k-border block elimination (ref solve_bls_block,
    src/LinearBorderSolver.jl:173-206,272-285):

        [ J   C ] [x]   [R]     J: N x N (any solver-compatible form),
        [ D   E ] [y] = [s]     C: (N, k) columns, D: (k, N) rows, E: k x k.

    Composes with ITERATIVE inner solvers: x1 = J\\R and X2 = J\\C are k+1
    independent solves batched in ONE vmapped dispatch, then the k x k
    Schur complement closes the system.  This is the building block of the
    BT / Hopf multi-border systems and the matrix-free PO codim-2 path.
    Returns (x, y, converged, n_iter)."""
    k = C.shape[1]
    R_flat, unravel = ravel(R)
    stacked = jnp.concatenate([R_flat[None, :], C.T], axis=0)  # (k+1, N)
    sols, cvs, its = jax.vmap(
        lambda b: solver(J, unravel(b),
                         **({} if shift is None else {"a0": shift})))(stacked)
    sols_flat = jax.vmap(lambda t: ravel(t)[0])(sols)
    x1 = sols_flat[0]
    X2 = sols_flat[1:].T                                        # (N, k)
    Schur = E - D @ X2
    from .linear import dense_solve

    y = dense_solve(Schur, s - D @ x1)
    x = x1 - X2 @ y
    return unravel(x), y, jnp.all(cvs), jnp.sum(its)


@dataclasses.dataclass(frozen=True)
class LSFromBLS:
    """Use a bordered solver as a plain (N+1)-dim linear solver
    (ref `LSFromBLS`, src/LinearBorderSolver.jl:468-488)."""

    bls: Any = dataclasses.field(default_factory=BorderingBLS)

    def __call__(self, A, rhs, a0=0.0, a1=1.0):
        # split A = [[J, b], [c^T, d]] and rhs = [R; n]
        J = A[:-1, :-1]
        b = A[:-1, -1]
        c = A[-1, :-1]
        d = A[-1, -1]
        dX, dl, cv, itl = self.bls(
            J, b, c, d, rhs[:-1], rhs[-1], 1.0, 1.0,
            dotp=lambda x, y: jnp.vdot(x, y))
        return jnp.concatenate([dX, dl[None]]), cv, itl
