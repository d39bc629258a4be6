"""Newton–Krylov solver (ref src/Newton.jl).

The whole Newton iteration — residual, jacobian, linear solve, update,
convergence test — runs inside one `lax.while_loop` under `jit`, so a solve
is a single XLA computation on the TPU with no host round-trips
(ref hot loop at src/Newton.jl:90-111).

Jacobian realization is chosen statically from the linear solver: direct
solvers get a dense matrix (`jacfwd`), iterative solvers get a matrix-free
`jvp` operator (ref jacobian-style singletons, src/jacobianTypes.jl).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .core.params import NewtonPar
from .core.problem import BifurcationProblem
from .core.state import tree_norm, tree_sub
from .linalg.linear import DenseLS


@dataclasses.dataclass
class NonLinearSolution:
    """Result of a nonlinear solve (ref `NonLinearSolution`, src/Newton.jl:49)."""

    u: Any
    prob: Any
    residuals: Any          # (max_iterations+1,) array, NaN-padded
    converged: Any
    itnewton: Any
    itlineartot: Any

    @property
    def x(self):
        return self.u


def _pick_jacobian(prob: BifurcationProblem, options: NewtonPar):
    """Static choice of jacobian realization based on the linear solver."""
    ls = options.linsolver
    if isinstance(ls, DenseLS) or getattr(ls, "needs_matrix", False):
        return lambda x, p: prob.jacobian(x, p)
    # iterative solver: matrix-free operator
    return lambda x, p: prob.jacobian_operator(x, p)


def default_callback(state_dict, **kwargs):
    return jnp.array(True)


def cb_max_norm(max_norm: float):
    """Callback rejecting iterates with residual norm > max_norm
    (ref `cbMaxNorm`, src/Newton.jl:156-164)."""

    def cb(d, **kwargs):
        return d["residual_norm"] < max_norm

    return cb


def cb_max_norm_and_dp(max_norm: float, max_dp: float, p_ref: float):
    """Reject iterates with large residual OR parameter excursion
    (ref `cbMaxNormAndDp`, src/Newton.jl:166-179).  Use with the PALC
    corrector by closing over the step's reference parameter."""
    import jax.numpy as _jnp

    def cb(d, **kwargs):
        ok = d["residual_norm"] < max_norm
        if "p" in d:
            ok = _jnp.logical_and(ok, _jnp.abs(d["p"] - p_ref) < max_dp)
        return ok

    return cb


def newton(prob: BifurcationProblem,
           options: Optional[NewtonPar] = None,
           x0=None,
           params=None,
           callback: Callable = default_callback,
           norm: Callable = tree_norm) -> NonLinearSolution:
    """Solve F(u, params) = 0 by Newton's method
    (ref `solve(prob, ::Newton, options)`, src/Newton.jl:147)."""
    options = options or NewtonPar()
    x0 = prob.u0 if x0 is None else x0
    params = prob.params if params is None else params
    x, res_hist, converged, itnewton, itlin = _newton_core(
        prob, options, callback, norm, x0, params)
    return NonLinearSolution(u=x, prob=prob, residuals=res_hist,
                             converged=converged, itnewton=itnewton,
                             itlineartot=itlin)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _newton_core(prob, options: NewtonPar, callback, norm, x0, params):
    """Jitted Newton loop (ref `_newton`, src/Newton.jl:66-114)."""
    jac = _pick_jacobian(prob, options)
    ls = options.linsolver
    tol = options.tol
    max_it = options.max_iterations

    res_f0 = prob.residual(x0, params)
    res0 = norm(res_f0)
    hist0 = jnp.full((max_it + 1,), jnp.nan,
                     dtype=jnp.result_type(res0, jnp.float32))
    hist0 = hist0.at[0].set(res0)

    cb0 = callback({"x": x0, "residual": res_f0, "residual_norm": res0,
                    "step": jnp.array(0)})

    def cond(carry):
        x, res_f, res, step, itlin, hist, keep_going = carry
        return jnp.logical_and(
            jnp.logical_and(res > tol, step < max_it), keep_going)

    def body(carry):
        x, res_f, res, step, itlin, hist, _ = carry
        J = jac(x, params)
        du, cv_lin, it_lin = ls(J, res_f)
        x_new = tree_sub(x, du)
        res_f_new = prob.residual(x_new, params)
        res_new = norm(res_f_new)

        if options.linesearch:
            # Armijo-style halving line search (ref linesearch branch,
            # src/continuation/Palc.jl:256-280 applied to plain Newton)
            def ls_body(state):
                alpha, xb, rfb, rb, ok = state
                x_try = jax.tree_util.tree_map(
                    lambda a, b: a - alpha * b, x, du)
                rf_try = prob.residual(x_try, params)
                r_try = norm(rf_try)
                better = r_try < res
                return (alpha * 0.5,
                        jax.tree_util.tree_map(
                            lambda a, b: jnp.where(better, a, b), x_try, xb),
                        jax.tree_util.tree_map(
                            lambda a, b: jnp.where(better, a, b), rf_try, rfb),
                        jnp.where(better, r_try, rb),
                        jnp.logical_or(ok, better))

            def ls_cond(state):
                alpha, _, _, _, ok = state
                return jnp.logical_and(~ok, alpha > options.alpha_min)

            _, x_new, res_f_new, res_new, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.asarray(options.alpha), x_new, res_f_new, res_new,
                 jnp.array(False)))

        step_new = step + 1
        hist = hist.at[step_new].set(res_new)
        keep = callback({"x": x_new, "residual": res_f_new,
                         "residual_norm": res_new, "step": step_new})
        return (x_new, res_f_new, res_new, step_new,
                itlin + it_lin.astype(jnp.int64 if
                                      jax.config.jax_enable_x64
                                      else jnp.int32),
                hist, keep)

    init = (x0, res_f0, res0, jnp.array(0),
            jnp.array(0, dtype=jnp.int64 if jax.config.jax_enable_x64
                      else jnp.int32), hist0, cb0)
    x, res_f, res, step, itlin, hist, _ = jax.lax.while_loop(cond, body, init)
    return x, hist, res <= tol, step, itlin
