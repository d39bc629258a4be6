"""Deflation operators & deflated Newton (ref src/DeflationOperator.jl).

`DeflationOperator` penalizes known roots so Newton finds *new* solutions:
M(u) = prod_i (1 / ||u - root_i||^(2p) + alpha) and the deflated problem is
G(u) = M(u) * F(u) (ref :57-88,180).

TPU design: the root set lives in a fixed-capacity stacked array
(`max_roots`, n) with an active count, so the deflated residual is a single
static-shape jitted function — adding a root never retraces.  The jacobian of
G comes from AD straight through M (matrix or jvp), which subsumes the
reference's custom Sherman–Morrison solver (`DeflatedProblemCustomLS`, :265)
at equal asymptotic cost for the matrix-free path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.problem import BifurcationProblem
from .core.params import NewtonPar
from .core.state import ravel, tree_norm
from .newton import NonLinearSolution, newton


@dataclasses.dataclass
class DeflationOperator:
    """M(u) = prod_i (1/||u - root_i||^(2p) + alpha)
    (ref DeflationOperator, src/DeflationOperator.jl:57-88)."""

    power: float = 2.0
    alpha: float = 1.0
    roots: List[Any] = dataclasses.field(default_factory=list)
    max_roots: int = 16

    def __len__(self):
        return len(self.roots)

    def push(self, root):
        if len(self.roots) >= self.max_roots:
            raise RuntimeError(f"deflation capacity {self.max_roots} reached;"
                               " raise max_roots")
        self.roots.append(root)

    def clear(self):
        self.roots = []

    def packed_roots(self, like):
        """Stack roots into a fixed (max_roots, n) array (padded)."""
        flat0, _ = ravel(like)
        n = flat0.shape[0]
        arr = jnp.zeros((self.max_roots, n), flat0.dtype)
        for i, r in enumerate(self.roots):
            fr, _ = ravel(r)
            arr = arr.at[i].set(fr)
        return arr, jnp.asarray(len(self.roots))

    def M(self, u):
        """Deflation factor at u (host-friendly evaluation)."""
        arr, k = self.packed_roots(u)
        return _deflation_factor(u, arr, k, self.power, self.alpha)


def _deflation_factor(u, roots_arr, k, power, alpha):
    flat, _ = ravel(u)
    d2 = jnp.sum((roots_arr - flat[None, :]) ** 2, axis=1)
    idx = jnp.arange(roots_arr.shape[0])
    terms = jnp.where(idx < k,
                      1.0 / jnp.maximum(d2, 1e-300) ** power + alpha,
                      1.0)
    return jnp.prod(terms)


def deflated_problem(prob: BifurcationProblem,
                     defl: DeflationOperator) -> BifurcationProblem:
    """Build G(u, par) = M(u) F(u) as a standard BifurcationProblem whose
    params carry the root set dynamically (no retrace when roots change)
    (ref DeflatedProblem, src/DeflationOperator.jl:180)."""
    power, alpha = defl.power, defl.alpha

    def G(u, par):
        m = _deflation_factor(u, par["_defl_roots"], par["_defl_k"],
                              power, alpha)
        F = prob.F(u, par["_inner"])
        return jax.tree_util.tree_map(lambda x: m * x, F)

    roots_arr, k = defl.packed_roots(prob.u0)

    from .core.lens import Lens, as_lens

    inner_lens = as_lens(prob.lens)
    lens = Lens(
        get=lambda par: inner_lens.get(par["_inner"]),
        set=lambda par, v: {**par, "_inner": inner_lens.set(par["_inner"],
                                                            v)},
        name=f"defl/{inner_lens.name}",
    )

    return BifurcationProblem(
        G, u0=prob.u0,
        params={"_inner": prob.params, "_defl_roots": roots_arr,
                "_defl_k": k},
        lens=lens, delta=prob.delta)


def deflated_newton(prob: BifurcationProblem, defl: DeflationOperator,
                    options: Optional[NewtonPar] = None, x0=None, params=None,
                    **kwargs) -> NonLinearSolution:
    """Newton on the deflated problem
    (ref solve(prob, defOp, options), src/DeflationOperator.jl:339-389)."""
    options = options or NewtonPar()
    # cache the deflated problem: its params carry the roots dynamically, so
    # one jitted Newton serves every root set of this (prob, defl) pair
    cache = getattr(defl, "_dprob_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(defl, "_dprob_cache", cache)
    dprob = cache.get(id(prob))
    if dprob is None:
        dprob = deflated_problem(prob, defl)
        cache[id(prob)] = dprob
    params = prob.params if params is None else params
    roots_arr, k = defl.packed_roots(prob.u0)
    dparams = {"_inner": params, "_defl_roots": roots_arr, "_defl_k": k}
    sol = newton(dprob, options, x0=x0, params=dparams, **kwargs)
    # report the residual of the *original* problem at the solution
    res = tree_norm(prob.F(sol.u, params))
    sol.converged = jnp.logical_and(sol.converged, res < 10 * options.tol)
    return sol
