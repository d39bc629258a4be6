"""Generic boundary-value problems (ref src/bvp/*).

`BVPModel(F, g)` holds the ODE right-hand side u' = F(u, p) on t in [0, 1]
and the boundary-condition functional g(u(0), u(1), p) (n conditions)
(ref BVPModel, src/bvp/BVPModel.jl:34).  Discretizers reuse the
periodic-orbit machinery without the periodicity/phase rows
(ref src/bvp/Discretizers.jl, discretize.jl):

* `BVPCollocation(Ntst, m)` — Gauss-Legendre collocation,
* `BVPShooting(M)`          — (multiple) shooting on the JAX flow.

`bvp_problem` wraps everything into a standard BifurcationProblem so the full
continuation stack applies (ref BVPBifProblem, src/bvp/BVPBifProblem.jl:38).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lens import as_lens
from ..core.problem import BifurcationProblem
from ..periodic.collocation import legendre_matrices
from ..periodic.flow import Flow


@dataclasses.dataclass(frozen=True)
class BVPModel:
    """u' = F(u, p), g(u(0), u(1), p) = 0 (g returns n values)."""

    F: Callable
    g: Callable


@dataclasses.dataclass(frozen=True)
class BVPCollocation:
    Ntst: int = 20
    m: int = 4

    @property
    def n_nodes(self):
        return self.Ntst * self.m + 1

    def unknown_size(self, n):
        return self.n_nodes * n

    def local_nodes(self, nodes):
        idx = (jnp.arange(self.Ntst)[:, None] * self.m
               + jnp.arange(self.m + 1)[None, :])
        return nodes[idx]

    def residual(self, model: BVPModel, X, params, n: int):
        L, dL, zg, wg = legendre_matrices(self.m)
        nodes = X.reshape(self.n_nodes, n)
        mesh = jnp.linspace(0.0, 1.0, self.Ntst + 1)
        d = mesh[1:] - mesh[:-1]
        U = self.local_nodes(nodes)
        p = jnp.einsum("li,jln->jin", L, U)
        dp = jnp.einsum("li,jln->jin", dL, U)
        Fp = jax.vmap(lambda x: model.F(x, params))(
            p.reshape(-1, n)).reshape(self.Ntst, self.m, n)
        rows = dp - (d[:, None, None] / 2.0) * Fp
        bc = model.g(nodes[0], nodes[-1], params)
        return jnp.concatenate([rows.ravel(), jnp.atleast_1d(bc)])

    def initial_guess(self, profile: Callable, n: int):
        mesh = np.linspace(0, 1, self.Ntst + 1)
        sig = np.linspace(-1.0, 1.0, self.m + 1)
        ts = [0.0]
        for j in range(self.Ntst):
            dd = mesh[j + 1] - mesh[j]
            for l in range(1, self.m + 1):
                ts.append(mesh[j] + (sig[l] + 1) / 2 * dd)
        nodes = jnp.stack([jnp.asarray(profile(t)) for t in ts])
        return nodes.ravel()

    def times(self):
        mesh = np.linspace(0, 1, self.Ntst + 1)
        sig = np.linspace(-1.0, 1.0, self.m + 1)
        ts = [0.0]
        for j in range(self.Ntst):
            dd = mesh[j + 1] - mesh[j]
            for l in range(1, self.m + 1):
                ts.append(mesh[j] + (sig[l] + 1) / 2 * dd)
        return np.asarray(ts)


@dataclasses.dataclass(frozen=True)
class BVPTrapezoid:
    """Trapezoid-rule BVP discretizer (ref src/bvp trapeze path)."""

    M: int = 50

    def unknown_size(self, n):
        return self.M * n

    def residual(self, model: BVPModel, X, params, n: int):
        u = X.reshape(self.M, n)
        h = 1.0 / (self.M - 1)
        Fu = jax.vmap(lambda x: model.F(x, params))(u)
        rows = (u[1:] - u[:-1]) - (h / 2.0) * (Fu[1:] + Fu[:-1])
        bc = model.g(u[0], u[-1], params)
        return jnp.concatenate([rows.ravel(), jnp.atleast_1d(bc)])

    def initial_guess(self, profile: Callable, n: int):
        ts = np.linspace(0, 1, self.M)
        return jnp.stack([jnp.asarray(profile(t)) for t in ts]).ravel()

    def times(self):
        return np.linspace(0, 1, self.M)


@dataclasses.dataclass(frozen=True)
class BVPShooting:
    M: int = 4
    steps_per_segment: int = 60

    def unknown_size(self, n):
        return self.M * n

    def residual(self, model: BVPModel, X, params, n: int):
        u = X.reshape(self.M, n)
        fl = Flow(model.F, steps=self.steps_per_segment)
        ends = jax.vmap(lambda x: fl(x, params, 1.0 / self.M))(u)
        match = (ends[:-1] - u[1:]).ravel()
        bc = model.g(u[0], ends[-1], params)
        return jnp.concatenate([match, jnp.atleast_1d(bc)])

    def initial_guess(self, profile: Callable, n: int):
        ts = np.linspace(0, 1, self.M, endpoint=False)
        return jnp.stack([jnp.asarray(profile(t)) for t in ts]).ravel()

    def times(self):
        return np.linspace(0, 1, self.M, endpoint=False)


def discretize(model: BVPModel, disc, profile: Callable, n: int):
    """Initial guess on the discretization mesh (ref src/bvp/discretize.jl)."""
    return disc.initial_guess(profile, n)


def bvp_problem(model: BVPModel, disc, X0, params, lens,
                n: Optional[int] = None,
                record_from_solution=None) -> BifurcationProblem:
    """Wrap (model, discretizer) into a BifurcationProblem
    (ref BVPBifProblem, src/bvp/BVPBifProblem.jl:38)."""
    if n is None:
        probe = np.asarray(model.g(np.zeros(99), np.zeros(99), params))
        raise ValueError("pass n (ODE dimension) explicitly")

    def F(X, par):
        return disc.residual(model, X, par, n)

    def record(X, p, **k):
        u = X.reshape(-1, n)
        return {"param": p, "norm": jnp.linalg.norm(X),
                "max": jnp.max(u[:, 0]), "min": jnp.min(u[:, 0])}

    return BifurcationProblem(
        F, u0=X0, params=params, lens=lens,
        record_from_solution=record_from_solution or record)
