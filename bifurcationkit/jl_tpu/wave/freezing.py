"""Traveling waves by the freezing method (ref src/wave/WaveProblem.jl).

Seek (u, s) with  F(u, p) + s * T u = 0  (co-moving frame; T = Lie generator,
e.g. translation d/dx) plus the phase condition <u - uref, T uref> = 0
(ref TWModel functional, :31-110).  Multiple generators give one speed and
one phase row each.

The augmented problem is an ordinary `BifurcationProblem` over
X = [u, s_1..s_k]; the wave spectrum comes from the co-moving-frame jacobian
J + sum_i s_i T_i through the engine's `eig_jacobian` hook (the reference's
`EigenWave` strips the constraint rows, ref src/wave/EigSolver.jl:6-45).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lens import Lens, as_lens
from ..core.problem import BifurcationProblem
from ..core.state import ravel


def travelling_wave_problem(prob_vf: BifurcationProblem,
                            generators: Union[Callable, Sequence[Callable]],
                            u0=None, speeds0=None, params=None,
                            uref=None, update_ref_every_step: int = 0):
    """Build the freezing-method problem.

    generators: linear operator(s) u -> T u (e.g. spectral/FD d/dx).
    Returns a BifurcationProblem over X = [u_flat, s_1..s_k].
    """
    if callable(generators):
        generators = (generators,)
    k = len(generators)
    params = prob_vf.params if params is None else params
    u0 = prob_vf.u0 if u0 is None else u0
    flat0, unravel = ravel(u0)
    n = flat0.shape[0]
    speeds0 = jnp.zeros((k,)) if speeds0 is None else jnp.asarray(speeds0)

    uref0 = flat0 if uref is None else ravel(uref)[0]
    Tflat = []
    for T in generators:
        def tf(v, T=T):
            return ravel(T(unravel(v)))[0]

        Tflat.append(tf)
    Turef0 = jnp.stack([tf(uref0) for tf in Tflat])   # (k, n)

    def split(X):
        return X[:n], X[n:]

    def G(X, par):
        u, s = split(X)
        F = ravel(prob_vf.F(unravel(u), par["_inner"]))[0]
        for i, tf in enumerate(Tflat):
            F = F + s[i] * tf(u)
        phases = jnp.stack([
            jnp.dot(u - par["_uref"], par["_Turef"][i]) for i in range(k)])
        return jnp.concatenate([F, phases])

    inner_lens = as_lens(prob_vf.lens)
    lens = Lens(
        get=lambda par: inner_lens.get(par["_inner"]),
        set=lambda par, v: {**par, "_inner": inner_lens.set(par["_inner"],
                                                            v)},
        name=f"tw/{inner_lens.name}")

    def record(X, p, **kw):
        u, s = split(X)
        out = {"param": p, "norm": jnp.linalg.norm(u)}
        for i in range(k):
            out[f"speed{i}" if k > 1 else "speed"] = s[i]
        return out

    def eig_jacobian(X, par):
        """Co-moving-frame jacobian J(u) + sum s_i T_i
        (ref EigenWave, src/wave/EigSolver.jl:6-45)."""
        u, s = split(X)

        def co_moving(v):
            out = ravel(prob_vf.F(unravel(v), par["_inner"]))[0]
            for i, tf in enumerate(Tflat):
                out = out + s[i] * tf(v)
            return out

        return jax.jacfwd(co_moving)(u)

    def update(it, state):
        if update_ref_every_step <= 0 or \
                state.step % update_ref_every_step != 0:
            return None
        par = it.current_params
        X = ravel(state.z.u)[0]
        u, _ = split(X)
        new = dict(par)
        new["_uref"] = u
        new["_Turef"] = jnp.stack([tf(u) for tf in Tflat])
        return new

    X0 = jnp.concatenate([flat0, speeds0])
    tw = BifurcationProblem(
        G, u0=X0,
        params={"_inner": params, "_uref": uref0, "_Turef": Turef0},
        lens=lens, record_from_solution=record, update=update)
    object.__setattr__(tw, "eig_jacobian", eig_jacobian)
    object.__setattr__(tw, "inner_prob", prob_vf)
    object.__setattr__(tw, "n_inner", n)
    object.__setattr__(tw, "unravel_inner", unravel)
    return tw


@dataclasses.dataclass(frozen=True)
class EigenWave:
    """Alias marker: the wave spectrum is produced by the co-moving-frame
    jacobian via `eig_jacobian`; any standard eigensolver works on top."""

    eigsolver: Any = None
