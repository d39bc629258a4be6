"""Normal forms of periodic-orbit bifurcations via the Poincare return map
(ref src/periodicorbit/NormalForms.jl:325-1004, PoincareRM.jl:10-190).

The return map P is built from the JAX flow: expand hyperplane coordinates
to full space, integrate for the (implicitly solved) return time, project
back.  The return-time solve is three unrolled Newton corrections on the
section condition — differentiable, so the map normal forms (flip /
Neimark-Sacker, normal_forms.maps) apply directly to P.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import BifurcationProblem
from ..continuation.results import Branch
from ..detection.points import NeimarkSacker, PeriodDoubling
from ..normal_forms.maps import neimark_sacker_nf, period_doubling_nf
from .flow import Flow


def poincare_return_map(prob_vf, x0, params, T, steps: int = 200,
                        newton_steps: int = 3):
    """Return (map_prob, y0): P as a BifurcationProblem over hyperplane
    coordinates y (n-1), anchored at x0 with normal F(x0)
    (ref PoincareMap solve/extend, PoincareRM.jl:32-190)."""
    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    normal = prob_vf.F(x0, params)
    normal = normal / jnp.linalg.norm(normal)
    # orthonormal basis of the section
    A = jnp.concatenate([normal[:, None], jnp.eye(n)], axis=1)
    Q, _ = jnp.linalg.qr(A)
    B = Q[:, 1:n]                       # (n, n-1)
    fl = Flow(prob_vf.F, steps=steps)

    def P(y, par):
        x = x0 + B @ y
        xT = fl(x, par, T)
        # Newton-correct the return time: <Phi_tau(x) - x0, normal> = 0
        tau = jnp.asarray(T)
        small = Flow(prob_vf.F, steps=1)

        def newton_time(carry, _):
            xT, tau = carry
            s = jnp.dot(xT - x0, normal)
            ds = jnp.dot(prob_vf.F(xT, par), normal)
            dt = -s / ds
            xT2 = small(xT, par, dt)
            return (xT2, tau + dt), None

        (xTc, tau), _ = jax.lax.scan(newton_time, (xT, tau),
                                     jnp.arange(newton_steps))
        return B.T @ (xTc - x0)

    map_prob = BifurcationProblem(P, u0=jnp.zeros(n - 1), params=params,
                                  lens=prob_vf.lens)
    return map_prob, jnp.zeros(n - 1)


def get_normal_form_po(br_po, ind_bif: int, verbose: bool = False,
                       flow_steps: int = 300):
    """Normal form of a PD/NS point on a periodic-orbit branch via the
    Poincare return map (ref get_normal_form dispatch for PO branches)."""
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_bif]
    if sp.type not in ("pd", "ns", "bp"):
        raise ValueError(f"point {ind_bif} has type {sp.type!r}; expected "
                         "pd/ns/bp on a periodic-orbit branch")
    po_prob = gamma.prob
    prob_vf = po_prob.prob_vf
    disc = po_prob.disc
    n = po_prob.n_vf
    X = jnp.asarray(sp.x)
    dof, T = X[:-1], float(X[-1])
    x0 = dof.reshape(-1, n)[0]
    params = prob_vf.set_lens_param(prob_vf.params, sp.param)

    map_prob, y0 = poincare_return_map(prob_vf, x0, params, T,
                                       steps=flow_steps)
    if sp.type == "pd":
        pt = period_doubling_nf(map_prob, y0, params, verbose=verbose)
        pt.p = sp.param
        pt.period = T
        return pt
    if sp.type == "ns":
        pt = neimark_sacker_nf(map_prob, y0, params, verbose=verbose)
        pt.p = sp.param
        pt.period = T
        return pt
    # bp of PO: treat via the return map's fold/branch structure
    raise NotImplementedError("PO branch-point normal form: use the PRM "
                              "fold machinery (round 2)")
