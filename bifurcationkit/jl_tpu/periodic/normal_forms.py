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


def make_prm_coef_kernels(prob_vf, flow_steps: int = 120,
                          newton_steps: int = 3):
    """Once-jitted Poincare-return-map normal-form evaluators with the curve
    point (x0, T, params) as ARGUMENTS, for per-step codim-3 monitoring
    along PO codim-2 curves (ref test_for_pd_gpd_cp, MinAugPD.jl:393-438;
    test_for_ns_ch, MinAugNS.jl:415-463).  Returns (dP_fn, pd_coef, ns_coef):

      dP_fn(x0, T, par)            -> (n-1, n-1) return-map jacobian
      pd_coef(x0, T, par, q, p)    -> b3 flip coefficient (real q, p)
      ns_coef(x0, T, par, q, p, theta) -> d NS Lyapunov coeff (complex q, p)

    Rebuilding a closure per curve point would retrace the 3rd-order jets
    through the flow every continuation step; with the point as arguments
    XLA compiles each kernel exactly once per curve."""
    fl = Flow(prob_vf.F, steps=flow_steps)
    small = Flow(prob_vf.F, steps=1)

    def _section(x0, par):
        F0 = prob_vf.F(x0, par)
        normal = F0 / jnp.linalg.norm(F0)
        n = x0.shape[0]
        A = jnp.concatenate([normal[:, None], jnp.eye(n)], axis=1)
        Q, _ = jnp.linalg.qr(A)
        return normal, Q[:, 1:n]

    def P(y, x0, T, par):
        normal, B = _section(x0, par)
        x = x0 + B @ y
        xT = fl(x, par, T)

        def newton_time(carry, _):
            xc, tau = carry
            s = jnp.dot(xc - x0, normal)
            ds = jnp.dot(prob_vf.F(xc, par), normal)
            dt = -s / ds
            return (small(xc, par, dt), tau + dt), None

        (xTc, _), _ = jax.lax.scan(newton_time, (xT, jnp.asarray(T)),
                                   jnp.arange(newton_steps))
        return B.T @ (xTc - x0)

    @jax.jit
    def dP_fn(x0, T, par):
        y0 = jnp.zeros(x0.shape[0] - 1)
        return jax.jacfwd(P)(y0, x0, T, par)

    def _B2(y0, x0, T, par, a, b):
        """Second directional derivative D^2P(y0)[a, b] via nested jvp."""
        def j1(y):
            return jax.jvp(lambda z: P(z, x0, T, par), (y,), (a,))[1]
        return jax.jvp(j1, (y0,), (b,))[1]

    def _C3(y0, x0, T, par, a, b, c):
        def j2(y):
            def j1(z):
                return jax.jvp(lambda w: P(w, x0, T, par), (z,), (a,))[1]
            return jax.jvp(j1, (y,), (b,))[1]
        return jax.jvp(j2, (y0,), (c,))[1]

    @jax.jit
    def pd_coef(x0, T, par, q, p):
        """b3 of xi -> -xi + b3 xi^3 (Kuznetsov 5.4; cf. period_doubling_nf)."""
        m = x0.shape[0] - 1
        y0 = jnp.zeros(m)
        A = jax.jacfwd(P)(y0, x0, T, par)
        Bqq = _B2(y0, x0, T, par, q, q)
        h2 = jnp.linalg.solve(jnp.eye(m) - A, Bqq)
        cv = _C3(y0, x0, T, par, q, q, q) + 3.0 * _B2(y0, x0, T, par, q, h2)
        return jnp.dot(p, cv) / 6.0

    def _B2c(y0, x0, T, par, a, b):
        """Complex bilinear extension by multilinearity (JAX jvp cannot push
        complex tangents through a real map)."""
        ar, ai, br, bi = jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b)
        rr = _B2(y0, x0, T, par, ar, br)
        ii = _B2(y0, x0, T, par, ai, bi)
        ri = _B2(y0, x0, T, par, ar, bi)
        ir = _B2(y0, x0, T, par, ai, br)
        return (rr - ii) + 1j * (ri + ir)

    @jax.jit
    def ns_coef(x0, T, par, q, p, theta):
        """NS first Lyapunov coefficient d (Kuznetsov (5.87); cf.
        neimark_sacker_nf)."""
        m = x0.shape[0] - 1
        y0 = jnp.zeros(m)
        A = jax.jacfwd(P)(y0, x0, T, par).astype(jnp.complex128)
        eye = jnp.eye(m, dtype=jnp.complex128)
        qb = jnp.conj(q)
        Bqq = _B2c(y0, x0, T, par, q, q)
        Bqqb = _B2c(y0, x0, T, par, q, qb)
        h20 = jnp.linalg.solve(jnp.exp(2j * theta) * eye - A, Bqq)
        h11 = jnp.linalg.solve(eye - A, Bqqb)
        qr_, qi = jnp.real(q), jnp.imag(q)
        # C(q, q, qb) by multilinearity over the three complex slots
        def C3c(a, b, c):
            parts = []
            for sa, va in ((1.0, jnp.real(a)), (1j, jnp.imag(a))):
                for sb, vb in ((1.0, jnp.real(b)), (1j, jnp.imag(b))):
                    for sc, vc in ((1.0, jnp.real(c)), (1j, jnp.imag(c))):
                        parts.append(sa * sb * sc
                                     * _C3(y0, x0, T, par, va, vb, vc))
            return sum(parts)
        gv = (C3c(q, q, qb) + 2.0 * _B2c(y0, x0, T, par, q, h11)
              + _B2c(y0, x0, T, par, qb, h20))
        g21 = jnp.vdot(p, gv) / 2.0
        return jnp.real(jnp.exp(-1j * theta) * g21)

    return dP_fn, pd_coef, ns_coef


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
