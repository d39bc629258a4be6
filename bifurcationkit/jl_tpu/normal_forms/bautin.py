"""Bautin (generalized Hopf) normal form: the second Lyapunov coefficient
l2 (ref Bautin NF, src/codim2/NormalForms.jl:642-958).

Standard center-manifold formulas (Kuznetsov, Elements of Applied Bifurcation
Theory, §8.3.2 — the same recipe MatCont's nf_GH uses), with the true
multilinear forms B, C, D, E from the problem's AD jets:

  h20 = (2 i w I - A)^-1 B(q, q)
  h11 = -A^-1 B(q, qb)
  g21 = <p, C(q,q,qb) + B(qb,h20) + 2 B(q,h11)>
  h30 = (3 i w I - A)^-1 [C(q,q,q) + 3 B(q,h20)]
  h21 : bordered solve of (i w I - A) h21 = rhs21 - g21 q      (resonant)
  h31 = (2 i w I - A)^-1 [D(q,q,q,qb) + 3 C(q,q,h11) + 3 C(q,qb,h20)
        + 3 B(h20,h11) + B(qb,h30) + 3 B(q,h21) - 3 g21 h20]
  h22 = -A^-1 [D(q,q,qb,qb) + 4 C(q,qb,h11) + C(qb,qb,h20) + C(q,q,cj(h20))
        + 2 B(h11,h11) + 2 B(q,cj(h21)) + 2 B(qb,h21) + B(cj(h20),h20)
        - 2 h11 (g21 + cj(g21))]
  g32 = <p, E(q,q,q,qb,qb) + D(q,q,q,cj(h20)) + 3 D(q,q,qb,h11)*2? ...>
  l2  = Re(g32) / 12
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..detection.points import Bautin
from ..linalg.eig import dense_eig
from .codim1 import _FlatProblem, _inner


def bautin_normal_form(prob, x0, params, verbose: bool = False):
    """Second Lyapunov coefficient at a (near-)degenerate Hopf point.

    The whole computation (jets up to 5th order, solves, eigs via host
    callbacks) is jitted once per problem and cached — repeated evaluations
    along a curve are then single dispatches."""
    core = getattr(prob, "_bautin_core", None)
    if core is None:
        core = jax.jit(lambda xf, par: _bautin_core(prob, xf, par))
        object.__setattr__(prob, "_bautin_core", core)
    from ..core.state import ravel as _ravel

    xf, _ = _ravel(x0)
    l1, l2, g21, g32, w, q, p = jax.device_get(core(xf, params))
    pt = Bautin(x0=xf, p=None, params=params, lens=prob.lens,
                zeta=q, zeta_star=p, omega=float(w),
                nf={"l1": float(l1), "l2": float(l2),
                    "g21": complex(g21), "g32": complex(g32)}, prob=prob)
    pt.subtype = "SuperCritical" if l2 < 0 else "SubCritical"
    if verbose:
        print(f"Bautin NF: l1 = {float(l1):.6g} (should be ~0), "
              f"l2 = {float(l2):.6g}, omega = {float(w):.6g}")
    return pt


def _bautin_core(prob, x_flat, params):
    fp = _FlatProblem(prob, x_flat, params)
    A = fp.jacobian().astype(jnp.complex128)
    n = fp.n
    vals, vecs = dense_eig(A)
    # complex pair with minimal |Re| (mask real eigenvalues)
    score = jnp.where(vals.imag > 1e-10, jnp.abs(vals.real), jnp.inf)
    i0 = jnp.argmin(score)
    lam = vals[i0]
    w = jnp.imag(lam)
    q = vecs[:, i0]
    q = q / jnp.linalg.norm(q)
    valsT, vecsT = dense_eig(A.T)
    iT = jnp.argmin(jnp.abs(valsT - jnp.conj(lam)))
    p = vecsT[:, iT]
    T = jnp.sum(jnp.conj(p) * q)
    p = p / jnp.conj(T)

    def ip(vec):
        return jnp.sum(jnp.conj(p) * vec)

    qb = jnp.conj(q)
    B = lambda a, b: fp.d2F(a, b)
    C = lambda a, b, c: fp.d3F(a, b, c)
    D = lambda a, b, c, d: fp.d4F(a, b, c, d)
    E = lambda a, b, c, d, e: fp.d5F(a, b, c, d, e)
    eye = jnp.eye(n, dtype=jnp.complex128)
    solve = jnp.linalg.solve

    h20 = solve(2j * w * eye - A, B(q, q).astype(jnp.complex128))
    h11 = solve(-A, B(q, qb).astype(jnp.complex128))

    rhs21 = (C(q, q, qb) + B(qb, h20) + 2.0 * B(q, h11))
    g21 = ip(rhs21)

    # resonant bordered solve for h21
    M = jnp.zeros((n + 1, n + 1), jnp.complex128)
    M = M.at[:n, :n].set(1j * w * eye - A)
    M = M.at[:n, n].set(q)
    M = M.at[n, :n].set(jnp.conj(p))
    # (i w I - A) h21 = rhs21 - g21 q  with  <p, h21> = 0
    rhs = jnp.concatenate([(rhs21 - g21 * q).astype(jnp.complex128),
                           jnp.zeros(1, jnp.complex128)])
    h21 = solve(M, rhs)[:n]

    h30 = solve(3j * w * eye - A,
                (C(q, q, q) + 3.0 * B(q, h20)).astype(jnp.complex128))

    h31 = solve(2j * w * eye - A,
                (D(q, q, q, qb) + 3.0 * C(q, q, h11) + 3.0 * C(q, qb, h20)
                 + 3.0 * B(h20, h11) + B(qb, h30) + 3.0 * B(q, h21)
                 - 3.0 * g21 * h20).astype(jnp.complex128))

    h22 = solve(-A,
                (D(q, q, qb, qb) + 4.0 * C(q, qb, h11)
                 + C(qb, qb, h20) + C(q, q, jnp.conj(h20))
                 + 2.0 * B(h11, h11) + 2.0 * B(q, jnp.conj(h21))
                 + 2.0 * B(qb, h21) + B(jnp.conj(h20), h20)
                 - 2.0 * (g21 + jnp.conj(g21)) * h11
                 ).astype(jnp.complex128))

    g32 = ip(E(q, q, q, qb, qb)
             + D(q, q, q, jnp.conj(h20)) + 3.0 * D(q, qb, qb, h20)
             + 6.0 * D(q, q, qb, h11)
             + C(qb, qb, h30) + 3.0 * C(q, q, jnp.conj(h21))
             + 6.0 * C(q, qb, h21) + 3.0 * C(q, jnp.conj(h20), h20)
             + 6.0 * C(q, h11, h11) + 6.0 * C(qb, h20, h11)
             + 2.0 * B(qb, h31) + 3.0 * B(q, h22)
             + B(jnp.conj(h20), h30) + 3.0 * B(jnp.conj(h21), h20)
             + 6.0 * B(h11, h21))
    l1 = jnp.real(g21) / 2.0
    l2 = jnp.real(g32) / 12.0
    return l1, l2, g21, g32, w, q, p
