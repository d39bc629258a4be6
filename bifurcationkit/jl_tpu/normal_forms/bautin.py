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


def bautin_normal_form(prob, x0, params, verbose: bool = False,
                       matrix_free: bool = False, precond=None,
                       gmres_opts=None, omega=None, seed=None):
    """Second Lyapunov coefficient at a (near-)degenerate Hopf point.

    The whole computation (jets up to 5th order, solves, eigs via host
    callbacks) is jitted once per problem and cached — repeated evaluations
    along a curve are then single dispatches.

    `matrix_free=True` is the PDE-scale route (the reference computes the
    same objects through its solver abstraction,
    src/codim2/NormalForms.jl:642-958): (q, p) by complex bordered inverse
    iteration near i*omega, every h-solve through the real-embedded
    shifted operator (sigma in {0, 2iw, 3iw}) and the resonant h21 through
    the complex bordered extended solve — nothing materializes."""
    from ..core.state import ravel as _ravel

    if matrix_free:
        xf, _ = _ravel(x0)
        l1, l2, g21, g32, w, q, p = _bautin_core_mf(
            prob, x0, params, precond=precond, gmres_opts=gmres_opts,
            omega=omega, seed=seed)
    else:
        core = getattr(prob, "_bautin_core", None)
        if core is None:
            core = jax.jit(lambda xf, par: _bautin_core(prob, xf, par))
            object.__setattr__(prob, "_bautin_core", core)
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


def _bautin_core_mf(prob, x0, params, precond=None, gmres_opts=None,
                    omega=None, seed=None):
    """Matrix-free Bautin core: identical formulas to `_bautin_core`, every
    linear solve routed through the preconditioned iterative closures of
    the codim-2 unfolding kit (ref the reference's solver-abstraction
    realization, src/codim2/NormalForms.jl:642-958):

      (q, p, w)            complex bordered inverse iteration near i*omega
      (sigma I - A)^-1     real-embedded shifted GMRES (sigma = 0, 2iw, 3iw)
      resonant h21         complex bordered extended solve with borders
                           (q, p):  [iw - A, q; p^H, 0][h; s] = [rhs; 0]
                           == cplx-bordered (A - iw) applied to -rhs
    """
    from ..codim2.minaug_mf import solve_bordered_ext_cplx
    from ..codim2.unfolding import (_dot, _estimate_hopf_omega,
                                    _make_solveC, _mf_hopf_pair,
                                    _mf_solver_set)

    fp = _FlatProblem(prob, x0, params)
    n = fp.n
    Jd, Jtd, gm1, gm2, gm2n = _mf_solver_set(fp, prob, params, precond,
                                             gmres_opts)
    if omega is None:
        omega = _estimate_hopf_omega(fp, Jd)
    q, p, w = _mf_hopf_pair(fp, Jd, Jtd, gm2, omega, seed=seed)
    solveC = _make_solveC(Jd, gm2n, n)

    qb = np.conj(q)
    _C = np.complex128
    B = lambda a, b: np.asarray(fp.d2F(jnp.asarray(a), jnp.asarray(b)))
    C = lambda a, b, c: np.asarray(fp.d3F(jnp.asarray(a), jnp.asarray(b),
                                          jnp.asarray(c)))
    D = lambda a, b, c, d: np.asarray(fp.d4F(jnp.asarray(a), jnp.asarray(b),
                                             jnp.asarray(c), jnp.asarray(d)))
    E = lambda a, b, c, d, e: np.asarray(fp.d5F(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d),
        jnp.asarray(e)))

    def ip(vec):
        return _dot(p, vec)

    h20 = solveC(2j * w, B(q, q))
    h11 = solveC(0.0, B(q, qb))

    rhs21 = C(q, q, qb) + B(qb, h20) + 2.0 * B(q, h11)
    g21 = ip(rhs21)

    # resonant bordered solve: [iw - A, q; p^H, 0][h21; s] = [rhs; 0]
    # multiplied by -1 on the top row this is the (A - iw) complex
    # bordered extended operator with top RHS -rhs (Omega = -w)
    qr_, qi_ = jnp.asarray(np.real(q)), jnp.asarray(np.imag(q))
    pr_, pi_ = jnp.asarray(np.real(p)), jnp.asarray(np.imag(p))
    wj = jnp.asarray(w)

    @jax.jit
    def _res(tr, ti):
        vr, vi, _, _, _ = solve_bordered_ext_cplx(
            Jd, -wj, qr_, qi_, pr_, pi_, gm2, rhs_top=(tr, ti))
        return vr, vi

    rhs_h21 = -(rhs21 - g21 * q).astype(_C)
    vr, vi = _res(jnp.asarray(rhs_h21.real), jnp.asarray(rhs_h21.imag))
    h21 = np.asarray(vr) + 1j * np.asarray(vi)

    h30 = solveC(3j * w, C(q, q, q) + 3.0 * B(q, h20))

    h31 = solveC(2j * w,
                 D(q, q, q, qb) + 3.0 * C(q, q, h11) + 3.0 * C(q, qb, h20)
                 + 3.0 * B(h20, h11) + B(qb, h30) + 3.0 * B(q, h21)
                 - 3.0 * g21 * h20)

    h22 = solveC(0.0,
                 D(q, q, qb, qb) + 4.0 * C(q, qb, h11)
                 + C(qb, qb, h20) + C(q, q, np.conj(h20))
                 + 2.0 * B(h11, h11) + 2.0 * B(q, np.conj(h21))
                 + 2.0 * B(qb, h21) + B(np.conj(h20), h20)
                 - 2.0 * (g21 + np.conj(g21)) * h11)

    g32 = ip(E(q, q, q, qb, qb)
             + D(q, q, q, np.conj(h20)) + 3.0 * D(q, qb, qb, h20)
             + 6.0 * D(q, q, qb, h11)
             + C(qb, qb, h30) + 3.0 * C(q, q, np.conj(h21))
             + 6.0 * C(q, qb, h21) + 3.0 * C(q, np.conj(h20), h20)
             + 6.0 * C(q, h11, h11) + 6.0 * C(qb, h20, h11)
             + 2.0 * B(qb, h31) + 3.0 * B(q, h22)
             + B(np.conj(h20), h30) + 3.0 * B(np.conj(h21), h20)
             + 6.0 * B(h11, h21))
    l1 = np.real(g21) / 2.0
    l2 = np.real(g32) / 12.0
    return l1, l2, complex(g21), complex(g32), w, q, p
