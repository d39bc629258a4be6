"""Normal forms for fixed points of maps: period-doubling (flip) and
Neimark-Sacker (ref src/NormalForms.jl:1295-1635; coefficients follow
Kuznetsov, Elements of Applied Bifurcation Theory, §5.4).

`prob` holds the map G(x, params); the bifurcating fixed point satisfies
G(x0) = x0 with multiplier -1 (PD) or exp(i theta0) (NS).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..detection.points import NeimarkSacker, PeriodDoubling
from ..linalg.eig import dense_eig
from .codim1 import _FlatProblem, _inner


def _map_eigen(fp, which):
    A = fp.jacobian()
    vals, vecs = dense_eig(A)
    vals_np = np.asarray(vals)
    if which == "pd":
        i0 = int(np.argmin(np.abs(vals_np + 1.0)))
    else:
        cand = np.where(vals_np.imag > 1e-10)[0]
        if len(cand) == 0:
            raise RuntimeError("no complex multiplier found for NS")
        i0 = cand[np.argmin(np.abs(np.abs(vals_np[cand]) - 1.0))]
    lam = vals_np[i0]
    q = jnp.asarray(np.asarray(vecs)[:, i0])
    q = q / jnp.linalg.norm(q)
    valsT, vecsT = dense_eig(A.T)
    iT = int(np.argmin(np.abs(np.asarray(valsT) - np.conj(lam))))
    p = jnp.asarray(np.asarray(vecsT)[:, iT])
    p = p / _inner(q, p)
    return A, lam, q, p


def period_doubling_nf(prob, x0, params, verbose: bool = False):
    """Flip normal form coefficient c: the restricted map reads
    xi -> -xi + c xi^3 (ref PeriodDoubling NF for maps,
    src/NormalForms.jl:1295).

    MAP convention: c > 0 => supercritical.  Second iterate
    xi -> (1+2d)xi - 2c xi^3 for multiplier mu = -(1+d), so the 2-cycle
    xi^2 = d/c exists (and is stable) on the unstable side d > 0 iff c > 0.
    NOTE this is OPPOSITE to the Iooss flow-normal-form convention
    (periodic.normal_forms.period_doubling_iooss: b3 < 0 supercritical);
    both vanish together at a GPD point."""
    fp = _FlatProblem(prob, x0, params)
    A, lam, q, p = _map_eigen(fp, "pd")
    n = fp.n
    q = jnp.real(q)
    q = q / jnp.linalg.norm(q)
    p = jnp.real(p)
    p = p / jnp.real(_inner(q, p))

    B = lambda a, b: fp.d2F(a, b)
    C = lambda a, b, c: fp.d3F(a, b, c)

    Bqq = B(q, q)
    h2 = jnp.linalg.solve(jnp.eye(n) - A, Bqq)
    cv = C(q, q, q) + 3.0 * B(q, h2)
    c = float(jnp.real(_inner(cv, p))) / 6.0
    pt = PeriodDoubling(x0=fp.flat0, p=None, params=params, lens=prob.lens,
                        zeta=q, zeta_star=p, nf={"c": c, "mu": lam},
                        prob=prob)
    pt.subtype = "SuperCritical" if c > 0 else "SubCritical"
    if verbose:
        print(f"PD normal form: c = {c:.6g} ({pt.subtype})")
    return pt


def neimark_sacker_nf(prob, x0, params, verbose: bool = False):
    """NS first Lyapunov coefficient d (ref NS NF for maps,
    src/NormalForms.jl:1386; Kuznetsov (5.87)):
    d = Re[e^{-i th} <p, C(q,q,qbar)/2 + B(qbar,(I-A)^{-1}B(q,q)...)>]."""
    fp = _FlatProblem(prob, x0, params)
    A, lam, q, p = _map_eigen(fp, "ns")
    theta = float(np.angle(lam))
    n = fp.n
    Ac = A.astype(jnp.complex128)
    eye = jnp.eye(n, dtype=jnp.complex128)

    B = lambda a, b: fp.d2F(a, b)
    C = lambda a, b, c: fp.d3F(a, b, c)
    qb = jnp.conj(q)

    h20 = jnp.linalg.solve(np.exp(2j * theta) * eye - Ac,
                           B(q, q).astype(jnp.complex128))
    h11 = jnp.linalg.solve(eye - Ac, B(q, qb).astype(jnp.complex128))
    gv = (C(q, q, qb) + 2.0 * B(q, h11) + B(qb, h20))
    g21 = _inner(gv, p) / 2.0
    d = float(np.real(np.exp(-1j * theta) * np.conj(g21)))
    # note: with VI.inner-style conjugation, <p, v> = conj(inner(v, p))
    pt = NeimarkSacker(x0=fp.flat0, p=None, params=params, lens=prob.lens,
                       zeta=q, zeta_star=p, omega=theta,
                       nf={"d": d, "mu": lam, "g21": g21}, prob=prob)
    pt.subtype = "SuperCritical" if d < 0 else "SubCritical"
    if verbose:
        print(f"NS normal form: d = {d:.6g}, theta = {theta:.6g} "
              f"({pt.subtype})")
    return pt
