"""Zero-Hopf and Hopf-Hopf normal-form coefficients
(ref src/codim2/NormalForms.jl:959-1574; Kuznetsov §8.5-8.6).

Quadratic coefficients of the reduced systems on the center manifold:

ZH (eigenvalues {0, +-i w}; q0 real null vector, q1 Hopf eigenvector):
    x' = 1/2 G200 x^2 + G011 |z|^2 + ...
    z' = i w z + G110 x z + ...
    G200 = <p0, B(q0, q0)>,  G011 = <p0, B(q1, conj q1)>,
    G110 = <p1, B(q0, q1)>

HH (eigenvalues {+-i w1, +-i w2}; q1, q2 the two Hopf eigenvectors):
    cubic cross/self coefficients via the standard h-solves:
    z1' = i w1 z1 + z1 (G2100 |z1|^2 + G1011 |z2|^2) + ...
    z2' = i w2 z2 + z2 (G1110 |z1|^2 + G0021 |z2|^2) + ...
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..detection.points import HopfHopf, ZeroHopf
from ..linalg.eig import dense_eig
from ..normal_forms.codim1 import _FlatProblem


def _pair(A, target):
    """(eigenvalue, right vec, left vec normalized <p,q>=1) nearest target."""
    vals, vecs = dense_eig(A)
    vals_np = np.asarray(vals)
    i0 = int(np.argmin(np.abs(vals_np - target)))
    lam = vals_np[i0]
    q = jnp.asarray(np.asarray(vecs)[:, i0])
    q = q / jnp.linalg.norm(q)
    valsT, vecsT = dense_eig(A.T)
    iT = int(np.argmin(np.abs(np.asarray(valsT) - np.conj(lam))))
    p = jnp.asarray(np.asarray(vecsT)[:, iT])
    T = complex(jnp.sum(jnp.conj(p) * q))
    p = p / np.conj(T)
    return lam, q, p


def zh_normal_form(prob, x0, params, verbose: bool = False,
                   matrix_free: bool = False, precond=None,
                   gmres_opts=None, omega=None, seed=None):
    """Quadratic ZH coefficients (ref ZH NF, src/codim2/NormalForms.jl:959).

    `matrix_free=True` computes the (q0, p0) null pair and the (q1, p1)
    Hopf pair by bordered inverse iteration (the `_zh_basis_mf` kit of the
    detailed unfolding) — the quadratic G's are then pure AD projections,
    no solves; the PDE-scale route for ZH points on MF MA curves."""
    fp = _FlatProblem(prob, x0, params)
    if matrix_free:
        from .unfolding import _zh_basis_mf

        q0n, p0n, q1n, p1n, w, _, _, _ = _zh_basis_mf(
            fp, prob, params, precond=precond, gmres_opts=gmres_opts,
            omega=omega, seed=seed)
        q0, p0 = jnp.asarray(q0n), jnp.asarray(p0n)
        q1, p1 = jnp.asarray(q1n), jnp.asarray(p1n)
        B = lambda a, b: fp.d2F(a, b)
        G200 = float(jnp.real(jnp.dot(p0, B(q0, q0))))
        G011 = float(jnp.real(jnp.sum(
            jnp.conj(p0.astype(jnp.complex128)) * B(q1, jnp.conj(q1)))))
        G110 = complex(jnp.sum(jnp.conj(p1) * B(q0, q1)))
        pt = ZeroHopf(x0=fp.flat0, p=None, params=params, lens=prob.lens,
                      zeta=(q0, q1), zeta_star=(p0, p1), omega=w,
                      nf={"G200": G200, "G011": G011, "G110": G110},
                      prob=prob)
        if verbose:
            print(f"ZH NF (mf): G200={G200:.6g} G011={G011:.6g} "
                  f"G110={G110:.6g} omega={w:.6g}")
        return pt
    A = fp.jacobian()
    # zero eigenvalue pair
    lam0, q0c, p0c = _pair(A.astype(jnp.complex128), 0.0 + 0.0j)
    q0 = jnp.real(q0c)
    q0 = q0 / jnp.linalg.norm(q0)
    p0 = jnp.real(p0c)
    p0 = p0 / jnp.dot(p0, q0)
    # Hopf pair
    vals = np.asarray(dense_eig(A)[0])
    cand = vals[vals.imag > 1e-8]
    if len(cand) == 0:
        raise RuntimeError("no Hopf pair at the ZH candidate")
    lamH = cand[np.argmin(np.abs(cand.real))]
    _, q1, p1 = _pair(A.astype(jnp.complex128), lamH)
    w = float(np.imag(lamH))

    B = lambda a, b: fp.d2F(a, b)
    G200 = float(jnp.real(jnp.dot(p0, B(q0, q0))))
    G011 = float(jnp.real(jnp.sum(jnp.conj(p0.astype(jnp.complex128))
                                  * B(q1, jnp.conj(q1)))))
    G110 = complex(jnp.sum(jnp.conj(p1) * B(q0, q1)))

    pt = ZeroHopf(x0=fp.flat0, p=None, params=params, lens=prob.lens,
                  zeta=(q0, q1), zeta_star=(p0, p1), omega=w,
                  nf={"G200": G200, "G011": G011, "G110": G110}, prob=prob)
    if verbose:
        print(f"ZH NF: G200={G200:.6g} G011={G011:.6g} G110={G110:.6g} "
              f"omega={w:.6g}")
    return pt


def hh_normal_form(prob, x0, params, verbose: bool = False):
    """Cubic HH coefficients (ref HH NF, src/codim2/NormalForms.jl:1315):
    z1' = i w1 z1 + z1 (G2100 |z1|^2 + G1011 |z2|^2) + ...
    z2' = i w2 z2 + z2 (G1110 |z1|^2 + G0021 |z2|^2) + ...
    in the basis with ||q_k|| = 1, <p_k, q_k> = 1 and w1 < w2.

    Individual G's rescale with the eigenvector amplitudes (the reference's
    gold asserts are commented out for the same reason, testNF.jl:690-693);
    the Kuznetsov classification invariants are basis-free and validated on
    the constructed normal form: delta = Re G1110 / Re G2100,
    theta = Re G1011 / Re G0021, and the signs of Re G2100, Re G0021."""
    fp = _FlatProblem(prob, x0, params)
    A = fp.jacobian()
    n = fp.n
    vals = np.asarray(dense_eig(A)[0])
    cand = vals[vals.imag > 1e-8]
    if len(cand) < 2:
        raise RuntimeError("need two Hopf pairs at an HH candidate")
    # the two pairs closest to the imaginary axis, ordered w1 < w2
    order = np.argsort(np.abs(cand.real))[:2]
    pair = cand[order]
    pair = pair[np.argsort(pair.imag)]
    lam1, lam2 = pair[0], pair[1]
    if abs(lam1.imag - lam2.imag) < 1e-10:
        raise RuntimeError("the two Hopf pairs coincide")
    _, q1, p1 = _pair(A.astype(jnp.complex128), lam1)
    _, q2, p2 = _pair(A.astype(jnp.complex128), lam2)
    w1, w2 = float(lam1.imag), float(lam2.imag)

    Ac = A.astype(jnp.complex128)
    eye = jnp.eye(n, dtype=jnp.complex128)
    B = lambda a, b: fp.d2F(a, b)
    C = lambda a, b, c: fp.d3F(a, b, c)
    solve = jnp.linalg.solve

    def ip(p, v):
        return complex(jnp.sum(jnp.conj(p) * v))

    # second-order h-solves (all non-resonant for w1 != w2, w1 != 3 w2 etc.)
    h1100 = solve(-Ac, B(q1, jnp.conj(q1)))
    h0011 = solve(-Ac, B(q2, jnp.conj(q2)))
    h2000 = solve(2j * w1 * eye - Ac, B(q1, q1))
    h0020 = solve(2j * w2 * eye - Ac, B(q2, q2))
    h1010 = solve(1j * (w1 + w2) * eye - Ac, B(q1, q2))
    h1001 = solve(1j * (w1 - w2) * eye - Ac, B(q1, jnp.conj(q2)))

    # resonant projections (monomial bookkeeping: h_{z1 zb2} = h1001, so the
    # z1 z2 zb2 products are B(q2, h1001), B(qb2, h1010), B(q1, h0011))
    G2100 = ip(p1, C(q1, q1, jnp.conj(q1)) + B(jnp.conj(q1), h2000)
               + 2.0 * B(q1, h1100)) / 2.0
    G1011 = ip(p1, C(q1, q2, jnp.conj(q2)) + B(q1, h0011)
               + B(q2, h1001) + B(jnp.conj(q2), h1010))
    G1110 = ip(p2, C(q2, q1, jnp.conj(q1)) + B(q2, h1100)
               + B(q1, jnp.conj(h1001)) + B(jnp.conj(q1), h1010))
    G0021 = ip(p2, C(q2, q2, jnp.conj(q2)) + B(jnp.conj(q2), h0020)
               + 2.0 * B(q2, h0011)) / 2.0

    pt = HopfHopf(x0=fp.flat0, p=None, params=params, lens=prob.lens,
                  zeta=(q1, q2), zeta_star=(p1, p2),
                  omega1=w1, omega2=w2,
                  nf={"G2100": G2100, "G1011": G1011, "G1110": G1110,
                      "G0021": G0021}, prob=prob)
    if verbose:
        print(f"HH NF: G2100={G2100:.6g} G0021={G0021:.6g} "
              f"G1011={G1011:.6g} G1110={G1110:.6g}")
    return pt
