"""Codim-1 normal forms (ref src/NormalForms.jl).

Lyapunov–Schmidt reduction at simple branch points (1d kernel), Hopf first
Lyapunov coefficient, and Nd reductions.  The reference convention is kept
throughout: `inner(x, y) = sum(conj(x) * y)` (VI.inner) and the reduced
equations

    1d:   a01*dp + a02*dp^2/2 + b11*x*dp + b20*x^2/2 + b30*x^3/6
    Hopf: da = a*dp*z + b*z|z|^2   (b = first Lyapunov coefficient)

All linear algebra runs on flattened states; for matrix-free problems the
bordered solves can be swapped for `BorderingBLS(GMRES)`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import ravel
from ..detection.points import (Bautin, BifPoint, BranchPoint, Fold, Hopf,
                                NdBranchPoint, Pitchfork, Transcritical)
from ..linalg.bordered import MatrixBLS
from ..linalg.eig import dense_eig


# ---------------------------------------------------------------------------
# flat-space wrappers around the problem's derivative operators
# ---------------------------------------------------------------------------


class _FlatProblem:
    """View of a BifurcationProblem acting on the raveled state."""

    def __init__(self, prob, x0, parbif):
        self.prob = prob
        self.parbif = parbif
        self.flat0, self.unravel = ravel(x0)
        self.n = self.flat0.shape[0]

    def residual(self, params=None):
        par = self.parbif if params is None else params
        out = self.prob.residual(self.unravel(self.flat0), par)
        return ravel(out)[0]

    def residual_at_p(self, p):
        par = self.prob.set_lens_param(self.parbif, p)
        out = self.prob.residual(self.unravel(self.flat0), par)
        return ravel(out)[0]

    def jacobian(self):
        return self.prob.jacobian(self.unravel(self.flat0), self.parbif)

    def dF(self, v, params=None):
        par = self.parbif if params is None else params
        if np.iscomplexobj(v) or jnp.iscomplexobj(v):
            vr = jnp.real(v)
            vi = jnp.imag(v)
            out = (ravel(self.prob.dF(self.unravel(self.flat0), par,
                                      self.unravel(vr)))[0]
                   + 1j * ravel(self.prob.dF(self.unravel(self.flat0), par,
                                             self.unravel(vi)))[0])
            return out
        out = self.prob.dF(self.unravel(self.flat0), par, self.unravel(v))
        return ravel(out)[0]

    def d2F(self, v1, v2):
        if jnp.iscomplexobj(v1) or jnp.iscomplexobj(v2):
            out = self.prob.d2F_complex(
                self.unravel(self.flat0), self.parbif,
                self._unravel_c(v1), self._unravel_c(v2))
        else:
            out = self.prob.d2F(self.unravel(self.flat0), self.parbif,
                                self.unravel(v1), self.unravel(v2))
        return ravel(out)[0]

    def d3F(self, v1, v2, v3):
        if any(jnp.iscomplexobj(v) for v in (v1, v2, v3)):
            out = self.prob.d3F_complex(
                self.unravel(self.flat0), self.parbif,
                self._unravel_c(v1), self._unravel_c(v2),
                self._unravel_c(v3))
        else:
            out = self.prob.d3F(self.unravel(self.flat0), self.parbif,
                                self.unravel(v1), self.unravel(v2),
                                self.unravel(v3))
        return ravel(out)[0]

    def d4F(self, *vs):
        if any(jnp.iscomplexobj(v) for v in vs):
            out = self.prob.d4F_complex(
                self.unravel(self.flat0), self.parbif,
                *[self._unravel_c(v) for v in vs])
        else:
            out = self.prob.d4F(self.unravel(self.flat0), self.parbif,
                                *[self.unravel(v) for v in vs])
        return ravel(out)[0]

    def d5F(self, *vs):
        if any(jnp.iscomplexobj(v) for v in vs):
            out = self.prob.d5F_complex(
                self.unravel(self.flat0), self.parbif,
                *[self._unravel_c(v) for v in vs])
        else:
            out = self.prob.d5F(self.unravel(self.flat0), self.parbif,
                                *[self.unravel(v) for v in vs])
        return ravel(out)[0]

    def _unravel_c(self, v):
        re = self.unravel(jnp.real(v))
        im = self.unravel(jnp.imag(v))
        return jax.tree_util.tree_map(lambda a, b: a + 1j * b, re, im)

    # ---- host-side variants: complex splits in NUMPY, device work real ----
    # The axon TPU backend rejects complex linalg AND complex device->host
    # transfers; the normal-form layer is point-wise host mathematics, so
    # these keep every complex number on the host and send only REAL
    # directions through the device jets.

    def _d2F_real_np(self, a, b):
        # directions may arrive from an f32 stability sweep — the jets
        # need tangents at the primal dtype
        out = self.prob.d2F(self.unravel(self.flat0), self.parbif,
                            self.unravel(jnp.asarray(a, self.flat0.dtype)),
                            self.unravel(jnp.asarray(b, self.flat0.dtype)))
        return np.asarray(ravel(out)[0])

    def d2F_host(self, v1, v2):
        v1, v2 = np.asarray(v1), np.asarray(v2)
        if not (np.iscomplexobj(v1) or np.iscomplexobj(v2)):
            return self._d2F_real_np(v1, v2)
        rr = self._d2F_real_np(v1.real, v2.real)
        ii = self._d2F_real_np(v1.imag, v2.imag)
        ri = self._d2F_real_np(v1.real, v2.imag)
        ir = self._d2F_real_np(v1.imag, v2.real)
        return (rr - ii) + 1j * (ri + ir)

    def _d3F_real_np(self, a, b, c):
        out = self.prob.d3F(self.unravel(self.flat0), self.parbif,
                            self.unravel(jnp.asarray(a, self.flat0.dtype)),
                            self.unravel(jnp.asarray(b, self.flat0.dtype)),
                            self.unravel(jnp.asarray(c, self.flat0.dtype)))
        return np.asarray(ravel(out)[0])

    def d3F_host(self, v1, v2, v3):
        args = [np.asarray(v) for v in (v1, v2, v3)]
        if not any(np.iscomplexobj(v) for v in args):
            return self._d3F_real_np(*args)
        out = 0.0 + 0.0j
        for c1 in (0, 1):
            for c2 in (0, 1):
                for c3 in (0, 1):
                    parts = [a.imag if c else a.real
                             for c, a in zip((c1, c2, c3), args)]
                    out = out + (1j) ** (c1 + c2 + c3) \
                        * self._d3F_real_np(*parts)
        return out

    def dFdp_dir_host(self, v, p):
        v = np.asarray(v)
        v = v.astype(np.complex128 if np.iscomplexobj(v) else np.float64)
        if np.iscomplexobj(v):
            return (np.asarray(self.dFdp_dir(jnp.asarray(v.real), p))
                    + 1j * np.asarray(self.dFdp_dir(jnp.asarray(v.imag),
                                                    p)))
        return np.asarray(self.dFdp_dir(jnp.asarray(v), p))

    def dFdp_at(self, p):
        """Exact d/dp of the residual through the lens at x0."""
        def f(pp):
            par = self.prob.set_lens_param(self.parbif, pp)
            return ravel(self.prob.residual(self.unravel(self.flat0),
                                            par))[0]

        _, dp = jax.jvp(f, (jnp.asarray(p),), (jnp.asarray(1.0),))
        return dp

    def d2Fdp2_at(self, p):
        def df(pp):
            return self.dFdp_at(pp)

        _, d2 = jax.jvp(df, (jnp.asarray(p),), (jnp.asarray(1.0),))
        return d2

    def dFdp_dir(self, v, p):
        """d/dp [ J(x0, p) v ] — mixed derivative R11 applied to v."""
        if jnp.iscomplexobj(v):
            return (self.dFdp_dir(jnp.real(v), p)
                    + 1j * self.dFdp_dir(jnp.imag(v), p))

        def f(pp):
            par = self.prob.set_lens_param(self.parbif, pp)
            out = self.prob.dF(self.unravel(self.flat0), par, self.unravel(v))
            return ravel(out)[0]

        _, dp = jax.jvp(f, (jnp.asarray(p),), (jnp.asarray(1.0),))
        return dp


def _inner(x, y):
    """VI.inner convention: sum(conj(x) * y)."""
    return complex(jnp.sum(jnp.conj(x) * y))


def get_adjoint_basis(Lt, lam, nev: int = 10):
    """Left eigenvector for the eigenvalue closest to `lam`
    (ref get_adjoint_basis, src/NormalForms.jl:27-43)."""
    vals, vecs = dense_eig(Lt, with_vectors=True)
    vals_np = np.asarray(vals)
    idx = int(np.argmin(np.abs(vals_np - lam)))
    return np.asarray(vecs)[:, idx], vals_np[idx]


def null_basis_iter(Jd, Jtd, seed, gmres, iters: int = 3,
                    rayleigh_iters: int = 2):
    """Matrix-free (right, left) critical-eigenvector pair of a
    (near-)singular real operator by bordered inverse iteration: one
    extended bordered solve per sweep concentrates v onto the null
    direction (the extended operator is nonsingular), and re-anchoring
    converges quadratically.  When the point is only NEAR the singularity
    (bisection-located folds carry a residual), `rayleigh_iters` extra
    sweeps with the Rayleigh-quotient shift lock onto the EXACT eigenvector
    of the eigenvalue nearest zero (cubic convergence) — required for
    normal-form coefficients at the dense path's accuracy.  This is the
    PDE-scale replacement for `get_adjoint_basis`'s dense_eig of the
    transpose (ref src/NormalForms.jl:27-43; the reference uses its
    iterative eigensolver abstraction there) — Jᵀv comes for free from vjp.
    Returns (zeta, zeta_ad) with ||zeta|| = 1, ||zeta_ad|| = 1."""
    from ..codim2.minaug_mf import solve_bordered_ext

    # jitted sweeps: spectral preconditioners (DCT/FFT) cannot run EAGERLY
    # on the axon TPU backend (complex conversion primitives unimplemented
    # outside jit), and jit also fuses the whole inverse-iteration sweep
    @jax.jit
    def _sweep(a, b, lam):
        Js = lambda d: Jd(d) - lam * d      # noqa: E731
        Jts = lambda d: Jtd(d) - lam * d    # noqa: E731
        v, _, _ = solve_bordered_ext(Js, a, b, gmres)
        w, _, _ = solve_bordered_ext(Jts, b, a, gmres)
        return v / jnp.linalg.norm(v), w / jnp.linalg.norm(w)

    @jax.jit
    def _rayleigh(b):
        return jnp.dot(b, Jd(b))

    b = jnp.asarray(seed)
    b = b / jnp.linalg.norm(b)
    a = b
    zero = jnp.zeros(())
    for _ in range(iters):
        b, a = _sweep(a, b, zero)
    for _ in range(rayleigh_iters):
        lam = _rayleigh(b)               # ||b|| = 1
        b, a = _sweep(a, b, lam)
    return b, a


def _bifpoint_eigen(br, sp, which: Optional[int] = None):
    """Eigen-elements at a special point: prefer those stored on the point."""
    ind = sp.ind_ev if which is None else which
    ind = max(int(ind) - 1, 0)
    if sp.eigenvals is None:
        raise ValueError("special point carries no eigen-elements; rerun "
                         "continuation with detect_bifurcation >= 2")
    lam = sp.eigenvals[ind]
    zeta = None
    if sp.eigenvecs is not None:
        zeta = np.asarray(sp.eigenvecs)[:, ind]
    return lam, zeta, ind


# ---------------------------------------------------------------------------
# 1d kernel (ref get_normal_form1d, src/NormalForms.jl:189-357)
# ---------------------------------------------------------------------------


def get_normal_form1d(prob, br, ind_bif: int, verbose: bool = False,
                      tol_fold: float = 1e-3, bls=None,
                      matrix_free: bool = False, precond=None,
                      gmres_opts: Optional[dict] = None):
    """1d-kernel Lyapunov-Schmidt normal form (ref get_normal_form1d,
    src/NormalForms.jl:189-357).  With `matrix_free=True` nothing
    materializes the jacobian: (zeta, zeta*) come from bordered inverse
    iteration (vjp transpose) and the two bordered projections run
    preconditioned GMRES on the extended operator — the PDE-scale route the
    reference exercises at 15,100 dof (`get_normal_form(br, 19)`,
    ref examples/SH2d-fronts.jl:95)."""
    sp = br.specialpoint[ind_bif]
    if sp.type not in ("bp", "fold"):
        raise ValueError(f"point {ind_bif} is of type {sp.type!r}, not a "
                         "branch point with 1d kernel")
    p = sp.param
    parbif = prob.set_lens_param(br.prob.params if br.prob else prob.params,
                                 p)
    fp = _FlatProblem(prob, sp.x, parbif)

    try:
        lam, zeta, ind = _bifpoint_eigen(br, sp)
    except ValueError:
        # fold-by-monotony points carry no eigen-elements; the critical
        # eigenvalue is 0 by definition and zeta comes from the fallback
        # (dense_eig / bordered inverse iteration) below
        lam, zeta, ind = 0.0, None, 0
    lam = float(np.real(lam))

    if matrix_free:
        from ..codim2.minaug_mf import _make_ma_gmres, solve_bordered_ext

        if precond is None:
            precond = getattr(prob, "spectral_precond", None)
        gm = _make_ma_gmres(precond, fp.n, 1, gmres_opts)

        Jd = lambda d: fp.dF(d)          # noqa: E731 — flat matvec
        Jtd = lambda d: ravel(prob.dFt(  # noqa: E731
            fp.unravel(fp.flat0), parbif, fp.unravel(d)))[0]
        if zeta is None:
            rng = np.random.default_rng(17)
            seed = rng.standard_normal(fp.n)
        else:
            seed = np.real(np.asarray(zeta))
        # saved eigenvectors may be f32 (LOBPCG/Arnoldi compute_dtype
        # sweeps); the bordered iteration runs at the state dtype
        seed = np.asarray(seed, np.asarray(fp.flat0).dtype)
        zeta, zeta_ad = null_basis_iter(Jd, Jtd, jnp.asarray(seed), gm)
        L = None

        @jax.jit
        def _proj_solve(col, row, R, nb):
            # jitted: the spectral precond cannot run eagerly on axon
            return solve_bordered_ext(Jd, col, row, gm, rhs_top=R,
                                      rhs_bot=nb)

        def bls(Lop, col, row, dzp, R, nb, dotp=None):
            Psi, s, cv = _proj_solve(col, row, jnp.asarray(R),
                                     jnp.asarray(nb, R.dtype))
            return Psi, s, cv, jnp.array(0)
    else:
        bls = bls or MatrixBLS()
        L = fp.jacobian()
        if zeta is None:
            vals, vecs = dense_eig(L)
            vals_np = np.asarray(vals)
            ind = int(np.argmin(np.abs(vals_np.real)))
            zeta = np.asarray(vecs)[:, ind]
        zeta = jnp.asarray(np.real(np.asarray(zeta)))
        zeta = zeta / jnp.linalg.norm(zeta)

        # adjoint kernel basis
        zeta_ad, lam_ad = get_adjoint_basis(L.T, lam)
        zeta_ad = jnp.asarray(np.real(zeta_ad))
    inner_zz = _inner(zeta, zeta_ad)
    if abs(inner_zz) < 1e-10:
        raise RuntimeError("<zeta, zeta*> ~ 0; increase nev")
    zeta_ad = zeta_ad / np.real(inner_zz)

    def E(x):
        """Projection onto Range(L): x - <x, zeta*> zeta."""
        return x - jnp.real(jnp.sum(jnp.conj(x) * zeta_ad)) * zeta

    R01 = fp.dFdp_at(p)
    R02 = fp.d2Fdp2_at(p)
    a01 = _inner(R01, zeta_ad).real

    # Psi01 from bordered solve [L zeta*; zeta' 0][Psi; s] = [E(-R01); 0]
    Psi01, _, cv, _ = bls(L, jnp.asarray(zeta_ad), jnp.asarray(zeta), 0.0,
                          E(-R01), 0.0,
                          dotp=lambda x, y: jnp.vdot(x, y))

    R11 = fp.dFdp_dir(zeta, p)
    b11 = _inner(R11 + fp.d2F(zeta, Psi01), zeta_ad).real

    R11Psi = fp.dFdp_dir(Psi01, p)
    a02 = _inner(R02 + 2 * R11Psi + fp.d2F(Psi01, Psi01), zeta_ad).real

    b2v = fp.d2F(zeta, zeta)
    b20 = _inner(b2v, zeta_ad).real

    Psi20, _, cv, _ = bls(L, jnp.asarray(zeta_ad), jnp.asarray(zeta), 0.0,
                          E(-b2v), 0.0,
                          dotp=lambda x, y: jnp.vdot(x, y))
    b3v = fp.d3F(zeta, zeta, zeta) + 3 * fp.d2F(zeta, Psi20)
    b30 = _inner(b3v, zeta_ad).real

    nf = {"a01": a01, "a02": a02, "b11": b11, "b20": b20, "b30": b30,
          "Psi01": Psi01, "Psi20": Psi20}
    if verbose:
        print(f"normal form: a01={a01:.6g} a02={a02:.6g} b11={b11:.6g} "
              f"b20/2={b20/2:.6g} b30/6={b30/6:.6g}")

    common = dict(x0=fp.flat0, p=p, params=parbif, lens=prob.lens,
                  zeta=zeta, zeta_star=zeta_ad, nf=nf, prob=prob)
    tau = sp.tau
    if max(abs(a01), abs(b11)) > 1e-10:
        if abs(a01) < tol_fold:
            if 100 * abs(b20 / 2) < abs(b30 / 6):
                out = Pitchfork(**common)
            else:
                out = Transcritical(**common)
        else:
            out = Fold(**common)
    else:
        out = BranchPoint(**common)
    out.tau = tau
    out.unravel = fp.unravel
    return out


# ---------------------------------------------------------------------------
# Hopf (ref hopf_normal_form / __hopf_normal_form, src/NormalForms.jl:987-1205)
# ---------------------------------------------------------------------------


def hopf_normal_form(prob, br, ind_hopf: int, verbose: bool = False):
    sp = br.specialpoint[ind_hopf]
    if sp.type != "hopf":
        raise ValueError(f"point {ind_hopf} is not a Hopf point "
                         f"(type={sp.type!r})")
    lam, zeta, ind = _bifpoint_eigen(br, sp)
    # ensure omega > 0 convention
    if np.imag(lam) < 0:
        lam = np.conj(lam)
        zeta = None if zeta is None else np.conj(zeta)
    return hopf_normal_form_point(prob, sp.x, sp.param,
                                  omega=float(np.imag(lam)), zeta=zeta,
                                  tau=sp.tau, verbose=verbose)


def hopf_normal_form_point(prob, x, p, omega, zeta=None, tau=None,
                           verbose: bool = False):
    """Hopf normal form from a raw point (x, p, omega) — the core used both
    for branch special points and for points ON a codim-2 Hopf curve
    (ref hopf_normal_form, src/NormalForms.jl:987-1205; the from-curve use is
    continuation(br_hopf, ind, ...) at src/periodicorbit/PeriodicOrbits.jl)."""
    # every complex operation below runs in NUMPY on the host: the axon
    # TPU backend has no complex linalg and cannot transfer complex
    # arrays; only REAL directions go through the device jets
    parbif = prob.set_lens_param(prob.params, p)
    fp = _FlatProblem(prob, x, parbif)
    L = np.asarray(fp.jacobian(), dtype=np.float64)

    lam = 1j * omega
    if zeta is None:
        vals_np, vecs_np = np.linalg.eig(L)
        ind = int(np.argmin(np.abs(vals_np - lam)))
        lam_found = vals_np[ind]
        zeta = vecs_np[:, ind]
        if np.imag(lam_found) < 0:
            zeta = np.conj(zeta)
    zeta = np.asarray(zeta, dtype=np.complex128)
    zeta = zeta / np.linalg.norm(zeta)

    valsT, vecsT = np.linalg.eig(L.T)
    zeta_ad = vecsT[:, int(np.argmin(np.abs(valsT - np.conj(lam))))]
    # normalize: dot(zeta, zeta_ad) = sum(conj(zeta) zeta_ad) = 1
    zeta_ad = zeta_ad / np.sum(np.conj(zeta) * zeta_ad)

    czeta = np.conj(zeta)
    ls = np.linalg.solve

    R2 = lambda a, b: fp.d2F_host(a, b) / 2.0
    R3 = lambda a, b, c: fp.d3F_host(a, b, c) / 6.0

    R01 = np.asarray(fp.dFdp_at(p))
    Psi001 = ls(L, -R01)

    av = fp.dFdp_dir_host(zeta, p) + 2.0 * R2(zeta, Psi001)
    a = complex(np.sum(np.conj(av) * zeta_ad))

    # (2 i omega - L) Psi200 = R20(zeta, zeta)
    n = fp.n
    R20 = R2(zeta, zeta)
    A200 = 2j * omega * np.eye(n) - L.astype(np.complex128)
    Psi200 = ls(A200, R20.astype(np.complex128))

    R20b = 2.0 * R2(zeta, czeta)
    # -L Psi110 = 2 R2(zeta, conj zeta); rhs is real
    Psi110 = ls(-L.astype(np.complex128), R20b.astype(np.complex128))

    bv = 2.0 * R2(zeta, Psi110) + 2.0 * R2(czeta, Psi200) \
        + 3.0 * R3(zeta, zeta, czeta)
    b = complex(np.sum(np.conj(bv) * zeta_ad))

    if verbose:
        print(f"Hopf normal form: a={a:.6g}, b={b:.6g} "
              f"({'supercritical' if b.real < 0 else 'subcritical'})")

    hp = Hopf(x0=fp.flat0, p=p, params=parbif, lens=prob.lens, zeta=zeta,
              zeta_star=zeta_ad, omega=omega, prob=prob,
              nf={"a": a, "b": b, "Psi001": Psi001, "Psi110": Psi110,
                  "Psi200": Psi200})
    hp.subtype = ("SuperCritical" if b.real < 0 else
                  "SubCritical" if b.real > 0 else "Singular")
    hp.tau = tau
    hp.unravel = fp.unravel
    return hp


# ---------------------------------------------------------------------------
# predictors (ref predictor(...), src/NormalForms.jl:389-536, 1227-1282)
# ---------------------------------------------------------------------------


def predictor(bp, ds: float, verbose: bool = False, ampfactor: float = 1.0):
    if isinstance(bp, Transcritical):
        nf = bp.nf
        pnew = bp.p + ds
        amp = -2 * ds * nf["b11"] / nf["b20"] * ampfactor
        if amp == 0:
            amp = abs(ds)
        x1 = bp.x0 + amp * jnp.real(bp.zeta) - ds * nf["Psi01"]
        xm1 = bp.x0 - amp * jnp.real(bp.zeta) + ds * nf["Psi01"]
        return {"x0": bp.x0, "x1": x1, "xm1": xm1, "p": pnew,
                "pm1": bp.p - ds, "amp": amp, "dsfactor": 1.0}
    if isinstance(bp, Pitchfork):
        nf = bp.nf
        dsfactor = 1.0 if nf["b11"] * nf["b30"] < 0 else -1.0
        amp = ampfactor * np.sqrt(max(-6 * abs(ds) * dsfactor * nf["b11"]
                                      / nf["b30"], 0.0))
        if amp == 0:
            amp = abs(ds)
        pnew = bp.p + abs(ds) * dsfactor
        x1 = bp.x0 + amp * jnp.real(bp.zeta)
        return {"x0": bp.x0, "x1": x1, "p": pnew, "amp": amp,
                "dsfactor": dsfactor, "dp": pnew - bp.p}
    if isinstance(bp, Hopf):
        return hopf_predictor(bp, ds, verbose=verbose, ampfactor=ampfactor)
    if isinstance(bp, Fold):
        return None
    if isinstance(bp, BranchPoint):
        # generic quadratic normal form: find zero directions of the reduced
        # equation on a circle of radius |ds| (ref _predictor, :495-536)
        nf = bp.nf
        ads = abs(ds)

        def g(x, pp):
            return ((nf["a01"] + nf["a02"] * pp / 2) * pp
                    + (nf["b11"] * pp + nf["b20"] * x / 2
                       + nf["b30"] * x ** 2 / 6) * x)

        thetas = np.linspace(0, 2 * np.pi, 100_000)
        vals = g(ads * np.cos(thetas), ads * np.sin(thetas))
        sign_flips = np.where(np.sign(vals[1:]) * np.sign(vals[:-1]) < 0)[0]
        if len(sign_flips) == 0:
            return None
        # pick the direction least aligned with the current branch tangent
        tau = bp.tau
        best, best_dot = None, np.inf
        for i in sign_flips:
            c, s = ads * np.cos(thetas[i]), ads * np.sin(thetas[i])
            tau_u_flat, _ = ravel(tau.u)
            d = abs(float(jnp.real(jnp.vdot(tau_u_flat, bp.zeta))) * c
                    + s * float(tau.p))
            if d < best_dot:
                best_dot, best = d, (c, s)
        c, s = best
        pnew = bp.p + s
        x1 = bp.x0 + c * jnp.real(bp.zeta)
        return {"x0": bp.x0, "x1": x1, "p": pnew, "amp": c, "dsfactor": 1.0}
    raise TypeError(f"no predictor for {type(bp)}")


def hopf_predictor(hp: Hopf, ds: float, verbose: bool = False,
                   ampfactor: float = 1.0):
    """Second-order periodic-orbit guess from the Hopf normal form
    (ref predictor(hp::Hopf, ds), src/NormalForms.jl:1227-1282)."""
    nf = hp.nf
    a, b = nf["a"], nf["b"]
    dsfactor = 1 if a.real * b.real < 0 else -1
    dsnew = abs(ds) * dsfactor
    pnew = hp.p + dsnew
    amp = ampfactor * np.sqrt(max(-dsnew * a.real / b.real, 0.0))
    omega = hp.omega + (a.imag - b.imag * a.real / b.real) * dsnew

    Psi001 = nf["Psi001"]
    Psi110 = nf["Psi110"]
    Psi200 = nf["Psi200"]

    def orbit(t):
        # complex combination in numpy (host): complex device arrays are
        # unsupported on the axon TPU backend
        A = amp * np.exp(1j * t)
        return (np.asarray(hp.x0)
                + 2 * np.real(np.asarray(hp.zeta) * A)
                + dsnew * np.real(np.asarray(Psi001))
                + abs(A) ** 2 * np.real(np.asarray(Psi110))
                + 2 * np.real(A ** 2 * np.asarray(Psi200)))

    return {"orbit": orbit, "amp": 2 * amp, "omega": omega,
            "period": abs(2 * np.pi / omega), "p": pnew,
            "dsfactor": dsfactor, "dp": dsnew}


# ---------------------------------------------------------------------------
# dispatcher (ref get_normal_form, src/NormalForms.jl:130-177)
# ---------------------------------------------------------------------------


def get_normal_form(br, ind_bif: int, prob=None, verbose: bool = False,
                    **kwargs):
    gamma = getattr(br, "gamma", br)
    prob = prob or gamma.prob
    # periodic-orbit branches dispatch to the Poincare-return-map route
    # (ref get_normal_form for PO branches, periodicorbit/NormalForms.jl)
    if hasattr(prob, "disc"):
        from ..periodic.normal_forms import get_normal_form_po

        return get_normal_form_po(br, ind_bif, verbose=verbose)
    br = gamma
    sp = br.specialpoint[ind_bif]
    if sp.type == "hopf":
        return hopf_normal_form(prob, br, ind_bif, verbose=verbose)
    if sp.type in ("bp", "fold", "nd"):
        from .codim1_nd import get_normal_form_nd

        if abs(sp.delta[0]) > 1 or sp.type == "nd":
            return get_normal_form_nd(prob, br, ind_bif, verbose=verbose)
        return get_normal_form1d(prob, br, ind_bif, verbose=verbose, **kwargs)
    raise ValueError(f"no normal form available for point type {sp.type!r}")
