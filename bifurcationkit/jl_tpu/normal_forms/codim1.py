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


def hopf_null_basis_iter(Jd, Jtd, omega, seed_r, seed_i, gm2,
                         iters: int = 3, rayleigh_iters: int = 2):
    """Matrix-free (right, left) eigenvector pair of a real operator J at
    the complex eigenvalue nearest ``i*omega`` by bordered inverse
    iteration in the real embedding: each sweep solves the extended
    bordered systems [J - (alpha + i om) I, a; b^H, 0][v; s] = [0; 1]
    (forward) and its adjoint — nonsingular even where J - i om I is
    exactly singular — then re-anchors; `rayleigh_iters` extra sweeps with
    the complex Rayleigh-quotient shift lock onto the EXACT pair (cubic
    convergence), refining omega along the way.  The PDE-scale replacement
    for the dense path's two `np.linalg.eig` calls (ref the reference
    computing the same pair through its eigensolver abstraction,
    src/NormalForms.jl:1009-1064).

    Returns (zr, zi, wr, wi, alpha, omega_ref): zeta = zr + i*zi (right,
    ||zeta|| = 1), w = wr + i*wi (left, ||w|| = 1, UNnormalized against
    zeta), and the refined eigenvalue alpha + i*omega_ref (omega_ref > 0)."""
    from ..codim2.minaug_mf import solve_bordered_ext_cplx

    # jitted sweeps: spectral preconditioners cannot run eagerly on the
    # axon TPU backend, and jit fuses the paired bordered solves
    @jax.jit
    def _sweep(ar, ai, br_, bi, alpha, om):
        Js = lambda d: Jd(d) - alpha * d     # noqa: E731
        Jts = lambda d: Jtd(d) - alpha * d   # noqa: E731
        vr, vi, _, _, _ = solve_bordered_ext_cplx(Js, -om, ar, ai, br_, bi,
                                                  gm2)
        wr, wi, _, _, _ = solve_bordered_ext_cplx(Jts, om, br_, bi, ar, ai,
                                                  gm2)
        nv = jnp.sqrt(jnp.dot(vr, vr) + jnp.dot(vi, vi))
        nw = jnp.sqrt(jnp.dot(wr, wr) + jnp.dot(wi, wi))
        return vr / nv, vi / nv, wr / nw, wi / nw

    @jax.jit
    def _rayleigh(zr, zi):
        # lambda = z^H J z with ||z|| = 1  (J real)
        Jzr, Jzi = Jd(zr), Jd(zi)
        al = jnp.dot(zr, Jzr) + jnp.dot(zi, Jzi)
        om = jnp.dot(zr, Jzi) - jnp.dot(zi, Jzr)
        return al, om

    zr = jnp.asarray(seed_r)
    zi = jnp.asarray(seed_i)
    nrm = jnp.sqrt(jnp.dot(zr, zr) + jnp.dot(zi, zi))
    zr, zi = zr / nrm, zi / nrm
    ar, ai = zr, zi
    alpha = jnp.zeros(())
    om = jnp.asarray(omega, zr.dtype)
    for _ in range(iters):
        zr, zi, ar, ai = _sweep(ar, ai, zr, zi, alpha, om)
    for _ in range(rayleigh_iters):
        alpha, om = _rayleigh(zr, zi)
        if float(om) < 0:
            # omega > 0 convention: conjugate the iterate
            zi, ai, om = -zi, -ai, -om
        zr, zi, ar, ai = _sweep(ar, ai, zr, zi, alpha, om)
    alpha, om_ref = _rayleigh(zr, zi)
    if float(om_ref) < 0:
        zr, zi, ar, ai = zr, -zi, ar, -ai
        om_ref = -om_ref
    return zr, zi, ar, ai, float(alpha), float(om_ref)


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


def hopf_normal_form(prob, br, ind_hopf: int, verbose: bool = False,
                     **kwargs):
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
                                  tau=sp.tau, verbose=verbose, **kwargs)


def hopf_normal_form_point(prob, x, p, omega, zeta=None, tau=None,
                           verbose: bool = False,
                           matrix_free: bool = False, precond=None,
                           gmres_opts: Optional[dict] = None,
                           low_dtype="auto",
                           eig_iters: int = 3, rayleigh_iters: int = 2):
    """Hopf normal form from a raw point (x, p, omega) — the core used both
    for branch special points and for points ON a codim-2 Hopf curve
    (ref hopf_normal_form, src/NormalForms.jl:987-1205; the from-curve use is
    continuation(br_hopf, ind, ...) at src/periodicorbit/PeriodicOrbits.jl).

    With `matrix_free=True` NOTHING materializes the jacobian — the PDE-scale
    route the reference takes through its linear-solver abstraction (the
    shifted solve `ls(L, R20; a0=2im*omega, a1=-1)` and the iterative
    eigensolves, ref src/NormalForms.jl:1009-1100): (zeta, zeta*) come from
    complex bordered inverse iteration (`hopf_null_basis_iter`, vjp
    transpose), Psi001/Psi110 run preconditioned GMRES on J / -J, Psi200
    the real-embedded (2i*omega - J) solve, and `a` uses the exact
    parameter jvp.  `low_dtype=jnp.float32` (the TPU "auto" default) runs
    every Krylov matvec on an f32 twin with f64 residual refinement."""
    if matrix_free:
        return _hopf_normal_form_point_mf(
            prob, x, p, omega, zeta=zeta, tau=tau, verbose=verbose,
            precond=precond, gmres_opts=gmres_opts, low_dtype=low_dtype,
            eig_iters=eig_iters, rayleigh_iters=rayleigh_iters)
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


def _hopf_normal_form_point_mf(prob, x, p, omega, zeta=None, tau=None,
                               verbose: bool = False, precond=None,
                               gmres_opts: Optional[dict] = None,
                               low_dtype="auto", eig_iters: int = 3,
                               rayleigh_iters: int = 2):
    """Matrix-free Hopf normal form (see hopf_normal_form_point docstring).
    All complex arithmetic is real-split on device; the three Psi solves
    are the same preconditioned-GMRES kernels as the MF GH test
    (make_l1_kernel_mf, codim2/minaug_mf.py) — here with the (a, Psi001)
    parameter terms the predictor needs (ref src/NormalForms.jl:1037-1064)."""
    from ..codim2.minaug_mf import (_cast_tree, _ir_solve, _make_ma_gmres,
                                    ext_precond2)

    parbif = prob.set_lens_param(prob.params, p)
    fp = _FlatProblem(prob, x, parbif)
    n = fp.n
    if precond is None:
        precond = getattr(prob, "spectral_precond", None)
    if low_dtype == "auto":
        # mixed precision pays only where f64 is emulated (TPU)
        low_dtype = jnp.float32 if jax.default_backend() == "tpu" else None
    lo = low_dtype

    Jd = lambda d: fp.dF(d)                       # noqa: E731
    Jtd = lambda d: ravel(prob.dFt(               # noqa: E731
        fp.unravel(fp.flat0), parbif, fp.unravel(d)))[0]

    gm2 = _make_ma_gmres(precond, n, 2, gmres_opts)
    o = dict(restart=40, maxiter=240, rtol=1e-10, atol=1e-14)
    if gmres_opts:
        o.update(gmres_opts)
    from ..linalg.linear import GMRES

    pre1 = ((lambda v: ravel(precond(v))[0]) if precond is not None
            else None)
    gm_n = GMRES(precond=pre1, **o)
    gm_2n = GMRES(precond=ext_precond2(precond, n)
                  if precond is not None else None, **o)
    gm_n_lo = gm_2n_lo = None
    Jd_lo = None
    if lo is not None:
        lo_o = dict(o)
        lo_o["rtol"] = max(float(lo_o.get("rtol", 1e-10)), 3e-5)
        lo_o["atol"] = 0.0
        gm_n_lo = GMRES(precond=pre1, restart=lo_o["restart"],
                        maxiter=lo_o["maxiter"], rtol=lo_o["rtol"],
                        atol=0.0)
        gm_2n_lo = GMRES(precond=ext_precond2(precond, n)
                         if precond is not None else None,
                         restart=lo_o["restart"], maxiter=lo_o["maxiter"],
                         rtol=lo_o["rtol"], atol=0.0)
        xs_lo = _cast_tree(fp.unravel(fp.flat0), lo)
        par_lo = _cast_tree(parbif, lo)
        Jd_lo = lambda d: ravel(prob.dF(xs_lo, par_lo,   # noqa: E731
                                        fp.unravel(d)))[0]

    def _solve_n(op_hi, op_lo, rhs):
        """Mixed-precision (or plain) GMRES solve of op_hi x = rhs."""
        if lo is not None:
            sol, _ = _ir_solve(op_hi, op_lo, rhs, gm_n_lo, lo)
            return sol
        sol, _, _ = gm_n(op_hi, rhs)
        return sol

    def _solve_2n(op_hi, op_lo, rhs):
        if lo is not None:
            sol, _ = _ir_solve(op_hi, op_lo, rhs, gm_2n_lo, lo)
            return sol
        sol, _, _ = gm_2n(op_hi, rhs)
        return sol

    # (zeta, zeta*) by complex bordered inverse iteration from the best seed
    if zeta is None:
        rng = np.random.default_rng(23)
        seed_r = rng.standard_normal(n)
        seed_i = rng.standard_normal(n)
    else:
        zc = np.asarray(zeta)
        seed_r, seed_i = np.real(zc), np.imag(zc)
    dt = np.asarray(fp.flat0).dtype
    seed_r = jnp.asarray(np.asarray(seed_r, dt))
    seed_i = jnp.asarray(np.asarray(seed_i, dt))
    if not bool(jnp.any(seed_i != 0)):
        # a purely-real seed collapses the complex iteration onto a real
        # ray; rotate a quarter period via J (z_i ~ J z_r / omega)
        seed_i = jax.jit(Jd)(seed_r) / jnp.maximum(abs(omega), 1e-8)
    zr, zi, wr, wi, alpha, om_ref = hopf_null_basis_iter(
        Jd, Jtd, omega, seed_r, seed_i, gm2, iters=eig_iters,
        rayleigh_iters=rayleigh_iters)
    om = om_ref if abs(om_ref - abs(omega)) < 0.2 * abs(om_ref) + 1e-8 \
        else abs(omega)

    p_arr = jnp.asarray(p, dt)

    @jax.jit
    def _nf_kernel(zr, zi, wr, wi, om):
        # zeta_ad scaled so <zeta, zeta_ad> = sum(conj(zeta) zeta_ad) = 1
        cr = jnp.dot(zr, wr) + jnp.dot(zi, wi)
        ci = jnp.dot(zr, wi) - jnp.dot(zi, wr)
        c2 = cr * cr + ci * ci
        ar = (wr * cr + wi * ci) / c2
        ai = (wi * cr - wr * ci) / c2

        d2 = lambda a, b: fp.d2F(a, b)            # noqa: E731
        d3 = lambda a, b, c: fp.d3F(a, b, c)      # noqa: E731

        # Psi001 = J^{-1} (-R01)   (J nonsingular at a Hopf point)
        R01 = fp.dFdp_at(p_arr)
        Psi001 = _solve_n(Jd, Jd_lo, -R01)

        # a = <R11(zeta) + 2 R2(zeta, Psi001), zeta_ad>
        av_r = fp.dFdp_dir(zr, p_arr) + d2(zr, Psi001)
        av_i = fp.dFdp_dir(zi, p_arr) + d2(zi, Psi001)
        a_re = jnp.dot(av_r, ar) + jnp.dot(av_i, ai)
        a_im = jnp.dot(av_r, ai) - jnp.dot(av_i, ar)

        # R20 = R2(z, z) (complex), R11c = R2(z, conj z) (real)
        R20_r = 0.5 * (d2(zr, zr) - d2(zi, zi))
        R20_i = d2(zr, zi)
        R11c = 0.5 * (d2(zr, zr) + d2(zi, zi))

        # Psi200: (2 i om - J) Psi = R20, real embedding
        def op2(zv):
            pr, pi = zv[:n], zv[n:]
            return jnp.concatenate([-Jd(pr) - 2 * om * pi,
                                    -Jd(pi) + 2 * om * pr])

        op2_lo = None
        if Jd_lo is not None:
            om_lo = om.astype(lo) if hasattr(om, "astype") \
                else jnp.asarray(om, lo)

            def op2_lo(zv):
                pr, pi = zv[:n], zv[n:]
                return jnp.concatenate([-Jd_lo(pr) - 2 * om_lo * pi,
                                        -Jd_lo(pi) + 2 * om_lo * pr])

        sol2 = _solve_2n(op2, op2_lo, jnp.concatenate([R20_r, R20_i]))
        P200_r, P200_i = sol2[:n], sol2[n:]

        # Psi110: -J Psi = 2 R2(z, conj z)
        negJ = lambda d: -Jd(d)                   # noqa: E731
        negJ_lo = (lambda d: -Jd_lo(d)) if Jd_lo is not None else None
        P110 = _solve_n(negJ, negJ_lo, 2.0 * R11c)

        # bv = 2 R2(z, Psi110) + 2 R2(conj z, Psi200) + 3 R3(z, z, conj z)
        bv_r = (d2(zr, P110)
                + (d2(zr, P200_r) + d2(zi, P200_i))
                + 0.5 * (d3(zr, zr, zr) + d3(zi, zi, zr)))
        bv_i = (d2(zi, P110)
                + (d2(zr, P200_i) - d2(zi, P200_r))
                + 0.5 * (d3(zr, zr, zi) + d3(zi, zi, zi)))
        b_re = jnp.dot(bv_r, ar) + jnp.dot(bv_i, ai)
        b_im = jnp.dot(bv_r, ai) - jnp.dot(bv_i, ar)
        return (a_re, a_im, b_re, b_im, ar, ai, Psi001, P110,
                P200_r, P200_i)

    (a_re, a_im, b_re, b_im, ar, ai, Psi001, P110, P200_r,
     P200_i) = _nf_kernel(zr, zi, wr, wi, jnp.asarray(om, dt))

    a = complex(float(a_re), float(a_im))
    b = complex(float(b_re), float(b_im))
    zeta_c = np.asarray(zr) + 1j * np.asarray(zi)
    zeta_ad_c = np.asarray(ar) + 1j * np.asarray(ai)
    Psi200 = np.asarray(P200_r) + 1j * np.asarray(P200_i)

    if verbose:
        print(f"Hopf normal form (matrix-free): a={a:.6g}, b={b:.6g} "
              f"({'supercritical' if b.real < 0 else 'subcritical'})")

    hp = Hopf(x0=fp.flat0, p=p, params=parbif, lens=prob.lens, zeta=zeta_c,
              zeta_star=zeta_ad_c, omega=float(om), prob=prob,
              nf={"a": a, "b": b, "Psi001": np.asarray(Psi001),
                  "Psi110": np.asarray(P110), "Psi200": Psi200})
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
        return hopf_normal_form(prob, br, ind_bif, verbose=verbose,
                                **kwargs)
    if sp.type in ("bp", "fold", "nd"):
        from .codim1_nd import get_normal_form_nd

        if abs(sp.delta[0]) > 1 or sp.type == "nd":
            return get_normal_form_nd(prob, br, ind_bif, verbose=verbose,
                                      **kwargs)
        return get_normal_form1d(prob, br, ind_bif, verbose=verbose, **kwargs)
    raise ValueError(f"no normal form available for point type {sp.type!r}")
