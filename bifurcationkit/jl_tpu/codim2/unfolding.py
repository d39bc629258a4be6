"""Detailed codim-2 normal-form unfoldings + predictors into PO-land
(ref src/codim2/NormalForms.jl:141-506 BT incl. homoclinic, :642-958
Bautin + fold-of-PO predictor :935, :959-1313 ZH + NS predictor :1283,
:1315-1624 HH + NS predictors :1536-1574).

The mathematics follows
  REF1  Kuznetsov 1999, "Numerical normalization techniques for all codim
        2 bifurcations of equilibria in ODEs", SINUM 36(4)
  REF2  Kuznetsov, Meijer, Govaerts, Sautois 2008, "Switching to
        nonhyperbolic cycles from codim 2 bifurcations of equilibria in
        ODEs", Physica D 237
  REF3  Al-Hdaibat, Govaerts, Kuznetsov, Meijer 2016, "Initialization of
        homoclinic solutions near Bogdanov-Takens points", SIADS 15(2)

Every parameter derivative (A1, B1, C1, J1, Jpp) is EXACT via jax.jvp over
the lens value — the reference uses finite differences.  All solves are
small dense host-side computations (codim-2 models); the heavy lifting
(the PO continuation the predictors feed) stays in the jitted machinery.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lens import Lens, as_lens
from ..core.state import ravel
from ..linalg.eig import dense_eig
from ..normal_forms.codim1 import _FlatProblem

_C = np.complex128


def _dot(p, v):
    """Julia LA.dot: sum(conj(p) .* v)."""
    return np.sum(np.conj(np.asarray(p)) * np.asarray(v))


class _ParamJet:
    """Exact parameter-derivatives of the vector field at a fixed point:
    J1 = dF/dp, A1(q) = d(J q)/dp, B1(q,r) = dB(q,r)/dp,
    C1(q,r,s) = dC(q,r,s)/dp — all via jax.jvp over the lens value
    (the reference's finite differences, made exact)."""

    def __init__(self, prob, x0_tree, params, lens):
        self.prob = prob
        self.x0 = x0_tree
        self.params = params
        self.lens = lens
        self.p0 = float(lens.get(params))

    def _d(self, g):
        """d/dp g(params(p)) at p0 for g returning a flat real vector."""
        return np.asarray(jax.jvp(
            lambda t: g(self.lens.set(self.params, t)),
            (jnp.asarray(self.p0),), (jnp.asarray(1.0),))[1])

    def J1(self):
        return self._d(lambda par: ravel(self.prob.F(self.x0, par))[0])

    def _A1r(self, q_flat):
        _, unr = ravel(self.x0)
        q = unr(jnp.asarray(q_flat))
        return self._d(lambda par: ravel(self.prob.dF(self.x0, par, q))[0])

    def A1(self, q):
        q = np.asarray(q)
        if np.iscomplexobj(q):
            return self._A1r(np.real(q)) + 1j * self._A1r(np.imag(q))
        return self._A1r(q)

    def _B1rr(self, q, r):
        _, unr = ravel(self.x0)
        qt, rt = unr(jnp.asarray(q)), unr(jnp.asarray(r))
        return self._d(
            lambda par: ravel(self.prob.d2F(self.x0, par, qt, rt))[0])

    def B1(self, q, r):
        q, r = np.asarray(q), np.asarray(r)
        if not (np.iscomplexobj(q) or np.iscomplexobj(r)):
            return self._B1rr(q, r)
        out = self._B1rr(np.real(q), np.real(r)).astype(_C)
        out -= self._B1rr(np.imag(q), np.imag(r))
        out += 1j * (self._B1rr(np.real(q), np.imag(r))
                     + self._B1rr(np.imag(q), np.real(r)))
        return out

    def _C1_terms(self, dxs):
        _, unr = ravel(self.x0)
        trees = [unr(jnp.asarray(d)) for d in dxs]
        return self._d(
            lambda par: ravel(self.prob.d3F(self.x0, par, *trees))[0])

    def C1(self, q, r, s):
        """Trilinear with complex arguments: expand over real/imag parts."""
        args = [np.asarray(a) for a in (q, r, s)]
        if not any(np.iscomplexobj(a) for a in args):
            return self._C1_terms(args)
        out = np.zeros(args[0].shape, _C)
        for i in range(2):
            for j in range(2):
                for k in range(2):
                    parts = [np.real(args[0]) if i == 0 else np.imag(args[0]),
                             np.real(args[1]) if j == 0 else np.imag(args[1]),
                             np.real(args[2]) if k == 0 else np.imag(args[2])]
                    coef = (1j) ** (i + j + k)
                    out = out + coef * self._C1_terms(parts)
        return out


def _dd_p2(prob, x0_tree, params, lensA, lensB):
    """Mixed second parameter derivative d^2 F / dpA dpB at x0 (exact)."""
    pA = float(lensA.get(params))
    pB = float(lensB.get(params))

    def inner(tA):
        def g(tB):
            par = lensB.set(lensA.set(params, tA), tB)
            return ravel(prob.F(x0_tree, par))[0]

        return jax.jvp(g, (jnp.asarray(pB),), (jnp.asarray(1.0),))[1]

    return np.asarray(jax.jvp(inner, (jnp.asarray(pA),),
                              (jnp.asarray(1.0),))[1])


def _bord_solve(L, col, row, rhs, shift=0.0):
    """Solve [L + shift*I, col; row^H, 0] [h; s] = [rhs; 0] (dense)."""
    L = np.asarray(L)
    n = L.shape[0]
    cplx = (np.iscomplexobj(L) or np.iscomplexobj(col)
            or np.iscomplexobj(rhs) or np.iscomplexobj(shift)
            or np.iscomplexobj(row))
    dt = _C if cplx else np.float64
    M = np.zeros((n + 1, n + 1), dt)
    M[:n, :n] = L + shift * np.eye(n)
    M[:n, n] = np.asarray(col)
    M[n, :n] = np.conj(np.asarray(row))
    b = np.zeros(n + 1, dt)
    b[:n] = np.asarray(rhs)
    sol = np.linalg.solve(M, b)
    return sol[:n]


# ---------------------------------------------------------------------------
# Bautin (GH): detailed unfolding + fold-of-PO predictor (REF2 §2.3.1)
# ---------------------------------------------------------------------------


def bautin_unfolding(prob, x0_tree, params, lens1, lens2,
                     matrix_free: bool = False, precond=None,
                     gmres_opts=None, omega=None, seed=None):
    """Detailed Bautin normal form: the REF1 §7 coefficients plus the REF2
    formulas (17), (19)-(22) parameter unfolding needed to predict the
    fold-of-PO curve (ref src/codim2/NormalForms.jl:835-925).

    `matrix_free=True` routes every solve through the iterative closures
    ((q0, p0) by complex bordered inverse iteration, shifted solves via the
    real embedding, the two resonant bordered solves via the complex
    extended operator) — the PDE-scale route for GH points on MF Hopf
    curves; l2 comes from the MF Bautin core."""
    fp = _FlatProblem(prob, x0_tree, params)
    n = fp.n
    from ..normal_forms.bautin import bautin_normal_form

    if matrix_free:
        import jax

        from .minaug_mf import solve_bordered_ext_cplx

        Jd, Jtd, gm1, gm2, gm2n = _mf_solver_set(fp, prob, params, precond,
                                                 gmres_opts)
        if omega is None:
            omega = _estimate_hopf_omega(fp, Jd)
        q0, p0, w = _mf_hopf_pair(fp, Jd, Jtd, gm2, omega, seed=seed)
        solveCmf = _make_solveC(Jd, gm2n, n)

        q0r, q0i = jnp.asarray(q0.real), jnp.asarray(q0.imag)
        p0r, p0i = jnp.asarray(p0.real), jnp.asarray(p0.imag)
        wj = jnp.asarray(w)

        @jax.jit
        def _cb(tr, ti):
            vr, vi, _, _, _ = solve_bordered_ext_cplx(
                Jd, -wj, q0r, q0i, p0r, p0i, gm2, rhs_top=(tr, ti))
            return vr, vi

        def _cbord(rhs):
            rhs = np.asarray(rhs, _C)
            vr, vi = _cb(jnp.asarray(rhs.real), jnp.asarray(rhs.imag))
            return np.asarray(vr) + 1j * np.asarray(vi)

        def solve2wmL(b):           # (2iw I - L)^{-1} b
            return solveCmf(2j * w, b)

        def solvemL(b):             # (-L)^{-1} b
            return solveCmf(0.0, b)

        def bord_res(rhs):
            # [-L + iw, q0; p0^H, 0][h; s] = [rhs; 0]  ==  cplx-bordered
            # (L - iw) applied to -rhs
            return _cbord(-np.asarray(rhs, _C))

        def Ainv(dx):
            # [L - iw, q0; p0^H, 0][h; s] = [dx; 0]
            return _cbord(dx)

        l2_pt = bautin_normal_form(prob, x0_tree, params, matrix_free=True,
                                   precond=precond, gmres_opts=gmres_opts,
                                   omega=w, seed=q0)
    else:
        L = np.asarray(fp.jacobian(), dtype=np.float64)
        vals, vecs = dense_eig(jnp.asarray(L).astype(jnp.complex128))
        vals_np = np.asarray(vals)
        score = np.where(vals_np.imag > 1e-10, np.abs(vals_np.real),
                         np.inf)
        i0 = int(np.argmin(score))
        lam = vals_np[i0]
        w = float(lam.imag)
        q0 = np.asarray(vecs)[:, i0]
        q0 = q0 / np.linalg.norm(q0)
        valsT, vecsT = dense_eig(jnp.asarray(L.T).astype(jnp.complex128))
        iT = int(np.argmin(np.abs(np.asarray(valsT) - np.conj(lam))))
        p0 = np.asarray(vecsT)[:, iT]
        p0 = p0 / np.conj(_dot(p0, q0))
        eye = np.eye(n)
        _slv = np.linalg.solve

        def solve2wmL(b):
            return _slv(2j * w * eye - L, np.asarray(b, _C))

        def solvemL(b):
            return _slv(-L.astype(_C), np.asarray(b, _C))

        def bord_res(rhs):
            return _bord_solve(-L, q0, p0, rhs, shift=1j * w)

        def Ainv(dx):
            return _bord_solve(L, q0, p0, dx, shift=-1j * w)

        l2_pt = bautin_normal_form(prob, x0_tree, params)
    cq0 = np.conj(q0)

    B = lambda a, b: np.asarray(fp.d2F(jnp.asarray(a), jnp.asarray(b)))
    C = lambda a, b, c: np.asarray(fp.d3F(jnp.asarray(a), jnp.asarray(b),
                                          jnp.asarray(c)))
    D = lambda a, b, c, d: np.asarray(fp.d4F(jnp.asarray(a), jnp.asarray(b),
                                             jnp.asarray(c), jnp.asarray(d)))

    # REF1 (7.2)-(7.7)
    h2000 = solve2wmL(B(q0, q0))
    h1100 = solvemL(B(q0, cq0)).real
    rhs21 = C(q0, q0, cq0) + B(cq0, h2000) + 2.0 * B(q0, h1100)
    G21 = _dot(p0, rhs21)
    h2100 = bord_res(rhs21 - G21 * q0)
    # note: reference solves (i w I - A) h21 = rhs - G21 q0 bordered;
    # here  (-L + i w) h = ...  is the same matrix

    l1 = G21 / 2.0          # complex l1 (REF2 notation)
    l2 = l2_pt.nf["l2"]

    # REF2 formula (17)
    pj1 = _ParamJet(prob, x0_tree, params, lens1)
    pj2 = _ParamJet(prob, x0_tree, params, lens2)
    J1_1, J1_2 = pj1.J1(), pj2.J1()
    h0010 = np.real(solvemL(J1_1))
    h0001 = np.real(solvemL(J1_2))
    g110 = _dot(p0, pj1.A1(q0) + B(q0, h0010))
    g101 = _dot(p0, pj2.A1(q0) + B(q0, h0001))

    # REF2 (19): Ainv = bordered (L - i w) with borders (q0, p0)
    h1010 = Ainv(g110 * q0 - pj1.A1(q0) - B(q0, h0010))
    h1001 = Ainv(g101 * q0 - pj2.A1(q0) - B(q0, h0001))

    # REF2 (20a): (-2 i w I + L) h = tmp
    def solve20a(tmp):
        return -solve2wmL(tmp)

    tmp2010 = (2.0 * g110) * h2000 - (
        C(q0, q0, h0010) + 2.0 * B(q0, h1010) + B(h2000, h0010)
        + pj1.B1(q0, q0) + pj1.A1(h2000))
    h2010 = solve20a(tmp2010)
    tmp2001 = (2.0 * g101) * h2000 - (
        C(q0, q0, h0001) + 2.0 * B(q0, h1001) + B(h2000, h0001)
        + pj2.B1(q0, q0) + pj2.A1(h2000))
    h2001 = solve20a(tmp2001)

    # REF2 (20b): L h = tmp
    tmp1110 = 2.0 * np.real(g110) * h1100 - (
        C(q0, cq0, h0010) + B(h1100, h0010)
        + 2.0 * np.real(B(cq0, h1010)) + pj1.B1(q0, cq0) + pj1.A1(h1100))
    h1110 = -solvemL(tmp1110)
    tmp1101 = 2.0 * np.real(g101) * h1100 - (
        C(q0, cq0, h0001) + B(h1100, h0001)
        + 2.0 * np.real(B(cq0, h1001)) + pj2.B1(q0, cq0) + pj2.A1(h1100))
    h1101 = -solvemL(tmp1101)

    # REF2 (21)
    def tmp21(h00_, h10_, h20_, h11_, pj):
        return (D(q0, q0, cq0, h00_)
                + 2.0 * C(q0, h1100, h00_)
                + 2.0 * C(q0, cq0, h10_)
                + C(q0, q0, np.conj(h10_))
                + C(h2000, cq0, h00_)
                + 2.0 * B(q0, h11_)
                + 2.0 * B(h1100, h10_)
                + B(h2000, np.conj(h10_))
                + B(h2100, h00_)
                + B(h20_, cq0)
                + pj.C1(q0, q0, cq0)
                + 2.0 * pj.B1(h1100, q0)
                + pj.B1(h2000, cq0)
                + pj.A1(h2100))

    g210 = _dot(p0, tmp21(h0010, h1010, h2010, h1110, pj1)) / 2.0
    g201 = _dot(p0, tmp21(h0001, h1001, h2001, h1101, pj2)) / 2.0

    # REF2 (22)
    Gam = np.array([[g110, g101], [g210, g201]])
    alpha = np.linalg.solve(np.real(Gam), np.array([0.0, 1.0]))

    return {
        "x0": np.asarray(fp.flat0), "omega": w, "q0": q0, "p0": p0,
        "l1": l1, "l2": float(l2), "G21": G21,
        "h2000": h2000, "h1100": h1100, "h2100": h2100,
        "h0010": h0010, "h0001": h0001,
        "g110": g110, "g101": g101, "g210": g210, "g201": g201,
        "alpha": alpha,
        "p10": float(lens1.get(params)), "p20": float(lens2.get(params)),
    }


def predictor_fold_po(nf: dict, eps: float):
    """Fold-of-PO curve predictor from a Bautin point (REF2 §2.3.1;
    ref predictor(gh, Val{:FoldPeriodicOrbitCont}),
    src/codim2/NormalForms.jl:935-957)."""
    l2, alpha = nf["l2"], nf["alpha"]
    x0 = nf["x0"] + eps ** 2 * np.real(
        nf["h1100"] - 2.0 * l2 * (nf["h0010"] * alpha[0]
                                  + nf["h0001"] * alpha[1]))
    q0 = nf["q0"]
    h2000 = nf["h2000"]

    def orbit(theta):
        return np.real(x0 + 2 * eps * np.real(q0 * np.exp(1j * theta))
                       + 2 * eps ** 2
                       * np.real(h2000 * np.exp(2j * theta)))

    omega = nf["omega"] + (-2.0 * l2 * np.imag(alpha[0] * nf["g110"]
                                               + alpha[1] * nf["g101"])
                           + np.imag(nf["l1"])) * eps ** 2
    params = (np.array([nf["p10"], nf["p20"]])
              - 2.0 * l2 * alpha * eps ** 2)
    return {"orbit": orbit, "omega": float(omega),
            "T": float(2 * np.pi / abs(omega)),
            "p1": float(params[0]), "p2": float(params[1])}


# ---------------------------------------------------------------------------
# Zero-Hopf: detailed unfolding + NS predictor (REF1 §8, REF2 §2.3.2)
# ---------------------------------------------------------------------------


def _mf_solver_set(fp, prob, params, precond, gmres_opts):
    """Shared matrix-free solver kit for the codim-2 unfoldings."""
    import jax

    from ..linalg.linear import GMRES
    from .minaug_mf import _make_ma_gmres, ext_precond2

    n = fp.n
    if precond is None:
        precond = getattr(prob, "spectral_precond", None)
    gm1 = _make_ma_gmres(precond, n, 1, gmres_opts)
    gm2 = _make_ma_gmres(precond, n, 2, gmres_opts)
    o = dict(restart=40, maxiter=240, rtol=1e-10, atol=1e-14)
    if gmres_opts:
        o.update(gmres_opts)
    gm2n = GMRES(precond=ext_precond2(precond, n)
                 if precond is not None else None, **o)
    from ..core.state import ravel as _ravel

    Jd = lambda d: fp.dF(d)                       # noqa: E731
    Jtd = lambda d: _ravel(prob.dFt(              # noqa: E731
        fp.unravel(fp.flat0), params, fp.unravel(d)))[0]
    return Jd, Jtd, gm1, gm2, gm2n


def _estimate_hopf_omega(fp, Jd, exclude=()):
    """Leading Hopf frequency by warm Arnoldi on the jvp operator."""
    import jax

    from ..linalg.eig import ArnoldiEig, FlatOperator

    op = FlatOperator(jax.jit(Jd), fp.n, np.asarray(fp.flat0).dtype)
    vals, _, _, _ = ArnoldiEig(krylov_dim=80, restarts=5, which="LR")(op, 8)
    v = np.asarray(vals)
    cand = v[v.imag > 1e-8]
    if len(cand) == 0:
        raise RuntimeError("no complex pair found; pass omega explicitly")
    for w_ex in exclude:
        cand = cand[np.abs(cand.imag - w_ex) > 1e-6]
    return float(cand[np.argmin(np.abs(cand.real))].imag)


def _mf_hopf_pair(fp, Jd, Jtd, gm2, omega, seed=None):
    """(q1, p1, w): unit right vector + <p1,q1>-normalized left vector of
    the eigenvalue nearest i*omega, by complex bordered inverse iteration."""
    from ..normal_forms.codim1 import hopf_null_basis_iter

    n = fp.n
    dt = np.asarray(fp.flat0).dtype
    rng = np.random.default_rng(41)
    if seed is None:
        sr = rng.standard_normal(n)
        si = rng.standard_normal(n)
    else:
        sc = np.asarray(seed)
        sr, si = np.real(sc), np.imag(sc)
        if not np.any(si):
            si = rng.standard_normal(n)
    zr, zi, wr, wi, _, om = hopf_null_basis_iter(
        Jd, Jtd, omega, jnp.asarray(np.asarray(sr, dt)),
        jnp.asarray(np.asarray(si, dt)), gm2)
    q1 = np.asarray(zr) + 1j * np.asarray(zi)
    p1c = np.asarray(wr) + 1j * np.asarray(wi)
    p1 = p1c / np.conj(_dot(p1c, q1))
    return q1, p1, float(om)


def _make_solveC(Jd, gm2n, n):
    """Host-complex wrapper of the real-embedded shifted solve
    (sigma I - J)^{-1} b (sigma = 0 gives -J^{-1} b)."""
    import jax

    from .minaug_mf import solve_shifted_cplx

    @jax.jit
    def _k(sr, si, br_, bi_):
        xr, xi, _ = solve_shifted_cplx(Jd, sr, si, br_, bi_, gm2n)
        return xr, xi

    def solveC(sig, b):
        b = np.asarray(b, _C)
        sig = complex(sig)
        xr, xi = _k(jnp.asarray(sig.real), jnp.asarray(sig.imag),
                    jnp.asarray(b.real), jnp.asarray(b.imag))
        return np.asarray(xr) + 1j * np.asarray(xi)

    return solveC


def _zh_basis_mf(fp, prob, params, precond=None, gmres_opts=None,
                 omega=None, seed=None):
    """Matrix-free ZH basis + solver closures: (q0, p0) by bordered
    inverse iteration, (q1, p1) by the complex bordered iteration,
    Ainv0/Ainv1 through the extended operators, solveC the shifted solve
    (ref the reference computing the same objects through its solver
    abstraction, src/codim2/NormalForms.jl:959-1205)."""
    import jax

    from ..normal_forms.codim1 import null_basis_iter
    from .minaug_mf import solve_bordered_ext, solve_bordered_ext_cplx

    n = fp.n
    dt = np.asarray(fp.flat0).dtype
    Jd, Jtd, gm1, gm2, gm2n = _mf_solver_set(fp, prob, params, precond,
                                             gmres_opts)
    if omega is None:
        omega = _estimate_hopf_omega(fp, Jd)
    rng = np.random.default_rng(43)
    q0j, p0j = null_basis_iter(Jd, Jtd,
                               jnp.asarray(np.asarray(
                                   rng.standard_normal(n), dt)), gm1)
    q0 = np.asarray(q0j)
    p0 = np.asarray(p0j)
    p0 = p0 / np.dot(p0, q0)
    q1, p1, w = _mf_hopf_pair(fp, Jd, Jtd, gm2, omega, seed=seed)

    p0dev = jnp.asarray(p0)
    q1r, q1i = jnp.asarray(q1.real), jnp.asarray(q1.imag)
    p1r, p1i = jnp.asarray(p1.real), jnp.asarray(p1.imag)
    wj = jnp.asarray(w)

    @jax.jit
    def _ainv0(dx):
        v, _, _ = solve_bordered_ext(Jd, q0j, p0dev, gm1, rhs_top=dx,
                                     rhs_bot=0.0)
        return v

    def Ainv0(dx):
        return np.asarray(_ainv0(jnp.asarray(np.real(np.asarray(dx)))))

    @jax.jit
    def _ainv1(tr, ti):
        vr, vi, _, _, _ = solve_bordered_ext_cplx(
            Jd, -wj, q1r, q1i, p1r, p1i, gm2, rhs_top=(tr, ti))
        return vr, vi

    def Ainv1(dx):
        dx = np.asarray(dx, _C)
        vr, vi = _ainv1(jnp.asarray(dx.real), jnp.asarray(dx.imag))
        return np.asarray(vr) + 1j * np.asarray(vi)

    solveC = _make_solveC(Jd, gm2n, n)
    return q0, p0, q1, p1, w, Ainv0, Ainv1, solveC


def zh_unfolding(prob, x0_tree, params, lens1, lens2,
                 matrix_free: bool = False, precond=None, gmres_opts=None,
                 omega=None, seed=None):
    """Detailed ZH normal form (ref src/codim2/NormalForms.jl:1100-1205):
    REF1 (8.2)-(8.6) second/third-order terms + REF2 (24)-(25) unfolding.

    `matrix_free=True`: (q0, p0) by bordered inverse iteration, (q1, p1)
    by the complex bordered iteration, and every projection solve through
    the preconditioned extended/shifted operators — the PDE-scale route
    (pass `omega` to target the Hopf pair; else a warm Arnoldi finds it)."""
    fp = _FlatProblem(prob, x0_tree, params)
    n = fp.n
    if matrix_free:
        L = None
        (q0, p0, q1, p1, w, Ainv0, Ainv1, solveC) = _zh_basis_mf(
            fp, prob, params, precond=precond, gmres_opts=gmres_opts,
            omega=omega, seed=seed)
        cq1 = np.conj(q1)
    else:
        L = np.asarray(fp.jacobian(), dtype=np.float64)
        vals, vecs = dense_eig(jnp.asarray(L).astype(jnp.complex128))
        vals_np = np.asarray(vals)
        izero = int(np.argmin(np.abs(vals_np)))
        cand = np.where(vals_np.imag > 1e-8)[0]
        ih = cand[int(np.argmin(np.abs(vals_np[cand].real)))]
        lamH = vals_np[ih]
        w = float(lamH.imag)
        q0 = np.real(np.asarray(vecs)[:, izero])
        q0 = q0 / np.linalg.norm(q0)
        q1 = np.asarray(vecs)[:, ih]
        q1 = q1 / np.linalg.norm(q1)
        cq1 = np.conj(q1)
        valsT, vecsT = dense_eig(jnp.asarray(L.T).astype(jnp.complex128))
        valsT_np = np.asarray(valsT)
        p0 = np.real(np.asarray(vecsT)[:,
                                       int(np.argmin(np.abs(valsT_np)))])
        p0 = p0 / np.dot(p0, q0)
        iT = int(np.argmin(np.abs(valsT_np - np.conj(lamH))))
        p1 = np.asarray(vecsT)[:, iT]
        p1 = p1 / np.conj(_dot(p1, q1))

        eye = np.eye(n)
        _slv = np.linalg.solve

        def Ainv0(dx):
            return _bord_solve(L, q0, p0, dx)

        def Ainv1(dx):
            return _bord_solve(L, q1, p1, dx, shift=-1j * w)

        def solveC(sig, b):
            return _slv(sig * eye - L.astype(_C), np.asarray(b, _C))

    B = lambda a, b: np.asarray(fp.d2F(jnp.asarray(a), jnp.asarray(b)))
    C = lambda a, b, c: np.asarray(fp.d3F(jnp.asarray(a), jnp.asarray(b),
                                          jnp.asarray(c)))

    # REF1 (8.2)
    G200 = float(np.real(_dot(p0, B(q0, q0))))
    G110 = _dot(p1, B(q0, q1))
    G011 = float(np.real(_dot(p0, B(q1, cq1))))

    # REF1 (8.3)-(8.6)
    h200 = Ainv0(-B(q0, q0) + G200 * q0)
    h020 = solveC(2j * w, B(q1, q1))
    h110 = -Ainv1(B(q0, q1) - G110 * q1)
    h011 = -Ainv0(B(q1, cq1) - G011 * q0)

    # third-order resonant projections
    G111 = _dot(p0, C(q0, q1, cq1) + B(q0, h011) + B(q1, np.conj(h110))
                + B(cq1, h110))
    G021 = _dot(p1, C(q1, q1, cq1) + 2.0 * B(q1, h011) + B(cq1, h020))

    # REF2 notations
    f011, g021, f111, g110, f200 = (G011, G021 / 2.0, G111, G110,
                                    G200 / 2.0)
    hasNS = bool(np.real(g110) * f011 < 0)

    # REF2 (24)-(25) parameter unfolding
    pj1 = _ParamJet(prob, x0_tree, params, lens1)
    pj2 = _ParamJet(prob, x0_tree, params, lens2)
    J1_1, J1_2 = pj1.J1(), pj2.J1()
    s1 = np.array([np.dot(p0, J1_1), np.dot(p0, J1_2)])
    s2 = np.array([-s1[1], s1[0]])
    s1 = s1 / np.dot(s1, s1)
    r1 = Ainv0(q0 - J1_1 * s1[0] - J1_2 * s1[1])
    r2 = Ainv0(J1_1 * s2[0] + J1_2 * s2[1])
    LL = np.zeros((2, 2), _C)
    LL[0, 0] = _dot(p0, B(q0, r2) + pj1.A1(q0) * s2[0] + pj2.A1(q0) * s2[1])
    LL[1, 0] = _dot(p1, B(q1, r2) + pj1.A1(q1) * s2[0] + pj2.A1(q1) * s2[1])
    LL[0, 1] = 2.0 * f200
    LL[1, 1] = g110
    RR = np.array([
        -_dot(p0, B(q0, r1) + pj1.A1(q0) * s1[0] + pj2.A1(q0) * s1[1]),
        -_dot(p1, B(q1, r1) + pj1.A1(q1) * s1[0] + pj2.A1(q1) * s1[1])])
    d13 = np.linalg.solve(np.real(LL), np.real(RR))
    d24 = np.linalg.solve(np.real(LL), np.array([0.0, 1.0]))
    v10 = s1 + d13[0] * s2
    v01 = d24[0] * s2
    h00010 = r1 + d13[0] * r2 + d13[1] * q1
    h00001 = d24[0] * r2 + d24[1] * q1

    # REF2 (10)
    xcoef = -(f111 + 2.0 * g021) / (2.0 * f200)
    beta1 = -f011
    beta2 = float(np.real((2.0 * np.real(g021) * (np.real(g110) - f200)
                           + np.real(g110) * f111) / (2.0 * f200)))

    return {
        "x0": np.asarray(fp.flat0), "omega": w, "q0": q0, "q1": q1,
        "p0": p0, "p1": p1,
        "G200": G200, "G110": G110, "G011": G011, "G111": G111,
        "G021": G021, "h020": h020, "h011": h011, "h110": h110,
        "h200": h200, "g110": g110, "f011": f011, "hasNS": hasNS,
        "v10": v10, "v01": v01, "h00010": h00010, "h00001": h00001,
        "x": xcoef, "beta1": beta1, "beta2": beta2,
        "p10": float(lens1.get(params)), "p20": float(lens2.get(params)),
    }


def predictor_ns_zh(nf: dict, eps: float):
    """NS-of-PO curve predictor from a ZH point (REF2 formula (27);
    ref predictor(zh, Val{:NS}), src/codim2/NormalForms.jl:1283-1313)."""
    beta1, beta2 = nf["beta1"], nf["beta2"]
    x = np.real(nf["x0"] + eps ** 2 * (nf["h00010"] * beta1
                                       + nf["h00001"] * beta2
                                       + nf["x"] * nf["q0"] + nf["h011"]))
    q1, h020, w = nf["q1"], nf["h020"], nf["omega"]

    def orbit(theta):
        return np.real(x + 2 * eps * np.real(q1 * np.exp(1j * theta))
                       + 2 * eps ** 2
                       * np.real(h020 * np.exp(2j * theta)))

    # predicted NS angle: the second frequency o1 winds over the orbit
    o1 = np.sqrt(2.0 * abs(np.real(nf["g110"]) * nf["f011"])) * eps
    k = float(np.arccos(np.clip(1.0 - (2 * np.pi * o1 / w) ** 2 / 2.0,
                                -1.0, 1.0)))
    pars = np.real(np.array([nf["p10"], nf["p20"]])
                   + (beta1 * nf["v10"] + beta2 * nf["v01"]) * eps ** 2)
    return {"orbit": orbit, "T": float(2 * np.pi / w), "k": k,
            "hasNS": nf["hasNS"], "p1": float(pars[0]),
            "p2": float(pars[1])}


# ---------------------------------------------------------------------------
# Hopf-Hopf: detailed unfolding + NS predictors (REF1 §9, REF2 §2.3.3)
# ---------------------------------------------------------------------------


def hh_unfolding(prob, x0_tree, params, lens1, lens2,
                 matrix_free: bool = False, precond=None, gmres_opts=None,
                 omegas=None, seeds=None):
    """Detailed HH normal form (ref src/codim2/NormalForms.jl:1459-1533):
    REF1 (9.2)-(9.6) + REF2 (26)/(22)/(28).

    `matrix_free=True`: both (q_k, p_k) pairs by complex bordered
    iteration (pass `omegas=(w1, w2)` to target them; else warm Arnoldi)
    and all six projection solves through the real-embedded shifted
    operator — nothing materializes the jacobian."""
    fp = _FlatProblem(prob, x0_tree, params)
    n = fp.n
    if matrix_free:
        Jd, Jtd, gm1, gm2, gm2n = _mf_solver_set(fp, prob, params,
                                                 precond, gmres_opts)
        if omegas is None:
            wa = _estimate_hopf_omega(fp, Jd)
            wb = _estimate_hopf_omega(fp, Jd, exclude=(wa,))
            omegas = (wa, wb)
        omegas = tuple(sorted(abs(float(w)) for w in omegas))
        s1_, s2_ = (seeds if seeds is not None else (None, None))
        q1, p1, w1 = _mf_hopf_pair(fp, Jd, Jtd, gm2, omegas[0], seed=s1_)
        q2, p2, w2 = _mf_hopf_pair(fp, Jd, Jtd, gm2, omegas[1], seed=s2_)
        cq1, cq2 = np.conj(q1), np.conj(q2)
        solveC = _make_solveC(Jd, gm2n, n)
    else:
        L = np.asarray(fp.jacobian(), dtype=np.float64)
        vals, vecs = dense_eig(jnp.asarray(L).astype(jnp.complex128))
        vals_np = np.asarray(vals)
        cand = np.where(vals_np.imag > 1e-8)[0]
        order = cand[np.argsort(np.abs(vals_np[cand].real))[:2]]
        pair = vals_np[order]
        srt = np.argsort(pair.imag)
        lam1, lam2 = pair[srt[0]], pair[srt[1]]
        i1, i2 = order[srt[0]], order[srt[1]]
        w1, w2 = float(lam1.imag), float(lam2.imag)
        q1 = np.asarray(vecs)[:, i1]
        q1 = q1 / np.linalg.norm(q1)
        q2 = np.asarray(vecs)[:, i2]
        q2 = q2 / np.linalg.norm(q2)
        cq1, cq2 = np.conj(q1), np.conj(q2)
        valsT, vecsT = dense_eig(jnp.asarray(L.T).astype(jnp.complex128))
        valsT_np = np.asarray(valsT)
        p1 = np.asarray(vecsT)[:, int(np.argmin(np.abs(valsT_np
                                                       - np.conj(lam1))))]
        p1 = p1 / np.conj(_dot(p1, q1))
        p2 = np.asarray(vecsT)[:, int(np.argmin(np.abs(valsT_np
                                                       - np.conj(lam2))))]
        p2 = p2 / np.conj(_dot(p2, q2))

        eye = np.eye(n)
        _slv = np.linalg.solve

        def solveC(sig, b):
            return _slv(sig * eye - L.astype(_C), np.asarray(b, _C))

    B = lambda a, b: np.asarray(fp.d2F(jnp.asarray(a), jnp.asarray(b)))
    C = lambda a, b, c: np.asarray(fp.d3F(jnp.asarray(a), jnp.asarray(b),
                                          jnp.asarray(c)))

    # REF1 (9.2)-(9.6)
    h2000 = solveC(2j * w1, B(q1, q1))
    h0020 = solveC(2j * w2, B(q2, q2))
    h1010 = solveC(1j * (w1 + w2), B(q1, q2))
    h1001 = solveC(1j * (w1 - w2), B(q1, cq2))
    h1100 = solveC(0.0, B(q1, cq1)).real
    h0011 = solveC(0.0, B(q2, cq2)).real

    G2100 = _dot(p1, C(q1, q1, cq1) + B(h2000, cq1) + 2.0 * B(h1100, q1))
    G0021 = _dot(p2, C(q2, q2, cq2) + B(h0020, cq2) + 2.0 * B(h0011, q2))
    G1110 = _dot(p2, C(q1, cq1, q2) + B(h1100, q2) + B(h1010, cq1)
                 + B(np.conj(h1001), q1))
    G1011 = _dot(p1, C(q1, q2, cq2) + B(h1010, cq2) + B(h1001, q2)
                 + B(h0011, q1))

    # REF2 (26)
    pj1 = _ParamJet(prob, x0_tree, params, lens1)
    pj2 = _ParamJet(prob, x0_tree, params, lens2)
    h000010 = solveC(0.0, pj1.J1()).real
    h000001 = solveC(0.0, pj2.J1()).real
    g110 = _dot(p1, B(q1, h000010) + pj1.A1(q1))
    g210 = _dot(p2, B(q2, h000010) + pj1.A1(q2))
    g101 = _dot(p1, B(q1, h000001) + pj2.A1(q1))
    g201 = _dot(p2, B(q2, h000001) + pj2.A1(q2))
    Gam = np.array([[g110, g101], [g210, g201]])

    # REF2 (22)/(28) for each NS family
    f2100 = float(np.real(G2100)) / 2.0
    alpha1 = np.linalg.solve(np.real(Gam),
                             np.array([f2100, float(np.real(G1110))]))
    dw1_1, dw2_1 = (np.array([np.imag(G2100) / 2.0, np.imag(G1110)])
                    - np.imag(Gam) @ alpha1)
    f0021 = float(np.real(G0021)) / 2.0
    alpha2 = np.linalg.solve(np.real(Gam),
                             np.array([float(np.real(G1011)), f0021]))
    dw1_2, dw2_2 = (np.array([np.imag(G1011), np.imag(G0021) / 2.0])
                    - np.imag(Gam) @ alpha2)

    return {
        "x0": np.asarray(fp.flat0), "w1": w1, "w2": w2,
        "q1": q1, "q2": q2, "p1": p1, "p2": p2,
        "G2100": G2100, "G0021": G0021, "G1110": G1110, "G1011": G1011,
        "h1100": h1100, "h0011": h0011, "h2000": h2000, "h0020": h0020,
        "h000010": h000010, "h000001": h000001,
        "ns1": {"alpha": alpha1, "dw1": float(dw1_1), "dw2": float(dw2_1)},
        "ns2": {"alpha": alpha2, "dw1": float(dw1_2), "dw2": float(dw2_2)},
        "p10": float(lens1.get(params)), "p20": float(lens2.get(params)),
    }


def predictor_ns_hh(nf: dict, eps: float, which: int = 1):
    """NS-of-PO predictors from an HH point, one per Hopf family
    (ref predictor(hh, Val{:NS}), src/codim2/NormalForms.jl:1574-1624)."""
    par0 = np.array([nf["p10"], nf["p20"]])
    if which == 1:
        ns = nf["ns1"]
        x = np.real(nf["x0"] + eps ** 2
                    * np.real(nf["h1100"] - (nf["h000010"] * ns["alpha"][0]
                                             + nf["h000001"]
                                             * ns["alpha"][1])))
        q, h2 = nf["q1"], nf["h2000"]
        # own frequency + the OTHER family's frequency wind the NS angle
        w_own = nf["w1"] + ns["dw1"] * eps ** 2
        w_oth = nf["w2"] + ns["dw2"] * eps ** 2
    else:
        ns = nf["ns2"]
        x = np.real(nf["x0"] + eps ** 2
                    * np.real(nf["h0011"] - (nf["h000010"] * ns["alpha"][0]
                                             + nf["h000001"]
                                             * ns["alpha"][1])))
        q, h2 = nf["q2"], nf["h0020"]
        w_own = nf["w2"] + ns["dw2"] * eps ** 2
        w_oth = nf["w1"] + ns["dw1"] * eps ** 2

    def orbit(theta):
        return np.real(x + 2 * eps * np.real(q * np.exp(1j * theta))
                       + 2 * eps ** 2 * np.real(h2 * np.exp(2j * theta)))

    k = float(np.mod(w_oth / w_own * 2 * np.pi, 2 * np.pi))
    pars = par0 - ns["alpha"] * eps ** 2
    return {"orbit": orbit, "T": float(2 * np.pi / w_own), "k": k,
            "p1": float(pars[0]), "p2": float(pars[1])}


# ---------------------------------------------------------------------------
# Bogdanov-Takens: detailed unfolding (REF3) + homoclinic predictor
# ---------------------------------------------------------------------------


def bt_unfolding(prob, x0_tree, params, lens1, lens2, pt=None,
                 matrix_free: bool = False, precond=None, gmres_opts=None):
    """Detailed BT normal form following REF3 (Al-Hdaibat et al. 2016),
    ref src/codim2/NormalForms.jl:195-340: the parameter transformation
    (K10, K11, K2) and the center-manifold expansions (H...) needed for
    the Lindstedt-Poincare homoclinic predictor — plus exact-parameter
    Hopf/fold curve predictors.

    `matrix_free=True` routes every linear solve through the
    preconditioned extended bordered operators (the reference's `bls` +
    `solve_bls_block` realization, src/codim2/NormalForms.jl:40-41,
    148-149,258-262) — a BT detected on a 15k-dof MF fold curve gets its
    full unfolding and homoclinic predictor with nothing materialized.
    All jets (B, C3, parameter derivatives) were already matrix-free AD."""
    from .normal_forms import bt_normal_form

    if pt is None:
        pt = bt_normal_form(prob, x0_tree, params,
                            matrix_free=matrix_free, precond=precond,
                            gmres_opts=gmres_opts)
    a, b = pt.nf["a"], pt.nf["b"]
    q0, q1 = (np.asarray(v, dtype=np.float64) for v in pt.zeta)
    p0, p1 = (np.asarray(v, dtype=np.float64) for v in pt.zeta_star)

    fp = _FlatProblem(prob, x0_tree, params)
    n = fp.n
    B = lambda u, v: np.asarray(fp.d2F(jnp.asarray(u), jnp.asarray(v)))
    C3 = lambda u, v, w: np.asarray(fp.d3F(jnp.asarray(u), jnp.asarray(v),
                                           jnp.asarray(w)))

    if matrix_free:
        from ..core.state import ravel as _ravel
        from .minaug_mf import _make_ma_gmres, solve_bordered_ext

        if precond is None:
            precond = getattr(prob, "spectral_precond", None)
        gm = _make_ma_gmres(precond, n, 1, gmres_opts)
        Jd = lambda d: fp.dF(d)                   # noqa: E731
        p1j, q0j = jnp.asarray(p1), jnp.asarray(q0)

        @jax.jit
        def _ainv(dx):
            v, _, _ = solve_bordered_ext(Jd, p1j, q0j, gm,
                                         rhs_top=jnp.asarray(dx),
                                         rhs_bot=0.0)
            return v

        def Ainv(dx):
            return np.asarray(_ainv(jnp.asarray(dx)))

        L = None
    else:
        L = np.asarray(fp.jacobian(), dtype=np.float64)

        def Ainv(dx):
            # bordered [L, p1; q0^T, 0] (L singular with ker = span(q0))
            return _bord_solve(L, p1, q0, dx)

    H2000 = Ainv(2.0 * a * q1 - B(q0, q0))
    gam = (-2.0 * np.dot(p0, H2000) + 2.0 * np.dot(p0, B(q0, q1))
           + np.dot(p1, B(q1, q1))) / 2.0
    H2000 = H2000 + gam * q0
    H1100 = Ainv(b * q1 + H2000 - B(q0, q1))
    H0200 = Ainv(2.0 * H1100 - B(q1, q1))

    # Hessian-of-(p.F) contractions: A12_i = p^T B(q0, .) rows
    _, unr = ravel(x0_tree)
    flat0 = np.asarray(fp.flat0)

    def pB(p_vec):
        """Vector w with w_i = p^T B(e_i, q) for q supplied later — here
        returns the map q -> H(p.F) q as a matrix-free closure via AD."""
        pv = jnp.asarray(p_vec)

        def hq(q_vec):
            g = jax.grad(lambda y: jnp.dot(
                pv, ravel(prob.F(unr(y), params))[0]))
            return np.asarray(jax.jvp(g, (jnp.asarray(flat0),),
                                      (jnp.asarray(q_vec),))[1])

        return hq

    Hp1 = pB(p1)
    Hp0 = pB(p0)
    A12_1 = Hp1(q0)
    A12_2 = Hp0(q0) + Hp1(q1)

    pj1 = _ParamJet(prob, x0_tree, params, lens1)
    pj2 = _ParamJet(prob, x0_tree, params, lens2)
    J1_1, J1_2 = pj1.J1(), pj2.J1()
    A22 = np.array([
        [np.dot(p1, pj1.A1(q0)), np.dot(p1, pj2.A1(q0))],
        [np.dot(p0, pj1.A1(q0)) + np.dot(p1, pj1.A1(q1)),
         np.dot(p0, pj2.A1(q0)) + np.dot(p1, pj2.A1(q1))]])

    if matrix_free:
        # 2-border extended operator, preconditioned GMRES (the
        # reference's solve_bls_block, src/codim2/NormalForms.jl:258-262)
        from ..linalg.linear import GMRES as _GMRES
        from .minaug_mf import ext_precond as _extp

        J1_1j, J1_2j = jnp.asarray(J1_1), jnp.asarray(J1_2)
        A12_1j, A12_2j = jnp.asarray(A12_1), jnp.asarray(A12_2)
        A22j = jnp.asarray(A22)
        o2 = dict(restart=40, maxiter=240, rtol=1e-10, atol=1e-14)
        if gmres_opts:
            o2.update(gmres_opts)
        gm2b = _GMRES(precond=_extp(precond, n), **o2)
        Jd2 = lambda d: fp.dF(d)                  # noqa: E731

        def _op2(z):
            zx, za, zb = z[:n], z[n], z[n + 1]
            top = Jd2(zx) + za * J1_1j + zb * J1_2j
            r1 = jnp.dot(A12_1j, zx) + A22j[0, 0] * za + A22j[0, 1] * zb
            r2 = jnp.dot(A12_2j, zx) + A22j[1, 0] * za + A22j[1, 1] * zb
            return jnp.concatenate([top, r1[None], r2[None]])

        @jax.jit
        def _block_solve(rhs):
            sol, _, _ = gm2b(_op2, rhs)
            return sol

        def solve_block(rhs_top, rhs_bot):
            rhs = jnp.asarray(np.concatenate([rhs_top, rhs_bot]))
            sol = np.asarray(_block_solve(rhs))
            return sol[:n], sol[n:]
    else:
        def solve_block(rhs_top, rhs_bot):
            M = np.zeros((n + 2, n + 2))
            M[:n, :n] = L
            M[:n, n] = J1_1
            M[:n, n + 1] = J1_2
            M[n, :n] = A12_1
            M[n + 1, :n] = A12_2
            M[n:, n:] = A22
            rhs = np.concatenate([rhs_top, rhs_bot])
            sol = np.linalg.solve(M, rhs)
            return sol[:n], sol[n:]

    c = 3.0 * np.dot(p0, H1100) - np.dot(p0, B(q1, q1))
    H0010, K10 = solve_block(q1, np.array([np.dot(p1, B(q1, q1)) / 2.0, c]))
    H0001, K11 = solve_block(np.zeros(n), np.array([0.0, 1.0]))

    # K2 (REF3): note the reference has a J2_11 typo in the last term of
    # J2K; the correct quadratic form uses J2_22
    J2_11 = _dd_p2(prob, x0_tree, params, lens1, lens1)
    J2_22 = _dd_p2(prob, x0_tree, params, lens2, lens2)
    J2_12 = _dd_p2(prob, x0_tree, params, lens1, lens2)
    k1_ = np.dot(p1, B(H0001, H0001))
    k2_ = (np.dot(p1, pj1.A1(H0001)) * K11[0]
           + np.dot(p1, pj2.A1(H0001)) * K11[1])
    J2K = (J2_11 * K11[0] ** 2 + 2.0 * J2_12 * K11[0] * K11[1]
           + J2_22 * K11[1] ** 2)
    k3_ = np.dot(p1, J2K)
    K2 = -(k1_ + 2.0 * k2_ + k3_) * K10

    h0002 = (B(H0001, H0001)
             + pj1.A1(H0001) * (2.0 * K11[0]) + pj2.A1(H0001)
             * (2.0 * K11[1]) + J2K + J1_1 * K2[0] + J1_2 * K2[1])
    H0002 = -Ainv(h0002)

    h1001 = (B(q0, H0001) + pj1.A1(q0) * K11[0] + pj2.A1(q0) * K11[1])
    H1001 = -Ainv(h1001)

    h0101 = (B(q1, H0001) + pj1.A1(q1) * K11[0] + pj2.A1(q1) * K11[1]
             - H1001 - q1)
    H0101 = -Ainv(h0101)

    h3000 = C3(q0, q0, q0) + 3.0 * B(q0, H2000) - 6.0 * a * H1100
    d = np.dot(p1, h3000) / 6.0
    H3000 = -Ainv(h3000 - 6.0 * d * q1)

    e = (np.dot(p1, C3(q0, q0, q0)) + 2.0 * np.dot(p1, B(q0, H1100))
         + np.dot(p1, B(q1, H2000)) - 2.0 * b * np.dot(p1, H1100)
         - 2.0 * a * np.dot(p1, H0200) - np.dot(p1, H3000)) / 2.0

    h2001 = (C3(q0, q0, H0001) + 2.0 * B(q0, H1001) + B(H0001, H2000)
             + pj1.B1(q0, q0) * K11[0] + pj2.B1(q0, q0) * K11[1]
             + pj1.A1(H2000) * K11[0] + pj2.A1(H2000) * K11[1]
             - 2.0 * a * H0101)
    a1 = np.dot(p1, h2001) / 2.0
    H2001 = -Ainv(h2001 - 2.0 * a1 * q1)

    b1 = (np.dot(p1, C3(q0, q1, H0001))
          + np.dot(p1, pj1.B1(q0, q1)) * K11[0]
          + np.dot(p1, pj2.B1(q0, q1)) * K11[1]
          + np.dot(p1, B(q1, H1001)) + np.dot(p1, B(H0001, H1100))
          + np.dot(p1, B(q0, H0101))
          + np.dot(p1, pj1.A1(H1100)) * K11[0]
          + np.dot(p1, pj2.A1(H1100)) * K11[1]
          - b * np.dot(p1, H0101) - np.dot(p1, H1100)
          - np.dot(p1, H2001))

    nf = dict(pt.nf)
    nf.update({"K10": K10, "K11": K11, "K2": K2, "gamma": gam, "c": c,
               "d": float(d), "e": float(e), "a1": float(a1),
               "b1": float(b1), "H0001": H0001, "H0010": H0010,
               "H0002": H0002, "H1001": H1001, "H2000": H2000,
               "q0": q0, "q1": q1,
               "x0": flat0,
               "p10": float(lens1.get(params)),
               "p20": float(lens2.get(params))})
    return nf


def predictor_homoclinic_bt(nf: dict, eps: float):
    """Lindstedt-Poincare homoclinic predictor near a BT point (REF3
    formulas 63/69/71; ref predictor(bt, Val{:HomoclinicCurve}),
    src/codim2/NormalForms.jl:446-506).  Returns the parameter curve
    alpha(eps) and the orbit xi -> x(xi) (xi = eps * t)."""
    a, b = nf["a"], nf["b"]
    b1, e, d, a1 = nf["b1"], nf["e"], nf["d"], nf["a1"]
    K10, K11, K2 = nf["K10"], nf["K11"], nf["K2"]
    par0 = np.array([nf["p10"], nf["p20"]])
    q0, q1 = nf["q0"], nf["q1"]

    # formula 63
    tau2 = (4.0 / a * (25.0 / 49.0 * b1 - e / b)
            + 2.0 / (49.0 * a ** 2)
            * (144.0 / 49.0 * b ** 2 - 25.0 * b * a1 + 73.0 * d))

    def alpha(ep):
        # formula 69
        return (par0 + (10.0 * b * ep ** 2 / (7.0 * a)) * K11
                + ep ** 4 / a * (-4.0 * K10
                                 + 50.0 * b ** 2 / (49.0 * a) * K2
                                 + b * tau2 * K11))

    def u0(xi):
        return -6.0 / np.cosh(xi) ** 2 + 2.0

    def v0(xi):
        return 12.0 * np.tanh(xi) / np.cosh(xi) ** 2

    def v1(xi):
        return -6.0 * b / (7.0 * a) * np.tanh(xi) * v0(xi)

    def u2(xi):
        return (-3.0 / (49.0 * a ** 2)
                * (6.0 * b ** 2 - 70.0 * b * a1 + 49.0 * d)
                / np.cosh(xi) ** 2
                - 2.0 * (5.0 * a1 * b + 7.0 * d) / (7.0 * a ** 2))

    def orbit(t, ep=eps):
        # formula 71 (u1 = 0)
        xi = ep * t
        return (nf["x0"]
                + (ep ** 2 / a) * (10.0 * b / 7.0 * nf["H0001"]
                                   + u0(xi) * q0)
                + (ep ** 3 / a) * (v0(xi) * q1)
                + (ep ** 4 / a) * (-4.0 * nf["H0010"]
                                   + 50.0 * b ** 2 / (49.0 * a)
                                   * nf["H0002"]
                                   + b * tau2 * nf["H0001"]
                                   + u2(xi) * q0 + v1(xi) * q1
                                   + 1.0 / (2.0 * a) * u0(xi) ** 2
                                   * nf["H2000"]
                                   + 10.0 * b / (7.0 * a) * u0(xi)
                                   * nf["H1001"]))

    pars = alpha(eps)
    return {"alpha": alpha, "orbit": orbit, "tau2": float(tau2),
            "p1": float(pars[0]), "p2": float(pars[1])}


# ---------------------------------------------------------------------------
# Switching: codim-2 equilibrium point -> PO codim-2 curve
# ---------------------------------------------------------------------------


def _curve_omega_sp(sp, maprob):
    """Hopf frequency stored in the extended MA state (hopf curves only)."""
    if getattr(maprob, "ma_kind", None) == "hopf":
        X = np.asarray(sp.x)
        n = maprob.n_inner
        if X.shape[0] > n + 1:
            return abs(float(X[n + 1]))
    return None


def _codim2_point_context(br_codim2, ind_bif):
    """Extract (inner problem, x0 tree, params at the point, lens1, lens2)
    from a codim-2 MA branch special point."""
    gamma = getattr(br_codim2, "gamma", br_codim2)
    sp = gamma.specialpoint[ind_bif]
    maprob = gamma.prob
    inner = maprob.inner_prob
    n = maprob.n_inner
    X = jnp.asarray(sp.x)
    x = maprob.unravel_inner(X[:n])
    p1 = float(X[n])
    par_dict = {"_inner": maprob.inner_lens.set(
        gamma.prob.params["_inner"], p1)}
    par_dict = maprob.lens.set(par_dict, sp.param)
    params = par_dict["_inner"]
    return sp, inner, x, params, maprob.inner_lens, maprob.outer_lens


def switch_codim2_po(br_codim2, ind_bif: int, contparams, disc=None,
                     eps: float = 0.05, which: int = 1,
                     newton_options=None, verbose: bool = False,
                     as_type: Optional[str] = None, **kwargs):
    """Start a PO codim-2 MA curve from a codim-2 equilibrium point
    (ref the :FoldPeriodicOrbitCont / :NS predictors composed with the
    PO-MA continuation, src/codim2/NormalForms.jl:935,1283,1536-1574):

      gh (Bautin)    -> fold-of-PO curve
      zh (Zero-Hopf) -> NS (torus) curve
      hh (Hopf-Hopf) -> NS curve of family `which` (1 or 2)

    Pipeline: detailed unfolding at the point (exact AD parameter
    derivatives) -> predicted orbit/period/2-parameter point at amplitude
    `eps` -> Newton on the PO functional at the predicted parameters ->
    monodromy eigenpair near the predicted multiplier -> functional PO-MA
    continuation in the second parameter."""
    from ..core.params import NewtonPar
    from ..periodic.codim2 import _po_codim2_from_data
    from ..periodic.collocation import Collocation
    from ..periodic.orbits import newton_po, periodic_orbit_problem

    sp, inner, x, params, lens1, lens2 = _codim2_point_context(
        br_codim2, ind_bif)
    sp_type = as_type or sp.type
    # on a matrix-free MA curve the unfolding at the point routes through
    # the bordered/iterative solvers too (nothing materialized)
    _maprob = getattr(br_codim2, "gamma", br_codim2).prob
    mf_kw = {}
    if bool(getattr(_maprob, "ma_mf", False)):
        mf_kw = dict(matrix_free=True,
                     precond=getattr(_maprob, "precond", None))
        om = _curve_omega_sp(sp, _maprob)
        if om is not None and sp_type in ("gh", "zh"):
            mf_kw["omega"] = om
    if sp_type == "gh":
        nf = bautin_unfolding(inner, x, params, lens1, lens2, **mf_kw)
        pred = predictor_fold_po(nf, eps)
        kind, theta_pred = "fold", 0.0
    elif sp_type == "zh":
        nf = zh_unfolding(inner, x, params, lens1, lens2, **mf_kw)
        pred = predictor_ns_zh(nf, eps)
        if not pred["hasNS"]:
            raise ValueError(
                "this ZH point has no NS curve (Re(G110) * G011 >= 0)")
        kind, theta_pred = "ns", pred["k"]
    elif sp_type == "hh":
        nf = hh_unfolding(inner, x, params, lens1, lens2, **mf_kw)
        pred = predictor_ns_hh(nf, eps, which=which)
        kind, theta_pred = "ns", pred["k"]
    else:
        raise ValueError(f"point {ind_bif} has type {sp_type!r}; expected "
                         "gh/zh/hh")
    if verbose:
        print(f"switch_codim2_po[{sp_type}->{kind}]: predicted "
              f"(p1, p2) = ({pred['p1']:.6g}, {pred['p2']:.6g}), "
              f"T = {pred['T']:.6g}, theta = {theta_pred:.4g}")

    disc = disc or Collocation(Ntst=40, m=4)
    par_pred = lens2.set(lens1.set(params, pred["p1"]), pred["p2"])
    _, unravel = ravel(inner.u0)
    flat_n = np.asarray(ravel(inner.u0)[0]).shape[0]
    vf = inner.re_make(params=par_pred)

    X0 = disc.generate_solution(pred["orbit"], pred["T"], flat_n)
    if kind == "fold":
        # do NOT Newton the plain PO problem first: at fixed parameters it
        # walks the predicted fold-amplitude orbit to the nearby REGULAR
        # cycle of the family, after which the MA corrector can collapse
        # onto the spurious zero-amplitude (Hopf-curve) solution.  The
        # predictor orbit sits AT the fold — hand it to the MA corrector
        # directly (its bordered Newton owns the (orbit, p1) unknowns).
        Xs = X0
    else:
        nopts = newton_options or NewtonPar(tol=1e-9, max_iterations=30)
        sol, _ = newton_po(vf, disc, X0, options=nopts)
        if not bool(sol.converged):
            raise RuntimeError(
                "switch_codim2_po: Newton on the predicted orbit failed; "
                "try a different eps")
        Xs = sol.u
        if verbose:
            print(f"switch_codim2_po: orbit converged, T = "
                  f"{float(disc.period(Xs)):.6g}")

    # rebuild the PO problem WITH the full machinery (sections etc.) at
    # the (converged / predicted) orbit, then locate the critical
    # multiplier
    po_prob = periodic_orbit_problem(vf, disc, Xs,
                                     use_cop=isinstance(disc, Collocation))
    par_po = po_prob.params
    M = disc.monodromy(vf, Xs, par_po)
    mult, vecs = dense_eig(M)
    mult_np = np.asarray(mult)
    if kind == "ns":
        target = np.exp(1j * theta_pred)
        cand = np.where(mult_np.imag > 1e-8)[0]
        if len(cand) == 0:
            raise RuntimeError("no complex multiplier pair at the "
                               "predicted NS orbit")
        i0 = cand[int(np.argmin(np.abs(mult_np[cand] - target)))]
        theta = float(np.angle(mult_np[i0]))
    else:
        order = np.argsort(np.abs(mult_np - 1.0))
        i0 = int(order[1]) if len(order) > 1 else int(order[0])
        theta = None
    zeta = np.asarray(vecs)[:, i0]
    multT, vecsT = dense_eig(M.T)
    iT = int(np.argmin(np.abs(np.asarray(multT) - np.conj(mult_np[i0]))))
    zeta_ad = np.asarray(vecsT)[:, iT]
    if verbose:
        print(f"switch_codim2_po: critical multiplier "
              f"{complex(mult_np[i0]):.6g}")

    start = (jnp.asarray(Xs), pred["p1"], theta, jnp.asarray(zeta),
             jnp.asarray(zeta_ad), par_po)
    # lens2 is a Lens over the inner vf params — the PO-MA machinery
    # accepts it directly
    try:
        out = _po_codim2_from_data(po_prob, start, lens2, contparams, kind,
                                   bp=sp, **kwargs)
        if kind == "ns":
            # the NS sigma vanishes SPURIOUSLY at theta = 0 (mod 2 pi)
            # through the trivial +1 multiplier; a corrector that escaped
            # to that basin produces a fake "NS curve" riding the plain
            # orbit family — detect and fall back
            thetas = np.asarray(out.gamma._table().get("theta", []))
            if len(thetas) and np.min(np.abs(np.sin(thetas / 2.0))) < 0.02:
                raise RuntimeError(
                    "NS MA collapsed onto the trivial multiplier "
                    f"(theta -> {thetas[np.argmin(np.abs(np.sin(thetas/2)))]:.4f})")
        return out
    except RuntimeError as err:
        if kind != "ns":
            raise
        # the direct MA start can sit too close to the ZH/HH degeneracy
        # (the MA jacobian condition grows like 1/eps there and the
        # predictor error makes the first corrector non-monotone).  Fall
        # back to the reference's on-branch flow: continue the ORBIT
        # branch in p1 through the predicted point with Floquet detection,
        # then start the NS MA from the DETECTED crossing
        # (ref the continuation(br_po, ind, lens2) dispatch).
        if verbose:
            print(f"switch_codim2_po: direct MA start failed ({err}); "
                  "falling back to on-branch NS detection")
        from ..periodic.codim2 import continuation_ns
        from ..periodic.floquet import FloquetColl
        from ..periodic.orbits import continuation_po

        # sweep axis 1 (p1 = the vf's own lens); if the NS level set is
        # near-tangent to that axis (it can be, e.g. Lorenz-84), sweep
        # axis 2 instead and start the MA with the parameter roles swapped
        attempts = ((vf, pred["p1"], lens2),
                    (vf.re_make(lens=lens2), pred["p2"], lens1))
        for vf_c, p_c, lens_curve in attempts:
            cpo = contparams.replace(
                ds=abs(contparams.ds), dsmax=max(contparams.dsmax, 0.01),
                p_min=p_c - 0.25, p_max=p_c + 0.25,
                max_steps=20, detect_bifurcation=3, detect_event=0,
                n_inversion=4, tol_stability=1e-5,
                newton_options=contparams.newton_options.replace(
                    linesearch=False, eigsolver=FloquetColl()))
            br_po = continuation_po(vf_c, disc, Xs, cpo,
                                    use_cop=isinstance(disc, Collocation),
                                    floquet="coll", bothside=True)
            ns_pts = [i for i, s2 in enumerate(br_po.gamma.specialpoint)
                      if s2.type == "ns"]
            if ns_pts:
                if verbose:
                    print("switch_codim2_po: NS detected on the orbit "
                          "branch at "
                          f"{br_po.gamma.specialpoint[ns_pts[0]].param:.6g}"
                          f" (sweep lens {as_lens(vf_c.lens).name})")
                out = continuation_ns(br_po, ns_pts[0], lens_curve,
                                      contparams, **kwargs)
                out.bp = sp
                return out
        raise RuntimeError(
            "switch_codim2_po: no NS crossing detected on the orbit "
            "branch around the predicted point (both parameter sweeps)"
        ) from err
