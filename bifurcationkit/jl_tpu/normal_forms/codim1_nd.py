"""Nd-kernel normal forms (ref get_normal_formNd, src/NormalForms.jl:656-899)
and the reduced-equation root solve used by `multicontinuation`
(ref src/bifdiagram/BranchSwitching.jl:234-441)."""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..detection.points import NdBranchPoint
from ..linalg.eig import dense_eig
from .codim1 import _FlatProblem, _inner


def biorthogonalise(zetas, zetas_ad):
    """Make <zeta_i, zeta*_j> = delta_ij (ref biorthogonalise,
    src/NormalForms.jl:48-92); adjusts the left vectors only."""
    N = len(zetas)
    G = np.array([[np.real(np.vdot(z, za)) for za in zetas_ad]
                  for z in zetas])
    if abs(np.linalg.det(G)) <= 1e-14:
        raise RuntimeError("Gram matrix singular in biorthogonalisation; "
                           "increase nev")
    Q = np.linalg.pinv(G)
    new_ad = [sum(Q.T[i, j] * zetas_ad[j] for j in range(N))
              for i in range(N)]
    G2 = np.array([[np.real(np.vdot(z, za)) for za in new_ad]
                   for z in zetas])
    if np.max(np.abs(G2 - np.eye(N))) > 1e-5:
        raise RuntimeError("bi-orthogonalisation failed; increase nev")
    return zetas, new_ad


def _nd_basis_mf(fp, prob, parbif, N: int, seeds=None, precond=None,
                 gmres_opts=None, sweeps: int = 3):
    """Matrix-free N-dimensional (right, left) kernel bases by BLOCK
    bordered inverse iteration: the N-border extended operator
    [J, W; V^T, 0] is nonsingular at the bifurcation (W spans the
    cokernel estimate), and the [0; e_i]-driven solves return kernel
    vectors EXACTLY there (the scalar slots must vanish — same argument
    as the BT chain solves); re-anchoring + QR converges the block.
    The PDE-scale replacement for the two dense_eig calls (the reference
    computes the same bases through its eigensolver abstraction,
    ref src/NormalForms.jl:656-720)."""
    import jax

    from ..codim2.minaug_mf import _make_ma_gmres

    n = fp.n
    if precond is None:
        precond = getattr(prob, "spectral_precond", None)
    gm = _make_ma_gmres(precond, n, 1, gmres_opts)
    from ..core.state import ravel as _ravel

    Jd = lambda d: fp.dF(d)                       # noqa: E731
    Jtd = lambda d: _ravel(prob.dFt(              # noqa: E731
        fp.unravel(fp.flat0), parbif, fp.unravel(d)))[0]

    eyeN = jnp.eye(N, dtype=np.asarray(fp.flat0).dtype)

    def _solveN(Jop, cols, rows, ei):
        def op(z):
            zx, zs = z[:n], z[n:]
            return jnp.concatenate([Jop(zx) + cols @ zs, rows.T @ zx])

        rhs = jnp.concatenate([jnp.zeros((n,), cols.dtype), ei])
        sol, _, _ = gm(op, rhs)
        return sol[:n]

    @jax.jit
    def _sweep(V, W):
        Vn = jax.vmap(lambda ei: _solveN(Jd, W, V, ei),
                      out_axes=1)(eyeN)
        Vn, _ = jnp.linalg.qr(Vn)
        Wn = jax.vmap(lambda ei: _solveN(Jtd, Vn, W, ei),
                      out_axes=1)(eyeN)
        Wn, _ = jnp.linalg.qr(Wn)
        return Vn, Wn

    if seeds is None:
        rng = np.random.default_rng(31)
        seeds = rng.standard_normal((n, N))
    V = jnp.asarray(np.asarray(seeds, np.asarray(fp.flat0).dtype))
    V, _ = jnp.linalg.qr(V)
    W = V
    for _ in range(sweeps):
        V, W = _sweep(V, W)
    return V, W, gm


def get_normal_form_nd(prob, br, ind_bif: int, verbose: bool = False,
                       tol_fold: float = 1e-3, matrix_free: bool = False,
                       precond=None, gmres_opts=None):
    """Nd-kernel normal form.  `matrix_free=True` = the PDE-scale route:
    kernel/adjoint bases by block bordered inverse iteration and every
    Lyapunov-Schmidt projection through the N-border extended operator
    with preconditioned GMRES — nothing materializes the jacobian
    (completes the r4/r5 matrix-free NF family for multi-dimensional
    kernels, e.g. the reference's D4 Mittelmann aBS use case)."""
    import jax

    sp = br.specialpoint[ind_bif]
    N = abs(sp.delta[0])
    assert N > 1, "use get_normal_form1d for 1d kernels"
    p = sp.param
    parbif = prob.set_lens_param(prob.params, p)
    fp = _FlatProblem(prob, sp.x, parbif)
    n = fp.n

    seeds = None
    if sp.eigenvecs is not None and sp.eigenvals is not None:
        ind = max(int(sp.ind_ev), N)
        vecs = np.asarray(sp.eigenvecs)
        seeds = np.stack([np.real(vecs[:, i])
                          for i in range(ind - N, ind)], axis=1)

    if matrix_free:
        L = None
        Vb, Wb, gm = _nd_basis_mf(fp, prob, parbif, N, seeds=seeds,
                                  precond=precond, gmres_opts=gmres_opts)
        zetas = [np.asarray(Vb[:, i]) for i in range(N)]
        zetas_ad = [np.asarray(Wb[:, i]) for i in range(N)]
        zetas, zetas_ad = biorthogonalise(zetas, zetas_ad)
        colsb = jnp.asarray(np.stack(zetas_ad, axis=1))
        rowsb = jnp.asarray(np.stack(zetas, axis=1))
        Jd = lambda d: fp.dF(d)                   # noqa: E731

        @jax.jit
        def _bls_mf(rhs):
            def op(z):
                zx, zs = z[:n], z[n:]
                return jnp.concatenate([Jd(zx) + colsb @ zs,
                                        rowsb.T @ zx])

            rhsx = jnp.concatenate([rhs, jnp.zeros((N,), rhs.dtype)])
            sol, _, _ = gm(op, rhsx)
            return sol[:n]

        def bls(rhs):
            return np.asarray(_bls_mf(jnp.asarray(np.asarray(rhs))))
    else:
        L = np.asarray(fp.jacobian())
        # kernel basis: eigenvectors for the N eigenvalues closest to zero
        if seeds is not None:
            zetas = [seeds[:, i] for i in range(N)]
        else:
            vals, vecs = dense_eig(jnp.asarray(L))
            vals = np.asarray(vals)
            order = np.argsort(np.abs(vals.real))[:N]
            zetas = [np.real(np.asarray(vecs)[:, i]) for i in order]
        zetas = [z / np.linalg.norm(z) for z in zetas]

        # adjoint basis
        valsT, vecsT = dense_eig(jnp.asarray(L.T))
        valsT = np.asarray(valsT)
        orderT = np.argsort(np.abs(valsT.real))[:N]
        zetas_ad = [np.real(np.asarray(vecsT)[:, i]) for i in orderT]
        zetas, zetas_ad = biorthogonalise(zetas, zetas_ad)

    def E(x):
        """Projection onto Range(L)."""
        x = np.asarray(x)
        for z, za in zip(zetas, zetas_ad):
            x = x - np.real(np.vdot(za, x)) * z
        return x

    if not matrix_free:
        # block-bordered solve: [L  Z*; Z' 0][w; s] = [rhs; 0]
        A = np.zeros((n + N, n + N))
        A[:n, :n] = L
        for i in range(N):
            A[:n, n + i] = zetas_ad[i]
            A[n + i, :n] = zetas[i]
        A_fact = A

        def bls(rhs):
            sol = np.linalg.solve(A_fact,
                                  np.concatenate([np.asarray(rhs),
                                                  np.zeros(N)]))
            return sol[:n]

    R2 = lambda a, b: np.asarray(fp.d2F(jnp.asarray(a), jnp.asarray(b)))
    R3 = lambda a, b, c: np.asarray(
        fp.d3F(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))

    R01 = np.asarray(fp.dFdp_at(p))
    R02 = np.asarray(fp.d2Fdp2_at(p))
    a01 = np.array([np.real(np.vdot(R01, za)) for za in zetas_ad])

    Psi01 = bls(-E(R01))
    b11 = np.zeros((N, N))
    a02 = np.zeros(N)
    for j in range(N):
        R11 = np.asarray(fp.dFdp_dir(jnp.asarray(zetas[j]), p))
        tmp = R11 + R2(zetas[j], Psi01)
        for i in range(N):
            b11[i, j] = np.real(np.vdot(tmp, zetas_ad[i]))
        R11Psi = np.asarray(fp.dFdp_dir(jnp.asarray(Psi01), p))
        a2v = R02 + 2 * R11Psi + R2(Psi01, Psi01)
        a02[j] = np.real(np.vdot(a2v, zetas_ad[j]))

    b20 = np.zeros((N, N, N))
    for j in range(N):
        for k in range(j, N):
            b2v = R2(zetas[j], zetas[k])
            for i in range(N):
                b20[i, j, k] = np.real(np.vdot(b2v, zetas_ad[i]))
                b20[i, k, j] = b20[i, j, k]

    b30 = np.zeros((N, N, N, N))
    for j in range(N):
        for k in range(N):
            for l in range(N):
                if (j == k == l) or (j == k) or (j < k < l):
                    b3v = R3(zetas[j], zetas[k], zetas[l])
                    w = bls(E(R2(zetas[l], zetas[k])))
                    b3v = b3v - R2(zetas[j], w)
                    w = bls(E(R2(zetas[l], zetas[j])))
                    b3v = b3v - R2(zetas[k], w)
                    w = bls(E(R2(zetas[k], zetas[j])))
                    b3v = b3v - R2(zetas[l], w)
                    for i in range(N):
                        c = np.real(np.vdot(b3v, zetas_ad[i]))
                        for I in {(j, k, l), (j, l, k), (k, j, l),
                                  (k, l, j), (l, j, k), (l, k, j)}:
                            b30[(i,) + I] = c

    nf = {"a01": a01, "a02": a02, "b11": b11, "b20": b20, "b30": b30}
    out = NdBranchPoint(x0=fp.flat0, p=p, params=parbif, lens=prob.lens,
                        zeta=zetas, zeta_star=zetas_ad, nf=nf, prob=prob)
    out.tau = sp.tau
    out.unravel = fp.unravel
    out.N = N
    if verbose:
        print(f"Nd normal form (N={N}): a01={a01}, b11=\n{b11}")
    return out


def reduced_equation(nf: dict, x: np.ndarray, dp: float) -> np.ndarray:
    """Evaluate the reduced system g_i(x, dp)
    (ref nf(::NdBranchPoint), src/NormalForms.jl:560-600)."""
    a01, a02 = nf["a01"], nf["a02"]
    b11, b20, b30 = nf["b11"], nf["b20"], nf["b30"]
    out = a01 * dp + a02 * dp ** 2 / 2 + (b11 @ x) * dp
    out = out + 0.5 * np.einsum("ijk,j,k->i", b20, x, x)
    out = out + np.einsum("ijkl,j,k,l->i", b30, x, x, x) / 6
    return out


def nd_branch_predictors(bp: NdBranchPoint, ds: float,
                         ampfactor: float = 1.0, perturb=None,
                         n_trials: int = 30, seed: int = 11) -> List[dict]:
    """Find the nontrivial roots of the reduced equation at dp = ±|ds| using
    deflated Newton on the N-dim polynomial system; return one predictor per
    distinct root (ref multicontinuation first stage,
    src/bifdiagram/BranchSwitching.jl:234-320)."""
    nf = bp.nf
    N = len(nf["a01"])
    rng = np.random.default_rng(seed)
    preds = []

    # characteristic root radii from the dominant balances of the reduced
    # equation: |b11 dp x| ~ |b20| x^2 / 2 (transcritical-like) and
    # ~ |b30| x^3 / 6 (pitchfork-like).  At symmetric (e.g. square-domain)
    # points b20 vanishes and the roots sit at the CUBIC radius, far outside
    # O(sqrt(ds)) — starts must cover all balances or Newton collapses onto
    # the trivial root.
    nb11 = max(np.abs(nf["b11"]).max(), 1e-16)
    nb20 = np.abs(nf["b20"]).max()
    nb30 = np.abs(nf["b30"]).max()
    adp = abs(ds)
    scales = [np.sqrt(adp) + adp]
    if nb20 > 1e-14:
        scales.append(2.0 * nb11 * adp / nb20)
    if nb30 > 1e-14:
        scales.append(np.sqrt(6.0 * nb11 * adp / nb30))
    scales = [s for s in scales if np.isfinite(s) and 1e-12 < s < 1e8]
    max_scale = max(scales)

    def _deflated_step(x, roots, dp):
        """One Newton step on M(x) g(x) with M = prod(1/||x-r||^2 + 1) over
        known roots INCLUDING the trivial one (ref: the reference solves the
        reduced equation with DeflationOperator-wrapped Newton,
        src/bifdiagram/BranchSwitching.jl:257-287)."""
        g = reduced_equation(nf, x, dp)
        J = _reduced_jac(nf, x, dp)
        M = 1.0
        gradM = np.zeros(N)
        for r in [np.zeros(N)] + roots:
            d = x - r
            d2 = float(d @ d)
            if d2 < 1e-24:
                return None
            f = 1.0 / d2 + 1.0
            M *= f
            gradM = gradM + (-2.0 / (d2 * d2 * f)) * d
        gradM = M * gradM
        Jd = M * J + np.outer(g, gradM)
        try:
            dx = np.linalg.solve(Jd, M * g)
        except np.linalg.LinAlgError:
            return None
        return x - dx

    for dp in (abs(ds), -abs(ds)):
        roots: List[np.ndarray] = []
        starts = []
        if N <= 4:
            from itertools import product

            for sigma in product((-1.0, 0.0, 1.0), repeat=N):
                if any(s != 0 for s in sigma):
                    for s_ in scales:
                        starts.append(np.asarray(sigma) * s_)
        for s_ in scales:
            starts += [rng.standard_normal(N) * s_ for _ in range(n_trials)]
        for x in starts:
            if perturb is not None:
                x = perturb(x)
            ok = True
            for _ in range(200):
                xn = _deflated_step(x, roots, dp)
                if xn is None:
                    ok = False
                    break
                step = np.linalg.norm(xn - x)
                x = xn
                if step < 1e-12:
                    break
            if not ok:
                continue
            if np.linalg.norm(reduced_equation(nf, x, dp)) < 1e-9 \
                    and np.linalg.norm(x) > 1e-8 * max_scale \
                    and np.linalg.norm(x) < 100 * max_scale:
                if not any(np.linalg.norm(x - r) < 1e-6 * max(1, max_scale)
                           for r in roots):
                    roots.append(x)
        for r in roots:
            x1 = np.asarray(bp.x0).copy()
            for j in range(N):
                x1 = x1 + ampfactor * r[j] * np.asarray(bp.zeta[j])
            preds.append({"x1": x1, "p": bp.p + dp, "amp": r,
                          "dp": dp})
    return preds


def _reduced_jac(nf, x, dp):
    b11, b20, b30 = nf["b11"], nf["b20"], nf["b30"]
    J = b11 * dp + np.einsum("ijk,k->ij", b20, x)
    J = J + 0.5 * np.einsum("ijkl,k,l->ij", b30, x, x)
    return J
