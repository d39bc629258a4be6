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
from .collocation import Collocation, legendre_matrices
from .flow import Flow


# ---------------------------------------------------------------------------
# Iooss periodic-eigenbasis normal form (collocation)
# ---------------------------------------------------------------------------


def _coll_integral(disc: Collocation, mesh, u_nodes, v_nodes):
    """∫_0^1 <u(t), v(t)> dt by Gauss quadrature of the node-interpolated
    functions, conjugating the first argument (LA.dot convention; ref ∫,
    PeriodicOrbitCollocation.jl:455-492)."""
    L, _, _, wg = legendre_matrices(disc.m)
    L = jnp.asarray(L)
    wg = jnp.asarray(wg)
    gu = jnp.einsum("li,jln->jin", L, disc.local_nodes(u_nodes))
    gv = jnp.einsum("li,jln->jin", L, disc.local_nodes(v_nodes))
    d = mesh[1:] - mesh[:-1]
    return jnp.sum(wg[None, :, None] * jnp.conj(gu) * gv
                   * (d[:, None, None] / 2.0))


def _coll_linear_operator(disc: Collocation, prob_vf, nodes, T, mesh, params,
                          transpose: bool = False, rho_f: float = 1.0,
                          rho_i: complex = 0.0, bc: str = "periodic"):
    """Dense matrix of the linearized collocation operator
    rows(w) = dL w - alpha (rho_f J0^(T) + rho_i I) w at the orbit's Gauss
    states, plus n boundary rows (ref po_analytical_jacobian,
    PeriodicOrbitCollocation.jl:646-724; _transpose/ρF/ρI options at
    :662-666; rho_i = -i*theta/T gives the Neimark-Sacker shift).
    bc: 'periodic' (w(1) - w(0) = 0) or 'antiperiodic' (w(0) + w(1) = 0,
    the period-doubling boundary condition)."""
    L, dL, _, _ = legendre_matrices(disc.m)
    L = jnp.asarray(L)
    dL = jnp.asarray(dL)
    n = nodes.shape[1]
    m, Ntst = disc.m, disc.Ntst
    U = disc.local_nodes(nodes)
    d = mesh[1:] - mesh[:-1]
    alpha = T * d / 2.0

    p = jnp.einsum("li,jln->jin", L, U)
    Jp = jax.vmap(lambda x: prob_vf.jacobian(x, params))(
        p.reshape(-1, n)).reshape(Ntst, m, n, n)
    if transpose:
        Jp = jnp.swapaxes(Jp, -1, -2)
    dtype = jnp.complex128 if (jnp.iscomplexobj(jnp.asarray(rho_i))
                               and jnp.any(jnp.imag(jnp.asarray(rho_i))
                                           != 0)) else nodes.dtype
    Jp = Jp.astype(dtype)
    eye = jnp.eye(n, dtype=dtype)

    def blocks_for(Jj, aj):
        # (m rows i) x (m+1 cols l) of n x n blocks:
        # dL[l, i] I - alpha L[l, i] (rho_f J0 + rho_i I)
        shifted = rho_f * Jj + rho_i * eye[None]
        blk = (dL[:, :].T[:, :, None, None] * eye[None, None]
               - aj * L[:, :].T[:, :, None, None] * shifted[:, None])
        # -> (m, m+1, n, n) -> (m*n, (m+1)*n)
        return blk.transpose(0, 2, 1, 3).reshape(m * n, (m + 1) * n)

    blocks = jax.vmap(blocks_for)(Jp, alpha)          # (Ntst, m*n, (m+1)*n)

    n_tot = (Ntst * m + 1) * n
    M = jnp.zeros((n_tot, n_tot), dtype=dtype)
    for j in range(Ntst):
        M = M.at[j * m * n:(j + 1) * m * n,
                 j * m * n:(j * m + m + 1) * n].set(blocks[j])
    # boundary rows
    if bc == "periodic":
        M = M.at[-n:, :n].set(-eye)
        M = M.at[-n:, -n:].set(eye)
    else:                       # antiperiodic / period-doubling
        M = M.at[-n:, :n].set(eye)
        M = M.at[-n:, -n:].set(eye)
    return M


def _null_bordered(M, key):
    """Null vector of a (numerically singular) square matrix via a bordered
    solve with refined borders (ref the extended-system kernel computation,
    periodicorbit/NormalForms.jl:612-637)."""
    nj = M.shape[0]
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    fdt = jnp.float64 if M.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    br = (jax.random.uniform(k1, (nj,), dtype=fdt) - 0.5).astype(M.dtype)
    bl = (jax.random.uniform(k2, (nj,), dtype=fdt) - 0.5).astype(M.dtype)
    rhs = jnp.zeros(nj + 1, dtype=M.dtype).at[-1].set(1.0)

    def solve(br_, bl_):
        Mb = jnp.zeros((nj + 1, nj + 1), dtype=M.dtype)
        Mb = Mb.at[:nj, :nj].set(M).at[:nj, -1].set(br_).at[-1, :nj].set(bl_)
        return Mb, jnp.linalg.solve(Mb, rhs)[:nj]

    Mb, k = solve(br, bl)
    l = jnp.linalg.solve(jnp.conj(Mb).T, rhs)[:nj]
    k = k / jnp.linalg.norm(k)
    l = l / jnp.linalg.norm(l)
    # refined borders: right border spans the left null space and vice versa
    _, v = solve(l, k)
    return v


def _pd_iooss_core(disc: Collocation, prob_vf, n: int, X, params, mesh,
                   detailed: bool = True):
    """Core of the Iooss PD normalization at one orbit point; returns a
    dict with a, b3, eigenfunctions (see period_doubling_iooss)."""
    nodes, T = disc.split(X, n)

    integral = lambda u, v: float(_coll_integral(disc, mesh, u, v))
    as_nodes = lambda w: w.reshape(disc.n_nodes, n)

    # v1: Floquet eigenfunction for mu = -1 (antiperiodic null function)
    J_pd = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                 bc="antiperiodic")
    v1 = _null_bordered(J_pd, 0)
    v1 = v1 / jnp.sqrt(_coll_integral(disc, mesh, as_nodes(v1),
                                      as_nodes(v1)))
    # adjoint eigenfunction: null of the transposed-vf operator with rho_f=-1
    J_pd_ad = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                    transpose=True, rho_f=-1.0,
                                    bc="antiperiodic")
    v1s = _null_bordered(J_pd_ad, 1)
    v1s = v1s / (2.0 * _coll_integral(disc, mesh, as_nodes(v1s),
                                      as_nodes(v1)))
    if not detailed:
        return {"a": 0.0, "b3": 0.0, "v1": v1, "v1s": v1s, "T": float(T)}

    # per-node jets along the orbit
    Fu0 = jax.vmap(lambda x: prob_vf.F(x, params))(nodes)
    v1n = as_nodes(v1)
    v1sn = as_nodes(v1s)
    Av = jax.vmap(lambda x, w: prob_vf.dF(x, params, w))(nodes, v1n)
    Bvv = jax.vmap(lambda x, w: prob_vf.d2F(x, params, w, w))(nodes, v1n)
    Cvvv = jax.vmap(
        lambda x, w: prob_vf.d3F(x, params, w, w, w))(nodes, v1n)

    # psi1*: periodic null function of the adjoint operator,
    # normalized by 2 * integral(psi1*, F(u0)) = 1
    J_psi = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                  transpose=True, rho_f=-1.0, bc="periodic")
    psi1s = _null_bordered(J_psi, 2)
    psi1s = psi1s / (2.0 * _coll_integral(disc, mesh, as_nodes(psi1s), Fu0))
    psi1sn = as_nodes(psi1s)

    a1 = _coll_integral(disc, mesh, psi1sn, Bvv)

    # h2 solve: [L_periodic  psi1*; grad integral(., psi1*)  0] h2 = Icoll rhs
    rhs_nodes = Bvv - 2.0 * a1 * Fu0
    J_h = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                bc="periodic")
    n_tot = J_h.shape[0]
    border = jax.grad(lambda w: _coll_integral(
        disc, mesh, w.reshape(disc.n_nodes, n), psi1sn))(
        jnp.zeros(n_tot, dtype=X.dtype))
    Mb = jnp.zeros((n_tot + 1, n_tot + 1), dtype=X.dtype)
    Mb = Mb.at[:n_tot, :n_tot].set(J_h)
    Mb = Mb.at[:n_tot, -1].set(psi1s)
    Mb = Mb.at[-1, :n_tot].set(border)
    # Icoll * rhs: dt-scaled Gauss interpolation rows + (rhs_end - rhs_0) BC
    L, _, _, _ = legendre_matrices(disc.m)
    L = jnp.asarray(L)
    d = mesh[1:] - mesh[:-1]
    g_rhs = jnp.einsum("li,jln->jin", L, disc.local_nodes(rhs_nodes)) \
        * (d[:, None, None] / 2.0)
    rhs_full = jnp.concatenate([
        g_rhs.ravel(), rhs_nodes[-1] - rhs_nodes[0],
        jnp.zeros(1, dtype=X.dtype)])
    h2 = jnp.linalg.solve(Mb, rhs_full)[:n_tot]
    h2n = as_nodes(h2)

    Bvh = jax.vmap(lambda x, w, h: prob_vf.d2F(x, params, w, h))(
        nodes, v1n, h2n)
    b3 = (_coll_integral(disc, mesh, v1sn, Cvvv) / (3.0 * T)
          + _coll_integral(disc, mesh, v1sn, Bvh)
          - 2.0 * a1 / T * _coll_integral(disc, mesh, v1sn, Av))
    return {"a": float(a1 / T), "b3": float(b3), "v1": v1, "v1s": v1s,
            "T": float(T)}


def _ns_iooss_core(disc: Collocation, prob_vf, n: int, X, params, mesh,
                   theta: float):
    """Core of the Iooss NS normalization at one orbit point (see
    neimark_sacker_iooss); theta = NS multiplier angle."""
    nodes, T = disc.split(X, n)
    as_nodes = lambda w: w.reshape(disc.n_nodes, n)
    integ = lambda u, v: complex(_coll_integral(disc, mesh, u, v))

    # v1: periodic part of the NS Floquet eigenfunction,
    # null of D - T A + i theta (ref :1038-1062)
    rho = complex(0.0, -theta / float(T))
    J_ns = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                 rho_i=rho, bc="periodic")
    v1 = _null_bordered(J_ns, 0)
    v1 = v1 / jnp.sqrt(jnp.real(_coll_integral(disc, mesh, as_nodes(v1),
                                               as_nodes(v1))))
    v1n = as_nodes(v1)

    # phi1*: real periodic null of the adjoint, <phi1*, F(u0)> = 1
    J_phi = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                  transpose=True, rho_f=-1.0, bc="periodic")
    phi1s = _null_bordered(J_phi, 1)
    Fu0 = jax.vmap(lambda x: prob_vf.F(x, params))(nodes)
    phi1s = phi1s / jnp.real(_coll_integral(disc, mesh, as_nodes(phi1s),
                                            Fu0))
    phi1sn = as_nodes(phi1s)

    # a1 = <phi1*, B(v1, conj v1)> (real)
    Bvvb = jax.vmap(lambda x, a, b: prob_vf.d2F_complex(x, params, a, b))(
        nodes, v1n, jnp.conj(v1n))
    a1 = float(np.real(integ(phi1sn, Bvvb)))

    # v1*: null of the adjoint with the NS shift, <v1*, v1> = 1
    J_nsad = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                   transpose=True, rho_f=-1.0, rho_i=rho,
                                   bc="periodic")
    v1s = _null_bordered(J_nsad, 2)
    v1s = v1s / jnp.conj(_coll_integral(disc, mesh, as_nodes(v1s), v1n))
    v1sn = as_nodes(v1s)

    # weak-form rhs helper: Icoll * g (dt-scaled Gauss rows + BC rows)
    L, _, _, _ = legendre_matrices(disc.m)
    L = jnp.asarray(L)
    d = mesh[1:] - mesh[:-1]

    def icoll_rhs(g_nodes, tail=None):
        gg = jnp.einsum("li,jln->jin", L, disc.local_nodes(g_nodes)) \
            * (d[:, None, None] / 2.0)
        parts = [gg.ravel(), g_nodes[-1] - g_nodes[0]]
        if tail is not None:
            parts.append(tail)
        return jnp.concatenate(parts)

    # h20: (D - T A + 2 i theta) h = B(v1, v1), periodic (nonsingular)
    Bvv = jax.vmap(lambda x, a: prob_vf.d2F_complex(x, params, a, a))(
        nodes, v1n)
    J_20 = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                 rho_i=2 * rho, bc="periodic")
    h20 = jnp.linalg.solve(J_20, icoll_rhs(Bvv))
    h20n = as_nodes(h20)

    # h11: bordered solve with the integral condition <phi1*, h11> = 0
    rhs11 = Bvvb - a1 * Fu0.astype(Bvvb.dtype)
    J_h = _coll_linear_operator(disc, prob_vf, nodes, T, mesh, params,
                                bc="periodic").astype(jnp.complex128)
    n_tot = J_h.shape[0]
    border = jax.grad(lambda w: jnp.real(_coll_integral(
        disc, mesh, w.reshape(disc.n_nodes, n), phi1sn)))(
        jnp.zeros(n_tot, dtype=X.dtype))
    Mb = jnp.zeros((n_tot + 1, n_tot + 1), dtype=jnp.complex128)
    Mb = Mb.at[:n_tot, :n_tot].set(J_h)
    Mb = Mb.at[:n_tot, -1].set(phi1s.astype(jnp.complex128))
    Mb = Mb.at[-1, :n_tot].set(border.astype(jnp.complex128))
    h11 = jnp.linalg.solve(Mb, icoll_rhs(rhs11,
                                         jnp.zeros(1, jnp.complex128)))
    h11n = as_nodes(h11[:n_tot])

    # d coefficient (ref :1180-1199)
    Cvvvb = jax.vmap(
        lambda x, a, b: prob_vf.d3F_complex(x, params, a, a, b))(
        nodes, v1n, jnp.conj(v1n))
    Bh11v = jax.vmap(lambda x, a, b: prob_vf.d2F_complex(x, params, a, b))(
        nodes, h11n, v1n)
    Bh20vb = jax.vmap(lambda x, a, b: prob_vf.d2F_complex(x, params, a, b))(
        nodes, h20n, jnp.conj(v1n))
    Av = jax.vmap(lambda x, w: prob_vf.dF(x, params, jnp.real(w))
                  + 1j * prob_vf.dF(x, params, jnp.imag(w)))(nodes, v1n)
    Tf = float(T)
    dcoef = (integ(v1sn, Cvvvb) / Tf + 2.0 * integ(v1sn, Bh11v)
             + integ(v1sn, Bh20vb)) / 2.0
    dcoef += -a1 / Tf * integ(v1sn, Av) + 1j * theta * a1 / Tf ** 2
    return {"a": a1, "d": complex(dcoef), "v1": v1, "v1s": v1s,
            "T": Tf, "theta": theta}


def neimark_sacker_iooss(br_po, ind_bif: int, verbose: bool = False):
    """NS normal form by periodic normalization in the collocation basis
    (ref neimark_sacker_normal_form_iooss,
    periodicorbit/NormalForms.jl:1004-1204, after
    Kuznetsov-Govaerts-Doedel-Dhooge 2005): Re d < 0 => supercritical.

    The reference's ad-hoc `2Ntst` rescalings of h11/h20 are replaced by the
    consistent weak-form rhs scaling (Icoll = dt-weighted Gauss
    interpolation), which also handles non-uniform meshes."""
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_bif] if isinstance(ind_bif, int) else ind_bif
    po_prob = gamma.prob
    disc = po_prob.disc
    if not isinstance(disc, Collocation):
        raise TypeError("neimark_sacker_iooss requires Collocation")
    prob_vf = po_prob.prob_vf
    n = po_prob.n_vf
    X = jnp.asarray(sp.x)
    params_full = po_prob.set_lens_param(po_prob.params, sp.param)

    # NS multiplier angle from the monodromy
    from ..linalg.eig import dense_eig

    mult = np.asarray(dense_eig(disc.monodromy(prob_vf, X, params_full))[0])
    cand = np.where(mult.imag > 1e-8)[0]
    if len(cand) == 0:
        raise RuntimeError("no complex Floquet multiplier found for NS")
    i0 = cand[np.argmin(np.abs(np.abs(mult[cand]) - 1.0))]
    theta = abs(float(np.angle(mult[i0])))

    out = _ns_iooss_core(disc, prob_vf, n, X, params_full["_inner"],
                         params_full["_mesh"], theta)
    pt = NeimarkSacker(x0=X, p=sp.param, params=params_full["_inner"],
                       lens=prob_vf.lens, zeta=out["v1"],
                       zeta_star=out["v1s"], omega=theta,
                       nf={"a": out["a"], "d": out["d"]}, prob=po_prob)
    pt.period = out["T"]
    pt.subtype = "SuperCritical" if out["d"].real < 0 else "SubCritical"
    if verbose:
        print(f"NS Iooss normal form: a = {out['a']:.6g}, "
              f"d = {out['d']:.6g} theta = {theta:.6g} ({pt.subtype})")
    return pt


def period_doubling_iooss(br_po, ind_bif: int, verbose: bool = False,
                          detailed: bool = True):
    """PD normal form by periodic normalization in the collocation basis
    (Iooss form) — no flow re-integration (ref
    period_doubling_normal_form_iooss, periodicorbit/NormalForms.jl:574-806,
    after Kuznetsov-Govaerts-Doedel-Dhooge SIAM J. Num. Anal. 2005).

    Restricted return map on the center manifold: xi -> -xi + b3 xi^3 per
    period in the periodic frame; FLOW convention: b3 < 0 => supercritical
    (opposite sign to the PRM map coefficient; both vanish at GPD)."""
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_bif] if isinstance(ind_bif, int) else ind_bif
    po_prob = gamma.prob
    disc = po_prob.disc
    if not isinstance(disc, Collocation):
        raise TypeError("period_doubling_iooss requires Collocation")
    prob_vf = po_prob.prob_vf
    n = po_prob.n_vf
    X = jnp.asarray(sp.x)
    params_full = po_prob.set_lens_param(po_prob.params, sp.param)
    out = _pd_iooss_core(disc, prob_vf, n, X, params_full["_inner"],
                         params_full["_mesh"], detailed=detailed)
    pt = PeriodDoubling(x0=X, p=sp.param, params=params_full["_inner"],
                        lens=prob_vf.lens, zeta=out["v1"],
                        zeta_star=out["v1s"],
                        nf={"a": out["a"], "b3": out["b3"],
                            "c": out["b3"]}, prob=po_prob)
    pt.period = out["T"]
    pt.subtype = "SuperCritical" if out["b3"] < 0 else "SubCritical"
    if verbose:
        print(f"PD Iooss normal form: a = {out['a']:.6g}, "
              f"b3 = {out['b3']:.6g} ({pt.subtype})")
    return pt


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
                       flow_steps: int = 300, method: str = "prm"):
    """Normal form of a PD/NS point on a periodic-orbit branch.

    method='prm': differentiate the Poincare return map (any discretization;
    ref periodicorbit/NormalForms.jl:325,807).
    method='iooss' (PD + Collocation): periodic normalization in the
    collocation basis, no flow re-integration (ref :574; the reference's
    default for collocation)."""
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_bif]
    if method == "iooss":
        if sp.type == "pd":
            return period_doubling_iooss(br_po, ind_bif, verbose=verbose)
        if sp.type == "ns":
            return neimark_sacker_iooss(br_po, ind_bif, verbose=verbose)
        raise NotImplementedError("iooss route implements PD and NS")
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
    # bp of PO: Lyapunov-Schmidt on the fixed-point problem of the return
    # map, Phi(y, p) = P(y, p) - y (ref branch_normal_form,
    # periodicorbit/NormalForms.jl:60-92, here with the full 1d-kernel
    # coefficient set rather than the eigenfunction-only generic path)
    from types import SimpleNamespace

    from ..detection.points import SpecialPoint
    from ..normal_forms.codim1 import get_normal_form1d

    def Phi(y, par):
        return map_prob.F(y, par) - y

    phi_prob = BifurcationProblem(Phi, u0=y0, params=params,
                                  lens=prob_vf.lens)
    L = jax.jacfwd(lambda y: Phi(y, params))(y0)
    vals, vecs = np.linalg.eig(np.asarray(L))
    ind = int(np.argmin(np.abs(vals)))
    sp2 = SpecialPoint(type="bp", param=sp.param, x=np.asarray(y0),
                       ind_ev=ind + 1, eigenvals=vals, eigenvecs=vecs)
    pt = get_normal_form1d(phi_prob, SimpleNamespace(specialpoint=[sp2],
                                                     prob=None),
                           0, verbose=verbose)
    pt.period = T
    return pt
