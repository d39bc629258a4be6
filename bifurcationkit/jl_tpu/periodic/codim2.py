"""Codim-2 continuation of periodic-orbit bifurcations
(ref src/periodicorbit/codim2/MinAugPD.jl, MinAugNS.jl).

Curves of period-doubling / Neimark-Sacker / fold points of periodic orbits,
continued in two parameters with minimally-augmented functionals on the
*monodromy*:

  PD:   sigma from [M(X, p1) + I,        a; b' 0][v; s] = [0; 1]
  NS:   sigma from [M(X, p1) - e^{i th}I, a; b' 0]  (extra unknown theta)
  Fold: sigma from [M(X, p1) - I,        a; b' 0]

Because the monodromy is a pure JAX function of the orbit unknowns (batched
per-interval solves + scan product), sigma is differentiable and the
augmented problem is again an ordinary `BifurcationProblem` with AD
jacobians — the same architecture as the equilibrium codim-2 layer.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..codim2.minaug import _adjoint_border_solve, _border_solve
from ..continuation.algorithms import PALC
from ..continuation.driver import continuation
from ..continuation.results import Branch
from ..detection.events import ContinuousEvent
from ..core.lens import Lens, as_lens
from ..core.params import ContinuationPar
from ..core.problem import BifurcationProblem
from ..linalg.eig import dense_eig
from .collocation import Collocation


_SHIFTS = {"pd": lambda th: 1.0, "fold": lambda th: -1.0}


# ---------------------------------------------------------------------------
# functional (matrix-free-of-the-monodromy) formulation for collocation
# (ref MinAugPD.jl:35-257, MinAugNS.jl:36-236: sigma on the full
#  discretized PO problem with bordered solves — scales to PDE orbits)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class POMAJac:
    """Structured jacobian of the augmented PO-MA system: the PO collocation
    blocks plus the borders (p1 column, sigma gradient rows).  Consumed by
    POMinAugLS; callable for BEC residual refinement."""

    blocks: Any            # COPBlocks at (X, p1)
    dRdp1: Any             # (N+1,) residual derivative wrt p1
    sig_X: Any             # (k, N+1) gradients of the sigma rows wrt X
    sig_p1: Any            # (k,)
    sig_th: Any            # (k,) (zeros when no theta unknown)
    kind: str              # 'pd' | 'fold' | 'ns'

    def tree_flatten(self):
        return ((self.blocks, self.dRdp1, self.sig_X, self.sig_p1,
                 self.sig_th), (self.kind,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def has_theta(self):
        return self.kind == "ns"

    def __call__(self, dY):
        nX = self.dRdp1.shape[0]
        dX = dY[:nX]
        dp1 = dY[nX]
        dth = dY[nX + 1] if self.has_theta else 0.0
        top = self.blocks(dX) + self.dRdp1 * dp1
        sig = (self.sig_X @ dX + self.sig_p1 * dp1 + self.sig_th * dth)
        return jnp.concatenate([top, sig])


@dataclasses.dataclass(frozen=True)
class POMinAugLS:
    """Linear solver for the POMAJac augmented system: ONE bordered COP
    condensation for pd/fold (k=1), a k=2 block elimination via
    cop_solve_block for ns — never materializes the (N+2)^2 dense jacobian
    (ref the MinAug linear solvers, MinAugPD.jl:141-257)."""

    needs_matrix = True

    def __call__(self, J: POMAJac, rhs, a0=0.0, a1=1.0):
        from ..core.state import ravel
        from .cop import cop_solve_block, cop_solve_bordered

        flat, unravel = ravel(rhs)
        nX = J.dRdp1.shape[0]
        if not J.has_theta:
            dX, dp1 = cop_solve_bordered(
                J.blocks, flat[:nX], flat[nX], J.dRdp1, J.sig_X[0],
                jnp.asarray(J.sig_p1[0]), xi_u=1.0, xi_p=1.0,
                dot_scale=1.0)
            sol = jnp.concatenate([dX, dp1[None]])
        else:
            C = jnp.stack([J.dRdp1, jnp.zeros_like(J.dRdp1)], axis=1)
            E = jnp.stack([J.sig_p1, J.sig_th], axis=1)     # (2, 2)
            x, y = cop_solve_block(J.blocks, flat[:nX], C, J.sig_X, E,
                                   flat[nX:])
            sol = jnp.concatenate([x, y])
        return unravel(sol), jnp.array(True), jnp.array(1)


def _floquet_mode_border(disc, prob_vf, X, par, zeta, s_re, s_im, n):
    """Propagate a monodromy eigenvector along the orbit into the border
    pair for the functional MA: b = the time-dependent Floquet mode over
    the nodes (phi_{j+1} = M_j phi_j), a = the boundary-row unit column
    carrying the mode's start value (non-orthogonal to the left null
    space of the boundary-closed operator in practice)."""
    maps = disc.interval_maps(prob_vf, X, par)     # (Ntst, n, n)
    cplx = abs(float(s_im)) > 0

    def chain(phi, Mj):
        if cplx:
            pr, pi = phi
            return (Mj @ pr, Mj @ pi), (Mj @ pr, Mj @ pi)
        return Mj @ phi, Mj @ phi

    if cplx:
        phi0 = (jnp.real(zeta), jnp.imag(zeta))
    else:
        phi0 = jnp.real(zeta)
    _, path = jax.lax.scan(chain, phi0, maps)
    if cplx:
        phis = (jnp.concatenate([phi0[0][None], path[0]])
                + 1j * jnp.concatenate([phi0[1][None], path[1]]))
    else:
        phis = jnp.concatenate([phi0[None], path])  # (Ntst+1, n)
    nrm = jnp.max(jnp.abs(phis))
    phis = phis / jnp.maximum(nrm, 1e-300)
    # linear interpolation onto the local nodes
    m = disc.m
    fr = (np.arange(m) / m)[None, :, None]
    phi_nodes = ((1 - fr) * phis[:-1, None, :]
                 + fr * phis[1:, None, :]).reshape(-1, n)
    b_unk = jnp.concatenate([phi_nodes.reshape(-1), phis[-1].reshape(-1)])
    Ntst = disc.Ntst
    a_res = jnp.concatenate([jnp.zeros((Ntst * m * n,), phis.dtype),
                             phis[0]])
    nb = jnp.linalg.norm(b_unk)
    na = jnp.linalg.norm(a_res)
    return a_res / jnp.maximum(na, 1e-300), b_unk / jnp.maximum(nb, 1e-300)


def _po_ma_problem_functional(po_prob, lens2, kind: str):
    """PO codim-2 MA problem with sigma on the discretized functional via
    COP condensation (collocation only) — the PDE-scale path."""
    from .cop import collocation_block_jacobian, cop_bc_sigma

    prob_vf = po_prob.prob_vf
    disc = po_prob.disc
    n = po_prob.n_vf
    inner_lens = as_lens(prob_vf.lens)
    outer_lens = as_lens(lens2)
    nX = int(np.asarray(po_prob.u0).shape[0])
    has_theta = kind == "ns"

    def split(Y):
        if has_theta:
            return Y[:nX], Y[nX], Y[nX + 1]
        return Y[:nX], Y[nX], None

    def _po_par(par, p1):
        po_par = {k: v for k, v in par.items() if k not in ("_a", "_b")}
        po_par["_inner"] = inner_lens.set(par["_inner"], p1)
        return po_par

    def _sigma(X, p1, theta, par):
        po_par = _po_par(par, p1)
        blocks = collocation_block_jacobian(disc, prob_vf, X, po_par)
        if kind == "fold":
            # generic fold MA on the FULL discretized problem (ref
            # "Fold-of-PO via generic Fold MA + COP",
            # periodicorbit/codim2): sigma from the bordered full-system
            # jacobian [dG a; b^H 0][v; sigma] = [0; 1] -> sigma =
            # -1/<b, dG^{-1} a>.  The Floquet-BC operator at s = +1 is
            # NOT usable here: it is singular through the TRIVIAL phase
            # multiplier on every orbit, which would make sigma vanish
            # identically along the orbit family.
            from .cop import cop_solve

            w = cop_solve(blocks, par["_a"])
            sigma = -1.0 / jnp.dot(par["_b"], w)
            return sigma, jnp.zeros_like(sigma), w, jnp.zeros_like(w)
        if kind == "pd":
            s_re, s_im = -1.0, 0.0
        else:
            s_re, s_im = jnp.cos(theta), jnp.sin(theta)
        sr, si, vr, vi = cop_bc_sigma(blocks, par["_a"], par["_b"],
                                      s_re, s_im)
        return sr, si, vr, vi

    def G(Y, par):
        X, p1, theta = split(Y)
        R = disc.residual(prob_vf, X, _po_par(par, p1))
        sr, si, _, _ = _sigma(X, p1, theta, par)
        if has_theta:
            return jnp.concatenate([R, sr[None], si[None]])
        return jnp.concatenate([R, sr[None]])

    def jac(Y, par):
        X, p1, theta = split(Y)
        po_par = _po_par(par, p1)
        blocks = collocation_block_jacobian(disc, prob_vf, X, po_par)
        # p1 column of the PO residual by forward AD
        _, dRdp1 = jax.jvp(
            lambda q: disc.residual(prob_vf, X, _po_par(par, q)),
            (p1,), (jnp.ones_like(p1),))
        th = theta if has_theta else jnp.zeros_like(p1)

        def sig_rows(Xv, p1v, thv):
            sr, si, _, _ = _sigma(Xv, p1v, thv, par)
            return jnp.stack([sr, si]) if has_theta else sr[None]

        k = 2 if has_theta else 1
        sX, sp1, sth = jax.jacrev(sig_rows, argnums=(0, 1, 2))(X, p1, th)
        return POMAJac(blocks=blocks, dRdp1=dRdp1,
                       sig_X=sX.reshape(k, nX),
                       sig_p1=sp1.reshape(k),
                       sig_th=(sth.reshape(k) if has_theta
                               else jnp.zeros((k,), X.dtype)),
                       kind=kind)

    lens = Lens(
        get=lambda par: outer_lens.get(par["_inner"]),
        set=lambda par, v: {**par,
                            "_inner": outer_lens.set(par["_inner"], v)},
        name=f"po-{kind}/{outer_lens.name}")

    def record(Y, p2, **k):
        X, p1, theta = split(Y)
        out = {"param": p2, "p1": p1,
               "period": disc.period(X) if hasattr(disc, "period")
               else X[-1]}
        if theta is not None:
            out["theta"] = theta
        return out

    def update(it, state):
        """Re-anchor b to the current mode v from the condensation and
        refresh the PO phase section (the left border a is kept — sigma
        only needs borders non-orthogonal to the null spaces)."""
        par = it.current_params
        Y = state.z.u
        X, p1, theta = split(Y)
        _, _, vr, vi = _sigma(X, p1, theta, par)
        v = vr + 1j * vi if has_theta else vr
        new = dict(par)
        new["_b"] = (v / jnp.linalg.norm(v)).astype(par["_b"].dtype)
        po_par = _po_par(par, p1)
        if "_uref" in new:
            nodes, _ = disc.split(X, n)
            _, phi = disc.phase_data(prob_vf, nodes, po_par["_inner"],
                                     new["_mesh"])
            new["_uref"] = nodes
            new["_phi"] = phi
        return new

    def eig_jacobian(Y, par):
        """COP blocks of the inner orbit -> FloquetColl along the curve."""
        X, p1, _ = split(Y)
        return collocation_block_jacobian(disc, prob_vf, X,
                                          _po_par(par, p1))

    maprob = BifurcationProblem(G, u0=None, params=None, lens=lens, jac=jac,
                                record_from_solution=record, update=update)
    object.__setattr__(maprob, "inner_prob", po_prob)
    object.__setattr__(maprob, "ma_kind", f"po-{kind}")
    object.__setattr__(maprob, "eig_jacobian", eig_jacobian)
    # blocks + FloquetColl in one program blows the TPU compile helper
    object.__setattr__(maprob, "eig_two_stage", True)
    return maprob, split


def _po_ma_problem(po_prob, lens2, kind: str):
    """Augmented problem over Y = [X_po, p1 (, theta)] continued in lens2."""
    prob_vf = po_prob.prob_vf
    disc = po_prob.disc
    inner_lens = as_lens(prob_vf.lens)
    outer_lens = as_lens(lens2)
    nX = int(np.asarray(po_prob.u0).shape[0])
    has_theta = kind == "ns"

    def split(Y):
        if has_theta:
            return Y[:nX], Y[nX], Y[nX + 1]
        return Y[:nX], Y[nX], None

    def G(Y, par):
        X, p1, theta = split(Y)
        po_par = {k: v for k, v in par.items() if k not in ("_a", "_b")}
        po_par["_inner"] = inner_lens.set(par["_inner"], p1)
        R = disc.residual(prob_vf, X, po_par)
        if kind == "fold":
            # generic fold MA on the FULL discretized problem: (M - I)
            # is singular through the trivial phase multiplier on EVERY
            # orbit, so the monodromy sigma would vanish identically —
            # use the bordered full-system jacobian instead (see the
            # functional formulation and ref periodicorbit/codim2)
            dG = jax.jacfwd(
                lambda Xv: disc.residual(prob_vf, Xv, po_par))(X)
            _, sigma = _border_solve(dG, par["_a"], par["_b"])
            return jnp.concatenate([R, jnp.real(sigma)[None]])
        M = disc.monodromy(prob_vf, X, po_par)
        if kind == "pd":
            shift = 1.0      # M + I singular at mu = -1
            _, sigma = _border_solve(M, par["_a"], par["_b"], shift=shift)
            return jnp.concatenate([R, jnp.real(sigma)[None]])
        # ns
        _, sigma = _border_solve(M, par["_a"], par["_b"],
                                 shift=-jnp.exp(1j * theta))
        return jnp.concatenate([R, jnp.real(sigma)[None],
                                jnp.imag(sigma)[None]])

    lens = Lens(
        get=lambda par: outer_lens.get(par["_inner"]),
        set=lambda par, v: {**par,
                            "_inner": outer_lens.set(par["_inner"], v)},
        name=f"po-{kind}/{outer_lens.name}")

    def record(Y, p2, **k):
        X, p1, theta = split(Y)
        out = {"param": p2, "p1": p1,
               "period": disc.period(X) if hasattr(disc, "period")
               else X[-1]}
        if theta is not None:
            out["theta"] = theta
        return out

    def update(it, state):
        """Re-anchor borders to the current monodromy null vectors and
        refresh the PO section (ref update hooks in MinAugPD.jl)."""
        par = it.current_params
        Y = state.z.u
        X, p1, theta = split(Y)
        po_par = {k: v for k, v in par.items() if k not in ("_a", "_b")}
        po_par["_inner"] = inner_lens.set(par["_inner"], p1)
        if kind == "fold":
            dG = jax.jacfwd(
                lambda Xv: disc.residual(prob_vf, Xv, po_par))(X)
            v, _ = _border_solve(dG, par["_a"], par["_b"])
            w, _ = _adjoint_border_solve(dG, par["_a"], par["_b"])
        else:
            M = disc.monodromy(prob_vf, X, po_par)
            shift = 1.0 if kind == "pd" else -jnp.exp(1j * theta)
            v, _ = _border_solve(M, par["_a"], par["_b"], shift)
            w, _ = _adjoint_border_solve(M, par["_a"], par["_b"], shift)
        new = dict(par)
        new["_b"] = (v / jnp.linalg.norm(v)).astype(par["_b"].dtype)
        new["_a"] = (w / jnp.linalg.norm(w)).astype(par["_a"].dtype)
        # refresh the PO phase section to the current orbit
        if "_uref" in new:
            n = new["_uref"].shape[1]
            if isinstance(disc, Collocation):
                nodes, _ = disc.split(X, n)
                _, phi = disc.phase_data(prob_vf, nodes, po_par["_inner"],
                                         new["_mesh"])
            else:
                nodes, _ = disc.split(X, n)
                _, phi = disc.phase_data(prob_vf, nodes, po_par["_inner"])
            new["_uref"] = nodes
            new["_phi"] = phi
        return new

    def eig_jacobian(Y, par):
        """Floquet spectrum of the INNER orbit along the codim-2 curve
        (the FoldEig/HopfEig border-stripping pattern, MinAugPD.jl:440):
        enables detection of SECONDARY bifurcations — fold-flip, fold-NS,
        pd-NS, NS-NS — as ordinary Floquet crossings."""
        X, p1, theta = split(Y)
        po_par = {k: v for k, v in par.items() if k not in ("_a", "_b")}
        po_par["_inner"] = inner_lens.set(par["_inner"], p1)
        return disc.monodromy(prob_vf, X, po_par)

    maprob = BifurcationProblem(G, u0=None, params=None, lens=lens,
                                record_from_solution=record, update=update)
    object.__setattr__(maprob, "inner_prob", po_prob)
    object.__setattr__(maprob, "ma_kind", f"po-{kind}")
    object.__setattr__(maprob, "eig_jacobian", eig_jacobian)
    return maprob, split


# label conversion for secondary Floquet crossings along PO codim-2 curves
# (ref _correct_event_labels, periodicorbit/codim2/codim2.jl:162-178)
_SECONDARY_LABELS = {
    "fold": {"bp": "R1", "hopf": "foldNS", "pd": "foldpd", "fold": "cusp"},
    "pd": {"bp": "foldFlip", "hopf": "pdNS", "pd": "R2"},
    "ns": {"bp": "foldNS", "hopf": "nsns", "pd": "pdNS"},
}


def _start_data(br_po, ind_bif, which: str):
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_bif]
    po_prob = gamma.prob
    X = jnp.asarray(sp.x)
    p1 = sp.param
    disc = po_prob.disc
    prob_vf = po_prob.prob_vf
    par = po_prob.set_lens_param(po_prob.params, p1)
    M = disc.monodromy(prob_vf, X, par)
    mult, vecs = dense_eig(M)
    mult_np = np.asarray(mult)
    if which == "pd":
        i0 = int(np.argmin(np.abs(mult_np + 1.0)))
        theta = None
    elif which == "fold":
        # second multiplier near +1 (excluding the trivial one)
        order = np.argsort(np.abs(mult_np - 1.0))
        i0 = int(order[1]) if len(order) > 1 else int(order[0])
        theta = None
    else:
        cand = np.where(np.abs(mult_np.imag) > 1e-8)[0]
        i0 = cand[np.argmin(np.abs(np.abs(mult_np[cand]) - 1.0))]
        theta = float(np.angle(mult_np[i0]))
    zeta = np.asarray(vecs)[:, i0]
    multT, vecsT = dense_eig(M.T)
    iT = int(np.argmin(np.abs(np.asarray(multT) - np.conj(mult_np[i0]))))
    zeta_ad = np.asarray(vecsT)[:, iT]
    return X, p1, theta, jnp.asarray(zeta), jnp.asarray(zeta_ad), par


def _po_codim3_event(po_prob, split, kind: str, flow_steps: int,
                     compute_nf: bool):
    """Codim-3 test functions monitored along PO codim-2 curves
    (ref test_for_pd_gpd_cp, MinAugPD.jl:393-438: (GPD, CP, R2);
    test_for_ns_ch, MinAugNS.jl:415-463: (R1..R4, CH) with
    R1=omega, R2=cos(omega)+1, R3=2cos(omega)+1, R4=cos(omega),
    after De Witte, 'Computational Analysis of Bifurcations of POs').

    GPD/CH are normal-form coefficients of the Poincare return map,
    evaluated by once-jitted PRM kernels (point as arguments)."""
    from .normal_forms import (_ns_iooss_core, _pd_iooss_core,
                               make_prm_coef_kernels)

    prob_vf = po_prob.prob_vf
    disc = po_prob.disc
    n = po_prob.n_vf
    inner_lens = as_lens(prob_vf.lens)
    # collocation: GPD/CH via the Iooss periodic normalization (the
    # reference's default, no flow re-integration); other discretizations:
    # PRM kernels
    use_iooss = isinstance(disc, Collocation) and kind in ("pd", "ns")
    kernels = make_prm_coef_kernels(prob_vf, flow_steps=flow_steps) \
        if (compute_nf and not use_iooss) else None

    def _point(it, state):
        # inject the CURRENT curve parameter p2 (current_params holds the
        # base pytree; stale p2 would freeze the codim-3 test functions on
        # models where p2 enters them directly)
        par = it.prob.set_lens_param(it.current_params, float(state.p))
        X, p1, theta = split(state.z.u)
        po_par = {k: v for k, v in par.items() if k not in ("_a", "_b")}
        po_par["_inner"] = inner_lens.set(par["_inner"], p1)
        nodes, T = disc.split(X, n)
        return X, po_par, nodes[0], T, theta, par

    def _prm_eig(x0, T, par_inner, which):
        dP_fn, _, _ = kernels
        A = np.asarray(dP_fn(x0, T, par_inner))
        vals, vecs = np.linalg.eig(A)
        valsT, vecsT = np.linalg.eig(A.T)
        if which == "pd":
            i0 = int(np.argmin(np.abs(vals + 1.0)))
            iT = int(np.argmin(np.abs(valsT + 1.0)))
            q = np.real(vecs[:, i0])
            q /= np.linalg.norm(q)
            p = np.real(vecsT[:, iT])
            p /= np.dot(p, q)
            return A, vals[i0], q, p
        cand = np.where(vals.imag > 1e-10)[0]
        if len(cand) == 0:
            return A, None, None, None
        i0 = cand[np.argmin(np.abs(np.abs(vals[cand]) - 1.0))]
        lam = vals[i0]
        q = vecs[:, i0]
        q /= np.linalg.norm(q)
        iT = int(np.argmin(np.abs(valsT - np.conj(lam))))
        p = vecsT[:, iT]
        p /= np.conj(np.vdot(p, q))
        return A, lam, q, p

    def _mono_borders(par, M):
        """n-dim borders for the monodromy-based codim-3 tests: the curve's
        own anchors when shapes match (monodromy formulation), generic
        ones otherwise (functional formulation stores discretization-space
        borders)."""
        a, b = par["_a"], par["_b"]
        if a.shape[0] != M.shape[0]:
            a = jnp.ones((M.shape[0],), M.dtype)
            b = a
        return a, b

    if kind == "pd":
        def cond(it, state):
            X, po_par, x0, T, _, par = _point(it, state)
            M = disc.monodromy(prob_vf, X, po_par)
            a_n, b_n = _mono_borders(par, M)
            v, _ = _border_solve(M, a_n, b_n, shift=1.0)
            w, _ = _adjoint_border_solve(M, a_n, b_n, shift=1.0)
            v = v / jnp.linalg.norm(v)
            w = w / jnp.linalg.norm(w)
            r2 = float(jnp.real(jnp.vdot(w, v)))
            cp = float(state.tau.p)
            if compute_nf and use_iooss:
                gpd = _pd_iooss_core(disc, prob_vf, n, X,
                                     po_par["_inner"],
                                     po_par["_mesh"])["b3"]
            elif compute_nf:
                _, _, q, p = _prm_eig(x0, T, po_par["_inner"], "pd")
                gpd = float(kernels[1](x0, T, po_par["_inner"],
                                       jnp.asarray(q), jnp.asarray(p)))
            else:
                gpd = 1.0
            return (gpd, cp, r2)

        return ContinuousEvent(nb=3, condition=cond,
                               labels=["gpd", "cusp", "R2"])

    if kind == "ns":
        def cond(it, state):
            X, po_par, x0, T, theta, par = _point(it, state)
            th = float(theta)
            c = np.cos(th)
            if compute_nf and use_iooss:
                ch = _ns_iooss_core(disc, prob_vf, n, X, po_par["_inner"],
                                    po_par["_mesh"], abs(th))["d"].real
            elif compute_nf:
                _, lam, q, p = _prm_eig(x0, T, po_par["_inner"], "ns")
                if q is None:
                    ch = 1.0
                else:
                    ch = float(kernels[2](x0, T, po_par["_inner"],
                                          jnp.asarray(q), jnp.asarray(p),
                                          float(np.angle(lam))))
            else:
                ch = 1.0
            return (th, c + 1.0, 2 * c + 1.0, c, ch)

        return ContinuousEvent(nb=5, condition=cond,
                               labels=["R1", "R2", "R3", "R4", "ch"])

    # fold of PO: cusp = fold of the fold curve in the second parameter
    def cond(it, state):
        return (float(state.tau.p),)

    return ContinuousEvent(nb=1, condition=cond, labels=["cusp"])


def _continuation_po_codim2(br_po, ind_bif, lens2, contparams, kind,
                            **kwargs):
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    po_prob = gamma.prob
    start = _start_data(br_po, ind_bif, kind)
    return _po_codim2_from_data(po_prob, start, lens2, contparams, kind,
                                bp=gamma.specialpoint[ind_bif], **kwargs)


def _po_codim2_from_data(po_prob, start, lens2, contparams, kind,
                         bp=None, alg=None, detect_codim3: int = 1,
                         compute_nf_events: bool = True,
                         nf_flow_steps: int = 120,
                         formulation: str = None, **kwargs):
    """Core PO codim-2 MA continuation from explicit start data — used by
    the on-branch starters (`continuation_pd/ns/fold_po`) and by the
    codim-2 -> PO-curve switch (`codim2.unfolding.switch_codim2_po`,
    ref src/codim2/NormalForms.jl:935,1283,1536-1574)."""
    alg = alg or PALC()
    X, p1, theta, zeta, zeta_ad, par = start
    # the functional (COP-condensed) formulation is the default for
    # collocation — sigma on the full discretized problem, no dense
    # monodromy in the corrector (ref MinAugPD.jl:35-257); shooting and
    # trapeze keep the monodromy formulation (ODE-scale)
    if formulation is None:
        formulation = ("functional"
                       if isinstance(po_prob.disc, Collocation)
                       else "monodromy")
    functional = formulation == "functional"
    if functional and not isinstance(po_prob.disc, Collocation):
        raise ValueError("formulation='functional' requires Collocation")
    if functional:
        maprob, split = _po_ma_problem_functional(po_prob, lens2, kind)
    else:
        maprob, split = _po_ma_problem(po_prob, lens2, kind)

    if kind == "ns":
        Y0 = jnp.concatenate([X, jnp.asarray(p1)[None],
                              jnp.asarray(theta)[None]])
    else:
        Y0 = jnp.concatenate([X, jnp.asarray(p1)[None]])

    if kind == "fold":
        # generic-fold-MA borders: approximate null pair of the FULL
        # discretized jacobian dG (near the fold dG is near-singular, so
        # one inverse iteration from a generic start isolates the null
        # direction).  The Floquet-mode borders are NOT usable: the
        # s = +1 boundary-closed operator is singular through the trivial
        # phase multiplier on every orbit.
        disc = po_prob.disc
        prob_vf = po_prob.prob_vf
        po_par = {k: v for k, v in par.items() if k not in ("_a", "_b")}
        r = jax.random.normal(jax.random.PRNGKey(17), X.shape, X.dtype)
        r = r / jnp.linalg.norm(r)
        if functional:
            from .cop import collocation_block_jacobian as _cbj2
            from .cop import cop_solve

            blocks0 = _cbj2(disc, prob_vf, X, po_par)
            w = cop_solve(blocks0, r)
            a = r
            b = w / jnp.linalg.norm(w)
        else:
            dG = jax.jacfwd(
                lambda Xv: disc.residual(prob_vf, Xv, po_par))(X)
            dGn = np.asarray(dG)
            wr = np.linalg.solve(dGn, np.asarray(r))
            wl = np.linalg.solve(dGn.T, np.asarray(r))
            a = jnp.asarray(wl / np.linalg.norm(wl))
            b = jnp.asarray(wr / np.linalg.norm(wr))
    elif functional:
        disc = po_prob.disc
        prob_vf = po_prob.prob_vf
        n = po_prob.n_vf
        if kind == "pd":
            s_re, s_im = -1.0, 0.0
        else:
            s_re, s_im = float(np.cos(theta)), float(np.sin(theta))
        a, b = _floquet_mode_border(disc, prob_vf, X, par, zeta,
                                    s_re, s_im, n)
        if kind != "ns":
            a, b = jnp.real(a), jnp.real(b)
    elif kind == "ns":
        cdtype = jnp.complex128
        a = zeta_ad.astype(cdtype)
        b = zeta.astype(cdtype)
    else:
        a = jnp.real(zeta_ad)
        a = a / jnp.linalg.norm(a)
        b = jnp.real(zeta)
        b = b / jnp.linalg.norm(b)

    params = dict(par)
    params["_a"] = a
    params["_b"] = b
    maprob2 = maprob.re_make(u0=Y0, params=params)
    for attr in ("inner_prob", "ma_kind", "eig_jacobian"):
        object.__setattr__(maprob2, attr, getattr(maprob, attr))
    cp = contparams
    if functional:
        # the structured POMAJac rides its own bordered solver
        nopts = cp.newton_options
        if not isinstance(nopts.linsolver, POMinAugLS):
            cp = cp.replace(
                newton_options=nopts.replace(linsolver=POMinAugLS()))
    if cp.detect_bifurcation > 1:
        # detect SECONDARY bifurcations along the curve from the inner
        # orbit's Floquet spectrum; the tracked critical multiplier and the
        # trivial one sit ON the unit circle and stay below tol_stability.
        # functional path: FloquetColl on the COP blocks (PDE-scalable);
        # monodromy path: FloquetEig on the dense monodromy
        from .floquet import FloquetColl, FloquetEig

        nopts = cp.newton_options
        if not getattr(nopts.eigsolver, "is_floquet", False):
            cp = cp.replace(newton_options=nopts.replace(
                eigsolver=FloquetColl() if functional else FloquetEig()))
    event = None
    if detect_codim3 > 0:
        event = _po_codim3_event(po_prob, split, kind,
                                 flow_steps=nf_flow_steps,
                                 compute_nf=compute_nf_events)
        if cp.detect_event == 0:
            cp = cp.replace(detect_event=min(detect_codim3, 2))
    gamma2 = continuation(maprob2, alg, cp, kind=f"POCodim2-{kind}",
                          event=event, **kwargs)
    conv = _SECONDARY_LABELS.get(kind, {})
    for sp2 in gamma2.specialpoint:
        if sp2.type in conv:
            sp2.type = conv[sp2.type]
    return Branch(gamma=gamma2, bp=bp)


def po_codim2_test_values(br_pd_or_ns, idx: int = -1):
    """Codim-3 test quantities along a PO codim-2 curve (ref codim-3 tests,
    MinAugPD.jl:392, MinAugNS.jl:415): for a saved point, return the
    monodromy multipliers plus the resonance phases — R1..R4 occur where
    theta hits 2pi/k on an NS curve; fold-flip / fold-NS where a second
    multiplier crosses +1."""
    gamma = br_pd_or_ns.gamma if isinstance(br_pd_or_ns, Branch) \
        else br_pd_or_ns
    po_prob = gamma.prob.inner_prob
    disc = po_prob.disc
    prob_vf = po_prob.prob_vf
    n = po_prob.n_vf
    sol = gamma.sol[idx]
    Y = np.asarray(sol["x"])
    nX = int(np.asarray(po_prob.u0).shape[0])
    X = jnp.asarray(Y[:nX])
    p1 = float(Y[nX])
    p2 = float(sol["p"])
    # rebuild the PO params at this curve point: p1 through the vf lens,
    # p2 through the MA curve's own lens2 optic
    maprob = gamma.prob
    par_dict = {k: v for k, v in maprob.params.items()
                if k not in ("_a", "_b")}
    from ..core.lens import as_lens

    vf_lens = as_lens(prob_vf.lens)
    par_dict["_inner"] = vf_lens.set(par_dict["_inner"], p1)
    par_dict = {**par_dict,
                "_inner": maprob.lens.set(
                    {"_inner": par_dict["_inner"]}, p2)["_inner"]}
    par = par_dict
    M = disc.monodromy(prob_vf, X, par)
    mult = np.asarray(dense_eig(M)[0])
    thetas = np.angle(mult)
    return {"multipliers": mult, "theta": thetas,
            "R1": float(np.min(np.abs(mult - 1.0))),
            "R2": float(np.min(np.abs(mult + 1.0))),
            "R3": float(np.min(np.abs(mult - np.exp(2j * np.pi / 3)))),
            "R4": float(np.min(np.abs(mult - 1j)))}


def continuation_pd(br_po, ind_bif, lens2, contparams, **kwargs) -> Branch:
    """Continue a period-doubling point of a PO in two parameters
    (ref continuation_pd, MinAugPD.jl:307)."""
    return _continuation_po_codim2(br_po, ind_bif, lens2, contparams, "pd",
                                   **kwargs)


def continuation_ns(br_po, ind_bif, lens2, contparams, **kwargs) -> Branch:
    """ref continuation_ns, MinAugNS.jl:328."""
    return _continuation_po_codim2(br_po, ind_bif, lens2, contparams, "ns",
                                   **kwargs)


def continuation_fold_po(br_po, ind_bif, lens2, contparams,
                         **kwargs) -> Branch:
    """Fold-of-periodic-orbits curve (ref Fold-of-PO via generic Fold MA,
    periodicorbit/codim2)."""
    return _continuation_po_codim2(br_po, ind_bif, lens2, contparams, "fold",
                                   **kwargs)


# ---------------------------------------------------------------------------
# period-doubling branch switching (PO -> PO with doubled period)
# ---------------------------------------------------------------------------


def bp_po_branch_switch(br_po, ind_bp, contparams, ampfactor: float = 0.1,
                        delta_p: float = 0.0, alg=None, **kwargs) -> Branch:
    """aBS at a branch point of periodic orbits (multiplier +1, not a fold):
    same-period orbit guess perturbed along the critical eigenfunction
    (ref PO->PO branching at BP, PeriodicOrbits.jl:626-709)."""
    from .orbits import continuation_po

    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_bp]
    po_prob = gamma.prob
    disc = po_prob.disc
    prob_vf = po_prob.prob_vf
    n = po_prob.n_vf
    X = jnp.asarray(sp.x)
    p1 = sp.param + delta_p
    nodes, T = disc.split(X, n)

    par = po_prob.set_lens_param(po_prob.params, sp.param)
    M = disc.monodromy(prob_vf, X, par)
    mult, vecs = dense_eig(M)
    mult_np = np.asarray(mult)
    # critical +1 multiplier EXCLUDING the trivial one: second closest to 1
    order = np.argsort(np.abs(mult_np - 1.0))
    i0 = int(order[1]) if len(order) > 1 else int(order[0])
    phi0 = np.array(np.real(np.asarray(vecs)[:, i0]))
    phi0 /= np.linalg.norm(phi0)

    nodes_np = np.asarray(nodes)
    scale = ampfactor * float(np.linalg.norm(nodes_np[0]) + 1.0)
    new_nodes = nodes_np + scale * phi0[None, :]
    X2 = disc.pack(jnp.asarray(new_nodes), T)
    params_new = prob_vf.set_lens_param(prob_vf.params, float(p1))
    return continuation_po(prob_vf, disc, X2, contparams, alg=alg,
                           params=params_new, **kwargs)


def pd_branch_switch(br_po, ind_pd, contparams, ampfactor: float = 0.1,
                     delta_p: float = None, alg=None, **kwargs) -> Branch:
    """aBS at a PD point: double-period orbit guess = orbit traversed twice
    perturbed by +/- the PD eigenfunction (ref PO->PO branching,
    PeriodicOrbits.jl:626-709).

    `delta_p` defaults to contparams.ds (the reference's default): AT the PD
    point the doubled problem is singular (the squared PD multiplier joins
    the trivial +1), so the jump must step off the point."""
    if delta_p is None:
        delta_p = contparams.ds
    from .orbits import continuation_po

    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_pd]
    po_prob = gamma.prob
    disc = po_prob.disc
    prob_vf = po_prob.prob_vf
    n = po_prob.n_vf
    if not isinstance(disc, Collocation):
        from .shooting import Shooting
        from .trapezoid import Trapeze

        if isinstance(disc, Shooting):
            return _pd_branch_switch_shooting(
                br_po, ind_pd, contparams, ampfactor=ampfactor,
                delta_p=delta_p, alg=alg, **kwargs)
        if isinstance(disc, Trapeze):
            return _pd_branch_switch_trapeze(
                br_po, ind_pd, contparams, ampfactor=ampfactor,
                delta_p=delta_p, alg=alg, **kwargs)
        raise NotImplementedError("PD branch switching requires "
                                  "Collocation, Trapeze or Shooting")
    X = jnp.asarray(sp.x)
    p1 = sp.param + delta_p
    nodes, T = disc.split(X, n)

    # PD eigenfunction at the orbit start from the monodromy null vector
    par = po_prob.set_lens_param(po_prob.params, sp.param)
    M = disc.monodromy(prob_vf, X, par)
    mult, vecs = dense_eig(M)
    i0 = int(np.argmin(np.abs(np.asarray(mult) + 1.0)))
    phi0 = np.array(np.real(np.asarray(vecs)[:, i0]))
    phi0 /= np.linalg.norm(phi0)

    # propagate the eigenfunction along the orbit with the per-interval
    # fundamental maps: the TIME-DEPENDENT antiperiodic Floquet mode
    # phi(t_{j+1}) = M_j phi(t_j), phi(T) = -phi(0).  A time-constant
    # perturbation is mostly orthogonal to the emerging period-2 branch and
    # Newton falls back onto the doubled period-1 orbit.
    maps = np.asarray(disc.interval_maps(prob_vf, X, par))
    phis = [phi0]
    for j in range(disc.Ntst):
        phis.append(maps[j] @ phis[-1])
    phis = np.stack(phis)                      # (Ntst+1, n) mesh boundaries
    phis /= max(np.abs(phis).max(), 1e-300)

    # interpolate onto the local nodes (node j*m+i at fraction i/m)
    m = disc.m
    fr = (np.arange(m) / m)[None, :, None]
    phi_nodes = ((1 - fr) * phis[:-1, None, :]
                 + fr * phis[1:, None, :]).reshape(-1, n)  # (Ntst*m, n)
    phi_nodes = np.concatenate([phi_nodes, phis[-1:]], axis=0)

    # double orbit: second copy perturbed with the opposite sign so the
    # doubled loop closes (antiperiodic eigenfunction)
    nodes_np = np.asarray(nodes)
    scale = ampfactor * float(np.linalg.norm(nodes_np[0]) + 1.0)
    first = nodes_np[:-1] + scale * phi_nodes[:-1]
    second = nodes_np[:-1] - scale * phi_nodes[:-1]
    doubled = np.concatenate(
        [first, second, nodes_np[:1] + scale * phi_nodes[:1]], axis=0)
    disc2 = Collocation(Ntst=2 * disc.Ntst, m=disc.m)
    X2 = disc2.pack(jnp.asarray(doubled), 2 * T)

    params_new = prob_vf.set_lens_param(prob_vf.params, float(p1))
    return continuation_po(prob_vf, disc2, X2, contparams,
                           alg=alg, params=params_new, **kwargs)


def _pd_branch_switch_trapeze(br_po, ind_pd, contparams,
                              ampfactor: float = 0.1, delta_p=None,
                              alg=None, **kwargs) -> Branch:
    """PD branch switching for the TRAPEZE discretization (the PDE-scale
    PO path): double-period guess with 2M-1 slices — the orbit traversed
    twice, perturbed by +/- the antiperiodic Floquet mode propagated to
    each slice through the per-slice trapezoid maps
    (I - T h/2 J_{i+1})^{-1} (I + T h/2 J_i)
    (ref PO->PO branching, PeriodicOrbits.jl:626-709 — discretization-
    generic there, covering PeriodicOrbitTrapProblem)."""
    from .orbits import continuation_po
    from .trapezoid import Trapeze

    if delta_p is None:
        delta_p = contparams.ds
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_pd]
    po_prob = gamma.prob
    disc = po_prob.disc
    prob_vf = po_prob.prob_vf
    n = po_prob.n_vf
    X = jnp.asarray(sp.x)
    u, T = disc.split(X, n)                      # (M, n), scalar
    par = po_prob.set_lens_param(po_prob.params, sp.param)

    Mn = disc.monodromy(prob_vf, X, par)
    mult, vecs = dense_eig(Mn)
    i0 = int(np.argmin(np.abs(np.asarray(mult) + 1.0)))
    phi0 = np.array(np.real(np.asarray(vecs)[:, i0]))
    phi0 /= np.linalg.norm(phi0)

    # time-dependent antiperiodic mode phi(t_{i+1}) = S_i phi(t_i) with the
    # per-slice trapezoid step maps (a time-constant perturbation is mostly
    # orthogonal to the emerging period-2 branch)
    params = par["_inner"]
    Js = np.asarray(jax.vmap(
        lambda x: prob_vf.jacobian(x, params))(u))   # (M, n, n)
    h = np.asarray(disc.steps())
    Tf = float(T)
    eye = np.eye(n)
    phis = [phi0]
    for i in range(disc.M - 1):
        A = eye + (Tf * h[i] / 2.0) * Js[i]
        B = eye - (Tf * h[i] / 2.0) * Js[i + 1]
        phis.append(np.linalg.solve(B, A @ phis[-1]))
    phis = np.stack(phis)                        # (M, n); phis[-1] ~ -phi0
    phis /= max(np.abs(phis).max(), 1e-300)

    # doubled loop: slice M-1 duplicates slice 0 (periodicity row), so the
    # 2T orbit has 2M-1 slices; the antiperiodic sign flip closes it
    u_np = np.asarray(u)
    scale = ampfactor * float(np.linalg.norm(u_np[0]) + 1.0)
    first = u_np[:-1] + scale * phis[:-1]
    second = u_np[:-1] - scale * phis[:-1]
    doubled = np.concatenate(
        [first, second, u_np[:1] + scale * phis[:1]], axis=0)
    if disc.time_mesh is not None:
        disc2 = Trapeze(M=2 * disc.M - 1,
                        time_mesh=np.concatenate([h, h]) / 2.0)
    else:
        disc2 = Trapeze(M=2 * disc.M - 1)
    X2 = disc2.pack(jnp.asarray(doubled), 2 * T)

    p1 = sp.param + delta_p
    params_new = prob_vf.set_lens_param(prob_vf.params, float(p1))
    return continuation_po(prob_vf, disc2, X2, contparams,
                           alg=alg, params=params_new, **kwargs)


def _pd_branch_switch_shooting(br_po, ind_pd, contparams,
                               ampfactor: float = 0.1, delta_p=None,
                               alg=None, **kwargs) -> Branch:
    """PD branch switching for STANDARD SHOOTING (VERDICT r1 #4): the
    double-period guess has 2M shooting points — the orbit traversed twice,
    perturbed by +/- the antiperiodic Floquet mode propagated to each
    segment start through the per-segment flow jacobians
    (ref PO->PO branching, PeriodicOrbits.jl:626-709)."""
    from .orbits import continuation_po
    from .shooting import Shooting

    if delta_p is None:
        delta_p = contparams.ds
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sp = gamma.specialpoint[ind_pd]
    po_prob = gamma.prob
    disc = po_prob.disc
    prob_vf = po_prob.prob_vf
    n = po_prob.n_vf
    X = jnp.asarray(sp.x)
    u, T = disc.split(X, n)                      # (M, n), scalar
    par = po_prob.set_lens_param(po_prob.params, sp.param)

    M = disc.monodromy(prob_vf, X, par)
    mult, vecs = dense_eig(M)
    i0 = int(np.argmin(np.abs(np.asarray(mult) + 1.0)))
    phi0 = np.array(np.real(np.asarray(vecs)[:, i0]))
    phi0 /= np.linalg.norm(phi0)

    # propagate the mode to each segment start: phi_{i+1} = dPhi_i phi_i
    params_in = par["_inner"]
    fl = disc._flow(prob_vf)
    dPhis = jax.vmap(
        lambda x: jax.jacfwd(lambda v: fl(v, params_in, T / disc.M))(x))(u)
    dPhis = np.asarray(dPhis)
    phis = [phi0]
    for i in range(disc.M - 1):
        nxt = dPhis[i] @ phis[-1]
        phis.append(nxt / max(np.linalg.norm(nxt), 1e-300))
    phis = np.stack(phis)                        # (M, n)

    u_np = np.asarray(u)
    scale = ampfactor * float(np.linalg.norm(u_np[0]) + 1.0)
    doubled = np.concatenate([u_np + scale * phis, u_np - scale * phis],
                             axis=0)             # (2M, n)
    disc2 = Shooting(M=2 * disc.M,
                     steps_per_segment=disc.steps_per_segment,
                     method=disc.method, adaptive=disc.adaptive,
                     rtol=disc.rtol, atol=disc.atol,
                     max_steps=disc.max_steps)
    X2 = disc2.pack(jnp.asarray(doubled), 2 * T)
    params_new = prob_vf.set_lens_param(prob_vf.params,
                                        float(sp.param + delta_p))
    return continuation_po(prob_vf, disc2, X2, contparams, alg=alg,
                           params=params_new, **kwargs)
