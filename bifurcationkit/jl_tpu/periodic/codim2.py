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
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codim2.minaug import _adjoint_border_solve, _border_solve
from ..continuation.algorithms import PALC
from ..continuation.driver import continuation
from ..continuation.results import Branch
from ..detection.events import ContinuousEvent
from ..core.lens import Lens, as_lens
from ..core.params import ContinuationPar, NewtonPar
from ..core.problem import BifurcationProblem
from ..linalg.eig import dense_eig
from ..newton import newton
from .collocation import Collocation
from .orbits import periodic_orbit_problem


_SHIFTS = {"pd": lambda th: 1.0, "fold": lambda th: -1.0}


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
        M = disc.monodromy(prob_vf, X, po_par)
        if kind == "pd":
            shift = 1.0      # M + I singular at mu = -1
            _, sigma = _border_solve(M, par["_a"], par["_b"], shift=shift)
            return jnp.concatenate([R, jnp.real(sigma)[None]])
        if kind == "fold":
            _, sigma = _border_solve(M, par["_a"], par["_b"], shift=-1.0)
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
        M = disc.monodromy(prob_vf, X, po_par)
        if kind == "pd":
            shift = 1.0
        elif kind == "fold":
            shift = -1.0
        else:
            shift = -jnp.exp(1j * theta)
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
        par = it.current_params
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

    if kind == "pd":
        def cond(it, state):
            X, po_par, x0, T, _, par = _point(it, state)
            M = disc.monodromy(prob_vf, X, po_par)
            v, _ = _border_solve(M, par["_a"], par["_b"], shift=1.0)
            w, _ = _adjoint_border_solve(M, par["_a"], par["_b"], shift=1.0)
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
                            alg=None, detect_codim3: int = 1,
                            compute_nf_events: bool = True,
                            nf_flow_steps: int = 120, **kwargs):
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    po_prob = gamma.prob
    alg = alg or PALC()
    X, p1, theta, zeta, zeta_ad, par = _start_data(br_po, ind_bif, kind)
    maprob, split = _po_ma_problem(po_prob, lens2, kind)

    if kind == "ns":
        cdtype = jnp.complex128
        a = zeta_ad.astype(cdtype)
        b = zeta.astype(cdtype)
        Y0 = jnp.concatenate([X, jnp.asarray(p1)[None],
                              jnp.asarray(theta)[None]])
    else:
        a = jnp.real(zeta_ad)
        a = a / jnp.linalg.norm(a)
        b = jnp.real(zeta)
        b = b / jnp.linalg.norm(b)
        Y0 = jnp.concatenate([X, jnp.asarray(p1)[None]])

    params = dict(par)
    params["_a"] = a
    params["_b"] = b
    maprob2 = maprob.re_make(u0=Y0, params=params)
    for attr in ("inner_prob", "ma_kind", "eig_jacobian"):
        object.__setattr__(maprob2, attr, getattr(maprob, attr))
    cp = contparams
    if cp.detect_bifurcation > 1:
        # detect SECONDARY bifurcations along the curve from the inner
        # orbit's Floquet spectrum (eig_jacobian = monodromy); the tracked
        # critical multiplier and the trivial one sit ON the unit circle and
        # stay below tol_stability
        from .floquet import FloquetEig

        nopts = cp.newton_options
        if not isinstance(nopts.eigsolver, FloquetEig):
            cp = cp.replace(
                newton_options=nopts.replace(eigsolver=FloquetEig()))
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
    return Branch(gamma=gamma2, bp=gamma.specialpoint[ind_bif])


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
        raise NotImplementedError("PD branch switching currently requires "
                                  "Collocation")
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
