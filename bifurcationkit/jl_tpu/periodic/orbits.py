"""Periodic-orbit orchestration (ref src/periodicorbit/PeriodicOrbits.jl).

Wraps a discretization (Trapeze / Collocation / Shooting) into an ordinary
`BifurcationProblem` over X = [orbit dof, T], so Newton, PALC, detection,
bisection and events all apply unchanged (ref the wrapper problems
PeriodicOrbitFunctional*, src/Problems.jl:394-425).  Stability comes from the
Floquet monodromy via the engine's `eig_jacobian` hook; the phase-condition
reference orbit is refreshed by the update! hook through the parameter pytree
(ref updatesection!, no retracing).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..continuation.algorithms import PALC
from ..continuation.driver import continuation
from ..continuation.results import Branch
from ..core.lens import Lens, as_lens
from ..core.params import ContinuationPar, NewtonPar
from ..core.problem import BifurcationProblem
from ..core.state import ravel
from ..newton import newton
from ..normal_forms.codim1 import hopf_normal_form, hopf_predictor
from .collocation import Collocation
from .floquet import FloquetEig
from .shooting import PoincareShooting, Shooting
from .trapezoid import Trapeze


def periodic_orbit_problem(prob_vf: BifurcationProblem, disc, X0,
                           params=None, uref=None,
                           update_section_every_step: int = 1,
                           use_cop: bool = False,
                           floquet: str = "qad",
                           floquet_linsolver=None,
                           floquet_compute_dtype=None):
    """Build the PO BifurcationProblem for any discretization."""
    params = prob_vf.params if params is None else params
    flatvf, unravel_vf = ravel(prob_vf.u0)
    n = flatvf.shape[0]
    # the PO machinery works on raveled states throughout; flatten structured
    # vector fields (e.g. (2, N) reaction-diffusion states) once here
    if getattr(prob_vf.u0, "ndim", None) != 1:
        base = prob_vf

        def F_flat(x, par):
            return ravel(base.F(unravel_vf(x), par))[0]

        kw = {"F": F_flat, "u0": flatvf}
        if base.d2F_user is not None:
            kw["d2F_user"] = lambda x, par, d1, d2: ravel(
                base.d2F_user(unravel_vf(x), par, unravel_vf(d1),
                              unravel_vf(d2)))[0]
        if base.d3F_user is not None:
            kw["d3F_user"] = lambda x, par, d1, d2, d3: ravel(
                base.d3F_user(unravel_vf(x), par, unravel_vf(d1),
                              unravel_vf(d2), unravel_vf(d3)))[0]
        prob_vf = base.re_make(**kw)
    expected = disc.unknown_size(n)
    if X0.shape[0] != expected:
        raise ValueError(
            f"orbit guess has {X0.shape[0]} unknowns but {type(disc).__name__}"
            f" over a {n}-dim vector field needs {expected} "
            f"(orbit dof + period)")

    po_par = {"_inner": params}
    if isinstance(disc, Collocation):
        mesh = jnp.asarray(np.linspace(0, 1, disc.Ntst + 1))
        nodes, _ = disc.split(X0, n)
        nodes_ref = nodes if uref is None else uref
        _, phi = disc.phase_data(prob_vf, nodes_ref, params, mesh)
        po_par.update({"_uref": nodes_ref, "_phi": phi, "_mesh": mesh})
    elif isinstance(disc, Trapeze):
        u, _ = disc.split(X0, n)
        u_ref = u if uref is None else uref
        _, phi = disc.phase_data(prob_vf, u_ref, params)
        po_par.update({"_uref": u_ref, "_phi": phi})
    elif isinstance(disc, (Shooting, PoincareShooting)):
        po_par.update(disc.section_data(prob_vf, X0, params))
    else:
        raise TypeError(f"unknown discretization {type(disc)}")

    inner_lens = as_lens(prob_vf.lens)
    lens = Lens(
        get=lambda par: inner_lens.get(par["_inner"]),
        set=lambda par, v: {**par,
                            "_inner": inner_lens.set(par["_inner"], v)},
        name=f"po/{inner_lens.name}")

    def F_po(X, par):
        return disc.residual(prob_vf, X, par)

    is_poincare = isinstance(disc, PoincareShooting)
    is_poincare_ev = is_poincare and getattr(disc, "event_driven", False)
    # event-driven Poincare shooting: the period comes out of the crossing
    # integration (refreshed by the update hook), not from the unknowns
    period_cell = {"T": float(np.sum(po_par["_thint"]))
                   if is_poincare_ev else None}

    def record(X, p, **k):
        if is_poincare_ev:
            T = period_cell["T"]
        else:
            T = disc.period(X) if hasattr(disc, "period") else X[-1]
        dof = X[:-1] if not is_poincare else X
        out = {"param": p, "period": T,
               "norm": jnp.linalg.norm(dof) / jnp.sqrt(1.0 * dof.shape[0])}
        if not is_poincare:
            traj = dof.reshape(dof.shape[0] // n, n)
            out.update({
                "amplitude": jnp.max(traj[:, 0]) - jnp.min(traj[:, 0]),
                "max": jnp.max(traj[:, 0]),
                "min": jnp.min(traj[:, 0])})
        return out

    def update(it, state):
        """Refresh the phase-condition reference to the current orbit
        (ref updatesection!)."""
        if update_section_every_step <= 0 or \
                state.step % update_section_every_step != 0:
            return None
        # inject the CURRENT continuation-parameter value: current_params
        # holds the base pytree; the engine sets the lens value only when
        # evaluating F (stale params here would re-anchor sections/crossing
        # times against the wrong vector field)
        par = it.prob.set_lens_param(it.current_params, float(state.p))
        X = state.z.u
        new = dict(par)
        if isinstance(disc, Collocation):
            nodes, T = disc.split(X, n)
            params_now = par["_inner"]
            mesh_now = par["_mesh"]
            if disc.adapt_mesh:
                # ref mesh adaptation, PeriodicOrbitCollocation.jl:1235-1400
                nodes, mesh_now = disc.adapt(nodes, mesh_now)
                new["_mesh"] = mesh_now
                state.z = dataclasses.replace(
                    state.z, u=disc.pack(nodes, T))
            _, phi = disc.phase_data(prob_vf, nodes, params_now, mesh_now)
            new["_uref"] = nodes
            new["_phi"] = phi
        elif isinstance(disc, Trapeze):
            u, _ = disc.split(X, n)
            _, phi = disc.phase_data(prob_vf, u, par["_inner"])
            new["_uref"] = u
            new["_phi"] = phi
        elif is_poincare_ev:
            new.update(disc.section_data(prob_vf, X, par["_inner"],
                                         po_par=par))
            period_cell["T"] = float(np.sum(np.asarray(new["_thint"])))
        elif isinstance(disc, (Shooting, PoincareShooting)):
            new.update(disc.section_data(prob_vf, X, par["_inner"]))
        return new

    jac = None
    if use_cop:
        if not isinstance(disc, Collocation):
            raise ValueError("use_cop requires a Collocation discretization")
        from .cop import collocation_block_jacobian

        jac = lambda X, par: collocation_block_jacobian(disc, prob_vf, X,
                                                        par)

    if floquet == "gev":
        if not isinstance(disc, Collocation):
            raise ValueError("floquet='gev' requires Collocation")

        def eig_jacobian(X, par):
            return disc.interval_maps(prob_vf, X, par)
    elif floquet == "coll":
        # COP-reusing FloquetColl (ref Floquet.jl:533-760): the stability
        # solve consumes the same structured blocks as the Newton solve
        if not isinstance(disc, Collocation):
            raise ValueError("floquet='coll' requires Collocation")
        from .cop import collocation_block_jacobian as _cbj

        def eig_jacobian(X, par):
            return _cbj(disc, prob_vf, X, par)
    elif floquet == "qad_mf":
        # matrix-free monodromy operator (ref Floquet.jl:89-109,164-254):
        # PDE-scale shooting/trapeze stability without forming (n, n)
        if not hasattr(disc, "monodromy_operator"):
            raise ValueError(
                "floquet='qad_mf' needs a discretization with a "
                "monodromy_operator (Shooting or Trapeze)")

        def eig_jacobian(X, par):
            if floquet_compute_dtype is not None:
                # reduced-precision Floquet sweep: multipliers are needed
                # to ~tol_stability (1e-3) for detection; the whole
                # M-slice chain (jvps + inner solves) runs native f32 on
                # TPU where f64 is emulated
                ed = floquet_compute_dtype
                X = X.astype(ed)
                par = jax.tree_util.tree_map(
                    lambda a: a.astype(ed)
                    if (hasattr(a, "dtype")
                        and jnp.issubdtype(a.dtype, jnp.floating)) else a,
                    par)
            return disc.monodromy_operator(prob_vf, X, par,
                                           linsolver=floquet_linsolver)
    else:
        def eig_jacobian(X, par):
            return disc.monodromy(prob_vf, X, par)
    po_prob = BifurcationProblem(F_po, u0=X0, params=po_par, lens=lens,
                                 jac=jac,
                                 record_from_solution=record, update=update)
    object.__setattr__(po_prob, "eig_jacobian", eig_jacobian)
    # structured-jacobian Floquet solvers (COP blocks / interval maps):
    # evaluate the blocks and the eigensolve in SEPARATE dispatches — one
    # fused program blows the TPU compile helper at PDE scale
    object.__setattr__(po_prob, "eig_two_stage",
                       floquet in ("coll", "gev"))
    object.__setattr__(po_prob, "disc", disc)
    object.__setattr__(po_prob, "prob_vf", prob_vf)
    object.__setattr__(po_prob, "n_vf", n)
    # the Floquet spectrum has at most n_vf entries: cap the engine's nev
    # auto-raise there (ADVICE r3 — no useless rebuild when
    # n_unstable + 5 > n_vf)
    object.__setattr__(po_prob, "eig_max_nev", n)
    return po_prob


def _po_contparams(cp: ContinuationPar) -> ContinuationPar:
    """PO defaults: Floquet eigensolver + looser stability tolerance
    (the trivial multiplier sits at exponent 0).  Any user-chosen Floquet
    solver (FloquetColl/FloquetGEV/...) is kept — only a non-Floquet
    eigensolver is replaced."""
    nopts = cp.newton_options
    if not getattr(nopts.eigsolver, "is_floquet", False):
        nopts = nopts.replace(eigsolver=FloquetEig())
    tol_stab = max(cp.tol_stability, 1e-6)
    return cp.replace(newton_options=nopts, tol_stability=tol_stab)


def newton_po(prob_vf, disc, X0, params=None,
              options: Optional[NewtonPar] = None, **kwargs):
    """Newton solve of a periodic orbit guess (ref newton entry,
    PeriodicOrbits.jl:310)."""
    options = options or NewtonPar()
    po_prob = periodic_orbit_problem(prob_vf, disc, X0, params=params)
    return newton(po_prob, options, **kwargs), po_prob


def _floquet_mode(contparams: ContinuationPar, floquet=None) -> str:
    """Pick the eig_jacobian flavor matching the configured Floquet solver
    (FloquetColl wants the COP blocks, FloquetGEV the interval maps)."""
    if floquet is not None:
        return floquet
    from .floquet import FloquetColl, FloquetGEV, FloquetQaDMF

    eig = contparams.newton_options.eigsolver
    if isinstance(eig, FloquetColl):
        return "coll"
    if isinstance(eig, FloquetGEV):
        return "gev"
    if isinstance(eig, FloquetQaDMF):
        return "qad_mf"
    return "qad"


def continuation_po(prob_vf, disc, X0, contparams: ContinuationPar,
                    alg=None, params=None, use_cop: bool = False,
                    floquet=None, floquet_linsolver=None,
                    floquet_compute_dtype=None,
                    **kwargs) -> Branch:
    """Continue a periodic orbit in the vector field's lens parameter."""
    alg = alg or PALC()
    po_prob = periodic_orbit_problem(prob_vf, disc, X0, params=params,
                                     use_cop=use_cop,
                                     floquet=_floquet_mode(contparams,
                                                           floquet),
                                     floquet_linsolver=floquet_linsolver,
                                     floquet_compute_dtype=floquet_compute_dtype)
    cp = _po_contparams(contparams)
    if use_cop:
        from .cop import COPBLS, COPLS

        nopts = cp.newton_options
        if not isinstance(nopts.linsolver, COPLS):
            cp = cp.replace(newton_options=nopts.replace(linsolver=COPLS()))
        # PALC rides the single-pass bordered condensation (ref COPBLS,
        # cop.jl:107): one stage-1 per corrector iteration, not two
        if isinstance(alg, PALC) and alg.bls is None:
            alg = dataclasses.replace(alg, bls=COPBLS())
    gamma = continuation(po_prob, alg, cp, kind="PeriodicOrbitCont",
                         **kwargs)
    return Branch(gamma=gamma, bp=None)


def continuation_hopf_po(br, ind_hopf: int, contparams: ContinuationPar,
                         disc=None, alg=None, delta_p: float = None,
                         ampfactor: float = 1.0, use_cop: bool = False,
                         nf_kwargs: Optional[dict] = None,
                         floquet_linsolver=None,
                         floquet_compute_dtype=None,
                         **kwargs) -> Branch:
    """Automatic branch switching Hopf -> periodic orbits
    (ref continuation(br, ind_hopf, contparams, disc),
    PeriodicOrbits.jl:395-624): normal-form predictor seeds the orbit guess.

    `nf_kwargs={"matrix_free": True}` computes the seeding Hopf normal form
    without materializing the jacobian (the reference's PDE-scale route,
    ref src/NormalForms.jl:1037-1064 through the solver abstraction)."""
    disc = disc or Collocation(Ntst=20, m=4)
    prob_vf = br.prob
    hp = hopf_normal_form(prob_vf, br, ind_hopf, **(nf_kwargs or {}))
    return _continuation_hopf_pred(prob_vf, hp, contparams, disc, alg=alg,
                                   delta_p=delta_p, ampfactor=ampfactor,
                                   use_cop=use_cop,
                                   floquet_linsolver=floquet_linsolver,
                                   floquet_compute_dtype=floquet_compute_dtype,
                                   **kwargs)


def _continuation_hopf_pred(prob_vf, hp, contparams, disc, alg=None,
                            delta_p=None, ampfactor=1.0, use_cop=False,
                            floquet_linsolver=None,
                            floquet_compute_dtype=None, **kwargs) -> Branch:
    """Common Hopf-normal-form -> PO-branch tail (ref _continuation(hopfpt,
    ...), PeriodicOrbits.jl:395-530)."""
    alg = alg or PALC()
    ds = delta_p if delta_p is not None else contparams.ds
    pred = hopf_predictor(hp, ds, ampfactor=ampfactor)
    p_new = float(pred["p"])
    period = float(pred["period"])
    n = np.asarray(hp.x0).shape[0]

    orbit_fn = lambda t: np.asarray(pred["orbit"](t))
    X0 = disc.generate_solution(orbit_fn, period, n)
    params_new = prob_vf.set_lens_param(prob_vf.params, p_new)
    po_prob = periodic_orbit_problem(prob_vf, disc, X0, params=params_new,
                                     use_cop=use_cop,
                                     floquet=_floquet_mode(contparams),
                                     floquet_linsolver=floquet_linsolver,
                                     floquet_compute_dtype=floquet_compute_dtype)
    cp = _po_contparams(contparams)
    if use_cop:
        from .cop import COPBLS, COPLS

        nopts = cp.newton_options
        if not isinstance(nopts.linsolver, COPLS):
            cp = cp.replace(newton_options=nopts.replace(linsolver=COPLS()))
        if isinstance(alg, PALC) and alg.bls is None:
            alg = dataclasses.replace(alg, bls=COPBLS())
    gamma = continuation(po_prob, alg, cp, kind="PeriodicOrbitCont",
                         **kwargs)
    return Branch(gamma=gamma, bp=hp)


def continuation_from_hopf_point(br_hopf, ind_pt: int,
                                 contparams: ContinuationPar, disc=None,
                                 alg=None, lens=None, delta_p: float = None,
                                 ampfactor: float = 1.0, use_cop: bool = False,
                                 nf_kwargs: Optional[dict] = None,
                                 **kwargs) -> Branch:
    """Branch switching from a point ON a codim-2 Hopf curve to the periodic
    orbits emanating from it (ref continuation_from_hopf_point,
    src/periodicorbit/PeriodicOrbits.jl:530-601).

    `br_hopf` is a curve produced by `continuation_hopf` (run it with
    `save_sol_every_step=1` so the curve points are stored); `ind_pt` indexes
    its saved solutions; `lens` is the parameter axis for the PO continuation
    (default: the Hopf curve's second parameter, as the reference)."""
    from ..normal_forms.codim1 import hopf_normal_form_point

    gamma = br_hopf.gamma if isinstance(br_hopf, Branch) else br_hopf
    maprob = gamma.prob
    if getattr(maprob, "ma_kind", None) != "hopf":
        raise ValueError("br_hopf must be a codim-2 Hopf curve "
                         "(continuation_hopf result)")
    if not gamma.sol:
        raise ValueError("the Hopf curve stored no solutions; rerun "
                         "continuation_hopf with save_sol_every_step=1")
    prob_vf = maprob.inner_prob
    n = maprob.n_inner
    sol = gamma.sol[ind_pt]
    X = np.asarray(sol["x"])
    p2 = float(sol["p"])
    x, p1, omega = X[:n], float(X[n]), float(X[n + 1])

    params = maprob.outer_lens.set(prob_vf.params, p2)
    params = maprob.inner_lens.set(params, p1)
    lens = lens if lens is not None else maprob.outer_lens
    prob_pt = prob_vf.re_make(u0=maprob.unravel_inner(jnp.asarray(x)),
                              params=params, lens=lens)
    p0 = prob_pt.get_lens_param(params)
    nf_kwargs = dict(nf_kwargs or {})
    if getattr(maprob, "ma_mf", False):
        # MF Hopf curves never materialized a jacobian — neither does the
        # normal form: route through the operator path with the curve's
        # preconditioner (ref the reference's PO switch consuming the
        # solver-abstraction NF, src/periodicorbit/PeriodicOrbits.jl:395-417)
        nf_kwargs.setdefault("matrix_free", True)
        nf_kwargs.setdefault("precond", maprob.precond)
    hp = hopf_normal_form_point(prob_pt, prob_pt.u0, p0, abs(omega),
                                **nf_kwargs)
    disc = disc or Collocation(Ntst=20, m=4)
    return _continuation_hopf_pred(prob_pt, hp, contparams, disc, alg=alg,
                                   delta_p=delta_p, ampfactor=ampfactor,
                                   use_cop=use_cop, **kwargs)


def get_periodic_orbit(br_po, idx: int = -1):
    """Reference-named accessor (ref get_periodic_orbit): returns a dict
    with the orbit samples, times, period and parameter."""
    traj, T, p = orbit_from_branch(br_po, idx)
    ts = np.linspace(0.0, T, traj.shape[0])
    return {"t": ts, "u": traj, "period": T, "p": p}


def orbit_from_branch(br_po, idx: int = -1):
    """Extract (trajectory (npts, n), period, param) from a saved solution."""
    gamma = br_po.gamma if isinstance(br_po, Branch) else br_po
    sol = gamma.sol[idx]
    X = np.asarray(sol["x"])
    prob = gamma.prob
    n = prob.n_vf
    T = X[-1]
    return X[:-1].reshape(-1, n), float(T), float(sol["p"])
