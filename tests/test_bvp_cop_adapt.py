"""BVP collocation parity items (VERDICT r1 #9): analytical block jacobian
+ condensed solver, and de Boor mesh adaptation through the update hook
(ref src/bvp/BVPBifProblem.jl:225-296, src/bvp/collocation/*)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.bvp.bvp import (BVPCollocation, BVPCOPLS,
                                           BVPModel, bvp_block_jacobian,
                                           bvp_cop_solve, bvp_problem,
                                           discretize)


def _bratu(Ntst=12, m=4, lam=1.0, **disc_kw):
    """Bratu u'' + lam e^u = 0, u(0) = u(1) = 0 — closed-form fold at
    lam* = 3.51383..."""
    def F(x, par):
        return jnp.array([x[1], -par["lam"] * jnp.exp(x[0])])

    def g(u0, uT, par):
        return jnp.array([u0[0], uT[0]])

    model = BVPModel(F, g)
    disc = BVPCollocation(Ntst=Ntst, m=m, **disc_kw)
    X0 = discretize(model, disc,
                    lambda t: np.array([0.3 * np.sin(np.pi * t), 0.0]), 2)
    return model, disc, X0


def test_bvp_blocks_match_ad_jacobian():
    model, disc, X0 = _bratu()
    prob = bvp_problem(model, disc, X0, {"lam": 1.0}, "lam", n=2,
                       use_cop=True)
    blocks = bvp_block_jacobian(disc, model, X0, prob.params, 2)
    J_ad = jax.jacfwd(lambda X: disc.residual(model, X, prob.params, 2))(X0)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(X0.shape[0]))
    np.testing.assert_allclose(np.asarray(blocks(v)),
                               np.asarray(J_ad @ v), atol=1e-9)


def test_bvp_cop_solve_matches_dense():
    model, disc, X0 = _bratu()
    prob = bvp_problem(model, disc, X0, {"lam": 1.0}, "lam", n=2,
                       use_cop=True)
    blocks = bvp_block_jacobian(disc, model, X0, prob.params, 2)
    J_ad = np.asarray(jax.jacfwd(
        lambda X: disc.residual(model, X, prob.params, 2))(X0))
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.standard_normal(X0.shape[0]))
    x_cop = np.asarray(bvp_cop_solve(blocks, rhs))
    x_dense = np.linalg.solve(J_ad, np.asarray(rhs))
    np.testing.assert_allclose(x_cop, x_dense, atol=1e-8)


def test_bvp_newton_with_cop_solver():
    model, disc, X0 = _bratu()
    prob = bvp_problem(model, disc, X0, {"lam": 1.0}, "lam", n=2,
                       use_cop=True)
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-11, max_iterations=20,
                                       linsolver=BVPCOPLS()))
    assert bool(sol.converged)
    # midpoint value of the lower Bratu sheet at lam=1: 0.1405392
    u = np.asarray(sol.u).reshape(-1, 2)
    tmid = np.argmin(np.abs(disc.times() - 0.5))
    assert abs(u[tmid, 0] - 0.1405392) < 1e-4


def _bratu_fold(disc_kw, Ntst, newton_options=None):
    model, disc, X0 = _bratu(Ntst=Ntst, m=3, **disc_kw)
    use_cop = True
    prob = bvp_problem(model, disc, X0, {"lam": 1.0}, "lam", n=2,
                       use_cop=use_cop)
    nopts = newton_options or bk.NewtonPar(tol=1e-10, max_iterations=25,
                                           linsolver=BVPCOPLS())
    sol = bk.newton(prob, nopts)
    assert bool(sol.converged)
    cp = bk.ContinuationPar(ds=0.05, dsmax=0.1, dsmin=1e-6, p_min=0.1,
                            p_max=4.0, max_steps=120, detect_bifurcation=0,
                            detect_fold=True, newton_options=nopts)
    br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
    folds = [sp.param for sp in br.specialpoint if sp.type == "fold"]
    assert folds
    return folds[0]


def test_bvp_adaptive_mesh_fold_not_disturbed():
    """On the SMOOTH Bratu problem Gauss collocation already
    superconverges — adaptation must not disturb the fold location."""
    lam_star = 3.513830719
    f_adapt = _bratu_fold({"adapt_mesh": True, "adapt_every": 5}, Ntst=6)
    # each remesh is a slightly different discrete problem, so the located
    # fold wanders within discretization error; it must stay at the 0.2%
    # level (detection + continuation through the fold unbroken)
    assert abs(f_adapt - lam_star) < 8e-3


def _troesch_solve(Ntst, adapt, lam=6.0, cycles=4):
    """Troesch's problem u'' = lam sinh(lam u), u(0)=0, u(1)=1: boundary
    layer of width ~1/lam at t=1 — the regime where mesh adaptation pays
    (the BVP analogue of the carrier boundary layers the reference's
    adaptive meshes target)."""
    def F(x, par):
        return jnp.array([x[1], par["lam"] * jnp.sinh(par["lam"] * x[0])])

    def g(u0, uT, par):
        return jnp.array([u0[0], uT[0] - 1.0])

    model = BVPModel(F, g)
    disc = BVPCollocation(Ntst=Ntst, m=3)
    X0 = discretize(model, disc, lambda t: np.array([t ** 3, 3 * t ** 2]),
                    2)
    nopts = bk.NewtonPar(tol=1e-11, max_iterations=60, linesearch=True,
                         linsolver=BVPCOPLS())
    mesh = jnp.linspace(0.0, 1.0, Ntst + 1)
    params = {"lam": lam}
    X = X0
    for it in range(cycles if adapt else 1):
        prob = bvp_problem(model, BVPCollocation(Ntst=Ntst, m=3), X,
                           params, "lam", n=2, use_cop=True)
        # solve on the CURRENT mesh by overriding the residual mesh
        def Fres(Xv, par, mesh=mesh):
            return BVPCollocation(Ntst=Ntst, m=3).residual(
                model, Xv, par, 2, mesh=mesh)

        def jac(Xv, par, mesh=mesh):
            from bifurcationkit.jl_tpu.bvp.bvp import bvp_block_jacobian

            return bvp_block_jacobian(BVPCollocation(Ntst=Ntst, m=3),
                                      model, Xv, par, 2, mesh=mesh)

        prob = prob.re_make(F=Fres, u0=X, jac=jac)
        sol = bk.newton(prob, nopts)
        assert bool(sol.converged), f"cycle {it} diverged"
        X = sol.u
        if adapt and it < cycles - 1:
            from bifurcationkit.jl_tpu.periodic.collocation import \
                Collocation

            tw = Collocation(Ntst=Ntst, m=3)
            nodes = X.reshape(-1, 2)
            new_nodes, mesh = tw.adapt(nodes, mesh)
            X = jnp.asarray(np.asarray(new_nodes).reshape(-1))
    return np.asarray(X).reshape(-1, 2), np.asarray(mesh)


def _profile_on(ts, nodes, mesh, Ntst):
    from bifurcationkit.jl_tpu.periodic.collocation import Collocation

    tw = Collocation(Ntst=Ntst, m=3)
    return np.stack([tw.interpolate(nodes, mesh, t) for t in ts])[:, 0]


def test_bvp_adaptive_mesh_beats_uniform_on_boundary_layer():
    """VERDICT #9 'Done' criterion: the adaptive mesh reaches the
    reference accuracy with HALF the nodes of the uniform mesh (global
    max error of the solution profile vs an Ntst=64 reference)."""
    ts = np.linspace(0.02, 0.98, 101)
    ref_nodes, ref_mesh = _troesch_solve(Ntst=64, adapt=False)
    ref = _profile_on(ts, ref_nodes, ref_mesh, 64)
    u10, m10 = _troesch_solve(Ntst=10, adapt=False)
    a10, am10 = _troesch_solve(Ntst=10, adapt=True)
    u20, m20 = _troesch_solve(Ntst=20, adapt=False)
    e_uni_10 = np.max(np.abs(_profile_on(ts, u10, m10, 10) - ref))
    e_ada_10 = np.max(np.abs(_profile_on(ts, a10, am10, 10) - ref))
    e_uni_20 = np.max(np.abs(_profile_on(ts, u20, m20, 20) - ref))
    # the adapted mesh concentrated intervals in the layer near t = 1
    assert np.diff(am10)[-1] < 0.5 * np.diff(am10)[0]
    assert e_ada_10 < e_uni_10
    assert e_ada_10 <= e_uni_20 * 1.5
