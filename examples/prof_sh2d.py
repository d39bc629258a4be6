"""Decompose the SH2d-fronts flagship step cost on TPU (docs/PERF.md).

Times, warm: one IterativeRefinement solve, one BorderingBLS call, one
shift-invert eigensolve, one fused PALC step, and a short continuation.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


def t(fn, n=3, warm=1):
    for _ in range(warm):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    on_tpu = jax.default_backend() != "cpu"
    print("backend:", jax.default_backend())
    prob = models.swift_hohenberg_2d(Nx=151, Ny=100)
    ls = bk.IterativeRefinement(
        inner=bk.GMRES(restart=40, maxiter=160, rtol=1e-5,
                       precond=prob.spectral_precond),
        refinements=4, rtol=1e-10)

    t0 = time.time()
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-8, max_iterations=25,
                                       linsolver=ls))
    print(f"newton: cv={bool(sol.converged)} it={int(sol.itnewton)} "
          f"{time.time()-t0:.1f}s incl compile")

    u = sol.u
    par = prob.params

    # one linear solve (warm)
    from bifurcationkit.jl_tpu.continuation.kernels import _pick_jac
    nopts = bk.NewtonPar(tol=1e-7, max_iterations=15, linsolver=ls)
    jac = _pick_jac(prob, ls)

    @jax.jit
    def one_solve(u, par):
        J = jac(u, par)
        rhs = prob.residual(u, par)
        du, cv, itl = ls(J, rhs)
        return du, itl

    du, itl = one_solve(u, par)
    print(f"IR solve: {t(lambda: one_solve(u, par)):.3f}s  itl={int(itl)}")

    # BorderingBLS call
    from bifurcationkit.jl_tpu.linalg.bordered import BorderingBLS
    bls = BorderingBLS(solver=ls)

    @jax.jit
    def one_bls(u, par):
        J = jac(u, par)
        dFdp = prob.dFdp(u, par)
        rhs = prob.residual(u, par)
        tau_u = jax.tree_util.tree_map(jnp.ones_like, u)
        dX, dl, cv, itl2 = bls(J, dFdp, tau_u, jnp.asarray(1.0), rhs,
                               jnp.asarray(0.0), 0.5, 0.5)
        return dX, itl2

    _, itl2 = one_bls(u, par)
    print(f"BLS call: {t(lambda: one_bls(u, par)):.3f}s  itl={itl2}")

    # eigensolve
    eig = bk.ShiftInvertEig(
        sigma=0.1,
        eigsolver=bk.ArnoldiEig(which="LM", krylov_dim=40, restarts=2),
        linsolver=bk.GMRES(restart=40, maxiter=120, rtol=1e-5,
                           precond=prob.spectral_precond),
        compute_dtype=np.float32 if on_tpu else None)
    cp = bk.ContinuationPar(ds=-0.005, dsmax=0.02, dsmin=1e-6, p_min=-0.8,
                            p_max=0.2, max_steps=9, nev=12,
                            detect_bifurcation=3, detect_fold=True,
                            newton_options=bk.NewtonPar(
                                tol=1e-7, max_iterations=15, linsolver=ls,
                                eigsolver=eig))
    from bifurcationkit.jl_tpu.continuation.engine import ContIterable
    it0 = ContIterable(prob.re_make(u0=u), bk.PALC(), cp)
    kern = it0.kernels

    def eig_call(seed=None):
        # kern.eig returns host numpy (already synced)
        vals, vecs, cv, seed = kern.eig(u, jnp.asarray(-0.1), par, seed)
        return np.asarray(vals), seed

    _, seed = eig_call()
    t0 = time.perf_counter()
    for _ in range(3):
        eig_call()
    print(f"eig cold: {(time.perf_counter()-t0)/3:.3f}s")
    t0 = time.perf_counter()
    for _ in range(3):
        _, seed = eig_call(seed)
    print(f"eig warm-started: {(time.perf_counter()-t0)/3:.3f}s")

    # fused palc step
    state = it0.init_state()
    z, tau = state.z, state.tau

    def full_step():
        out = kern.palc_full_step(z, tau, jnp.asarray(-0.005), par,
                                  state.eig_seed)
        return out[2]

    full_step()
    print(f"fused palc step (corrector+tangent+eig): "
          f"{t(full_step):.3f}s")

    # short continuation with detection
    t0 = time.time()
    br = bk.continuation(prob.re_make(u0=u), bk.PALC(), cp)
    dt = time.time() - t0
    nbp = sum(1 for s in br.specialpoint if s.type != "endpoint")
    print(f"continuation: {len(br)} pts, {nbp} special, {dt:.1f}s = "
          f"{dt/max(len(br)-1,1):.2f} s/step")


if __name__ == "__main__":
    main()
