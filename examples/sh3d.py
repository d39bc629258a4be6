"""Swift-Hohenberg 3D (ref examples/SH3d.jl): 22^3 = 10648-dof matrix-free
Newton-GMRES with the exact DCT spectral preconditioner (the Neumann analog
of the reference's cholesky((I+Delta)^2), SH3d.jl:91), shift-invert Arnoldi
stability, PALC continuation of the 3D lattice branch, and multicontinuation
at Nd branch points.

    python examples/sh3d.py [N] [max_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


def main(N=22, max_steps=146):
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() != "cpu"
    prob = models.swift_hohenberg_3d(N=N)
    precond = prob.spectral_precond
    if on_tpu:
        # mixed precision: f32 Krylov + f64 refinement (docs/TPU_NOTES.md)
        ls = bk.IterativeRefinement(
            inner=bk.GMRES(restart=40, maxiter=160, rtol=1e-5,
                           precond=precond), refinements=4, rtol=1e-10)
    else:
        ls = bk.GMRES(restart=40, maxiter=200, rtol=1e-9, precond=precond)
    # basins at l=0.1 are delicate; double the lattice guess (the reference's
    # exact float path lands on the hexa state from 1.2x, ours from 2x)
    prob = prob.re_make(u0=prob.u0 * 2.0)

    t0 = time.time()
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-8, max_iterations=80,
                                       linsolver=ls))
    u = np.asarray(sol.u)
    print(f"newton ({N ** 3} dof, matrix-free GMRES + DCT precond): "
          f"converged={bool(sol.converged)} in {int(sol.itnewton)} iters, "
          f"{time.time() - t0:.1f}s; |u|_inf={np.abs(u).max():.4f}")

    # stability sweep (ref SH3dEig, SH3d.jl:98-121: sigma = 0.1, :LM).
    # TPU: the 3D SH jacobian is symmetric (gradient flow) — blocked
    # mixed-precision LOBPCG with the exact DCT preconditioner, no inner
    # solves (docs/PERF.md).  CPU: shift-invert Arnoldi as in the reference.
    if on_tpu:
        eig = bk.LOBPCGEig(maxiter=30, tol=3e-3, extra=8,
                           precond=lambda v: precond(v, shift=1.0),
                           compute_dtype=jnp.float32)
    else:
        eig = bk.ShiftInvertEig(sigma=0.1,
                                linsolver=bk.GMRES(
                                    restart=40, maxiter=200, rtol=1e-9,
                                    precond=precond))
    cp = bk.ContinuationPar(ds=-0.001, dsmax=0.005, dsmin=1e-4, p_min=-0.1,
                            p_max=0.15, max_steps=max_steps,
                            detect_bifurcation=3, nev=15, n_inversion=4,
                            newton_options=bk.NewtonPar(
                                tol=1e-9, max_iterations=15, linsolver=ls,
                                eigsolver=eig))
    t0 = time.time()
    br = bk.continuation(prob.re_make(u0=sol.u),
                         bk.PALC(tangent=bk.Bordered()), cp)
    dt = time.time() - t0
    print(f"continuation: {len(br)} steps in {dt:.1f}s = "
          f"{len(br) / dt:.2f} steps/s")
    for i, sp in enumerate(br.specialpoint):
        print(f"  {i}: {sp.type} at l={sp.param:.5f}")

    nds = [i for i, sp in enumerate(br.specialpoint) if sp.type == "nd"]
    if nds:
        from bifurcationkit.jl_tpu.normal_forms.branch_switch import \
            multicontinuation

        t0 = time.time()
        nf, branches = multicontinuation(
            br, nds[0], cp.replace(ds=0.005, max_steps=10,
                                   detect_bifurcation=0,
                                   save_sol_every_step=1),
            delta_p=0.005)
        print(f"multicontinuation at nd #{nds[0]}: {len(branches)} branches "
              f"in {time.time() - t0:.1f}s")
    return br


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 22,
         int(sys.argv[2]) if len(sys.argv) > 2 else 146)
