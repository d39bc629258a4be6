"""2D complex Ginzburg-Landau (ref examples/cGL2d.jl): matrix-free
Newton-GMRES continuation of the trivial state, Hopf detection by Arnoldi,
Hopf normal form, and aBS to periodic orbits with the trapezoid
discretization — the reference's large-PO workload (BASELINE.json config).

The reference runs this with sparse-J + ILU-preconditioned GMRES on CPU;
here the Jacobian-vector product is one fused XLA stencil kernel and every
solve is matrix-free on device.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.linalg.eig import ArnoldiEig
from bifurcationkit.jl_tpu.linalg.linear import GMRES


def main(Nx=21, Ny=11, po_steps=6):
    base = models.cgl2d(Nx=Nx, Ny=Ny, r=0.1, c3=1.0)  # supercritical
    # PO machinery needs a flat state; wrap the (2, Nx, Ny) fields
    shape = (2, Nx, Ny)

    def F(x, par):
        return base.F(x.reshape(shape), par).ravel()

    prob = bk.BifurcationProblem(
        F, u0=jnp.zeros(2 * Nx * Ny), params=base.params, lens="r",
        record_from_solution=lambda x, p, **k: {
            "param": p, "norm": jnp.linalg.norm(x),
            "norminf": jnp.max(jnp.abs(x))})
    # the matrix-free normal-form/codim-2 layers pick the preconditioner
    # up from the problem (spectral_precond accepts flat vectors)
    object.__setattr__(prob, "spectral_precond", base.spectral_precond)

    # stability sweep: every cGL2d mode carries the SAME +-i nu rotation,
    # so the spectrum is two vertical lines — plain LR Arnoldi converges
    # at the Re-gap/spread ratio (~1e-4 at full size: kr=60 leaves ~2e-2
    # eigenvalue bias, enough to MISLOCATE the Hopf).  Shift-invert at
    # sigma = 0 separates the leading pair by |lambda| (~1 vs 1.86x) and
    # localizes to bisection precision.
    if 2 * Nx * Ny > 600:
        eig = bk.ShiftInvertEig(
            sigma=0.0,
            eigsolver=ArnoldiEig(which="LM", krylov_dim=40, restarts=2,
                                 tol=1e-10),
            linsolver=GMRES(restart=40, maxiter=200, rtol=1e-8,
                            precond=base.spectral_precond))
    else:
        eig = ArnoldiEig(krylov_dim=60, restarts=4)
    nopts = bk.NewtonPar(tol=1e-9, max_iterations=20,
                         linsolver=GMRES(restart=40, maxiter=400,
                                         rtol=1e-10,
                                         precond=base.spectral_precond),
                         eigsolver=eig)
    cp = bk.ContinuationPar(ds=0.02, dsmax=0.05, dsmin=1e-6, p_min=0.0,
                            p_max=2.5, max_steps=80, detect_bifurcation=3,
                            nev=10, n_inversion=4, newton_options=nopts)
    br = bk.continuation(prob, bk.PALC(), cp)
    print(br)
    hopfs = br.get_special_points("hopf")
    print("Hopf points at r =", [round(h.param, 5) for h in hopfs])
    assert hopfs, "no Hopf found on the trivial cGL2d branch"

    i = br.specialpoint.index(hopfs[0])
    # matrix-free at scale (the dense path would np.linalg.eig a
    # (2 Nx Ny)^2 jacobian twice); both verified equal to 1e-8 in
    # tests/test_minaug_mf.py::test_hopf_nf_mf_parity_cgl2d
    hp = bk.get_normal_form(br, i, verbose=True,
                            matrix_free=2 * Nx * Ny > 500)

    # --- codim-2: Hopf curve in gamma via the MATRIX-FREE MA path with
    # BT/GH monitoring (the reference's 1,722-dof leg with
    # `jacobian_ma = MinAug()`, ref examples/cGL2d.jl:115-127); the DST-I
    # spectral preconditioner steers every inner solve
    if os.environ.get("CGL2D_HOPF_CURVE", "1") == "1":
        import time

        cp_h = bk.ContinuationPar(
            ds=0.02, dsmax=0.05, dsmin=1e-6, p_min=-10.0, p_max=6.5,
            max_steps=int(os.environ.get("CGL2D_HOPF_STEPS", "20")),
            detect_bifurcation=0, detect_fold=False,
            newton_options=bk.NewtonPar(
                tol=1e-8, max_iterations=20,
                linsolver=bk.GMRES(restart=40, maxiter=400, rtol=1e-10,
                                   precond=base.spectral_precond)))
        t0 = time.time()
        brh = bk.continuation_hopf(br, i, "gamma", cp_h,
                                   detect_codim2_bifurcation=2,
                                   jacobian_ma="minaug",
                                   precond=base.spectral_precond)
        dt = time.time() - t0
        tblh = brh.gamma._table()
        print(f"MF Hopf curve (gamma, r): {len(brh)} steps in {dt:.1f}s = "
              f"{len(brh)/dt:.2f} steps/s; omega:",
              [round(float(v), 4) for v in tblh["omega"][:4]])

    if os.environ.get("CGL2D_PO_DISC", "coll") == "trapeze":
        # the reference's OWN configuration for this workload: trapeze +
        # preconditioned GMRES (it uses ILU, ref examples/cGL2d.jl:209-213;
        # here the space-time spectral preconditioner + the matrix-free
        # Hopf normal form seed + blocked SubspaceEig Floquet per step —
        # nothing materializes at n = 2 Nx Ny)
        import time

        from bifurcationkit.jl_tpu.periodic.floquet import FloquetQaDMF
        from bifurcationkit.jl_tpu.periodic.trapezoid import (
            slice_spectral_precond)

        M = int(os.environ.get("CGL2D_PO_M", "51"))
        n = 2 * Nx * Ny
        r0 = hopfs[0].param
        T0 = 2 * np.pi / abs(hp.omega)
        disc = bk.Trapeze(M=M)
        blocks, to_m, from_m = base.po_spectral_data(r0)
        pre = disc.spectral_precond(n, blocks, to_m, from_m, float(T0))
        import jax

        if jax.default_backend() != "cpu":
            ls_po = bk.IterativeRefinement(
                inner=bk.GMRES(restart=30, maxiter=120, rtol=1e-4,
                               precond=pre),
                refinements=4, rtol=1e-9)
        else:
            ls_po = bk.GMRES(restart=30, maxiter=300, rtol=1e-9,
                             precond=pre)
        c0 = float(T0) / (M - 1) / 2.0
        on_tpu = jax.default_backend() != "cpu"
        mono_ls = bk.GMRES(restart=20, maxiter=80,
                           rtol=1e-5 if on_tpu else 1e-6,
                           precond=slice_spectral_precond(blocks, to_m,
                                                          from_m, c0))
        cp_po = bk.ContinuationPar(
            ds=0.005, dsmax=0.02, dsmin=1e-8, p_min=0.0, p_max=2.5,
            max_steps=po_steps, detect_bifurcation=2, nev=8,
            tol_stability=1e-3, save_eigenvectors=False,
            newton_options=bk.NewtonPar(
                tol=1e-7, max_iterations=25, linsolver=ls_po,
                eigsolver=FloquetQaDMF(eigsolver=bk.SubspaceEig(
                    sweeps=2, krylov_blocks=3, extra=4, tol=1e-6))))
        t0 = time.time()
        br_po = bk.continuation_hopf_po(
            br, i, cp_po, disc=disc, delta_p=0.003,
            nf_kwargs={"matrix_free": True}, floquet_linsolver=mono_ls,
            floquet_compute_dtype=jnp.float32 if on_tpu else None)
        dt = time.time() - t0
        tbl = br_po.gamma._table()
        print(f"trapeze PO branch ({2 * Nx * Ny}-dof vf, M={M} -> "
              f"{2 * Nx * Ny * M + 1} unknowns): {len(br_po)} points in "
              f"{dt:.1f}s = {len(br_po) / dt:.2f} steps/s; r:",
              [round(float(v), 5) for v in tbl["param"][:6]],
              "period:", [round(float(v), 4) for v in tbl["period"][:6]],
              "n_unstable:", [int(v) for v in tbl["n_unstable"][:6]])
        return br, br_po

    # PO solves go through the native COP direct solver (the reference
    # uses ILU-preconditioned GMRES on the trapezoid system instead).
    # With c3 = -1 (the reference's sign) the Hopf is weakly subcritical
    # with a fold ~2e-4 past it; c3 = +1 gives the clean supercritical
    # demonstration branch.
    cp_po = bk.ContinuationPar(ds=0.005, dsmax=0.02, dsmin=1e-8,
                               p_min=0.9, p_max=2.5,
                               max_steps=po_steps, detect_bifurcation=0,
                               detect_fold=False,
                               newton_options=bk.NewtonPar(
                                   tol=1e-8, max_iterations=25))
    br_po = bk.continuation_hopf_po(br, i, cp_po,
                                    disc=bk.Collocation(Ntst=12, m=3),
                                    delta_p=0.003, use_cop=True)
    tbl = br_po.gamma._table()
    print("PO branch:", len(br_po), "points; r:",
          [round(float(v), 5) for v in tbl["param"][:4]],
          "period:", [round(float(v), 4) for v in tbl["period"][:4]])
    return br, br_po


if __name__ == "__main__":
    main(Nx=int(os.environ.get("CGL2D_NX", "21")),
         Ny=int(os.environ.get("CGL2D_NY", "11")),
         po_steps=int(os.environ.get("CGL2D_PO_STEPS", "6")))
