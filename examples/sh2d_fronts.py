"""Swift-Hohenberg 2D (ref examples/SH2d-fronts.jl + SH2d-fronts-cuda.jl):
matrix-free Newton-GMRES with the exact spectral preconditioner, PALC
continuation of the roll branch with fold detection.

Run on TPU (default) or CPU (JAX_PLATFORMS workaround in tests/conftest.py).
    python examples/sh2d_fronts.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


def main(N=256):
    import jax

    on_tpu = jax.default_backend() != "cpu"
    periodic = os.environ.get("SH2D_PERIODIC", "0") == "1"
    if periodic and os.environ.get("SH2D_PERIODIC_FFT", "0") == "1":
        # legacy all-f32 FFT-operator variant (spectral symbol); kept for
        # comparison — f32-only on TPU, Newton stalls at ~2e-4
        prob = models.swift_hohenberg_periodic_2d(Nx=N, Ny=N,
                                                  operator="fft")
        tol_n, tol_c = 2e-4, 5e-4
    elif periodic:
        # the cuda example's workload f64-grade on TPU: real-space FD
        # stencil residuals/jvp (f64 elementwise works on TPU; only the
        # FFT is c64-only) + exact discrete-symbol FFT preconditioner
        # (ref examples/SH2d-fronts-cuda.jl:19-20,67-103)
        prob = models.swift_hohenberg_periodic_2d(Nx=N, Ny=N)
        tol_n, tol_c = 1e-8, 1e-7
    else:
        # the true reference config: Neumann BCs + localized front,
        # preconditioned with the exact DCT spectral inverse (the precond
        # transform drops to f32 on TPU — complex64-only FFT — which only
        # steers GMRES; residuals stay f64)
        prob = models.swift_hohenberg_2d(Nx=151, Ny=100)
        tol_n, tol_c = 1e-8, 1e-7
    if on_tpu:
        # mixed-precision iterative refinement: all Krylov matvecs run in
        # native f32 (MXU/VPU speed), a few f64 residual corrections reach
        # the same tolerances as the f64 GMRES (docs/PERF.md)
        ls = bk.IterativeRefinement(
            inner=bk.GMRES(restart=40, maxiter=160, rtol=1e-5,
                           precond=prob.spectral_precond),
            refinements=4, rtol=1e-10)
    else:
        ls = bk.GMRES(restart=40, maxiter=300, rtol=1e-10,
                      precond=prob.spectral_precond)

    t0 = time.time()
    sol = bk.newton(prob, bk.NewtonPar(tol=tol_n, max_iterations=25,
                                       linsolver=ls))
    ndof = int(np.prod(np.asarray(prob.u0).shape))
    print(f"Newton ({ndof} dof, matrix-free GMRES + spectral precond): "
          f"converged={bool(sol.converged)} in {int(sol.itnewton)} iters, "
          f"{time.time()-t0:.1f}s (incl. compile)")

    # stability along the branch.  The SH jacobian is symmetric (gradient
    # flow): with an f64-capable operator (Neumann stencil, or the
    # periodic FD stencil) use blocked mixed-precision LOBPCG — no inner
    # solves, f32 CholQR2 sweep + f64 Rayleigh-Ritz refine, warm-started
    # across steps (docs/PERF.md: 480ms -> 66ms).  Only the legacy
    # f32-only FFT-operator variant keeps shift-invert (no f64 operator
    # for the refine; ||A|| ~ 4e6 puts the f32 Ritz wall at O(1) error).
    symmetric_f64 = os.environ.get("SH2D_PERIODIC_FFT", "0") != "1"
    if on_tpu and symmetric_f64:
        eig = bk.LOBPCGEig(
            maxiter=30, tol=3e-3, extra=8,
            precond=lambda v: prob.spectral_precond(v, shift=1.0),
            compute_dtype=np.float32)
    else:
        eig = bk.ShiftInvertEig(
            sigma=0.1,
            eigsolver=bk.ArnoldiEig(which="LM", krylov_dim=40, restarts=2,
                                    tol=1e-4 if on_tpu else 1e-10),
            linsolver=bk.GMRES(restart=40, maxiter=120, rtol=1e-5,
                               precond=prob.spectral_precond),
            compute_dtype=np.float32 if on_tpu else None)
    cp = bk.ContinuationPar(ds=-0.005, dsmax=0.02, dsmin=1e-6, p_min=-0.8,
                            p_max=0.2,
                            max_steps=int(os.environ.get(
                                "SH2D_BRANCH_STEPS", "60")), nev=12,
                            detect_bifurcation=3 if on_tpu else 0,
                            detect_fold=True,
                            newton_options=bk.NewtonPar(
                                tol=tol_c, max_iterations=15, linsolver=ls,
                                eigsolver=eig))
    t0 = time.time()
    br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
    dt = time.time() - t0
    print(br)
    print(f"continuation: {len(br)} steps in {dt:.1f}s = "
          f"{len(br)/dt:.2f} steps/s")
    try:
        ax = bk.plot_branch(br)
        bk.savefig(ax, "sh2d_branch.png")
        print("saved sh2d_branch.png")
    except Exception:
        pass

    # --- codim-2: fold curve in nu via the MATRIX-FREE minimally-augmented
    # path (the reference's own 15,100-dof leg, SH2d-fronts.jl:97-115 with
    # jacobian_ma = MinAug() + BorderingBLS): sigma / Govaerts corrector /
    # anchors / per-step spectrum all through preconditioned GMRES on the
    # extended operator — nothing materializes a matrix.
    # --- PDE-scale normal form + aBS (the reference's
    # `get_normal_form(br, 19)` + branch switch at 15,100 dof,
    # ref examples/SH2d-fronts.jl:95): adjoint basis by bordered inverse
    # iteration (vjp transpose + Rayleigh refinement), Lyapunov-Schmidt
    # projections via preconditioned GMRES — no dense_eig, no materialized
    # jacobian.
    bps = [sp for sp in br.specialpoint if sp.type == "bp"]
    if os.environ.get("SH2D_ABS", "1") == "1" and bps:
        from bifurcationkit.jl_tpu.normal_forms.branch_switch import \
            continuation_from_bp

        idx_bp = br.specialpoint.index(bps[0])
        t0 = time.time()
        nf = bk.get_normal_form(br, idx_bp, matrix_free=True)
        print(f"MF normal form at bp (l = {bps[0].param:.5f}): "
              f"{type(nf).__name__}, b11 = {nf.nf['b11']:.5g}, "
              f"b30/6 = {nf.nf['b30']/6:.5g} ({time.time()-t0:.1f}s)")
        cp_abs = bk.ContinuationPar(
            ds=-0.004, dsmax=0.01, dsmin=1e-7, p_min=-0.8, p_max=0.2,
            max_steps=int(os.environ.get("SH2D_ABS_STEPS", "6")),
            detect_bifurcation=0, detect_fold=False,
            newton_options=bk.NewtonPar(tol=tol_c, max_iterations=20,
                                        linsolver=ls))
        t0 = time.time()
        b2 = continuation_from_bp(br, idx_bp, cp_abs, delta_p=-0.003,
                                  nf_kwargs={"matrix_free": True})
        print(f"aBS branch from bp: {len(b2)} steps in "
              f"{time.time()-t0:.1f}s; l:",
              np.round(np.asarray(b2.gamma._table()['param'])[:5], 5))

    folds = br.get_special_points("fold")
    if os.environ.get("SH2D_FOLD_CURVE", "1") == "1" and folds:
        if on_tpu:
            # release the branch leg's compiled programs before the MA
            # compile (the tunneled worker has limited program memory)
            jax.clear_caches()
        idx = br.specialpoint.index(folds[0])
        cp2 = bk.ContinuationPar(
            ds=float(os.environ.get("SH2D_FOLD_DS", "0.01")),
            dsmax=float(os.environ.get("SH2D_FOLD_DSMAX", "0.02")),
            dsmin=1e-6, p_min=0.5, p_max=2.0,
            max_steps=int(os.environ.get("SH2D_FOLD_STEPS", "30")),
            detect_bifurcation=0, detect_fold=False,
            newton_options=bk.NewtonPar(
                tol=tol_c, max_iterations=20,
                linsolver=bk.GMRES(restart=40, maxiter=400, rtol=1e-9,
                                   precond=prob.spectral_precond)))
        t0 = time.time()
        brf = bk.continuation_fold(
            br, idx, "nu", cp2, detect_codim2_bifurcation=2,
            jacobian_ma="minaug",
            verbosity=int(os.environ.get("SH2D_FOLD_VERBOSE", "0")))
        dt = time.time() - t0
        tbl = brf.gamma._table()
        print(f"MF fold curve (nu, l): {len(brf)} steps in {dt:.1f}s = "
              f"{len(brf)/dt:.2f} steps/s")
        print("  nu:", np.round(np.asarray(tbl['param'])[:6], 4),
              " l:", np.round(np.asarray(tbl['p1'])[:6], 4))
    return br


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
