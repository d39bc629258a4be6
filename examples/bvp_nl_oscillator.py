"""Forced nonlinear (Duffing-type) oscillator through the generic BVP module
(ref examples/bvp_nl_oscillator.jl): nonautonomous forcing via the
t-as-state trick, continued in the forcing period lambda; the resonance
curve carries the primary hysteresis fold pair and the subharmonic fold
cascade accumulating at lambda -> 0.

Run: python examples/bvp_nl_oscillator.py   (BK_CPU=0 for the TPU backend)
"""
import os
import sys

if os.environ.get("BK_CPU", "1") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.bvp.bvp import (BVPCollocation, BVPModel,
                                           bvp_problem, discretize)


def Fosc(x, par):
    """ref Fosc, bvp_nl_oscillator.jl:20-28 (first-order form + t-state)."""
    lam = par["lam"]
    r = lam / (2 * jnp.pi)
    z, z1, t = x[0], x[1], x[2]
    return jnp.array([
        z1,
        -(r / 25 * z1 - z / 5 + 8 / 16 * z ** 3) / r ** 2
        + 2 / 5 * jnp.cos(2 * jnp.pi * t) / r ** 2,
        1.0])


def gosc(u0, uT, par):
    """Periodic in (z, z'), t(0) = 0 (ref gosc :31)."""
    return jnp.array([u0[0] - uT[0], u0[1] - uT[1], u0[2]])


model = BVPModel(Fosc, gosc)
disc = BVPCollocation(Ntst=40, m=5)
X0 = discretize(model, disc, lambda t: np.array([0.0, 0.0, t]), 3)
prob = bvp_problem(model, disc, X0, {"lam": 3.0}, "lam", n=3)

sol = bk.newton(prob, bk.NewtonPar(tol=1e-10, max_iterations=30))
print("newton converged:", bool(sol.converged))

cp = bk.ContinuationPar(ds=-0.01, dsmax=0.05, dsmin=1e-5, p_min=0.05,
                        p_max=10.05, max_steps=400, detect_bifurcation=0,
                        detect_fold=True,
                        newton_options=bk.NewtonPar(tol=1e-10,
                                                    max_iterations=20))
br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
folds = [sp.param for sp in br.specialpoint if sp.type == "fold"]
print(len(folds), "folds; primary hysteresis pair:",
      f"{max(folds):.4f} / {sorted(folds)[-3]:.4f}" if len(folds) > 2
      else folds)
print("subharmonic cascade:", np.round(sorted(folds)[:8], 4))

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    ps = np.asarray(br.branch["param"])
    ns = np.asarray(br.branch["norm"])
    fig, ax = plt.subplots()
    ax.plot(1.0 / ps, ns, lw=0.9)
    ax.set_xlabel("1/lambda")
    ax.set_ylabel("|X|")
    ax.set_title("Forced Duffing BVP — resonance curve")
    fig.savefig("bvp_nl_oscillator.png", dpi=120)
    print("saved bvp_nl_oscillator.png")
except Exception as e:
    print("plot skipped:", e)
