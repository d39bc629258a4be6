"""Carrier problem (ref examples/carrier.jl): eps^2 u'' + 2(1-x^2) u + u^2 = 1
with Dirichlet BCs — deflated continuation discovering the disconnected
boundary-layer branches, plus the automatic bifurcation diagram.

Run: python examples/carrier.py  (CPU ~ a couple of minutes; set BK_CPU=0 to
use the TPU backend).
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
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.continuation.deflated import (DefCont,
                                                         deflated_continuation)
from bifurcationkit.jl_tpu.deflation import DeflationOperator

N = 100  # the reference runs N=200; kept smaller so the example finishes fast
prob = models.carrier(N=N)

# --- Newton on the primary (even) solution at eps = 0.7 (ref carrier.jl:46)
sol = bk.newton(prob, bk.NewtonPar(tol=1e-8, max_iterations=30))
print("newton converged:", bool(sol.converged),
      "|u|_inf =", float(jnp.max(jnp.abs(sol.u))))

# --- continuation in eps (ref carrier.jl:49-53) --------------------------
cp = bk.ContinuationPar(ds=-0.01, dsmax=0.05, dsmin=1e-4, p_min=0.05,
                        p_max=0.75, max_steps=300, detect_bifurcation=3,
                        nev=40, n_inversion=6,
                        newton_options=bk.NewtonPar(tol=1e-8,
                                                    max_iterations=20))
br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
print("branch:", len(br.branch["param"]), "points; special points:")
for sp in br.specialpoint:
    print(f"   {sp.type} at eps = {sp.param:.5f}")

# --- bifurcation diagram, 2 levels (ref carrier.jl:81-86) ----------------
diagram = bk.bifurcationdiagram(prob.re_make(u0=sol.u), bk.PALC(), 2,
                                lambda x, p, level: cp)
print("diagram: ", len(diagram), "branches")
diagram.show()

# --- deflated continuation from eps = 0.6 (ref carrier.jl:90-102) --------
X = np.linspace(-1, 1, N)
env = np.exp(-0.01 / np.maximum(1 - X ** 2, 1e-12) ** 2)
rng = np.random.default_rng(7)


def perturb(solu, p, i):
    """ref perturbsol, carrier.jl:64-68 (boundary-vanishing envelope)."""
    return jnp.asarray(np.asarray(solu) + 0.5 * rng.random(N) * env)


prob06 = prob.re_make(params={"eps": 0.6})
sol06 = bk.newton(prob06, bk.NewtonPar(tol=1e-8, max_iterations=30))
cp_dc = bk.ContinuationPar(ds=-0.002, dsmax=0.01, dsmin=1e-5, p_min=0.3,
                           p_max=0.7, max_steps=150, detect_bifurcation=0,
                           newton_options=bk.NewtonPar(tol=1e-9,
                                                       max_iterations=100))
alg = DefCont(deflation_operator=DeflationOperator(max_roots=48),
              max_branches=24, perturb_solution=perturb, max_new_branches=4)
dc = deflated_continuation(prob06.re_make(u0=sol06.u), alg, cp_dc)
print("deflated continuation:", len(dc.branches), "branches")
for i, b in enumerate(dc.branches):
    ps = b.branch.get("param", np.array([]))
    if len(ps):
        print(f"   branch {i}: {len(ps)} points, eps in "
              f"[{ps.min():.3f}, {ps.max():.3f}]")

try:
    from bifurcationkit.jl_tpu.utils.plotting import plot_branch
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for b in dc.branches:
        if len(b.branch.get("param", [])):
            ax.plot(b.branch["param"], b.branch["s"], lw=0.8)
    ax.set_xlabel("eps")
    ax.set_ylabel("s = dx * sum u^2")
    ax.set_title("Carrier problem — deflated continuation")
    fig.savefig("carrier_defcont.png", dpi=120)
    print("saved carrier_defcont.png")
except Exception as e:  # plotting optional
    print("plot skipped:", e)
