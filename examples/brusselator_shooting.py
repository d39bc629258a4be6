"""Brusselator 1D: Hopf -> periodic orbits via STANDARD SHOOTING on the
stiff RODAS3 flow, plus a Poincare-shooting Newton solve
(ref examples/brusselatorShooting.jl — there SciML Rodas4P/QNDF supplies the
stiff flow; here the fixed-step linearly-implicit RODAS3 kernel does, one LU
of (I/(dt*gamma) - J) per step, vmapped over the shooting segments).

Run: python examples/brusselator_shooting.py   (BK_CPU=0 for the TPU backend)
"""
import os
import sys

if os.environ.get("BK_CPU", "1") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.orbits import (continuation_hopf_po,
                                                   get_periodic_orbit)

n = 40
prob = models.brusselator_1d(n=n)

# --- equilibrium branch in the domain length l (ref :96-103) -------------
cp = bk.ContinuationPar(ds=0.01, dsmax=0.02, dsmin=1e-6, p_min=0.29,
                        p_max=0.8, max_steps=120, detect_bifurcation=3,
                        nev=12, n_inversion=4,
                        newton_options=bk.NewtonPar(tol=1e-9))
br = bk.continuation(prob, bk.PALC(), cp)
hopfs = [(i, sp.param) for i, sp in enumerate(br.specialpoint)
         if sp.type == "hopf"]
print("Hopf points:", [f"l={p:.5f}" for _, p in hopfs])
ih = hopfs[0][0]

# --- aBS Hopf -> POs with standard shooting (ref :217-234) ----------------
cpo = bk.ContinuationPar(ds=0.01, dsmax=0.03, dsmin=1e-6, p_min=0.29,
                         p_max=0.75, max_steps=15, detect_bifurcation=2,
                         nev=8, tol_stability=1e-3,
                         newton_options=bk.NewtonPar(tol=1e-7,
                                                     max_iterations=25,
                                                     linesearch=True))
br_po = continuation_hopf_po(
    br, ih, cpo, delta_p=0.02,
    disc=bk.Shooting(M=3, steps_per_segment=40, method="rodas3"))
tab = br_po.gamma._table()
print("shooting PO branch:", len(br_po.gamma), "points")
print("   l:", np.round(np.asarray(tab["param"]), 4))
print("   T:", np.round(np.asarray(tab["period"]), 4))
print("   stable:", np.asarray(tab["stable"]))

# --- Poincare shooting Newton from the converged orbit (ref :250-274) ----
orb = get_periodic_orbit(br_po, -1)
from bifurcationkit.jl_tpu.periodic.orbits import newton_po

psh = bk.PoincareShooting(M=1, steps_per_segment=150, method="rodas3",
                          event_driven=True)
l_last = float(np.asarray(tab["param"])[-1])
params = prob.set_lens_param(prob.params, l_last)
X0 = psh.generate_solution(
    lambda t: np.asarray(orb["u"])[int(t / (2 * np.pi)
                                       * (orb["u"].shape[0] - 1))],
    float(orb["period"]), 2 * n)
sol, po_prob = newton_po(prob, psh, X0, params=params,
                         options=bk.NewtonPar(tol=1e-8, max_iterations=30))
print("Poincare shooting Newton converged:", bool(sol.converged))
if bool(sol.converged):
    T = float(psh.period_par(po_prob.prob_vf, sol.u, po_prob.params))
    print("   period:", T, "(standard shooting gave",
          float(orb["period"]), ")")
