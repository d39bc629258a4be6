"""BVAM 1D reaction-diffusion period-doubling cascade (ref examples/pd-1d.jl,
Aragon et al. PRE 86 026201): Turing branch -> Hopf -> collocation PO branch
through the COP solver -> PD cascade -> period-2 branch.

    python examples/pd_1d.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.codim2 import pd_branch_switch
from bifurcationkit.jl_tpu.periodic.orbits import (continuation_hopf_po,
                                                   get_periodic_orbit)


def main(N=100):
    prob = models.bvam_1d(N=N)
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-9, max_iterations=100))
    print(f"Turing pattern Newton: converged={bool(sol.converged)}")

    cp = bk.ContinuationPar(ds=-0.001, dsmax=0.051, dsmin=1e-5, p_min=-1.8,
                            p_max=0.0, max_steps=60, detect_bifurcation=3,
                            nev=21, n_inversion=10,
                            newton_options=bk.NewtonPar(tol=1e-9,
                                                        max_iterations=25))
    t0 = time.time()
    br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
    print(f"equilibrium branch: {len(br)} steps in {time.time()-t0:.1f}s")
    for i, sp in enumerate(br.specialpoint):
        print(f"  {i}: {sp.type} at C={sp.param:.5f}")

    ih = [i for i, sp in enumerate(br.specialpoint) if sp.type == "hopf"][0]
    cpo = bk.ContinuationPar(ds=0.01, dsmax=0.015, dsmin=1e-4, p_min=-1.8,
                             p_max=0.0, max_steps=60, detect_bifurcation=3,
                             n_inversion=6, tol_stability=1e-4,
                             newton_options=bk.NewtonPar(tol=1e-8,
                                                         max_iterations=20))
    t0 = time.time()
    brpo = continuation_hopf_po(br, ih, cpo, bk.Collocation(Ntst=30, m=4),
                                use_cop=True)
    print(f"PO branch (collocation 30x4, COP, {2*N} fields): "
          f"{len(brpo.gamma)} steps in {time.time()-t0:.1f}s")
    pds = [(i, sp.param) for i, sp in enumerate(brpo.gamma.specialpoint)
           if sp.type == "pd"]
    print(f"PD cascade: {['%.4f' % p for _, p in pds]}")

    if pds:
        ipd = pds[0][0]
        cpd = cpo.replace(ds=-0.005, max_steps=20, detect_bifurcation=0,
                          save_sol_every_step=1,
                          newton_options=bk.NewtonPar(tol=1e-9,
                                                      max_iterations=40,
                                                      linesearch=True))
        t0 = time.time()
        br2 = pd_branch_switch(brpo, ipd, cpd, ampfactor=0.02, use_cop=True)
        orb = get_periodic_orbit(br2, 0)
        u = orb["u"]
        half = u.shape[0] // 2
        print(f"period-2 branch: {len(br2.gamma)} steps in "
              f"{time.time()-t0:.1f}s; halves-diff = "
              f"{np.abs(u[:half]-u[half:2*half]).max():.3f}, "
              f"period = {orb['period']:.4f}")
    return brpo


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
