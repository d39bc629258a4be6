"""Mittelmann 2D Gelfand-Bratu problem (ref examples/mittleman.jl):
automatic bifurcation diagram with Nd branch points (D4 symmetry of the
square), multicontinuation, and deflated continuation.

    python examples/mittleman.py [Nx]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.normal_forms.branch_switch import multicontinuation
from bifurcationkit.jl_tpu.normal_forms.diagram import bifurcationdiagram


def main(N=30):
    prob = models.mittelmann(Nx=N, Ny=N)
    cp = bk.ContinuationPar(ds=0.005, dsmax=0.05, dsmin=1e-4, p_min=0.01,
                            p_max=3.5, max_steps=250, detect_bifurcation=3,
                            nev=24, n_inversion=6, tol_stability=1e-6,
                            newton_options=bk.NewtonPar(tol=1e-9,
                                                        max_iterations=20))
    t0 = time.time()
    br = bk.continuation(prob, bk.PALC(), cp)
    print(f"main branch: {len(br)} steps in {time.time()-t0:.1f}s")
    for i, sp in enumerate(br.specialpoint):
        print(f"  {i}: {sp.type} at lam={sp.param:.5f}")
    print(f"  fold at 1/e = {np.exp(-1.0):.5f} (exact, flat states solve "
          "u = lam*e^u)")

    # D4 splitting of the first 2d branch point (ref mittleman.jl:164-172)
    ind_nd = [i for i, sp in enumerate(br.specialpoint)
              if sp.type == "nd"][0]
    cp2 = cp.replace(ds=0.001, max_steps=30, detect_bifurcation=0,
                     save_sol_every_step=1)
    t0 = time.time()
    nf, branches = multicontinuation(br, ind_nd, cp2)
    print(f"multicontinuation at nd (lam={br.specialpoint[ind_nd].param:.4f})"
          f": {len(branches)} branches in {time.time()-t0:.1f}s "
          "(4 stripes + 4 diagonals)")

    # automatic bifurcation diagram, 2 levels (ref mittleman.jl:142-146)
    def options(x, p, level):
        if level <= 1:
            return cp.replace(max_steps=150)
        return cp.replace(ds=0.001, dsmax=0.01, max_steps=40,
                          detect_bifurcation=3)

    t0 = time.time()
    diagram = bifurcationdiagram(prob, bk.PALC(), 2, options)
    print(f"diagram (2 levels) in {time.time()-t0:.1f}s:")
    diagram.show()

    # deflated continuation from lam = 0.367 downward (ref mittleman.jl:175)
    probd = prob.re_make(params=prob.set_lens_param(prob.params, 0.367))
    algdc = bk.DefCont(deflation_operator=bk.DeflationOperator(
        power=2.0, alpha=1.0, max_roots=20), max_branches=15)
    cpd = cp.replace(ds=-0.001, dsmax=0.02, max_steps=200,
                     detect_bifurcation=0)
    t0 = time.time()
    brdef = bk.deflated_continuation(probd, algdc, cpd)
    print(f"deflated continuation: {len(brdef)} branches in "
          f"{time.time()-t0:.1f}s")
    return br


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
