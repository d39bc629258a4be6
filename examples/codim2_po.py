"""Two-parameter continuation of periodic-orbit bifurcations on the Lur'e
system (ref examples/codim2PO.jl, test/codim_2_po_collocation/): equilibria
-> Hopf -> PO branch -> PD point -> PD curve in (alpha, beta) through the
FUNCTIONAL MA formulation (sigma on the discretized collocation problem via
COP condensation — PDE-scalable, no dense monodromy in the corrector).

Run: python examples/codim2_po.py      (BK_CPU=1 to force the CPU backend)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("BK_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.codim2 import (continuation_ns,
                                                   continuation_pd)


def main():
    prob = models.lure(alpha=1.2, beta=1.0)
    cp = bk.ContinuationPar(ds=-0.01, dsmax=0.02, dsmin=1e-6, p_min=0.2,
                            p_max=1.4, max_steps=120, detect_bifurcation=3,
                            nev=3, n_inversion=6,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.PALC(tangent=bk.Bordered()), cp)
    hopf = br.get_special_points("hopf")[0]
    print(f"Hopf at alpha = {hopf.param:.6f} (analytic: 1.0)")

    cp_po = bk.ContinuationPar(ds=-0.01, dsmax=0.03, dsmin=1e-7, p_min=0.2,
                               p_max=1.05, max_steps=100,
                               detect_bifurcation=3, nev=3, n_inversion=4,
                               max_bisection_steps=15, tol_stability=1e-4,
                               newton_options=bk.NewtonPar(
                                   tol=1e-9, max_iterations=25))
    br_po = bk.continuation_hopf_po(br, br.specialpoint.index(hopf), cp_po,
                                    disc=bk.Collocation(Ntst=25, m=4),
                                    delta_p=-0.01)
    pds = br_po.gamma.get_special_points("pd")
    print(f"PD of the periodic orbit at alpha = {pds[0].param:.6f}")

    cp2 = bk.ContinuationPar(ds=1e-2, dsmax=3e-2, dsmin=1e-8, p_min=0.5,
                             p_max=1.5, max_steps=25, detect_bifurcation=0,
                             newton_options=bk.NewtonPar(tol=1e-8,
                                                         max_iterations=25))
    brc = continuation_pd(br_po, br_po.gamma.specialpoint.index(pds[0]),
                          "beta", cp2, detect_codim3=1)
    tab = brc.gamma._table()
    print(f"PD curve (functional MA): {len(tab['param'])} points, "
          f"beta in [{np.min(tab['param']):.3f}, "
          f"{np.max(tab['param']):.3f}], "
          f"alpha in [{np.min(tab['p1']):.3f}, {np.max(tab['p1']):.3f}]")
    gpds = [sp for sp in brc.gamma.specialpoint if sp.type == "gpd"]
    if gpds:
        print(f"GPD (codim-3) detected at beta = {gpds[0].param:.4f}")
    return brc


if __name__ == "__main__":
    main()
