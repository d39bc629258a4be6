"""Brusselator 1D (ref examples/brusselator.jl): Hopf detection, normal form,
Hopf curve in beta, and Hopf -> periodic orbits."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


def main(n=60):
    prob = models.brusselator_1d(n=n)
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.02, dsmin=1e-6, p_min=0.29,
                            p_max=0.8, max_steps=120, detect_bifurcation=3,
                            nev=8, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-9))
    br = bk.continuation(prob, bk.PALC(), cp)
    print(br)
    i = br.specialpoint.index(br.get_special_points("hopf")[0])

    hp = bk.get_normal_form(br, i, verbose=True)

    cp2 = cp.replace(p_min=5.1, p_max=10.5, ds=0.01, detect_bifurcation=0,
                     detect_fold=False)
    br_hopf = bk.continuation_hopf(br, i, "beta", cp2,
                                   detect_codim2_bifurcation=2)
    print("hopf curve:", len(br_hopf), "points")

    cp_po = bk.ContinuationPar(ds=0.005, dsmax=0.02, dsmin=1e-7, p_min=0.29,
                               p_max=0.75, max_steps=30, detect_bifurcation=2,
                               nev=6, tol_stability=1e-4,
                               newton_options=bk.NewtonPar(
                                   tol=1e-8, max_iterations=25))
    br_po = bk.continuation_hopf_po(br, i, cp_po,
                                    disc=bk.Collocation(Ntst=20, m=4))
    print("PO branch:", len(br_po), "points, period",
          br_po.gamma._table()["period"][:3])
    return br, br_hopf, br_po


if __name__ == "__main__":
    main()
