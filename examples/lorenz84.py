"""Lorenz-84 atmospheric model: the codim-2 showcase
(ref test/hopf_codim_2/lorenz84.jl).

Equilibrium branch in F -> Hopf + fold; two-parameter curves in (F, G):
Hopf curve with ZH detection, then `switch_codim2` jumps to the fold curve
through the same zero-Hopf point (the reference's hp_from_zh flow).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


def main():
    prob = models.lorenz84()
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.04, dsmin=1e-6, p_min=-1.0,
                            p_max=5.0, max_steps=300, detect_bifurcation=3,
                            nev=4, n_inversion=6,
                            newton_options=bk.NewtonPar(tol=1e-10,
                                                        max_iterations=30))
    br = bk.continuation(prob, bk.PALC(), cp)
    print(br)

    i = br.specialpoint.index(br.get_special_points("hopf")[0])
    cp2 = bk.ContinuationPar(ds=0.01, dsmax=0.03, dsmin=1e-6, p_min=0.0001,
                             p_max=3.0, max_steps=100, detect_bifurcation=0,
                             detect_fold=False,
                             newton_options=bk.NewtonPar(tol=1e-9,
                                                         max_iterations=30))
    brh = bk.continuation_hopf(br, i, "G", cp2, detect_codim2_bifurcation=2)
    print("Hopf curve:", [(s.type, round(s.param, 4))
                          for s in brh.gamma.specialpoint])

    zhs = [s for s in brh.gamma.specialpoint if s.type == "zh"]
    if zhs:
        idx = brh.gamma.specialpoint.index(zhs[0])
        br_fold = bk.switch_codim2(brh, idx, cp2.replace(max_steps=40))
        tbl = br_fold.gamma._table()
        print(f"fold curve from the ZH: {len(br_fold)} points, "
              f"G in [{tbl['param'].min():.4f}, {tbl['param'].max():.4f}]")
        # ZH normal-form coefficients at the switch point
        X = np.asarray(zhs[0].x)
        params = dict(prob.params)
        params["G"] = float(zhs[0].param)
        params["F"] = float(X[4])
        pt = bk.zh_normal_form(prob, X[:4], params, verbose=True)
    return br, brh


if __name__ == "__main__":
    main()
