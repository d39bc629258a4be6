"""1D quintic Swift-Hohenberg homoclinic snaking (ref
examples/SHpde_snaking.jl): flat branch -> rolls -> localized snaking
branches via the automatic bifurcation diagram, plus deflated continuation.

    python examples/shpde_snaking.py [levels]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.normal_forms.diagram import bifurcationdiagram


def main(levels=3):
    prob = models.swift_hohenberg_1d()
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.01, dsmin=1e-5, p_min=-1.0,
                            p_max=1.0, max_steps=200, detect_bifurcation=3,
                            nev=24, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-8,
                                                        max_iterations=30))

    def options(x, p, level):
        if level <= 2:
            return cp.replace(max_steps=200)
        return cp.replace(max_steps=150, ds=0.005)

    t0 = time.time()
    diagram = bifurcationdiagram(prob, bk.PALC(), levels, options)
    print(f"diagram ({levels} levels) in {time.time() - t0:.1f}s")
    diagram.show()

    # the roll branch folds at the amplitude-equation value -9 nu^2/40
    rolls = diagram.children[0].gamma if diagram.children else None
    if rolls is not None:
        folds = [sp.param for sp in rolls.specialpoint if sp.type == "fold"]
        print(f"roll folds: {['%.3f' % f for f in folds]} "
              f"(amplitude equation: -0.900)")

    # deflated continuation (ref SHpde_snaking.jl:97-107)
    algdc = bk.DefCont(deflation_operator=bk.DeflationOperator(
        power=2.0, alpha=1.0, max_roots=24), max_branches=20,
        perturb_factor=0.02)
    cpd = cp.replace(ds=0.001, dsmax=0.005, max_steps=400, p_max=0.25,
                     p_min=-1.0, detect_bifurcation=0,
                     newton_options=bk.NewtonPar(tol=1e-9,
                                                 max_iterations=15))
    t0 = time.time()
    res = bk.deflated_continuation(prob, algdc, cpd)
    print(f"deflated continuation: {len(res)} branches in "
          f"{time.time() - t0:.1f}s")
    return diagram


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
