"""Chan 1D BVP (ref examples/chan.jl): PALC with Bordered tangent, folds,
deflated Newton finding multiple solutions."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


def main():
    prob = models.chan(n=101, alpha=3.3)
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-8))
    print("newton:", bool(sol.converged))

    cp = bk.ContinuationPar(ds=0.01, dsmax=0.12, dsmin=1e-5, p_min=0.0,
                            p_max=4.25, max_steps=150, detect_bifurcation=0,
                            detect_fold=True,
                            newton_options=bk.NewtonPar(tol=1e-9))
    br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(tangent=bk.Bordered()),
                         cp)
    print(br)

    # deflation: find other solutions at alpha = 3.3 (ref chan.jl deflation)
    defl = bk.DeflationOperator(power=2.0, alpha=1.0, max_roots=8)
    defl.push(sol.u)
    sol2 = bk.deflated_newton(prob, defl, bk.NewtonPar(tol=1e-8,
                                                       max_iterations=120),
                              x0=sol.u * 2.0)
    print("deflated newton found distinct solution:", bool(sol2.converged))
    return br


if __name__ == "__main__":
    main()
