"""Forced nonlinear (Duffing-type) oscillator as a generic BVP
(ref examples/bvp_nl_oscillator.jl): nonautonomous forcing handled by the
t-as-third-state trick, continued in the forcing period lambda.  The
resonance curve carries the primary hysteresis fold pair plus the
subharmonic fold cascade accumulating at lambda -> 0."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.bvp.bvp import (BVPCollocation, BVPModel,
                                           bvp_problem, discretize)


def _duffing_problem(Ntst=40, m=5):
    def Fosc(x, par):
        """ref Fosc, bvp_nl_oscillator.jl:20-28."""
        lam = par["lam"]
        r = lam / (2 * jnp.pi)
        z, z1, t = x[0], x[1], x[2]
        return jnp.array([
            z1,
            -(r / 25 * z1 - z / 5 + 8 / 16 * z ** 3) / r ** 2
            + 2 / 5 * jnp.cos(2 * jnp.pi * t) / r ** 2,
            1.0])

    def gosc(u0, uT, par):
        # periodic in (z, z'), t(0) = 0 (ref gosc :31)
        return jnp.array([u0[0] - uT[0], u0[1] - uT[1], u0[2]])

    model = BVPModel(Fosc, gosc)
    disc = BVPCollocation(Ntst=Ntst, m=m)
    X0 = discretize(model, disc, lambda t: np.array([0.0, 0.0, t]), 3)
    return bvp_problem(model, disc, X0, {"lam": 3.0}, "lam", n=3)


def test_duffing_resonance_folds():
    prob = _duffing_problem()
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-10, max_iterations=30))
    assert bool(sol.converged)

    # the reference drives this with dsmax=1.1; a giant arclength step can
    # hop clean over the fold lobe onto the far sheet, so keep steps small
    # enough to resolve the resonance structure deterministically
    cp = bk.ContinuationPar(ds=-0.01, dsmax=0.05, dsmin=1e-5, p_min=0.5,
                            p_max=10.05, max_steps=400,
                            detect_bifurcation=0, detect_fold=True,
                            newton_options=bk.NewtonPar(tol=1e-10,
                                                        max_iterations=20))
    br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
    folds = sorted(sp.param for sp in br.specialpoint if sp.type == "fold")
    # primary hysteresis pair (measured: 0.74158 / 2.46076 at Ntst=40, m=5)
    assert len(folds) >= 2
    assert abs(folds[-1] - 2.4608) < 2e-2
    assert abs(folds[0] - 0.7416) < 2e-2

    # the t-component integrates the trick exactly: t(1) = 1
    u = np.asarray(br.get_solx(0)).reshape(-1, 3)
    assert abs(u[-1, 2] - 1.0) < 1e-8
