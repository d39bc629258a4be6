"""Carrier singular-perturbation problem (ref examples/carrier.jl):
the deflated-continuation flagship — disconnected boundary-layer branches
found by deflation, plus a symmetry-breaking branch point on the primary
(even) branch."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.continuation.deflated import (DefCont,
                                                         deflated_continuation)
from bifurcationkit.jl_tpu.deflation import DeflationOperator, deflated_newton

N = 100


@pytest.fixture(scope="module")
def carrier_newton():
    prob = models.carrier(N=N)
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-8, max_iterations=30))
    return prob, sol


def test_carrier_newton_symmetric(carrier_newton):
    """The primary solution at eps=0.7 is even in x (the problem is
    x -> -x symmetric) and solves the analytic residual."""
    prob, sol = carrier_newton
    assert bool(sol.converged)
    u = np.asarray(sol.u)
    assert np.abs(u - u[::-1]).max() < 1e-10
    assert np.abs(np.asarray(prob.residual(sol.u, prob.params))).max() < 1e-7
    # user-supplied tridiagonal J (ref Jac_carr) matches AD
    Ju = prob.jac(sol.u, prob.params)
    Jad = jnp.asarray(np.asarray(
        bk.BifurcationProblem(prob.F, u0=prob.u0, params=prob.params,
                              lens="eps").jacobian(sol.u, prob.params)))
    assert float(jnp.abs(Ju - Jad).max()) < 1e-10


def test_carrier_symmetry_breaking_bp(carrier_newton):
    """Continuation down in eps detects the symmetry-breaking branch point
    on the even branch (measured at eps ~ 0.4688 for N=100)."""
    prob, sol = carrier_newton
    cp = bk.ContinuationPar(ds=-0.01, dsmax=0.05, dsmin=1e-4, p_min=0.05,
                            p_max=0.75, max_steps=300, detect_bifurcation=3,
                            nev=40, n_inversion=6,
                            newton_options=bk.NewtonPar(tol=1e-8,
                                                        max_iterations=20))
    br = bk.continuation(prob.re_make(u0=sol.u), bk.PALC(), cp)
    bps = [sp.param for sp in br.specialpoint if sp.type == "bp"]
    assert bps and abs(bps[0] - 0.4688) < 1e-2


def test_carrier_deflation_and_defcont(carrier_newton):
    """Deflated Newton finds a second, distinct root at eps=0.6 (ref the
    deflation section of carrier.jl:59-78) and deflated continuation with
    the reference's perturb_solution keeps discovering branches."""
    prob07, _ = carrier_newton
    prob = prob07.re_make(params={"eps": 0.6})
    sol = bk.newton(prob, bk.NewtonPar(tol=1e-8, max_iterations=30))
    assert bool(sol.converged)

    X = np.linspace(-1, 1, N)
    env = np.exp(-0.01 / np.maximum(1 - X ** 2, 1e-12) ** 2)
    rng = np.random.default_rng(3)

    defl = DeflationOperator(max_roots=12)
    defl.push(sol.u)
    nopt = bk.NewtonPar(tol=1e-7, max_iterations=200)
    extra = 0
    for _ in range(8):
        x0 = jnp.asarray(-np.asarray(sol.u) + 0.5 * rng.random(N) * env)
        s2 = deflated_newton(prob, defl, nopt, x0=x0)
        if bool(s2.converged):
            if min(float(jnp.linalg.norm(s2.u - r))
                   for r in defl.roots) > 1e-4:
                defl.push(s2.u)
                extra += 1
    assert extra >= 1

    def perturb(solu, p, i):
        return jnp.asarray(np.asarray(solu) + 0.5 * rng.random(N) * env)

    cp = bk.ContinuationPar(ds=-0.0025, dsmax=0.01, dsmin=1e-5, p_min=0.4,
                            p_max=0.7, max_steps=60, detect_bifurcation=0,
                            newton_options=bk.NewtonPar(tol=1e-9,
                                                        max_iterations=100))
    alg = DefCont(deflation_operator=DeflationOperator(max_roots=24),
                  max_branches=16, perturb_solution=perturb,
                  max_new_branches=4)
    dc = deflated_continuation(prob.re_make(u0=sol.u), alg, cp)
    assert len(dc.branches) >= 3
