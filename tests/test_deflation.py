"""Deflation & deflated continuation tests (mirrors ref test/newton deflation
parts and DeflatedContinuation usage)."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk


def cubic_problem(p=1.0):
    # F = p*u - u^3: roots 0, ±sqrt(p) for p > 0
    def F(u, par):
        return par["p"] * u - u ** 3

    return bk.BifurcationProblem(F, u0=jnp.array([0.1]), params={"p": p},
                                 lens="p")


def test_deflated_newton_finds_distinct_roots():
    prob = cubic_problem(p=1.0)
    defl = bk.DeflationOperator(power=2.0, alpha=1.0, max_roots=8)
    opts = bk.NewtonPar(tol=1e-11, max_iterations=60)

    s1 = bk.newton(prob, opts)
    assert bool(s1.converged)
    defl.push(s1.u)

    s2 = bk.deflated_newton(prob, defl, opts, x0=jnp.array([0.2]))
    assert bool(s2.converged)
    assert abs(float(s2.u[0]) - float(s1.u[0])) > 0.1
    defl.push(s2.u)

    s3 = bk.deflated_newton(prob, defl, opts, x0=jnp.array([-0.3]))
    assert bool(s3.converged)
    roots = sorted(float(s.u[0]) for s in (s1, s2, s3))
    np.testing.assert_allclose(roots, [-1.0, 0.0, 1.0], atol=1e-8)


def test_deflation_operator_value():
    defl = bk.DeflationOperator(power=1.0, alpha=0.5, max_roots=4)
    defl.push(jnp.array([0.0]))
    u = jnp.array([2.0])
    # M = 1/|u-0|^2 + 0.5 = 0.25 + 0.5
    assert float(defl.M(u)) == pytest.approx(0.75)


def test_deflated_continuation_cubic():
    prob = cubic_problem(p=-0.5)
    cp = bk.ContinuationPar(ds=0.02, dsmax=0.05, dsmin=1e-4, p_min=-0.6,
                            p_max=1.0, max_steps=90, detect_bifurcation=1,
                            nev=1, newton_options=bk.NewtonPar(
                                tol=1e-10, max_iterations=40))
    alg = bk.DefCont(max_branches=8, seek_every_step=2, perturb_factor=0.1)
    dc = bk.deflated_continuation(prob, alg, cp)
    # must discover the two nontrivial branches after p crosses 0
    assert len(dc) >= 3
    lengths = sorted((len(b) for b in dc.branches))[::-1]
    assert lengths[0] > 40       # trivial branch spans the whole range
    # nontrivial branches live at |u| = sqrt(p): check final norms
    finals = []
    for b in dc.branches:
        if len(b) > 3:
            finals.append((b.param[-1], b["norm"][-1]))
    nontrivial = [f for f in finals if f[1] > 0.3]
    assert len(nontrivial) >= 2
    for pf, nf in nontrivial:
        assert nf == pytest.approx(np.sqrt(pf), abs=1e-4)
