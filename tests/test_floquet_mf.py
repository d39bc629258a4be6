"""Matrix-free FloquetQaD (VERDICT r2 missing #1 / next #3): the monodromy
applied as an operator (chain of per-segment flow jvps), eigensolved by
Krylov :LM — the PDE-scale shooting/trapeze stability path
(ref src/periodicorbit/Floquet.jl:89-109,164-254, examples/codim2PO-sh-mf.jl).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.orbits import (continuation_hopf_po,
                                                   newton_po)


def _sl_orbit_problem():
    R0, MU, NU = 0.5, 0.2, 0.5
    prob = bk.models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Shooting(M=3, steps_per_segment=40)
    RAD, OM = np.sqrt(R0), MU - NU * R0
    T = 2 * np.pi / abs(OM)

    def orbit(t):
        s = np.sign(OM)
        return np.array([RAD * np.cos(s * t), RAD * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, T, 2)
    sol, po = newton_po(prob, disc, X0,
                        options=bk.NewtonPar(tol=1e-11, max_iterations=20))
    assert bool(sol.converged)
    return prob, disc, sol, po


def test_mf_shooting_matches_dense_small():
    """Operator monodromy == dense jacfwd monodromy on the same orbit."""
    prob, disc, sol, po = _sl_orbit_problem()
    op = disc.monodromy_operator(prob, sol.u, po.params)
    mf = bk.FloquetQaDMF(eigsolver=bk.ArnoldiEig(which="LM", krylov_dim=2,
                                                 restarts=4, tol=1e-12))
    expo, vecs, cv, _ = mf(op, 2)
    got = np.sort(np.abs(np.exp(np.asarray(expo))))[::-1]
    Mn = np.asarray(disc.monodromy(prob, sol.u, po.params))
    ref = np.sort(np.abs(np.linalg.eigvals(Mn)))[::-1]
    np.testing.assert_allclose(got, ref, atol=1e-9)
    assert got[0] == pytest.approx(1.0, abs=1e-8)   # trivial multiplier


def test_mf_trapeze_operator_matches_dense():
    """Trapeze operator monodromy (jvp explicit half + iterative implicit
    half) == the dense batched-LU trapeze monodromy."""
    R0, MU, NU = 0.5, 0.2, 0.5
    prob = bk.models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Trapeze(M=80)
    RAD, OM = np.sqrt(R0), MU - NU * R0
    T = 2 * np.pi / abs(OM)

    def orbit(t):
        s = np.sign(OM)
        return np.array([RAD * np.cos(s * t), RAD * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, T, 2)
    sol, po = newton_po(prob, disc, X0,
                        options=bk.NewtonPar(tol=1e-10, max_iterations=25))
    assert bool(sol.converged)
    Mn = np.asarray(disc.monodromy(prob, sol.u, po.params))
    op = disc.monodromy_operator(prob, sol.u, po.params)
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = jnp.asarray(rng.standard_normal(2))
        np.testing.assert_allclose(np.asarray(op(v)), Mn @ v, atol=1e-8)


@pytest.mark.slow
def test_mf_vs_floquetcoll_brusselator():
    """VERDICT 'done' cross-check: shooting MF multipliers match the
    collocation FloquetColl route on the same brusselator PO to 1e-4."""
    from bifurcationkit.jl_tpu.periodic.cop import collocation_block_jacobian

    nsite = 20
    prob = models.brusselator_1d(n=nsite)
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.02, dsmin=1e-6, p_min=0.29,
                            p_max=0.8, max_steps=120, detect_bifurcation=3,
                            nev=10, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-9))
    br = bk.continuation(prob, bk.PALC(), cp)
    ih = [i for i, spt in enumerate(br.specialpoint)
          if spt.type == "hopf"][0]
    cpo = bk.ContinuationPar(ds=0.01, dsmax=0.02, dsmin=1e-6, p_min=0.29,
                             p_max=0.75, max_steps=4, detect_bifurcation=0,
                             newton_options=bk.NewtonPar(tol=1e-9,
                                                         max_iterations=25))
    disc_c = bk.Collocation(Ntst=30, m=4)
    br_cl = continuation_hopf_po(br, ih, cpo, delta_p=0.02, disc=disc_c,
                                 use_cop=True)
    gam = br_cl.gamma
    Xc = jnp.asarray(gam.sol[-1]["x"])
    p_at = float(gam.sol[-1]["p"])
    po_c = gam.prob
    par_c = po_c.set_lens_param(po_c.params, p_at)
    blocks = collocation_block_jacobian(disc_c, po_c.prob_vf, Xc, par_c)
    expo_c, _, _, _ = bk.FloquetColl()(blocks, 4)
    mult_c = np.sort(np.abs(np.exp(np.asarray(expo_c))))[::-1]

    # shooting orbit from the interpolated collocation solution at the
    # same parameter value
    n = 2 * nsite
    mesh = np.asarray(par_c["_mesh"])
    nodes, T = disc_c.split(Xc, n)
    disc_s = bk.Shooting(M=5, steps_per_segment=150)
    X0 = disc_s.generate_solution(
        lambda t: disc_c.interpolate(nodes, mesh, (t / (2 * np.pi)) % 1.0),
        float(T), n)
    vf = po_c.prob_vf.re_make(
        params=po_c.set_lens_param(po_c.params, p_at)["_inner"])
    sol_s, po_s = newton_po(vf, disc_s, X0,
                            options=bk.NewtonPar(
                                tol=1e-10, max_iterations=25,
                                linsolver=bk.GMRES(restart=50, maxiter=200,
                                                   rtol=1e-10)))
    assert bool(sol_s.converged)
    op = disc_s.monodromy_operator(vf, sol_s.u, po_s.params)
    mf = bk.FloquetQaDMF(eigsolver=bk.ArnoldiEig(which="LM", krylov_dim=24,
                                                 restarts=4, tol=1e-10))
    expo, _, _, _ = mf(op, 4)
    mult_mf = np.sort(np.abs(np.exp(np.asarray(expo))))[::-1]
    np.testing.assert_allclose(mult_mf, mult_c, atol=1e-4)


def test_mf_floquet_pde_scale_ring():
    """PDE-scale validation at n = 500 state dimension (the VERDICT bar):
    ring of 250 diffusively coupled Stuart-Landau oscillators.  The
    synchronous orbit's Floquet multipliers are ANALYTIC — for each ring
    Laplacian eigenvalue mu_k = 2 d (cos(2 pi k/N) - 1), the variational
    system in the co-rotating frame is triangular with exponents
    {mu_k, -2 r + mu_k} — so the matrix-free Krylov sweep is validated
    against closed-form values, no dense monodromy needed."""
    N = 250
    n = 2 * N
    r, nu, aa, d = 1.0, 1.0, 0.5, 40.0
    om = nu - aa * r
    T = 2 * np.pi / abs(om)

    def F(u, par):
        z = u[:N] + 1j * u[N:]
        lap = jnp.roll(z, 1) + jnp.roll(z, -1) - 2 * z
        dz = ((par["r"] + 1j * nu) * z
              - (1.0 + 1j * aa) * z * (jnp.abs(z) ** 2)
              + par["d"] * lap)
        return jnp.concatenate([jnp.real(dz), jnp.imag(dz)])

    prob = bk.BifurcationProblem(F, u0=jnp.zeros(n),
                                 params={"r": r, "d": d}, lens="r")

    def orbit(t):
        z = np.sqrt(r) * np.exp(1j * t) * np.ones(N)
        return np.concatenate([z.real, z.imag])

    steps = int(np.ceil((T / 4) * (4 * d + 4) / 2.2)) + 10
    disc = bk.Shooting(M=4, steps_per_segment=steps)
    X0 = disc.generate_solution(orbit, T, n)
    sol, po = newton_po(prob, disc, X0,
                        options=bk.NewtonPar(
                            tol=1e-10, max_iterations=15,
                            linsolver=bk.GMRES(restart=40, maxiter=120,
                                               rtol=1e-10)))
    assert bool(sol.converged)
    Tn = float(sol.u[-1])
    assert Tn == pytest.approx(T, rel=1e-8)

    op = disc.monodromy_operator(prob, sol.u, po.params)
    mf = bk.FloquetQaDMF(eigsolver=bk.ArnoldiEig(which="LM", krylov_dim=30,
                                                 restarts=5, tol=1e-10))
    nev = 7
    expo, vecs, cv, _ = mf(op, nev)
    got = np.sort(np.abs(np.exp(np.asarray(expo))))[::-1]

    # analytic: exponents d_mu_k (and -2r + d_mu_k, all ~ e^{-25}, deep
    # in the contracting tail)
    k = np.arange(N)
    mu = 2 * d * (np.cos(2 * np.pi * k / N) - 1.0)
    analytic = np.sort(np.exp(np.concatenate([mu, -2 * r + mu]) * T))[::-1]
    np.testing.assert_allclose(got, analytic[:nev], atol=1e-6)
    assert got[0] == pytest.approx(1.0, abs=1e-8)     # trivial
    # the leading band is genuinely multiple (mode pairs +-k)
    assert got[1] == pytest.approx(got[2], abs=1e-9)
