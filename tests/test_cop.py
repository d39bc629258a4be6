"""COP solver tests: blocks match the AD jacobian, COP solve matches dense LU
(the reference's own strongest parity pattern, ref test/condensation_of_parameters/cop.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.periodic.cop import (COPLS,
                                                collocation_block_jacobian,
                                                cop_solve)
from bifurcationkit.jl_tpu.periodic.orbits import periodic_orbit_problem


R0, MU, NU = 0.5, 0.2, 0.5
RADIUS = np.sqrt(R0)
OMEGA = MU - NU * R0
PERIOD = 2 * np.pi / abs(OMEGA)


def _setup():
    prob = models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Collocation(Ntst=12, m=3)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([RADIUS * np.cos(s * t), RADIUS * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, PERIOD, 2)
    po = periodic_orbit_problem(prob, disc, X0)
    return prob, disc, X0, po


def test_cop_blocks_match_ad_jacobian():
    prob, disc, X0, po = _setup()
    blocks = collocation_block_jacobian(disc, prob, X0, po.params)
    J_ad = jax.jacfwd(lambda X: po.F(X, po.params))(X0)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(X0.shape[0]))
    np.testing.assert_allclose(blocks(v), J_ad @ v, atol=1e-9)


def test_cop_solve_matches_dense():
    prob, disc, X0, po = _setup()
    blocks = collocation_block_jacobian(disc, prob, X0, po.params)
    J_ad = np.asarray(jax.jacfwd(lambda X: po.F(X, po.params))(X0))
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.standard_normal(X0.shape[0]))
    x_cop = cop_solve(blocks, rhs)
    x_dense = np.linalg.solve(J_ad, np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x_cop), x_dense, atol=1e-7)


def test_newton_po_with_cop():
    prob = models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Collocation(Ntst=12, m=3)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([1.1 * RADIUS * np.cos(s * t),
                         1.1 * RADIUS * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, PERIOD * 1.05, 2)
    po = periodic_orbit_problem(prob, disc, X0, use_cop=True)
    sol = bk.newton(po, bk.NewtonPar(tol=1e-10, max_iterations=25,
                                     linsolver=bk.COPLS()))
    assert bool(sol.converged)
    assert float(disc.period(sol.u)) == pytest.approx(PERIOD, rel=1e-6)


def test_continuation_po_with_cop():
    """Full PALC continuation on the COP direct solver (auto-wired by
    use_cop=True): the branch tracks the exact SL orbit family."""
    from bifurcationkit.jl_tpu.periodic.orbits import continuation_po

    prob = models.stuart_landau(r=R0, mu=MU, nu=NU, c3=1.0, c5=0.0)
    disc = bk.Collocation(Ntst=12, m=3)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([RADIUS * np.cos(s * t), RADIUS * np.sin(s * t)])

    X0 = disc.generate_solution(orbit, PERIOD, 2)
    cp = bk.ContinuationPar(ds=0.02, dsmax=0.05, dsmin=1e-6, p_min=0.1,
                            p_max=0.9, max_steps=8, detect_bifurcation=0,
                            detect_fold=False,
                            newton_options=bk.NewtonPar(tol=1e-9,
                                                        max_iterations=20))
    br = continuation_po(prob, disc, X0, cp, use_cop=True)
    tbl = br.gamma._table()
    # exact period at r: 2 pi / |mu - nu r|
    exact = 2 * np.pi / np.abs(MU - NU * np.asarray(tbl["param"]))
    np.testing.assert_allclose(np.asarray(tbl["period"]), exact, rtol=1e-6)


def test_cop_bordered_single_pass_matches_dense():
    """COPBLS condenses [J dR; c' cp] in ONE pass (ref cop.jl:107);
    parity vs the dense (N+1) solve."""
    prob, disc, X0, po = _setup()
    blocks = collocation_block_jacobian(disc, prob, X0, po.params)
    J_ad = np.asarray(jax.jacfwd(lambda X: po.F(X, po.params))(X0))
    N = X0.shape[0]
    rng = np.random.default_rng(3)
    dR = rng.standard_normal(N)
    dzu = rng.standard_normal(N)
    dzp = 0.7
    R = rng.standard_normal(N)
    rn = 0.3
    theta = 0.5
    scale = 1.0 / N          # the normalized PALC dot
    Aext = np.zeros((N + 1, N + 1))
    Aext[:N, :N] = J_ad
    Aext[:N, N] = dR
    Aext[N, :N] = theta * scale * dzu
    Aext[N, N] = (1 - theta) * dzp
    sol = np.linalg.solve(Aext, np.concatenate([R, [rn]]))

    from bifurcationkit.jl_tpu.periodic.cop import COPBLS
    from bifurcationkit.jl_tpu.linalg.bordered import _default_dotp

    dX, dp, cv, _ = COPBLS()(blocks, jnp.asarray(dR), jnp.asarray(dzu),
                             jnp.asarray(dzp), jnp.asarray(R),
                             jnp.asarray(rn), theta, 1 - theta,
                             dotp=_default_dotp)
    np.testing.assert_allclose(np.asarray(dX), sol[:N], atol=1e-7)
    np.testing.assert_allclose(float(dp), sol[N], atol=1e-9)


def _unstable_setup(lam=0.35, Ntst=100, m=3):
    """Orbit with a strongly unstable Floquet multiplier: Stuart-Landau
    extended by a decoupled unstable mode y' = lam*y restricted to the
    orbit's period; mu_unstable = exp(lam*T) ~ 1e3 上 for lam*T ~ 7."""
    import bifurcationkit.jl_tpu as bk
    from bifurcationkit.jl_tpu.core.problem import BifurcationProblem

    def F(u, par):
        x, y, w = u[0], u[1], u[2]
        r, mu, nu = par["r"], par["mu"], par["nu"]
        a = x * x + y * y
        return jnp.array([
            r * x - mu * y - (x - nu * y) * a,
            mu * x + r * y - (y + nu * x) * a,
            lam * w,
        ])

    prob = BifurcationProblem(F, u0=jnp.zeros(3),
                              params={"r": R0, "mu": MU, "nu": NU},
                              lens="r")
    disc = bk.Collocation(Ntst=Ntst, m=m)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([RADIUS * np.cos(s * t), RADIUS * np.sin(s * t),
                         0.0])

    X0 = disc.generate_solution(orbit, PERIOD, 3)
    po = periodic_orbit_problem(prob, disc, X0)
    return prob, disc, X0, po


def test_cop_solve_stable_on_strongly_unstable_orbit():
    """VERDICT #3 'Done' criterion: COP-vs-dense parity at Ntst=100 on an
    orbit with ||mu_max|| ~ 1e3 — the exact regime where an unpivoted
    chain elimination loses digits."""
    prob, disc, X0, po = _unstable_setup(lam=0.055, Ntst=100, m=3)
    # lam*T = 0.055 * 125.7 ~ 6.9 -> mu ~ 1e3
    blocks = collocation_block_jacobian(disc, prob, X0, po.params)
    J_ad = np.asarray(jax.jacfwd(lambda X: po.F(X, po.params))(X0))
    rng = np.random.default_rng(7)
    rhs = jnp.asarray(rng.standard_normal(X0.shape[0]))
    x_cop = np.asarray(cop_solve(blocks, rhs))
    x_dense = np.linalg.solve(J_ad, np.asarray(rhs))
    scale = np.linalg.norm(x_dense)
    assert np.linalg.norm(x_cop - x_dense) / scale < 1e-9


def test_floquet_coll_multipliers():
    """FloquetColl (COP stage-1 maps + log-renormalized product) recovers
    the analytic multipliers: trivial mu=1, radial exp(-2 r T), and the
    planted unstable exp(lam T) ~ 1e3 without overflow."""
    lam = 0.055
    prob, disc, X0, po = _unstable_setup(lam=lam, Ntst=60, m=4)
    from bifurcationkit.jl_tpu.periodic.cop import (
        collocation_block_jacobian as cbj)
    from bifurcationkit.jl_tpu.periodic.floquet import FloquetColl

    blocks = cbj(disc, prob, X0, po.params)
    expo, vecs, cv, _ = FloquetColl()(blocks, 3)
    got = np.sort(np.asarray(expo.real))[::-1]
    # leading exponents (what stability detection consumes) are exact;
    # the third at -2 r T ~ -126 underflows the product's f64 spectrum —
    # the documented product-method limitation the reference shares
    # (Floquet.jl:28-31; FloquetGEV is the accurate alternative) — and
    # must still read as strongly stable
    np.testing.assert_allclose(got[:2], [lam * PERIOD, 0.0], atol=2e-3)
    assert got[2] < -30.0


def test_floquet_threeway_parity_hard_orbit():
    """VERDICT r2 #7: FloquetColl / FloquetGEV / QaD three-way parity on a
    STIFFLY separated orbit — planted multipliers mu ~ 1e3 AND mu ~ 1e-3
    simultaneously (exponent spread ~ 14).  Coll and GEV must agree to
    tolerance on every planted exponent; the dense QaD monodromy-product
    route is validated on the leading exponents and documented to degrade
    on the deeply stable tail (the reference's own caveat, Floquet.jl:28-31:
    precision degrades with the multiplier spread and Ntst)."""
    lam_u, lam_s = 0.055, -0.055    # exp(+-lam*T) ~ 1e3 / 1e-3
    import bifurcationkit.jl_tpu as bk
    from bifurcationkit.jl_tpu.core.problem import BifurcationProblem
    from bifurcationkit.jl_tpu.periodic.cop import (
        collocation_block_jacobian as cbj)
    from bifurcationkit.jl_tpu.periodic.floquet import (FloquetColl,
                                                        FloquetGEV)

    def F(u, par):
        x, y, wu, ws = u[0], u[1], u[2], u[3]
        r, mu, nu = par["r"], par["mu"], par["nu"]
        a = x * x + y * y
        return jnp.array([
            r * x - mu * y - (x - nu * y) * a,
            mu * x + r * y - (y + nu * x) * a,
            lam_u * wu,
            lam_s * ws,
        ])

    prob = BifurcationProblem(F, u0=jnp.zeros(4),
                              params={"r": R0, "mu": MU, "nu": NU},
                              lens="r")
    disc = bk.Collocation(Ntst=60, m=4)

    def orbit(t):
        s = np.sign(OMEGA)
        return np.array([RADIUS * np.cos(s * t), RADIUS * np.sin(s * t),
                         0.0, 0.0])

    X0 = disc.generate_solution(orbit, PERIOD, 4)
    po = periodic_orbit_problem(prob, disc, X0)
    exact = np.sort([lam_u * PERIOD, 0.0, lam_s * PERIOD,
                     -2 * R0 * PERIOD])[::-1]

    blocks = cbj(disc, prob, X0, po.params)
    expo_c, _, _, _ = FloquetColl()(blocks, 4)
    got_c = np.sort(np.asarray(expo_c.real))[::-1]

    maps = disc.interval_maps(prob, X0, po.params)
    expo_g, _, _, _ = FloquetGEV()(maps, 4)
    got_g = np.sort(np.asarray(expo_g.real))[::-1]

    # Coll and GEV both resolve the stiff pair AND agree with each other
    np.testing.assert_allclose(got_c[:3], exact[:3], atol=2e-3)
    np.testing.assert_allclose(got_g[:3], exact[:3], atol=2e-3)
    np.testing.assert_allclose(got_c[:3], got_g[:3], atol=2e-3)
    # the -2rT ~ -126 exponent (mu ~ 3e-55) is beyond every route's f64
    # resolution — all must still read it as strongly stable (the QZ path
    # returns mu = 0 -> exponent -inf, which sorts/classifies correctly)
    assert got_c[3] < -30.0
    assert got_g[3] < -30.0

    # QaD (dense monodromy product): leading exponents fine, the 1e-3
    # multiplier already carries visible rounding from the product
    Mn = np.asarray(disc.monodromy(prob, X0, po.params))
    mult_q = np.linalg.eigvals(Mn)
    got_q = np.sort(np.log(np.abs(mult_q)))[::-1]
    np.testing.assert_allclose(got_q[:2], exact[:2], atol=2e-3)
    assert abs(got_q[2] - exact[2]) < 0.5      # degraded but sane


def test_cop_solve_mixed_matches_f64():
    """Mixed-precision COP (f32 factorizations + f64 structured-matvec
    refinement, VERDICT r3 #4) reaches the f64 solve to refinement
    tolerance at unchanged semantics."""
    from bifurcationkit.jl_tpu.periodic.cop import cop_solve_mixed

    prob, disc, X0, po = _setup()
    blocks = collocation_block_jacobian(disc, prob, X0, po.params)
    rng = np.random.default_rng(7)
    rhs = jnp.asarray(rng.standard_normal(X0.shape[0]))
    x64 = cop_solve(blocks, rhs)
    xm, cv = cop_solve_mixed(blocks, rhs)
    assert bool(cv)
    rel = float(jnp.linalg.norm(x64 - xm) / jnp.linalg.norm(x64))
    assert rel < 1e-8
    assert float(jnp.linalg.norm(rhs - blocks(xm))) < 1e-8


def test_cop_bordered_mixed_matches_f64():
    from bifurcationkit.jl_tpu.periodic.cop import (COPBLS,
                                                    cop_solve_bordered)

    prob, disc, X0, po = _setup()
    blocks = collocation_block_jacobian(disc, prob, X0, po.params)
    N = X0.shape[0]
    rng = np.random.default_rng(8)
    dR = jnp.asarray(rng.standard_normal(N))
    dzu = jnp.asarray(rng.standard_normal(N))
    R = jnp.asarray(rng.standard_normal(N))
    x1, dp1 = cop_solve_bordered(blocks, R, 0.3, dR, dzu, 0.7,
                                 xi_u=0.5, xi_p=0.5, dot_scale=1.0 / N)
    from bifurcationkit.jl_tpu.linalg.bordered import _default_dotp

    dX, dp, cv, _ = COPBLS(low_dtype=jnp.float32)(
        blocks, dR, dzu, jnp.asarray(0.7), R, jnp.asarray(0.3),
        0.5, 0.5, dotp=_default_dotp)
    assert bool(cv)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(x1), atol=1e-8)
    np.testing.assert_allclose(float(dp), float(dp1), atol=1e-9)


def test_continuation_po_cop_mixed_precision():
    """End-to-end PO continuation with the mixed-precision COP corrector:
    same branch as the f64 path at unchanged Newton tolerances."""
    from bifurcationkit.jl_tpu.periodic.cop import COPBLS, COPLS

    prob, disc, X0, _ = _setup()
    po = periodic_orbit_problem(prob, disc, X0, use_cop=True,
                                floquet="coll")
    cp = bk.ContinuationPar(
        ds=0.01, dsmax=0.03, dsmin=1e-5, p_min=0.05, p_max=0.6,
        max_steps=12, detect_bifurcation=0, detect_fold=False,
        newton_options=bk.NewtonPar(tol=1e-9, max_iterations=20,
                                    linsolver=COPLS()))
    from bifurcationkit.jl_tpu.continuation.engine import ContIterable

    def run(lo):
        cpx = cp.replace(newton_options=cp.newton_options.replace(
            linsolver=COPLS(low_dtype=lo)))
        alg = bk.PALC(bls=COPBLS(low_dtype=lo))
        it = ContIterable(po, alg, cpx, kind="PeriodicOrbitCont")
        state = it.init_state(x0=X0)
        ps = []
        for _ in range(8):
            it.iterate(state)
            assert state.converged
            ps.append(float(state.p))
        return np.asarray(ps)

    p64 = run(None)
    pmx = run(jnp.float32)
    np.testing.assert_allclose(pmx, p64, atol=1e-8)


def test_floquet_coll_low_dtype_parity():
    """FloquetColl(low_dtype=f32): f32 stage-1 + product, f64 host eig of
    the reduction — exponents within ~1e-5 of the all-f64 path (ample for
    count-based detection at tol_stability >= 1e-3)."""
    prob, disc, X0, _ = _setup()
    po = periodic_orbit_problem(prob, disc, X0, use_cop=True,
                                floquet="coll")
    blocks = po.jacobian(X0, po.params)
    f64 = bk.FloquetColl()
    f32 = bk.FloquetColl(low_dtype=jnp.float32)
    e64, _, cv64, _ = f64.host_eig(
        *[np.asarray(r) for r in f64.device_reduce(blocks)], 2)
    e32, _, cv32, _ = f32.host_eig(
        *[np.asarray(r) for r in f32.device_reduce(blocks)], 2)
    assert cv64 and cv32
    # only the DETECTION-relevant window is comparable: multipliers below
    # ~eps_f32 * ||P|| (exponents < ~-16) are unrepresentable noise in the
    # f32 reduction, and irrelevant to stability counting either way
    win = np.real(e64) > -10
    assert win.any()
    assert np.max(np.abs(e64[win] - e32[win])) < 1e-4
