"""Multi-device tests on the virtual 8-device CPU mesh: sharded SpMV with
explicit halo exchange matches single-device; automatic sharding of the
stencil residual; mesh reductions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.ops import DIAMatrix
from bifurcationkit.jl_tpu.parallel import (make_mesh, pdot,
                                            sharded_dia_spmv, shard_state)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh((1, 8), ("branch", "space"))


def test_sharded_dia_spmv_matches(mesh8):
    rng = np.random.default_rng(0)
    n = 8 * 64
    offsets = (-3, -1, 0, 1, 3)
    data = rng.standard_normal((len(offsets), n))
    for k, off in enumerate(offsets):
        if off > 0:
            data[k, n - off:] = 0
        elif off < 0:
            data[k, :-off] = 0
    A = DIAMatrix(jnp.asarray(data), offsets)
    v = jnp.asarray(rng.standard_normal(n))
    ref = A.matvec(v)
    out = sharded_dia_spmv(mesh8, A, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_sharded_spmv_with_sharded_input(mesh8):
    rng = np.random.default_rng(1)
    n = 8 * 32
    A = DIAMatrix(jnp.asarray(rng.standard_normal((3, n))), (-1, 0, 1))
    v = shard_state(mesh8, jnp.asarray(rng.standard_normal(n)), "space")
    out = sharded_dia_spmv(mesh8, A, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(A.matvec(v)), atol=1e-12)


def test_pdot_inside_shard_map(mesh8):
    n = 8 * 16
    x = jnp.arange(n, dtype=jnp.float64)
    y = jnp.ones(n)

    f = jax.jit(jax.shard_map(
        lambda a, b: pdot(a, b)[None],
        mesh=mesh8, in_specs=(P("space"), P("space")),
        out_specs=P("space")))
    out = f(x, y)
    # every shard holds the same global value
    assert float(out[0]) == pytest.approx(float(jnp.sum(x)))


def test_auto_sharded_newton_gmres(mesh8):
    """Automatic path: sharded state + matrix-free GMRES Newton executes
    over the mesh (collectives inserted by XLA)."""
    from bifurcationkit.jl_tpu import models

    n_sites = 8 * 8
    prob = models.brusselator_1d(n=n_sites)
    sharding = NamedSharding(mesh8, P("space"))
    u0 = jax.device_put(
        prob.u0 + 1e-2 * jnp.sin(jnp.arange(2 * n_sites) * 0.1), sharding)
    with mesh8:
        sol = bk.newton(
            prob.re_make(u0=u0),
            bk.NewtonPar(tol=1e-8, max_iterations=12,
                         linsolver=bk.GMRES(restart=160, maxiter=320,
                                            rtol=1e-10)))
    assert bool(sol.converged)


def test_sharded_sh_jv_matches_single_chip():
    """Row-partitioned fused SH J.v with explicit ppermute halo over the
    8-device mesh == the single-chip operator."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from bifurcationkit.jl_tpu.ops.pallas_sh import sh_jv_reference
    from bifurcationkit.jl_tpu.parallel.halo import sharded_sh_jv

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("space",))
    N, M = 64, 32
    u = jax.random.normal(jax.random.PRNGKey(0), (N, M))
    v = jax.random.normal(jax.random.PRNGKey(1), (N, M))
    scal = jnp.array([-0.1, 1.3, 1.0 / 0.0241, 1.0 / 0.0241])
    ref = sh_jv_reference(u, v, scal)
    out = sharded_sh_jv(mesh, u, v, scal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


def test_time_parallel_monodromy_assoc_scan(mesh8):
    """Tree-parallel monodromy product (the time-slice 'ring analog',
    SURVEY §2.3): associative_scan over per-interval fundamental maps
    sharded on the mesh time axis matches the sequential chain."""
    from bifurcationkit.jl_tpu.periodic.floquet import monodromy_from_maps

    rng = np.random.default_rng(5)
    Ntst, n = 32, 6
    # well-conditioned maps close to identity (like real fundamental maps)
    maps = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((Ntst, n, n)))
    ref = monodromy_from_maps(maps, method="seq")

    sh = NamedSharding(mesh8, P("space"))       # shard the time axis
    maps_sh = jax.device_put(maps, sh)
    out = jax.jit(lambda m: monodromy_from_maps(m, method="assoc"))(maps_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-11)
