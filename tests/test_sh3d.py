"""SH3d flagship workload (ref examples/SH3d.jl): matrix-free Newton-GMRES
with the exact DCT spectral preconditioner and shift-invert Arnoldi through
the same preconditioned solver (ref SH3dEig, SH3d.jl:98-121)."""
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models
from bifurcationkit.jl_tpu.linalg.eig import FlatOperator, dense_eig

N = 10


@pytest.fixture(scope="module")
def sh3d_state():
    prob = models.swift_hohenberg_3d(N=N)
    precond = prob.spectral_precond
    ls = bk.GMRES(restart=40, maxiter=200, rtol=1e-10, precond=precond)
    sol = bk.newton(prob.re_make(u0=prob.u0 * 2.0),
                    bk.NewtonPar(tol=1e-9, max_iterations=80, linsolver=ls))
    return prob, precond, sol


def test_sh3d_newton_lattice(sh3d_state):
    prob, precond, sol = sh3d_state
    assert bool(sol.converged)
    u = np.asarray(sol.u)
    # a patterned (non-flat) state, not the trivial one (at this small N the
    # basin yields z-uniform rolls; the 22^3 example converges to a 3D state)
    assert np.abs(u).max() > 0.5
    assert np.ptp(u) > 0.5


def test_sh3d_spectral_precond_exact(sh3d_state):
    """The DCT preconditioner inverts -(I+Delta)^2 - shift exactly."""
    prob, precond, sol = sh3d_state
    v = jnp.asarray(np.random.default_rng(3).standard_normal((N, N, N)))
    w = precond(v, shift=1.0)
    # apply the operator back: -(I+Lap)^2 w - w should equal v
    zero_par = {"l": 0.0, "nu": 0.0}
    # residual at l=nu=0 is -(I+Lap)^2 w - w^3; add back the cubic
    lin = prob.residual(w, zero_par) + w ** 3
    err = np.asarray(lin - w - v)
    assert np.abs(err).max() < 1e-10


def test_sh3d_matrix_free_eig_parity(sh3d_state):
    """Shift-invert Arnoldi on the matrix-free J.v agrees with the dense
    spectrum near sigma (ref SH3d.jl shift-invert vs Arpack parity)."""
    prob, precond, sol = sh3d_state
    J = prob.jacobian(sol.u, prob.params)
    dv, _ = dense_eig(J)
    eig = bk.ShiftInvertEig(
        sigma=0.1, linsolver=bk.GMRES(restart=40, maxiter=300, rtol=1e-10,
                                      precond=precond))

    def op(v):
        return jnp.ravel(prob.dF(sol.u, prob.params, v.reshape(N, N, N)))

    vals, vecs, cv, _ = eig(FlatOperator(op, N ** 3), 6)
    assert bool(cv)
    np.testing.assert_allclose(np.asarray(vals)[:4].real,
                               np.asarray(dv)[:4].real, atol=1e-7)
