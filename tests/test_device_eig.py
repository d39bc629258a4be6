"""Device-native dense nonsymmetric eigensolver (no LAPACK, no host
callback): Hessenberg reduction + implicit Francis double-shift QR with
windowed deflation + inverse-iteration eigenvectors.  This is the TPU
spectral path — the axon runtime supports neither complex128 nor
jax.pure_callback, so the detection layer's eigenvalues must be computable
entirely on device.  Parity vs LAPACK."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifurcationkit.jl_tpu.linalg.eig import (inverse_iteration_vectors,
                                              qr_eigvals)


@pytest.mark.parametrize("m", [2, 5, 12, 40, 80])
@pytest.mark.parametrize("seed", [0, 5, 7])
def test_qr_eigvals_random(m, seed):
    A = np.random.default_rng(seed).standard_normal((m, m))
    w_ref = np.sort_complex(np.linalg.eigvals(A))
    w = np.sort_complex(np.asarray(qr_eigvals(jnp.asarray(A))))
    assert np.abs(w - w_ref).max() < 1e-8 * max(1.0, np.abs(w_ref).max())


def test_qr_eigvals_structured():
    rng = np.random.default_rng(0)
    cases = {}
    A = rng.standard_normal((20, 20))
    cases["symmetric"] = A + A.T
    cases["jacobian_like"] = (-np.diag(np.linspace(0.5, 30, 30))
                              + 0.1 * rng.standard_normal((30, 30)))
    cases["repeated"] = (np.diag([2.0, 2.0, 2.0, 1.0, 1.0, 0.0])
                         + np.triu(rng.standard_normal((6, 6)), 1))
    cases["jordan"] = np.diag([1.0, 1.0, 1.0]) + np.diag([1.0, 1.0], 1)
    B = np.zeros((12, 12))
    for k in range(6):
        a, b = rng.standard_normal(2)
        B[2 * k:2 * k + 2, 2 * k:2 * k + 2] = [[a, -b], [b, a]]
    Q, _ = np.linalg.qr(rng.standard_normal((12, 12)))
    cases["complex_pairs"] = Q @ B @ Q.T
    for tag, A in cases.items():
        w_ref = np.sort_complex(np.linalg.eigvals(A))
        w = np.sort_complex(np.asarray(qr_eigvals(jnp.asarray(A))))
        assert np.abs(w - w_ref).max() < 1e-8, tag


def test_qr_eigvals_sorted_lr():
    """Detection-layer contract: decreasing real part."""
    A = np.random.default_rng(3).standard_normal((25, 25))
    w = np.asarray(qr_eigvals(jnp.asarray(A)))
    assert np.all(np.diff(w.real) < 1e-12)


def test_inverse_iteration_vectors():
    A = np.random.default_rng(1).standard_normal((15, 15))
    w = qr_eigvals(jnp.asarray(A))
    V = inverse_iteration_vectors(jnp.asarray(A), w)
    res = np.abs(np.asarray(A) @ np.asarray(V)
                 - np.asarray(V) * np.asarray(w)[None, :]).max()
    assert res < 1e-8


def test_qr_eigvals_jittable():
    A = jnp.asarray(np.random.default_rng(2).standard_normal((10, 10)))
    w1 = np.sort_complex(np.asarray(jax.jit(qr_eigvals)(A)))
    w2 = np.sort_complex(np.linalg.eigvals(np.asarray(A)))
    assert np.abs(w1 - w2).max() < 1e-9
