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


def test_mixed_precision_stability_sweep():
    """compute_dtype=f32 shift-invert through the continuation kernels:
    the J.v operator is built at f32 (the TPU fast path; detection is
    count-based and tolerant of ~1e-4 eigenvalue error) and the spectrum
    matches the dense f64 one."""
    import bifurcationkit.jl_tpu as bk
    from bifurcationkit.jl_tpu import models
    from bifurcationkit.jl_tpu.continuation.kernels import make_kernels

    prob = models.brusselator_1d(n=40)
    par = dict(prob.params)
    ref = np.linalg.eigvals(np.asarray(prob.jacobian(prob.u0, par)))
    ref = ref[np.lexsort((-ref.imag, -ref.real))][:6]

    si32 = bk.ShiftInvertEig(
        sigma=0.2,
        eigsolver=bk.ArnoldiEig(which="LM", krylov_dim=60),
        linsolver=bk.GMRES(restart=60, maxiter=120, rtol=1e-6),
        compute_dtype=jnp.float32)
    cp = bk.ContinuationPar(ds=1e-3, dsmax=1e-2, p_min=0.0, p_max=1.0,
                            max_steps=1, nev=6,
                            newton_options=bk.NewtonPar(eigsolver=si32))
    kern = make_kernels(prob, bk.PALC(), cp)
    vals, _, cv, _ = kern.eig(prob.u0, jnp.asarray(par[prob.lens]), par)
    assert bool(cv)
    assert np.abs(np.asarray(vals)[:6] - ref).max() < 5e-3

    # dense-matrix path: compute_dtype casts the matrix before factorization
    si_dense = bk.ShiftInvertEig(sigma=0.2, compute_dtype=jnp.float32)
    vals_d, _, _, _ = si_dense(prob.jacobian(prob.u0, par), 6)
    assert np.abs(np.asarray(vals_d)[:6] - ref).max() < 5e-3


def test_subspace_eig_monodromy_like():
    """SubspaceEig (blocked orthogonal iteration + block-Krylov
    Rayleigh-Ritz, residual-filtered :LM) on a monodromy-like spectrum:
    a few dominant multipliers over a decaying bulk — the Floquet shape
    it exists for."""
    import numpy as np
    from scipy.linalg import block_diag

    from bifurcationkit.jl_tpu.linalg.eig import FlatOperator, SubspaceEig

    rng = np.random.default_rng(5)
    mu = [1.0, 0.97, 0.6 * np.exp(1j)] + list(
        rng.uniform(0.001, 0.1, 150) * np.exp(1j * rng.uniform(-3, 3, 150)))
    blocks = []
    for m in mu:
        m = complex(m)
        if abs(m.imag) < 1e-12:
            blocks.append(np.array([[m.real]]))
        else:
            blocks.append(np.array([[m.real, m.imag], [-m.imag, m.real]]))
    D = block_diag(*blocks)
    n = D.shape[0]
    V = rng.standard_normal((n, n))
    A = np.linalg.solve(V, D @ V)
    Aj = jnp.asarray(A)
    op = FlatOperator(lambda v: Aj @ v, n, jnp.float64)
    wref = np.linalg.eigvals(A)
    wref = wref[np.lexsort((-wref.imag, -np.abs(wref)))][:4]

    eig = SubspaceEig(sweeps=2, krylov_blocks=3, extra=4, tol=1e-6)
    vals, vecs, cv, _ = eig(op, 4)
    err = np.max(np.abs(np.sort_complex(np.asarray(vals))
                        - np.sort_complex(wref)))
    # cold start: good enough for count-based detection (tol_stability
    # 1e-3 applies to the DOMINANT multipliers, which converge fastest)
    assert err < 1e-2, err
    # warm restart from the returned block (Re/Im-interleaved seed)
    v0 = eig.make_seed(vecs, eig.seed_cols(4))
    vals2, _, cv2, _ = eig(op, 4, v0=jnp.asarray(v0))
    err2 = np.max(np.abs(np.sort_complex(np.asarray(vals2))
                         - np.sort_complex(wref)))
    assert err2 < 1e-5, err2
    assert err2 < err / 10
