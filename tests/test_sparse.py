"""Sparse container + SpMV tests (DIA/ELL/BSR vs dense; pallas kernel in
interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu.ops import (BSRMatrix, DIAMatrix, ELLMatrix,
                                       laplacian_1d_dia)
from bifurcationkit.jl_tpu.ops.pallas_spmv import dia_spmv


def test_dia_matvec_vs_dense():
    rng = np.random.default_rng(0)
    n = 50
    A = np.zeros((n, n))
    for off in (-2, 0, 1):
        d = rng.standard_normal(n - abs(off))
        A += np.diag(d, off)
    D = DIAMatrix.from_dense(A, (-2, 0, 1))
    v = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(D.matvec(v), A @ np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(D.todense()), A, atol=1e-12)


def test_dia_in_gmres_newton():
    # DIA as matrix-free jacobian: solve Laplacian system via GMRES
    n = 64
    D = laplacian_1d_dia(n, 1.0 / (n + 1))
    b = jnp.ones(n)
    sol, cv, _ = bk.GMRES(restart=64, maxiter=200, rtol=1e-12)(D, b)
    assert bool(cv)
    np.testing.assert_allclose(D.matvec(sol), b, atol=1e-8)


def test_ell_matvec():
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    A = sp.random(60, 60, density=0.1, random_state=2,
                  data_rvs=rng.standard_normal) + 5 * sp.eye(60)
    E = ELLMatrix.from_scipy(A)
    v = jnp.asarray(rng.standard_normal(60))
    np.testing.assert_allclose(E.matvec(v), A @ np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(E.todense()), A.toarray(),
                               atol=1e-12)


def test_bsr_matvec_and_diag():
    rng = np.random.default_rng(3)
    nb, k, bs = 6, 3, 4
    blocks = rng.standard_normal((nb, k, bs, bs))
    bcols = np.full((nb, k), -1, np.int32)
    for r in range(nb):
        cols = rng.choice(nb, size=2, replace=False)
        if r not in cols:
            cols[0] = r
        bcols[r, :2] = cols
    B = BSRMatrix(jnp.asarray(blocks), jnp.asarray(bcols))
    v = jnp.asarray(rng.standard_normal(nb * bs))
    # dense reference
    A = np.zeros((nb * bs, nb * bs))
    for r in range(nb):
        for j in range(k):
            c = bcols[r, j]
            if c >= 0:
                A[r*bs:(r+1)*bs, c*bs:(c+1)*bs] += blocks[r, j]
    np.testing.assert_allclose(B.matvec(v), A @ np.asarray(v), atol=1e-12)
    # diagonal blocks
    D = np.asarray(B.diag_blocks())
    for r in range(nb):
        np.testing.assert_allclose(D[r], A[r*bs:(r+1)*bs, r*bs:(r+1)*bs],
                                   atol=1e-12)


def test_pallas_dia_spmv_interpret():
    """Pallas kernel correctness in interpreter mode (no TPU needed)."""
    import jax.experimental.pallas as pl
    from bifurcationkit.jl_tpu.ops import pallas_spmv

    rng = np.random.default_rng(4)
    n = 3 * pallas_spmv.TILE
    offsets = (-3, -1, 0, 1, 3)
    data = rng.standard_normal((len(offsets), n))
    # zero out-of-band entries like from_dense would
    for kk, off in enumerate(offsets):
        if off > 0:
            data[kk, n - off:] = 0
        elif off < 0:
            data[kk, :-off] = 0
    D = DIAMatrix(jnp.asarray(data), offsets)
    v = jnp.asarray(rng.standard_normal(n))

    out = pallas_spmv.dia_spmv_pallas(D, v, interpret=True)
    np.testing.assert_allclose(out, D.matvec(v), atol=1e-10)


def test_pallas_sh_jv_parity():
    """Fused Pallas SH J.v kernel (bench north-star) against the XLA
    formulation, including both Neumann edge closures (interpret mode on
    CPU; the same kernel runs compiled on TPU)."""
    import jax
    import jax.numpy as jnp

    from bifurcationkit.jl_tpu.ops.pallas_sh import (sh_jv_pallas,
                                                     sh_jv_reference)

    N, M = 256, 256
    u = jax.random.normal(jax.random.PRNGKey(0), (N, M), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (N, M), jnp.float32)
    scal = jnp.array([-0.1, 1.3, 1.0 / 0.0241, 1.0 / 0.0241], jnp.float32)
    ref = sh_jv_reference(u, v, scal)
    for B in (64, 128, 256):
        out = sh_jv_pallas(u, v, scal, block_rows=B, interpret=True)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 1e-5, (B, err)
