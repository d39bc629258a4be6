"""Native C++ utilities: CSR conversions vs scipy, branch log round-trip."""
import os
import tempfile

import numpy as np
import pytest
import scipy.sparse as sp

from bifurcationkit.jl_tpu.native import (BranchLog, csr_to_dia_arrays,
                                          csr_to_ell_arrays, _load)


def test_native_compiles():
    assert _load() is not None, "g++ toolchain should be available here"


def test_csr_to_ell_native():
    rng = np.random.default_rng(0)
    A = sp.random(80, 80, density=0.08, random_state=1,
                  data_rvs=rng.standard_normal).tocsr() + sp.eye(80).tocsr()
    A = A.tocsr()
    data, cols = csr_to_ell_arrays(A.indptr, A.indices, A.data)
    # reconstruct and compare
    B = np.zeros((80, 80))
    for i in range(80):
        for j in range(data.shape[1]):
            if cols[i, j] >= 0:
                B[i, cols[i, j]] += data[i, j]
    np.testing.assert_allclose(B, A.toarray(), atol=1e-14)


def test_csr_to_dia_native():
    n = 60
    A = sp.diags([np.full(n - 1, 2.0), np.full(n, -5.0), np.full(n - 3, 1.5)],
                 [-1, 0, 3]).tocsr()
    data, offsets = csr_to_dia_arrays(A.indptr, A.indices, A.data)
    assert offsets == (-1, 0, 3)
    import jax.numpy as jnp
    from bifurcationkit.jl_tpu.ops import DIAMatrix

    D = DIAMatrix(jnp.asarray(data), offsets)
    v = np.random.default_rng(2).standard_normal(n)
    np.testing.assert_allclose(np.asarray(D.matvec(jnp.asarray(v))),
                               A @ v, atol=1e-12)


def test_branch_log_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "branch.log")
        log = BranchLog(path, 4)
        recs = [(0, [1.0, 2, 3, 4]), (1, [5.0, 6, 7, 8]),
                (7, [9.0, 10, 11, 12])]
        for s, v in recs:
            log.append(s, v)
        log.close()
        steps, values = BranchLog.read(path, 4)
        np.testing.assert_array_equal(steps, [0, 1, 7])
        np.testing.assert_allclose(values[2], [9, 10, 11, 12])
        # append-resume: reopen and add more
        log2 = BranchLog(path, 4)
        log2.append(8, [13.0, 14, 15, 16])
        log2.close()
        steps, values = BranchLog.read(path, 4)
        assert len(steps) == 4 and steps[-1] == 8
