"""Preconditioners (ref src/Preconditioner.jl).

`PartialSchurPrecond` — the spectral-projection preconditioner P^-1 that
inverts the restriction of J to a low-dimensional invariant subspace and acts
as the identity on its complement (ref `PrecPartialSchur`, :4-66): built from
an Arnoldi partial Schur factorization, it deflates the few troublesome
(near-singular / unstable) eigenvalues so GMRES converges fast on the rest of
the spectrum.

`BlockJacobiPrecond` — classic block-diagonal inverse for BSR-structured PDE
jacobians (the TPU replacement habit for ILU; SURVEY §7 hard parts).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .eig import ArnoldiEig, FlatOperator, dense_eig
from .linear import apply_J, is_operator


@dataclasses.dataclass(frozen=True)
class PartialSchurPrecond:
    """P^-1 = I + Q (T^-1 - I) Q^T where (Q, T) is a partial Schur pair of J
    on the subspace of the `nev` rightmost eigenvalues."""

    Q: Any              # (n, k) orthonormal basis of the invariant subspace
    T: Any              # (k, k) restriction of J

    @classmethod
    def from_matrix(cls, J, nev: int = 5):
        vals, vecs = dense_eig(J)
        V = np.asarray(vecs)[:, :nev]
        # orthonormalize the (possibly complex-pair) basis, keep real span
        Vr = np.concatenate([V.real, V.imag], axis=1)
        Q, _ = np.linalg.qr(Vr)
        # rank-trim
        k = min(2 * nev, Q.shape[1])
        Q = Q[:, :k]
        T = Q.T @ np.asarray(J) @ Q
        return cls(Q=jnp.asarray(Q), T=jnp.asarray(T))

    @classmethod
    def from_operator(cls, op, n: int, nev: int = 5, krylov_dim: int = 40):
        eig = ArnoldiEig(krylov_dim=krylov_dim, which="LR")
        vals, vecs, cv, _ = eig(FlatOperator(op, n), nev)
        V = np.asarray(vecs)
        Vr = np.concatenate([V.real, V.imag], axis=1)
        Q, _ = np.linalg.qr(Vr)
        k = min(2 * nev, Q.shape[1])
        Q = Q[:, :k]
        JQ = np.stack([np.asarray(op(jnp.asarray(Q[:, i])))
                       for i in range(k)], axis=1)
        T = Q.T @ JQ
        return cls(Q=jnp.asarray(Q), T=jnp.asarray(T))

    def __call__(self, v):
        """Apply P^-1 v (ref ldiv!, src/Preconditioner.jl:20-40)."""
        flat = v if isinstance(v, jnp.ndarray) else jnp.asarray(v)
        c = self.Q.T @ flat
        from .linear import dense_solve
        corr = dense_solve(self.T, c) - c
        return flat + self.Q @ corr


@dataclasses.dataclass(frozen=True)
class BlockJacobiPrecond:
    """Inverse of the block diagonal: blocks (nb, bs, bs) pre-factorized
    (backend-aware: LU, or QR on TPU-f64 where XLA's LU expander rejects
    F64)."""

    fac: Any
    nb: int
    bs: int

    @classmethod
    def from_blocks(cls, blocks):
        from .linear import dense_factor
        fac = jax.vmap(dense_factor)(blocks)
        return cls(fac=fac, nb=blocks.shape[0], bs=blocks.shape[1])

    def __call__(self, v):
        from .linear import dense_factor_solve

        flat = jnp.asarray(v)
        vb = flat.reshape(self.nb, self.bs)
        out = jax.vmap(dense_factor_solve)(self.fac, vb)
        return out.reshape(flat.shape)
