"""Sparse matrix containers for TPU (replaces SuiteSparse/SparseArrays in the
reference's PDE jacobian path — SURVEY §2.2).

TPU-native formats (no scatter/gather in the hot loop):

* `DIAMatrix` — diagonal storage: data (ndiags, n) + offsets.  SpMV is a sum
  of shifted elementwise products — the speed-of-light format for
  stencil-structured PDE jacobians (every example in the reference: chan,
  brusselator, SH, cGL).  Fully fusable by XLA; also available as a Pallas
  kernel (ops.pallas_spmv).
* `ELLMatrix` — padded rows: data (n, k) + cols (n, k).  General sparsity
  with bounded row degree; SpMV is one gather + reduce.
* `BSRMatrix` — block-ELL: blocks (nb, k, bs, bs) + bcols (nb, k).  SpMV is
  an einsum over (bs, bs) blocks: MXU work for bs >= 8, and the natural
  container for multi-component PDE systems.

All are registered pytrees, so they pass through `jit`/`vmap`/solvers as
jacobian representations (they are callables: J(v) = J @ v).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DIAMatrix:
    data: Any            # (ndiags, n)
    offsets: Tuple[int, ...]   # static

    def tree_flatten(self):
        return (self.data,), self.offsets

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def shape(self):
        n = self.data.shape[1]
        return (n, n)

    @property
    def nnz(self):
        return self.data.shape[0] * self.data.shape[1]

    def __call__(self, v):
        return self.matvec(v)

    def matvec(self, v):
        """sum_d data[d, i] * v[i + off_d] (zero padded).

        Shifts lower to pad+slice (measured at full HBM bandwidth on TPU —
        concatenate/scatter variants are 10-20x slower); XLA fuses the whole
        sum into one pass."""
        out = None
        for k, off in enumerate(self.offsets):
            if off == 0:
                shifted = v
            elif off > 0:
                shifted = jnp.pad(v, (0, off))[off:]
            else:
                shifted = jnp.pad(v, (-off, 0))[:off]
            term = self.data[k] * shifted
            out = term if out is None else out + term
        return out

    def todense(self):
        n = self.data.shape[1]
        A = jnp.zeros((n, n), self.data.dtype)
        for k, off in enumerate(self.offsets):
            if off >= 0:
                idx = jnp.arange(n - off)
                A = A.at[idx, idx + off].set(self.data[k, :n - off])
            else:
                o = -off
                idx = jnp.arange(n - o)
                A = A.at[idx + o, idx].set(self.data[k, o:])
        return A

    @classmethod
    def from_dense(cls, A, offsets: Sequence[int]):
        A = np.asarray(A)
        n = A.shape[0]
        data = np.zeros((len(offsets), n), A.dtype)
        for k, off in enumerate(offsets):
            if off >= 0:
                data[k, :n - off] = np.diag(A, off)
            else:
                data[k, -off:] = np.diag(A, off)
        return cls(jnp.asarray(data), tuple(offsets))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ELLMatrix:
    data: Any      # (n, k)
    cols: Any      # (n, k) int32; -1 = padding

    def tree_flatten(self):
        return (self.data, self.cols), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        n = self.data.shape[0]
        return (n, n)

    @property
    def nnz(self):
        return int(self.data.shape[0] * self.data.shape[1])

    def __call__(self, v):
        return self.matvec(v)

    def matvec(self, v):
        mask = self.cols >= 0
        safe = jnp.where(mask, self.cols, 0)
        vals = v[safe] * jnp.where(mask, self.data, 0.0)
        return jnp.sum(vals, axis=1)

    @classmethod
    def from_scipy(cls, A):
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n = A.shape[0]
        k = int(np.diff(A.indptr).max())
        data = np.zeros((n, k), A.dtype)
        cols = np.full((n, k), -1, np.int32)
        for i in range(n):
            row = slice(A.indptr[i], A.indptr[i + 1])
            nzi = A.indptr[i + 1] - A.indptr[i]
            data[i, :nzi] = A.data[row]
            cols[i, :nzi] = A.indices[row]
        return cls(jnp.asarray(data), jnp.asarray(cols))

    def todense(self):
        n, k = self.data.shape
        A = jnp.zeros((n, n), self.data.dtype)
        mask = self.cols >= 0
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
        safe = jnp.where(mask, self.cols, 0)
        return A.at[rows, safe].add(jnp.where(mask, self.data, 0.0))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BSRMatrix:
    blocks: Any    # (nbrows, k, bs, bs)
    bcols: Any     # (nbrows, k) int32; -1 = padding

    def tree_flatten(self):
        return (self.blocks, self.bcols), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def bs(self):
        return self.blocks.shape[2]

    @property
    def shape(self):
        n = self.blocks.shape[0] * self.bs
        return (n, n)

    @property
    def nnz(self):
        return int(np.prod(self.blocks.shape))

    def __call__(self, v):
        return self.matvec(v)

    def matvec(self, v):
        nb, k, bs, _ = self.blocks.shape
        vb = v.reshape(nb, bs)
        mask = self.bcols >= 0
        safe = jnp.where(mask, self.bcols, 0)
        vg = vb[safe]                       # (nb, k, bs)
        out = jnp.einsum("rkij,rkj->ri",
                         jnp.where(mask[..., None, None], self.blocks, 0.0),
                         vg)
        return out.reshape(-1)

    def diag_blocks(self):
        """Extract diagonal blocks (for BlockJacobiPrecond)."""
        nb, k, bs, _ = self.blocks.shape
        rows = jnp.arange(nb)
        isdiag = self.bcols == rows[:, None]
        return jnp.einsum("rk,rkij->rij", isdiag.astype(self.blocks.dtype),
                          self.blocks)


def laplacian_1d_dia(n: int, h: float, dtype=jnp.float64) -> DIAMatrix:
    """Standard Dirichlet 1D Laplacian as a DIA matrix."""
    main = jnp.full((n,), -2.0 / h ** 2, dtype)
    off = jnp.full((n,), 1.0 / h ** 2, dtype)
    return DIAMatrix(jnp.stack([off, main, off]), (-1, 0, 1))
