"""Explicit halo-exchange SpMV over a device mesh (SURVEY §2.3).

`sharded_dia_spmv` row-partitions a DIA matrix over the mesh's `space` axis
inside `shard_map`: each device computes its local row block while the
wrap-around neighbor entries arrive by `lax.ppermute` over ICI; the halo
transfer is issued before the bulk local compute so XLA overlaps it.
`pdot`/`pnorm` are the mesh-aware reductions every Newton/PALC/GMRES inner
product lowers to (`psum`).

This is the hand-written counterpart of the automatic path (annotate
shardings, let XLA insert collectives) used by the rest of the framework —
useful when the schedule must be pinned, and the template for multi-host
(DCN) runs.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sparse import DIAMatrix


def pdot(x, y, axis: str = "space"):
    """Global dot product of `space`-sharded vectors (inside shard_map)."""
    return lax.psum(jnp.sum(x * y), axis)


def pnorm(x, axis: str = "space"):
    return jnp.sqrt(lax.psum(jnp.sum(x * x), axis))


def sharded_dia_spmv(mesh: Mesh, A: DIAMatrix, v, axis: str = "space"):
    """Row-partitioned DIA SpMV with explicit ppermute halo exchange.

    Requires every |offset| <= local block size.  Zero (Dirichlet-style)
    boundaries: the halos that would wrap around the global domain are
    masked on the first/last shard.
    """
    n = v.shape[0]
    nshards = mesh.shape[axis]
    assert n % nshards == 0, "state size must divide the mesh axis"
    local = n // nshards
    max_neg = max(0, -min(A.offsets))
    max_pos = max(0, max(A.offsets))
    h = max(max_neg, max_pos, 1)
    assert h <= local, "halo wider than the local block"
    offsets = A.offsets

    fwd = [(i, (i + 1) % nshards) for i in range(nshards)]
    bwd = [(i, (i - 1) % nshards) for i in range(nshards)]

    def kernel(data_blk, v_blk):
        idx = lax.axis_index(axis)
        # issue both halo transfers first: XLA overlaps them with the
        # offset-0 local work below
        from_left = lax.ppermute(v_blk[-h:], axis, perm=fwd)
        from_right = lax.ppermute(v_blk[:h], axis, perm=bwd)
        # zero the wrap-around halos at the global boundary
        from_left = jnp.where(idx == 0, 0.0, from_left)
        from_right = jnp.where(idx == nshards - 1, 0.0, from_right)
        v_ext = jnp.concatenate([from_left, v_blk, from_right])

        out = None
        for k, off in enumerate(offsets):
            shifted = lax.dynamic_slice_in_dim(v_ext, h + off, local)
            term = data_blk[k] * shifted
            out = term if out is None else out + term
        return out

    spmv = jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, axis), P(axis)), out_specs=P(axis)))
    return spmv(A.data, v)


def sharded_gmres_matvec(mesh: Mesh, A: DIAMatrix, axis: str = "space"):
    """Matvec closure for the Krylov solvers: global arrays in, XLA keeps
    them sharded across calls."""

    def mv(v):
        return sharded_dia_spmv(mesh, A, v, axis=axis)

    return mv
