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


def sharded_sh_jv(mesh: Mesh, u, v, scal, axis: str = "space"):
    """Row-partitioned fused Swift-Hohenberg J.v over a device mesh: the
    multi-chip version of `ops.pallas_sh.sh_jv_pallas` — the 2-row halo of v
    arrives by `lax.ppermute` over ICI before the bulk stencil work (so XLA
    overlaps transfer and compute), global Neumann edges replicate on the
    first/last shard.  u, v: (N, M); scal: (4,) = [l, nu, 1/hx2, 1/hy2].
    Exactly matches the single-chip operator (SURVEY hard part:
    'halo-overlap in the Pallas SpMV')."""
    N, M = u.shape
    nshards = mesh.shape[axis]
    assert N % nshards == 0 and N // nshards >= 2
    fwd = [(i, (i + 1) % nshards) for i in range(nshards)]
    bwd = [(i, (i - 1) % nshards) for i in range(nshards)]

    def kernel(u_blk, v_blk, sc):
        idx = lax.axis_index(axis)
        l, nu, inv_hx2, inv_hy2 = sc[0], sc[1], sc[2], sc[3]
        B = v_blk.shape[0]
        # halo first: overlapped with the pointwise work below
        from_up = lax.ppermute(v_blk[-2:], axis, perm=fwd)
        from_dn = lax.ppermute(v_blk[:2], axis, perm=bwd)
        first = idx == 0
        last = idx == nshards - 1
        top2 = jnp.where(first, jnp.broadcast_to(v_blk[:1], (2, M)),
                         from_up)
        bot2 = jnp.where(last, jnp.broadcast_to(v_blk[B - 1:B], (2, M)),
                         from_dn)
        vext = jnp.concatenate([top2, v_blk, bot2], axis=0)   # (B+4, M)

        def lap_y(a):
            left = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
            right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
            return (left - 2.0 * a + right) * inv_hy2

        lap_x = (vext[:-2] - 2.0 * vext[1:-1] + vext[2:]) * inv_hx2
        vmid = vext[1:-1]
        w = vmid + lap_x + lap_y(vmid)                         # (B+2, M)
        row0 = jnp.where(first, w[1:2], w[0:1])
        rowL = jnp.where(last, w[B:B + 1], w[B + 1:B + 2])
        w = jnp.concatenate([row0, w[1:B + 1], rowL], axis=0)
        wmid = w[1:-1]
        lap_wx = (w[:-2] - 2.0 * wmid + w[2:]) * inv_hx2
        L1v = wmid + lap_wx + lap_y(wmid)
        return -L1v + (l + 2.0 * nu * u_blk - 3.0 * u_blk * u_blk) * v_blk

    jv = jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=P(axis, None)))
    return jv(u, v, scal)


def sharded_gmres_matvec(mesh: Mesh, A: DIAMatrix, axis: str = "space"):
    """Matvec closure for the Krylov solvers: global arrays in, XLA keeps
    them sharded across calls."""

    def mv(v):
        return sharded_dia_spmv(mesh, A, v, axis=axis)

    return mv
