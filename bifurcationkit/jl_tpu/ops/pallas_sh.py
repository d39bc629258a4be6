"""Fused Swift-Hohenberg J.v Pallas kernel (the bench north-star workload).

J v = -(I + Lap)^2 v + (l + 2 nu u - 3 u^2) v  on an (N, M) grid with the
reference's Neumann closure (edge replication, ref examples/SH2d-fronts.jl:
20-24).  The XLA lowering of the 4 chained stencil passes round-trips the
intermediates through HBM (~5x the minimal traffic); this kernel keeps the
whole radius-2 computation in VMEM: one read of u and v, one write of the
output, with a 2-row halo streamed from the neighbouring row blocks.

Scalars (l, nu, 1/hx2, 1/hy2) arrive through SMEM so the continuation
parameter stays traced (no retrace per continuation step).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_rows(a, k):
    """a shifted by k rows (k in {-1, +1}), edge rows handled by caller."""
    if k == -1:
        return jnp.concatenate([a[:1], a[:-1]], axis=0)
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def _lap_y(a, inv_hy2):
    """Column Laplacian with edge replication (global in y: columns are
    fully resident per block)."""
    left = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    return (left - 2.0 * a + right) * inv_hy2


def _sh_jv_kernel(scal, vp, vc, vn, uc, out):
    """One (B, M) output row block; vp/vc/vn are the previous/current/next
    v row blocks (halo source), uc the current u block."""
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    l = scal[0]
    nu = scal[1]
    inv_hx2 = scal[2]
    inv_hy2 = scal[3]

    B = vc.shape[0]
    first = i == 0
    last = i == nblk - 1

    # v halo rows -2..-1 and B..B+1 (edge replication at the global ends)
    top2 = jnp.where(first, jnp.broadcast_to(vc[:1], (2, vc.shape[1])),
                     vp[B - 2:B])
    bot2 = jnp.where(last, jnp.broadcast_to(vc[B - 1:B], (2, vc.shape[1])),
                     vn[:2])
    vext = jnp.concatenate([top2, vc[:], bot2], axis=0)     # (B+4, M)

    # w = v + Lap v on padded rows -1..B  (padded index 1..B+2)
    lap_x = (vext[:-2] - 2.0 * vext[1:-1] + vext[2:]) * inv_hx2  # rows -1..B
    vmid = vext[1:-1]                                            # rows -1..B
    w = vmid + lap_x + _lap_y(vmid, inv_hy2)                     # (B+2, M)

    # global edge replication at the w level (the second lap's closure);
    # scatter is not lowerable on TPU Pallas, so rebuild by concatenation
    row0 = jnp.where(first, w[1:2], w[0:1])
    rowL = jnp.where(last, w[B:B + 1], w[B + 1:B + 2])
    w = jnp.concatenate([row0, w[1:B + 1], rowL], axis=0)

    wmid = w[1:-1]                                               # rows 0..B-1
    lap_wx = (w[:-2] - 2.0 * wmid + w[2:]) * inv_hx2
    L1v = wmid + lap_wx + _lap_y(wmid, inv_hy2)

    u = uc[:]
    v = vc[:]
    out[:] = -L1v + (l + 2.0 * nu * u - 3.0 * u * u) * v


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def sh_jv_pallas(u, v, scal, block_rows: int = 128,
                 interpret: bool = False):
    """Fused J.v for the 2D Swift-Hohenberg operator.

    u, v: (N, M) f32/f64 fields; scal: (4,) array [l, nu, 1/hx2, 1/hy2].
    Requires N % block_rows == 0 and M % 128 == 0 (see sh_jv_supported)."""
    N, M = u.shape
    B = block_rows
    nblk = N // B
    grid_spec = pl.GridSpec(
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # all-int32 indices: with jax x64 on, jnp index arithmetic
            # yields i64, which Mosaic's index-map transform cannot legalize
            pl.BlockSpec((B, M),
                         lambda i: (jnp.maximum(i - 1, 0)
                                    .astype(jnp.int32), jnp.int32(0))),
            pl.BlockSpec((B, M), lambda i: (i, jnp.int32(0))),
            pl.BlockSpec((B, M),
                         lambda i, _n=nblk: (jnp.minimum(i + 1, _n - 1)
                                             .astype(jnp.int32),
                                             jnp.int32(0))),
            pl.BlockSpec((B, M), lambda i: (i, jnp.int32(0))),
        ],
        out_specs=pl.BlockSpec((B, M), lambda i: (i, jnp.int32(0))),
    )
    # trace the kernel in i32 mode: the package enables x64 globally, and
    # Mosaic cannot legalize i64 index-map arithmetic
    with jax.enable_x64(False):
        return pl.pallas_call(
            _sh_jv_kernel,
            out_shape=jax.ShapeDtypeStruct((N, M), u.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(scal, v, v, v, u)


def sh_jv_supported(shape, dtype=jnp.float32, block_rows: int = 128) -> bool:
    """The fused kernel needs TPU-tileable shapes."""
    N, M = shape
    return (N % block_rows == 0) and (M % 128 == 0)


def sh_jv_reference(u, v, scal, hx2=None, hy2=None):
    """The unfused XLA formulation (for parity checks)."""
    from ..models.sh import _lap_neumann

    l, nu, inv_hx2, inv_hy2 = scal[0], scal[1], scal[2], scal[3]

    def lap(a):
        return (_lap_neumann(a, 1.0 / inv_hx2, 0)
                + _lap_neumann(a, 1.0 / inv_hy2, 1))

    w = v + lap(v)
    L1v = w + lap(w)
    return -L1v + (l + 2.0 * nu * u - 3.0 * u * u) * v
