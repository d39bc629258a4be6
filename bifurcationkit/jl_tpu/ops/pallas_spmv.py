"""Pallas TPU kernel for DIA-format SpMV.

The halo is expressed through BlockSpecs: the padded v is passed (2h+1)
times with shifted tile index maps (previous / current / next tiles), so
every load is an aligned TILE block chosen by the pipeline; the
per-diagonal shifts are static in-register slices of the concatenated
window.  One pass over HBM per operand — bandwidth-bound by construction.

Falls back to the pure-jnp matvec on non-TPU backends.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .sparse import DIAMatrix

TILE = 8 * 128          # one f32 vreg row block


def _dia_kernel(offsets, halo_tiles, *refs):
    nwin = 2 * halo_tiles + 1
    vrefs = refs[:nwin]
    data_ref = refs[nwin]
    out_ref = refs[nwin + 1]

    W = jnp.concatenate([r[...] for r in vrefs], axis=0)
    base = halo_tiles * TILE
    acc = jnp.zeros((TILE,), out_ref.dtype)
    for k, off in enumerate(offsets):
        vblk = jax.lax.slice_in_dim(W, base + off, base + off + TILE)
        acc = acc + data_ref[k, :] * vblk
    out_ref[...] = acc


def dia_spmv_pallas(A: DIAMatrix, v, interpret: bool = False):
    """Fused DIA SpMV (pads n to a TILE multiple internally)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = v.shape[0]
    if n % TILE != 0:
        pad = TILE - n % TILE
        vp = jnp.pad(v, (0, pad))
        dp = jnp.pad(A.data, ((0, 0), (0, pad)))
        out = dia_spmv_pallas(DIAMatrix(dp, A.offsets), vp,
                              interpret=interpret)
        return out[:n]

    max_off = max(max(abs(o) for o in A.offsets), 1)
    halo_tiles = -(-max_off // TILE)
    pad_side = halo_tiles * TILE
    vpad = jnp.pad(v, (pad_side, pad_side))
    nwin = 2 * halo_tiles + 1

    grid = (n // TILE,)
    # vpad tile j corresponds to original tile j - halo_tiles; the window
    # for output tile i is vpad tiles i .. i + 2*halo_tiles
    def _i32(x):
        # index maps must stay int32 even with jax_enable_x64
        return jnp.asarray(x, jnp.int32)

    v_specs = [pl.BlockSpec((TILE,), (lambda i, s=s: (_i32(i + s),)),
                            memory_space=pltpu.VMEM)
               for s in range(nwin)]
    data_spec = pl.BlockSpec((A.data.shape[0], TILE),
                             lambda i: (_i32(0), _i32(i)),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE,), lambda i: (_i32(i),),
                            memory_space=pltpu.VMEM)

    kernel = partial(_dia_kernel, A.offsets, halo_tiles)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n,), v.dtype),
        grid=grid,
        in_specs=v_specs + [data_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(*([vpad] * nwin), A.data)


def dia_spmv(A: DIAMatrix, v, use_pallas: bool = False):
    """DIA SpMV dispatch.

    Default = the XLA pad+slice matvec, measured at ~full HBM bandwidth on
    v5e (984 GB/s, 176 Gnnz/s for a 5-diagonal 1M-row matrix — docs/PERF.md).
    A standalone generic Pallas DIA kernel cannot beat a bandwidth-bound op
    that already saturates the memory system, so it is deliberately NOT the
    default; Pallas earns its keep where FUSION across op boundaries is the
    win — see the SH stencil J.v kernel (ops/pallas_sh.py), which beats the
    XLA lowering by keeping the whole radius-2 window in VMEM.

    `use_pallas=True` opts into the standalone kernel explicitly; it
    requires a TPU backend and raises on anything else (no silent
    fallback)."""
    if use_pallas:
        if jax.default_backend() != "tpu":
            raise ValueError(
                "dia_spmv(use_pallas=True) requires the TPU backend; the "
                "default XLA lowering is the supported path elsewhere")
        return dia_spmv_pallas(A, v)
    return A.matvec(v)
