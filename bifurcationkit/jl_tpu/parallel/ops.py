"""Mesh-partitionable PDE operators.

Stencil applications written with `jnp.roll` so that, under a sharding
constraint on the space axis, XLA lowers the wrap-around neighbors to
`ppermute` halo exchanges on ICI and fuses the arithmetic — the
row-partitioned SpMV of SURVEY §2.3 without hand-written collectives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def periodic_laplacian_2d(u: jnp.ndarray, hx: float, hy: float):
    """5-point periodic Laplacian; partitions along either axis."""
    return ((jnp.roll(u, 1, 0) - 2 * u + jnp.roll(u, -1, 0)) / hx ** 2
            + (jnp.roll(u, 1, 1) - 2 * u + jnp.roll(u, -1, 1)) / hy ** 2)


def sh_operator_2d(u: jnp.ndarray, hx: float, hy: float):
    """Swift-Hohenberg linear operator -(I + Delta)^2 u
    (ref examples/SH2d-fronts.jl:8-32 builds the same bilaplacian operator
    as a sparse matrix; here it is a fused 13-point stencil)."""
    v = u + periodic_laplacian_2d(u, hx, hy)
    return -(v + periodic_laplacian_2d(v, hx, hy))


def sh_residual_2d(u, params, hx, hy):
    """Swift-Hohenberg 2D residual: -(I+Delta)^2 u + l*u + nu*u^2 - u^3
    (ref examples/SH2d-fronts.jl:35-42)."""
    l = params["l"]
    nu = params["nu"]
    return sh_operator_2d(u, hx, hy) + l * u + nu * u * u - u * u * u
