"""Device-mesh helpers (the TPU replacement for the reference's absent
distributed backend — SURVEY §2.3).

The framework's two parallel axes:

* ``space``  — row/block partition of the PDE state (the sequence-parallel
  analog): stencil/SpMV halo exchanges ride ICI via the collectives XLA
  inserts for `jnp.roll`/slicing under sharding constraints;
* ``branch`` — embarrassingly parallel work units (deflated-continuation
  branches, multiple-shooting segments, ensemble flows) — the data-parallel
  analog.

All reductions (Newton norms, PALC dots, GMRES inner products) are plain
`jnp.sum`/`vdot` on sharded arrays, so XLA lowers them to `psum` over the
mesh automatically; nothing in the solver stack needs explicit collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("branch", "space"),
              devices=None) -> Mesh:
    """Create a mesh over the available devices.

    Default: all devices on the `space` axis (1 x N mesh), matching
    row-partitioned SpMV; pass shape=(b, s) for branch x space hybrids."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def shard_state(mesh: Mesh, u, axis: str = "space", dim: int = 0):
    """Place a state array on the mesh, sharded along `dim` over `axis`."""
    spec = [None] * u.ndim
    spec[dim] = axis
    return jax.device_put(u, NamedSharding(mesh, P(*spec)))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
