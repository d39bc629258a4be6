"""Pytree state algebra — the TPU-native replacement for the reference's
BorderedArrays + VectorInterface layer (ref: src/BorderedArrays.jl:23-238).

The reference wraps state vectors in a `BorderedArray(u, p)` so that the
(N+1)-dimensional PALC unknown never needs concatenation (and never indexes
`x[end]`, which is slow on accelerators — ref src/BorderedArrays.jl:9).

On TPU the natural analogue is a *pytree*: `BorderedState(u, p)` is a
registered pytree node, arbitrary nesting is free, and every algebraic verb
below (`tree_axpy`, `tree_dot`, …) maps over leaves with `jax.tree_util` so
XLA fuses the elementwise work.  Reductions return 0-d jax arrays so they can
live inside `jit`/`lax.while_loop` bodies; on a sharded mesh the same code is
valid inside `shard_map` provided dots are wrapped with `psum` (see
bifurcationkit.jl_tpu.parallel.pdot).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.flatten_util
import jax.numpy as jnp

Pytree = Any

# ---------------------------------------------------------------------------
# BorderedState
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BorderedState:
    """Composite state `(u, p)` used by PALC and augmented problems.

    `u` is any pytree (typically a 1-D jax array for PDE states); `p` is a
    scalar (or a small array for multi-parameter augmented problems, e.g.
    Hopf continuation carries p = [p, omega]; ref src/codim2/MinAugHopf.jl).
    """

    u: Pytree
    p: Any

    def tree_flatten(self):
        return (self.u, self.p), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # Convenience algebra (functional, returns new object)
    def __add__(self, other):
        return tree_add(self, other)

    def __sub__(self, other):
        return tree_sub(self, other)

    def __mul__(self, s):
        return tree_scale(self, s)

    __rmul__ = __mul__

    def copy(self):
        return jax.tree_util.tree_map(lambda x: x, self)


# ---------------------------------------------------------------------------
# Generic pytree verbs (ref VectorInterface verbs, src/BorderedArrays.jl:86-217)
# ---------------------------------------------------------------------------


def tree_add(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(a: Pytree, s) -> Pytree:
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_axpy(alpha, x: Pytree, y: Pytree) -> Pytree:
    """y + alpha * x (ref `VI.add!!(y, x, alpha)`)."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + alpha * xi, x, y)


def tree_axpby(alpha, x: Pytree, beta, y: Pytree) -> Pytree:
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + beta * yi, x, y)


def tree_zeros_like(a: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_conj(a: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.conj, a)


def tree_real(a: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.real, a)


def tree_dot(a: Pytree, b: Pytree):
    """Unconjugated dot product sum_i a_i b_i over all leaves."""
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_vdot(a: Pytree, b: Pytree):
    """Conjugated dot product sum_i conj(a_i) b_i (ref `VI.inner`)."""
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(jnp.conj(x) * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_norm(a: Pytree):
    """L2 norm over all leaves."""
    return jnp.sqrt(jnp.real(tree_vdot(a, a)))


def tree_norm_inf(a: Pytree):
    leaves = jax.tree_util.tree_map(lambda x: jnp.max(jnp.abs(x)), a)
    return jax.tree_util.tree_reduce(jnp.maximum, leaves)


def tree_size(a: Pytree) -> int:
    """Static total number of scalar entries (python int)."""
    return sum(int(jnp.size(leaf)) for leaf in jax.tree_util.tree_leaves(a))


def tree_randn_like(key, a: Pytree) -> Pytree:
    """Random normal pytree with same structure (ref `_randn`)."""
    leaves, treedef = jax.tree_util.tree_flatten(a)
    keys = jax.random.split(key, len(leaves))
    new = [jax.random.normal(k, jnp.shape(l), _float_dtype(l))
           for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def _float_dtype(leaf):
    dt = jnp.asarray(leaf).dtype
    if jnp.issubdtype(dt, jnp.floating) or jnp.issubdtype(dt, jnp.complexfloating):
        return dt
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# ---------------------------------------------------------------------------
# Flattening helpers for dense linear algebra
# ---------------------------------------------------------------------------


def ravel(a: Pytree):
    """Flatten a pytree state to a 1-D array; returns (flat, unravel_fn)."""
    return jax.flatten_util.ravel_pytree(a)


# ---------------------------------------------------------------------------
# DotTheta — the weighted PALC dot product (ref src/continuation/Palc.jl:23-41)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DotTheta:
    """Weighted dot `<(u1,p1),(u2,p2)>_theta = theta*Re<u1,u2>/N + (1-theta)*p1*p2`.

    The 1/N normalization matches the reference's `NormalisedDot`
    (ref src/continuation/Palc.jl:1-5); it keeps theta meaningful when the
    state dimension is large.  A custom un-normalized dot can be supplied for
    mesh-adaptive problems.
    """

    normalize: bool = True

    def dot(self, u1, u2, n: int):
        d = jnp.real(tree_vdot(u1, u2))
        return d / n if self.normalize else d

    def dot_theta(self, u1, u2, p1, p2, theta, n: int):
        return self.dot(u1, u2, n) * theta + jnp.real(p1 * p2) * (1.0 - theta)

    def norm_theta(self, u, p, theta, n: int):
        return jnp.sqrt(self.dot_theta(u, u, p, p, theta, n))

    def dot_bs(self, a: BorderedState, b: BorderedState, theta, n: int):
        return self.dot_theta(a.u, b.u, a.p, b.p, theta, n)

    def norm_bs(self, a: BorderedState, theta, n: int):
        return self.norm_theta(a.u, a.p, theta, n)


def arc_length_eq(dot_t: DotTheta, u, p, du, dp, theta, ds, n: int):
    """PALC constraint N(x, p) (ref src/continuation/Palc.jl:44)."""
    return dot_t.dot_theta(u, du, p, dp, theta, n) - ds
