"""Shooting discretizations (ref src/periodicorbit/StandardShooting.jl,
PoincareShooting.jl).

Standard shooting: M parallel segments, unknowns X = [x_0..x_{M-1}, T]:

    Phi_{T/M}(x_i) - x_{i+1 mod M} = 0   (M*n rows)   + phase (1 row)

The M flows evolve as one `vmap` batch — the reference's EnsembleProblem
thread parallelism (ref FlowDE.jl:86-99) becomes a TPU batch axis; on a
device mesh the segment axis shards over `branch`.

Poincare shooting: unknowns live in M hyperplane sections (dim n-1) plus the
M return times; the segment flows are again one vmap batch, and no phase
condition is needed (the sections fix the phase; ref PoincareShooting.jl:50).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .flow import Flow


@dataclasses.dataclass(frozen=True)
class Shooting:
    """Standard M-segment parallel shooting (ref Shooting,
    StandardShooting.jl:59)."""

    M: int = 5
    steps_per_segment: int = 60
    method: str = "dopri5"

    def unknown_size(self, n: int) -> int:
        return self.M * n + 1

    def split(self, X, n: int):
        return X[:-1].reshape(self.M, n), X[-1]

    def pack(self, u, T):
        return jnp.concatenate([u.ravel(), jnp.asarray(T)[None]])

    def period(self, X):
        return X[-1]

    def _flow(self, prob_vf):
        return Flow(prob_vf.F, steps=self.steps_per_segment,
                    method=self.method)

    def residual(self, prob_vf, X, po_par):
        params = po_par["_inner"]
        n = po_par["_xsec"].shape[0]
        u, T = self.split(X, n)
        fl = self._flow(prob_vf)
        ends = jax.vmap(lambda x: fl(x, params, T / self.M))(u)
        rows = ends - jnp.roll(u, -1, axis=0)
        phase = jnp.dot(u[0] - po_par["_xsec"], po_par["_phisec"])
        return jnp.concatenate([rows.ravel(), phase[None]])

    def monodromy(self, prob_vf, X, po_par):
        """Product of per-segment flow jacobians dPhi (ref FloquetQaD for
        shooting, Floquet.jl:164-254): batched jacfwd + scan chain."""
        params = po_par["_inner"]
        n = po_par["_xsec"].shape[0]
        u, T = self.split(X, n)
        fl = self._flow(prob_vf)
        dPhis = jax.vmap(
            lambda x: jax.jacfwd(lambda v: fl(v, params, T / self.M))(x))(u)

        def chain(Mn, i):
            return dPhis[i] @ Mn, None

        Mn, _ = jax.lax.scan(chain, jnp.eye(n, dtype=X.dtype),
                             jnp.arange(self.M))
        return Mn

    def generate_solution(self, orbit_fn, T, n: int):
        ts = np.linspace(0, 2 * np.pi, self.M, endpoint=False)
        u = jnp.stack([jnp.asarray(orbit_fn(t)) for t in ts])
        return self.pack(u, T)

    def section_data(self, prob_vf, X, params):
        n = np.asarray(prob_vf.u0).size
        u, T = self.split(X, n)
        phi = prob_vf.F(u[0], params)
        return {"_xsec": u[0], "_phisec": phi}


@dataclasses.dataclass(frozen=True)
class PoincareShooting:
    """Poincare shooting with hyperplane sections (ref PoincareShooting.jl).

    Unknowns X = [y_0..y_{M-1} (each n-1, hyperplane coordinates),
    t_0..t_{M-1} (return times)]; residual per segment:
    Phi_{t_i}(E_i(y_i)) - E_{i+1}(y_{i+1}) = 0  (n rows each).
    Sections are centers + normals stored in the parameter pytree
    (ref SectionPS, Sections.jl:87)."""

    M: int = 2
    steps_per_segment: int = 80
    method: str = "dopri5"

    def unknown_size(self, n: int) -> int:
        return self.M * (n - 1) + self.M

    def split(self, X, n: int):
        y = X[:self.M * (n - 1)].reshape(self.M, n - 1)
        ts = X[self.M * (n - 1):]
        return y, ts

    def pack(self, y, ts):
        return jnp.concatenate([y.ravel(), jnp.asarray(ts)])

    def period(self, X):
        return jnp.sum(X[-self.M:])

    def _flow(self, prob_vf):
        return Flow(prob_vf.F, steps=self.steps_per_segment,
                    method=self.method)

    @staticmethod
    def _basis(normal):
        """Orthonormal basis of the hyperplane orthogonal to `normal`
        (projection/expansion operators R, E, ref :188-215)."""
        n = normal.shape[0]
        nrm = normal / jnp.linalg.norm(normal)
        # complete to an orthonormal basis by QR of [normal, I]
        A = jnp.concatenate([nrm[:, None], jnp.eye(n)], axis=1)
        Q, _ = jnp.linalg.qr(A)
        return Q[:, 1:n]   # (n, n-1)

    def expand(self, y_i, center, normal):
        B = self._basis(normal)
        return center + B @ y_i

    def project(self, x, center, normal):
        B = self._basis(normal)
        return B.T @ (x - center)

    def residual(self, prob_vf, X, po_par):
        params = po_par["_inner"]
        centers = po_par["_centers"]      # (M, n)
        normals = po_par["_normals"]      # (M, n)
        n = centers.shape[1]
        y, ts = self.split(X, n)
        fl = self._flow(prob_vf)

        def seg(i):
            x_i = self.expand(y[i], centers[i], normals[i])
            x_end = fl(x_i, params, ts[i])
            ip1 = (i + 1) % self.M
            x_next = self.expand(y[ip1], centers[ip1], normals[ip1])
            return x_end - x_next

        rows = jax.vmap(seg)(jnp.arange(self.M))
        return rows.ravel()

    def monodromy(self, prob_vf, X, po_par):
        params = po_par["_inner"]
        centers = po_par["_centers"]
        normals = po_par["_normals"]
        n = centers.shape[1]
        y, ts = self.split(X, n)
        fl = self._flow(prob_vf)
        x0 = self.expand(y[0], centers[0], normals[0])
        T = jnp.sum(ts)
        return jax.jacfwd(lambda v: fl(v, params, T))(x0)

    def generate_solution(self, orbit_fn, T, n: int):
        ts_angle = np.linspace(0, 2 * np.pi, self.M, endpoint=False)
        pts = np.stack([np.asarray(orbit_fn(t)) for t in ts_angle])
        y = jnp.zeros((self.M, n - 1))
        times = jnp.full((self.M,), T / self.M)
        # store points as section centers later via section_data; unknowns
        # start at the section centers (y = 0)
        obj = self.pack(y, times)
        object.__setattr__(self, "_init_centers", jnp.asarray(pts))
        return obj

    def section_data(self, prob_vf, X, params):
        centers = getattr(self, "_init_centers", None)
        n = np.asarray(prob_vf.u0).size
        if centers is None:
            y, ts = self.split(X, n)
            centers = jnp.stack([jnp.asarray(prob_vf.u0)] * self.M)
        normals = jax.vmap(lambda c: prob_vf.F(c, params))(centers)
        normals = normals / jnp.linalg.norm(normals, axis=1, keepdims=True)
        return {"_inner": params, "_centers": centers, "_normals": normals}
