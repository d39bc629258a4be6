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
    # adaptive error-controlled flows (ref the SciML abstol/reltol the
    # reference exposes, FlowDE.jl:41-99; e.g. Rodas4P in
    # examples/brusselatorShooting.jl:165-171 -> method="rodas3" here)
    adaptive: bool = False
    rtol: float = 1e-7
    atol: float = 1e-9
    max_steps: int = 256

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
                    method=self.method, adaptive=self.adaptive,
                    rtol=self.rtol, atol=self.atol, max_steps=self.max_steps)

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

    def monodromy_operator(self, prob_vf, X, po_par, linsolver=None):
        """MATRIX-FREE monodromy v -> M v: the chain of per-segment flow
        jvps, never materializing the (n, n) matrix (ref the matrix-free
        FloquetQaD operator, Floquet.jl:89-109 and the MF shooting variant
        :164-254, exercised by examples/codim2PO-sh-mf.jl).  Each
        application integrates the variational equation along the orbit
        via `jax.jvp` through the integrator — O(M * steps * n) work and
        memory, so PDE-scale shooting stability (n >~ 10^3, where a
        `jacfwd` monodromy is n times that) stays feasible.  Feed it to
        `FloquetQaDMF` (Krylov :LM on the operator)."""
        from ..linalg.eig import FlatOperator

        params = po_par["_inner"]
        n = po_par["_xsec"].shape[0]
        u, T = self.split(X, n)
        fl = self._flow(prob_vf)

        def Mv(v):
            def seg(vc, x):
                _, jv = jax.jvp(lambda w: fl(w, params, T / self.M),
                                (x,), (vc,))
                return jv, None

            out, _ = jax.lax.scan(seg, v, u)
            return out

        return FlatOperator(Mv, n, X.dtype)

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
    # adaptive error control for the free-time segment flows (the
    # section-crossing scan keeps its fixed grid — the event location
    # needs equispaced samples)
    adaptive: bool = False
    rtol: float = 1e-7
    atol: float = 1e-9
    max_steps: int = 256
    # event-driven mode (the reference's formulation, PoincareShooting.jl:50):
    # unknowns are ONLY the hyperplane coordinates; each segment integrates
    # until it CROSSES the next section.  The crossing is located by a
    # fixed-length scan (first upward sign change of the section function —
    # XLA-compatible, unlike a while_loop which blocks AD) and refined by 3
    # Newton corrections on the crossing time, so the composed map is
    # differentiable (implicit-function derivative through the refinement).
    event_driven: bool = False
    horizon: float = 1.8     # integrate up to horizon * t_hint per segment
    newton_time_steps: int = 3

    def unknown_size(self, n: int) -> int:
        if self.event_driven:
            return self.M * (n - 1)
        return self.M * (n - 1) + self.M

    def split(self, X, n: int):
        if self.event_driven:
            return X.reshape(self.M, n - 1), None
        y = X[:self.M * (n - 1)].reshape(self.M, n - 1)
        ts = X[self.M * (n - 1):]
        return y, ts

    def pack(self, y, ts):
        return jnp.concatenate([y.ravel(), jnp.asarray(ts)])

    def period(self, X):
        if self.event_driven:
            # the period is an OUTPUT of the event-driven integration, not a
            # function of the unknowns alone; use period_par
            return jnp.nan
        return jnp.sum(X[-self.M:])

    def period_par(self, prob_vf, X, po_par):
        return jnp.sum(self.crossing_times(prob_vf, X, po_par))

    def _flow(self, prob_vf):
        return Flow(prob_vf.F, steps=self.steps_per_segment,
                    method=self.method, adaptive=self.adaptive,
                    rtol=self.rtol, atol=self.atol, max_steps=self.max_steps)

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

    def _flow_to_section(self, prob_vf, x0, params, c, nrm, t_hint):
        """Integrate from x0 until the first upward crossing of the
        hyperplane {<x - c, nrm> = 0}, refined by Newton on the crossing
        time (ref section-crossing callbacks, ShootingDE.jl).  Returns
        (x_cross, tau)."""
        K = self.steps_per_segment
        dt = t_hint * self.horizon / K
        small = Flow(prob_vf.F, steps=1, method=self.method)

        def step(x, _):
            x2 = small(x, params, dt)
            return x2, x2

        _, traj = jax.lax.scan(step, x0, None, length=K)
        s = (traj - c[None, :]) @ nrm
        s0 = jnp.dot(x0 - c, nrm)
        prev = jnp.concatenate([s0[None], s[:-1]])
        kmin = max(1, K // 10)
        mask = (prev < 0) & (s >= 0) & (jnp.arange(K) >= kmin)
        has = jnp.any(mask)
        idx = jnp.where(has, jnp.argmax(mask), K - 1)
        x_c = traj[idx]
        tau = (idx + 1.0) * dt

        for _ in range(self.newton_time_steps):
            sv = jnp.dot(x_c - c, nrm)
            dsv = jnp.dot(prob_vf.F(x_c, params), nrm)
            dtau = -sv / dsv
            x_c = small(x_c, params, dtau)
            tau = tau + dtau
        return x_c, tau

    def crossing_times(self, prob_vf, X, po_par):
        """Per-segment section-return times at the current unknowns
        (event-driven mode): the period is their sum."""
        params = po_par["_inner"]
        centers = po_par["_centers"]
        normals = po_par["_normals"]
        thint = po_par["_thint"]
        n = centers.shape[1]
        y, _ = self.split(X, n)

        def seg(i):
            x_i = self.expand(y[i], centers[i], normals[i])
            ip1 = (i + 1) % self.M
            _, tau = self._flow_to_section(prob_vf, x_i, params,
                                           centers[ip1], normals[ip1],
                                           thint[i])
            return tau

        return jax.vmap(seg)(jnp.arange(self.M))

    def residual(self, prob_vf, X, po_par):
        params = po_par["_inner"]
        centers = po_par["_centers"]      # (M, n)
        normals = po_par["_normals"]      # (M, n)
        n = centers.shape[1]
        y, ts = self.split(X, n)
        fl = self._flow(prob_vf)

        if self.event_driven:
            thint = po_par["_thint"]

            def seg(i):
                x_i = self.expand(y[i], centers[i], normals[i])
                ip1 = (i + 1) % self.M
                x_c, _ = self._flow_to_section(prob_vf, x_i, params,
                                               centers[ip1], normals[ip1],
                                               thint[i])
                # fixed point of the composed Poincare maps in hyperplane
                # coordinates: R_{i+1}(P_i(E_i y_i)) - y_{i+1} = 0
                return self.project(x_c, centers[ip1], normals[ip1]) - y[ip1]

            rows = jax.vmap(seg)(jnp.arange(self.M))
            return rows.ravel()

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
        if self.event_driven:
            T = jnp.sum(jax.lax.stop_gradient(
                self.crossing_times(prob_vf, X, po_par)))
        else:
            T = jnp.sum(ts)
        return jax.jacfwd(lambda v: fl(v, params, T))(x0)

    def generate_solution(self, orbit_fn, T, n: int):
        ts_angle = np.linspace(0, 2 * np.pi, self.M, endpoint=False)
        pts = np.stack([np.asarray(orbit_fn(t)) for t in ts_angle])
        y = jnp.zeros((self.M, n - 1))
        object.__setattr__(self, "_init_centers", jnp.asarray(pts))
        object.__setattr__(self, "_init_times",
                           jnp.full((self.M,), T / self.M))
        if self.event_driven:
            return y.ravel()
        return self.pack(y, jnp.full((self.M,), T / self.M))

    def section_data(self, prob_vf, X, params, po_par=None):
        centers = getattr(self, "_init_centers", None)
        n = np.asarray(prob_vf.u0).size
        if centers is None:
            centers = jnp.stack([jnp.asarray(prob_vf.u0)] * self.M)
        normals = jax.vmap(lambda c: prob_vf.F(c, params))(centers)
        normals = normals / jnp.linalg.norm(normals, axis=1, keepdims=True)
        out = {"_inner": params, "_centers": centers, "_normals": normals}
        if self.event_driven:
            if po_par is not None and "_thint" in po_par:
                out["_thint"] = self.crossing_times(
                    prob_vf, X, {**po_par, "_inner": params,
                                 "_centers": centers, "_normals": normals})
            else:
                out["_thint"] = getattr(
                    self, "_init_times", jnp.ones((self.M,)))
        return out
