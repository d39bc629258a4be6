"""Orthogonal collocation periodic-orbit discretization
(ref src/periodicorbit/PeriodicOrbitCollocation.jl).

Per coarse-mesh interval j (Ntst intervals), the state is interpolated by the
Lagrange basis on m+1 equispaced nodes sigma in [-1,1] and collocated at the
m Gauss-Legendre points (ref MeshCollocationCache, :23-132):

    residual[j, i] = sum_l dL[l,i] u_{j,l} - (T d_j / 2) F(sum_l L[l,i] u_{j,l})

Unknown X = [nodes (Ntst*m + 1, n) flattened, T]; rows = collocation
(Ntst*m*n) + periodicity (n) + phase (1).

TPU shape: the (m+1, m) Lagrange matrices contract against all intervals in
one einsum (MXU), the vector field evaluates as one (Ntst*m)-way vmap, and
the Floquet monodromy is a vmapped batch of per-interval dense solves chained
by `lax.scan` — precisely the reference's COP stage-1/stage-2 structure
(ref Floquet.jl:602-760) as native XLA batch linear algebra.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def legendre_matrices(m: int):
    """L, dL ((m+1, m)), Gauss nodes & weights (m,) — Lagrange basis on the
    equispaced sigma-mesh evaluated at Gauss points
    (ref compute_legendre_matrices, PeriodicOrbitCollocation.jl:90-105)."""
    sigmas = np.linspace(-1.0, 1.0, m + 1)
    zg, wg = np.polynomial.legendre.leggauss(m)

    def lagrange(i, x):
        l = 1.0
        for k in range(m + 1):
            if k != i:
                l = l * (x - sigmas[k]) / (sigmas[i] - sigmas[k])
        return l

    def dlagrange(i, x, eps=1e-7):
        return (lagrange(i, x + eps) - lagrange(i, x - eps)) / (2 * eps)

    L = np.zeros((m + 1, m))
    dL = np.zeros((m + 1, m))
    for j in range(m + 1):
        for i, z in enumerate(zg):
            L[j, i] = lagrange(j, z)
            dL[j, i] = dlagrange(j, z)
    # cache host numpy constants — jnp arrays created inside a trace would
    # leak tracers through the lru_cache
    return L, dL, zg, wg


@dataclasses.dataclass(frozen=True)
class Collocation:
    """Discretization config (ref `Collocation`,
    PeriodicOrbitCollocation.jl:212)."""

    Ntst: int = 20
    m: int = 4
    adapt_mesh: bool = False

    @property
    def n_nodes(self) -> int:
        return self.Ntst * self.m + 1

    def unknown_size(self, n: int) -> int:
        return self.n_nodes * n + 1

    def split(self, X, n: int):
        return X[:-1].reshape(self.n_nodes, n), X[-1]

    def pack(self, nodes, T):
        return jnp.concatenate([nodes.ravel(), jnp.asarray(T)[None]])

    def period(self, X):
        return X[-1]

    def local_nodes(self, nodes):
        """Gather (Ntst, m+1, n) local node blocks (shared endpoints)."""
        idx = (jnp.arange(self.Ntst)[:, None] * self.m
               + jnp.arange(self.m + 1)[None, :])
        return nodes[idx]

    def node_times(self, mesh):
        """Times in [0,1] of every unknown node (ref get_times, :112-131)."""
        m = self.m
        sig = np.linspace(-1.0, 1.0, m + 1)
        mesh = np.asarray(mesh)
        ts = [0.0]
        for j in range(self.Ntst):
            d = mesh[j + 1] - mesh[j]
            for l in range(1, m + 1):
                ts.append(mesh[j] + (sig[l] + 1) / 2 * d)
        return np.asarray(ts)

    # ------------------------------------------------------------------
    def residual(self, prob_vf, X, po_par):
        """po_par = {"_inner", "_uref" (nodes), "_phi" (Ntst, m, n),
        "_mesh" (Ntst+1,)}."""
        L, dL, zg, wg = legendre_matrices(self.m)
        params = po_par["_inner"]
        mesh = po_par["_mesh"]
        n = po_par["_uref"].shape[1]
        nodes, T = self.split(X, n)
        U = self.local_nodes(nodes)                       # (Ntst, m+1, n)
        d = (mesh[1:] - mesh[:-1])                        # (Ntst,)

        p = jnp.einsum("li,jln->jin", L, U)               # states at Gauss
        dp = jnp.einsum("li,jln->jin", dL, U)             # d/dsigma
        Fp = jax.vmap(lambda x: prob_vf.F(x, params))(
            p.reshape(-1, n)).reshape(self.Ntst, self.m, n)
        rows = dp - (T * d[:, None, None] / 2.0) * Fp

        per = nodes[0] - nodes[-1]

        uref_loc = self.local_nodes(po_par["_uref"])
        pref = jnp.einsum("li,jln->jin", L, uref_loc)
        # integral phase condition with Gauss weights (ref :504-547)
        phase = jnp.sum(
            wg[None, :, None] * (p - pref) * po_par["_phi"]
            * (d[:, None, None] / 2.0))
        return jnp.concatenate([rows.ravel(), per, phase[None]])

    # ------------------------------------------------------------------
    def monodromy(self, prob_vf, X, po_par):
        """Floquet monodromy: per-interval fundamental maps solved as one
        batched dense system, chained with a scan (ref FloquetColl,
        Floquet.jl:533-760)."""
        L, dL, zg, wg = legendre_matrices(self.m)
        params = po_par["_inner"]
        mesh = po_par["_mesh"]
        n = po_par["_uref"].shape[1]
        nodes, T = self.split(X, n)
        U = self.local_nodes(nodes)
        d = (mesh[1:] - mesh[:-1])
        m = self.m

        p = jnp.einsum("li,jln->jin", L, U)
        Jp = jax.vmap(lambda x: prob_vf.jacobian(x, params))(
            p.reshape(-1, n)).reshape(self.Ntst, m, n, n)
        alpha = T * d / 2.0

        eye = jnp.eye(n, dtype=X.dtype)

        def interval_map(Jj, aj):
            # rows: i (m gauss pts), unknown local nodes l = 1..m
            # A[i, l] = dL[l, i] I - a L[l, i] J_i   (n x n blocks)
            blocks = (dL[1:, :].T[:, :, None, None] * eye[None, None]
                      - aj * L[1:, :].T[:, :, None, None] * Jj[:, None])
            A = blocks.transpose(0, 2, 1, 3).reshape(m * n, m * n)
            # rhs for delta u_0: -(dL[0, i] I - a L[0, i] J_i)
            rhs_blocks = -(dL[0, :][:, None, None] * eye[None]
                           - aj * L[0, :][:, None, None] * Jj)
            rhs = rhs_blocks.reshape(m * n, n)
            from ..linalg.linear import dense_solve
            sol = dense_solve(A, rhs)                     # (m*n, n)
            return sol[-n:, :]                            # map u_0 -> u_m

        maps = jax.vmap(interval_map)(Jp, alpha)          # (Ntst, n, n)

        def chain(Mn, Mi):
            return Mi @ Mn, None

        Mn, _ = jax.lax.scan(chain, eye, maps)
        return Mn

    def interval_maps(self, prob_vf, X, po_par):
        """Per-interval fundamental maps M_j: u(tau_j) -> u(tau_{j+1})
        (stage 1 of FloquetColl without the product — feed these to
        FloquetGEV for the well-conditioned pencil formulation)."""
        L, dL, zg, wg = legendre_matrices(self.m)
        dL = jnp.asarray(dL)
        L = jnp.asarray(L)
        params = po_par["_inner"]
        mesh = po_par["_mesh"]
        n = po_par["_uref"].shape[1]
        nodes, T = self.split(X, n)
        U = self.local_nodes(nodes)
        d = mesh[1:] - mesh[:-1]
        m = self.m
        p = jnp.einsum("li,jln->jin", L, U)
        Jp = jax.vmap(lambda x: prob_vf.jacobian(x, params))(
            p.reshape(-1, n)).reshape(self.Ntst, m, n, n)
        alpha = T * d / 2.0
        eye = jnp.eye(n, dtype=X.dtype)

        def interval_map(Jj, aj):
            blocks = (dL[1:, :].T[:, :, None, None] * eye[None, None]
                      - aj * L[1:, :].T[:, :, None, None] * Jj[:, None])
            A = blocks.transpose(0, 2, 1, 3).reshape(m * n, m * n)
            rhs_blocks = -(dL[0, :][:, None, None] * eye[None]
                           - aj * L[0, :][:, None, None] * Jj)
            from ..linalg.linear import dense_solve
            sol = dense_solve(A, rhs_blocks.reshape(m * n, n))
            return sol[-n:, :]

        return jax.vmap(interval_map)(Jp, alpha)

    # ------------------------------------------------------------------
    def generate_solution(self, orbit_fn, T, n: int, mesh=None):
        """Sample a 2pi-periodic function onto the node mesh
        (ref generate_solution / generate_ci_problem, :369-430)."""
        mesh = np.linspace(0, 1, self.Ntst + 1) if mesh is None else mesh
        ts = self.node_times(mesh)
        nodes = jnp.stack([jnp.asarray(orbit_fn(2 * np.pi * t)) for t in ts])
        return self.pack(nodes, T)

    def phase_data(self, prob_vf, nodes, params, mesh):
        """phi at the Gauss points = F(uref) there (Poincare-style integral
        phase condition)."""
        L, dL, zg, wg = legendre_matrices(self.m)
        n = nodes.shape[1]
        U = self.local_nodes(nodes)
        p = jnp.einsum("li,jln->jin", L, U)
        phi = jax.vmap(lambda x: prob_vf.F(x, params))(
            p.reshape(-1, n)).reshape(self.Ntst, self.m, n)
        return nodes, phi

    # ------------------------------------------------------------------
    def adapt(self, nodes, mesh, verbose: bool = False):
        """Equidistribute the coarse mesh on the interpolation-error density
        (ref compute_error!, PeriodicOrbitCollocation.jl:1235-1400, de Boor).

        Host-side (adaptation is occasional): estimates the m-th derivative
        per interval from the local Lagrange coefficients, equidistributes
        |u^(m)|^{1/m} h, and re-interpolates the nodes onto the new mesh.
        Returns (new_nodes, new_mesh)."""
        nodes_np = np.asarray(nodes)
        mesh = np.asarray(mesh)
        m = self.m
        sig = np.linspace(-1.0, 1.0, m + 1)
        # m-th divided difference per interval ~ u^(m) / m!
        dens = np.zeros(self.Ntst)
        for j in range(self.Ntst):
            U = nodes_np[j * m: j * m + m + 1]
            # divided differences on the sigma nodes
            dd = U.astype(float)
            xs = sig.copy()
            for order in range(1, m + 1):
                dd = (dd[1:] - dd[:-1]) / (
                    (xs[order:] - xs[:-order])[:, None])
            scale = (mesh[j + 1] - mesh[j]) / 2.0
            dens[j] = (np.linalg.norm(dd[0]) / max(scale, 1e-12) ** m
                       ) ** (1.0 / m) + 1e-8
        # equidistribute the integral of the density, with the standard
        # weight floor (each interval keeps >= 30% of the average weight):
        # pure equidistribution starves smooth regions — an interval there
        # can grow until its own h^{m+1} error dominates the one the
        # refinement removed in the layer
        w = dens * np.diff(mesh)
        w = np.maximum(w, 0.3 * w.mean())
        cum = np.concatenate([[0.0], np.cumsum(w)])
        cum /= cum[-1]
        targets = np.linspace(0, 1, self.Ntst + 1)
        new_mesh = np.interp(targets, cum, mesh)
        new_mesh[0], new_mesh[-1] = 0.0, 1.0
        # keep adjacent intervals within a sane ratio
        new_nodes = np.stack([
            self.interpolate(nodes_np, mesh, t)
            for t in self.node_times(new_mesh)])
        if verbose:
            print(f"[mesh-adapt] h in [{np.diff(new_mesh).min():.4f}, "
                  f"{np.diff(new_mesh).max():.4f}]")
        return jnp.asarray(new_nodes), jnp.asarray(new_mesh)

    # ------------------------------------------------------------------
    def interpolate(self, nodes, mesh, t):
        """Evaluate the collocation polynomial at time t in [0, 1]
        (ref :1196-1233)."""
        mesh = np.asarray(mesh)
        j = int(np.clip(np.searchsorted(mesh, t, side="right") - 1, 0,
                        self.Ntst - 1))
        d = mesh[j + 1] - mesh[j]
        sigma = 2 * (t - mesh[j]) / d - 1.0
        sigmas = np.linspace(-1.0, 1.0, self.m + 1)
        U = np.asarray(nodes)[j * self.m: j * self.m + self.m + 1]
        out = np.zeros(U.shape[1])
        for i in range(self.m + 1):
            li = 1.0
            for k in range(self.m + 1):
                if k != i:
                    li *= (sigma - sigmas[k]) / (sigmas[i] - sigmas[k])
            out = out + li * U[i]
        return out
