"""Generic boundary-value problems (ref src/bvp/*).

`BVPModel(F, g)` holds the ODE right-hand side u' = F(u, p) on t in [0, 1]
and the boundary-condition functional g(u(0), u(1), p) (n conditions)
(ref BVPModel, src/bvp/BVPModel.jl:34).  Discretizers reuse the
periodic-orbit machinery without the periodicity/phase rows
(ref src/bvp/Discretizers.jl, discretize.jl):

* `BVPCollocation(Ntst, m)` — Gauss-Legendre collocation,
* `BVPShooting(M)`          — (multiple) shooting on the JAX flow.

`bvp_problem` wraps everything into a standard BifurcationProblem so the full
continuation stack applies (ref BVPBifProblem, src/bvp/BVPBifProblem.jl:38).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lens import as_lens
from ..core.problem import BifurcationProblem
from ..periodic.collocation import legendre_matrices
from ..periodic.flow import Flow


@dataclasses.dataclass(frozen=True)
class BVPModel:
    """u' = F(u, p), g(u(0), u(1), p) = 0 (g returns n values)."""

    F: Callable
    g: Callable


@dataclasses.dataclass(frozen=True)
class BVPCollocation:
    Ntst: int = 20
    m: int = 4
    # de Boor mesh adaptation via the update hook (ref the collocation
    # mesh-adapt path of BVPBifProblem, src/bvp/BVPBifProblem.jl:225-296);
    # run every `adapt_every` accepted steps — remeshing every step keeps
    # perturbing the secant tangent for no accuracy gain
    adapt_mesh: bool = False
    adapt_every: int = 5

    @property
    def n_nodes(self):
        return self.Ntst * self.m + 1

    def unknown_size(self, n):
        return self.n_nodes * n

    def local_nodes(self, nodes):
        idx = (jnp.arange(self.Ntst)[:, None] * self.m
               + jnp.arange(self.m + 1)[None, :])
        return nodes[idx]

    def residual(self, model: BVPModel, X, params, n: int, mesh=None):
        L, dL, zg, wg = legendre_matrices(self.m)
        nodes = X.reshape(self.n_nodes, n)
        if mesh is None:
            mesh = jnp.linspace(0.0, 1.0, self.Ntst + 1)
        d = mesh[1:] - mesh[:-1]
        U = self.local_nodes(nodes)
        p = jnp.einsum("li,jln->jin", L, U)
        dp = jnp.einsum("li,jln->jin", dL, U)
        Fp = jax.vmap(lambda x: model.F(x, params))(
            p.reshape(-1, n)).reshape(self.Ntst, self.m, n)
        rows = dp - (d[:, None, None] / 2.0) * Fp
        bc = model.g(nodes[0], nodes[-1], params)
        return jnp.concatenate([rows.ravel(), jnp.atleast_1d(bc)])

    def _po_coll(self):
        """Internal periodic-orbit Collocation twin: hosts the shared
        interpolation / de Boor adaptation machinery."""
        from ..periodic.collocation import Collocation

        return Collocation(Ntst=self.Ntst, m=self.m)

    def node_times(self, mesh):
        mesh = np.asarray(mesh)
        sig = np.linspace(-1.0, 1.0, self.m + 1)
        ts = [float(mesh[0])]
        for j in range(self.Ntst):
            dd = mesh[j + 1] - mesh[j]
            for l in range(1, self.m + 1):
                ts.append(float(mesh[j] + (sig[l] + 1) / 2 * dd))
        return np.asarray(ts)

    def initial_guess(self, profile: Callable, n: int):
        ts = self.node_times(np.linspace(0, 1, self.Ntst + 1))
        nodes = jnp.stack([jnp.asarray(profile(t)) for t in ts])
        return nodes.ravel()

    def times(self, mesh=None):
        if mesh is None:
            mesh = np.linspace(0, 1, self.Ntst + 1)
        return self.node_times(mesh)


@dataclasses.dataclass(frozen=True)
class BVPTrapezoid:
    """Trapezoid-rule BVP discretizer (ref src/bvp trapeze path)."""

    M: int = 50

    def unknown_size(self, n):
        return self.M * n

    def residual(self, model: BVPModel, X, params, n: int):
        u = X.reshape(self.M, n)
        h = 1.0 / (self.M - 1)
        Fu = jax.vmap(lambda x: model.F(x, params))(u)
        rows = (u[1:] - u[:-1]) - (h / 2.0) * (Fu[1:] + Fu[:-1])
        bc = model.g(u[0], u[-1], params)
        return jnp.concatenate([rows.ravel(), jnp.atleast_1d(bc)])

    def initial_guess(self, profile: Callable, n: int):
        ts = np.linspace(0, 1, self.M)
        return jnp.stack([jnp.asarray(profile(t)) for t in ts]).ravel()

    def times(self):
        return np.linspace(0, 1, self.M)


@dataclasses.dataclass(frozen=True)
class BVPShooting:
    M: int = 4
    steps_per_segment: int = 60

    def unknown_size(self, n):
        return self.M * n

    def residual(self, model: BVPModel, X, params, n: int):
        u = X.reshape(self.M, n)
        fl = Flow(model.F, steps=self.steps_per_segment)
        ends = jax.vmap(lambda x: fl(x, params, 1.0 / self.M))(u)
        match = (ends[:-1] - u[1:]).ravel()
        bc = model.g(u[0], ends[-1], params)
        return jnp.concatenate([match, jnp.atleast_1d(bc)])

    def initial_guess(self, profile: Callable, n: int):
        ts = np.linspace(0, 1, self.M, endpoint=False)
        return jnp.stack([jnp.asarray(profile(t)) for t in ts]).ravel()

    def times(self):
        return np.linspace(0, 1, self.M, endpoint=False)


def discretize(model: BVPModel, disc, profile: Callable, n: int):
    """Initial guess on the discretization mesh (ref src/bvp/discretize.jl)."""
    return disc.initial_guess(profile, n)


# ---------------------------------------------------------------------------
# analytical block jacobian + condensed solve for BVP collocation
# (ref the collocation jacobian/COP path of src/bvp/collocation/*;
#  the PO machinery minus the period column/phase row, closed by the BC
#  rows dg/du(0), dg/du(1))
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BVPBlocks:
    """Structured BVP collocation jacobian (pytree)."""

    Aint: Any    # (Ntst, m*n, m*n)
    B0: Any      # (Ntst, m*n, n)
    G0: Any      # (n, n)  dg/du(0)
    G1: Any      # (n, n)  dg/du(1)
    n: int
    m: int
    Ntst: int

    def tree_flatten(self):
        return ((self.Aint, self.B0, self.G0, self.G1),
                (self.n, self.m, self.Ntst))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def __call__(self, dX):
        n, m, Ntst = self.n, self.m, self.Ntst
        nodes = dX.reshape(Ntst * m + 1, n)
        idxI = (jnp.arange(Ntst)[:, None] * m
                + jnp.arange(1, m + 1)[None, :])
        loc = nodes[idxI].reshape(Ntst, m * n)
        u0 = nodes[jnp.arange(Ntst) * m]
        rows = (jnp.einsum("jab,jb->ja", self.Aint, loc)
                + jnp.einsum("jan,jn->ja", self.B0, u0))
        bc = self.G0 @ nodes[0] + self.G1 @ nodes[-1]
        return jnp.concatenate([rows.reshape(-1), bc])


def bvp_block_jacobian(disc: BVPCollocation, model: BVPModel, X, params,
                       n: int, mesh=None) -> BVPBlocks:
    """d r_{j,i} / d U_l = dL[l,i] I - (d_j/2) L[l,i] J(p_{j,i}) plus the
    BC rows — the analytical jacobian the reference assembles for BVP
    collocation (src/bvp/collocation)."""
    L, dL, zg, wg = legendre_matrices(disc.m)
    L = jnp.asarray(L)
    dL = jnp.asarray(dL)
    m, Ntst = disc.m, disc.Ntst
    nodes = X.reshape(disc.n_nodes, n)
    if mesh is None:
        mesh = jnp.linspace(0.0, 1.0, Ntst + 1)
    d = mesh[1:] - mesh[:-1]
    U = disc.local_nodes(nodes)
    p = jnp.einsum("li,jln->jin", L, U)
    Jf = jax.vmap(jax.jacfwd(lambda x: model.F(x, params)))(
        p.reshape(-1, n)).reshape(Ntst, m, n, n)
    eye = jnp.eye(n, dtype=X.dtype)

    def blocks_for(Jj, dj):
        a = dj / 2.0
        blkI = (dL[1:, :].T[:, :, None, None] * eye[None, None]
                - a * L[1:, :].T[:, :, None, None] * Jj[:, None])
        Aint = blkI.transpose(0, 2, 1, 3).reshape(m * n, m * n)
        blk0 = (dL[0, :][:, None, None] * eye[None]
                - a * L[0, :][:, None, None] * Jj)
        return Aint, blk0.reshape(m * n, n)

    Aint, B0 = jax.vmap(blocks_for)(Jf, d)
    G0 = jax.jacfwd(lambda u: jnp.atleast_1d(
        model.g(u, nodes[-1], params)))(nodes[0])
    G1 = jax.jacfwd(lambda u: jnp.atleast_1d(
        model.g(nodes[0], u, params)))(nodes[-1])
    return BVPBlocks(Aint=Aint, B0=B0, G0=G0, G1=G1, n=n, m=m, Ntst=Ntst)


def bvp_cop_solve(blocks: BVPBlocks, rhs):
    """Condensed solve of the BVP collocation jacobian: batched pivoted LU
    of the interior blocks, then a dense pivoted external system on the
    interval boundaries closed by the BC rows (the BVP twin of
    periodic.cop.cop_solve)."""
    from ..linalg.linear import dense_factor, dense_factor_solve, dense_solve

    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    rc = rhs[:Ntst * m * n].reshape(Ntst, m * n)
    r_bc = rhs[Ntst * m * n:]

    fac = jax.vmap(dense_factor)(blocks.Aint)
    solve = jax.vmap(dense_factor_solve)
    H = solve(fac, blocks.B0)
    G = solve(fac, rc[..., None])[..., 0]
    S = -H[:, -n:, :]
    h = G[:, -n:]

    dtype = rhs.dtype
    eye = jnp.eye(n, dtype=dtype)
    jidx = jnp.arange(Ntst)
    rowsA = jnp.zeros((Ntst, n, Ntst + 1, n), dtype)
    rowsA = rowsA.at[jidx, :, jidx, :].set(-S)
    rowsA = rowsA.at[jidx, :, jidx + 1, :].add(
        jnp.broadcast_to(eye, (Ntst, n, n)))
    K = (Ntst + 1) * n
    A = jnp.zeros((K, K), dtype)
    A = A.at[:Ntst * n, :].set(rowsA.reshape(Ntst * n, K))
    A = A.at[Ntst * n:, 0:n].set(blocks.G0)
    A = A.at[Ntst * n:, Ntst * n:].add(blocks.G1)
    b = jnp.concatenate([h.reshape(-1), r_bc])
    y = dense_solve(A, b)
    du_bound = y.reshape(Ntst + 1, n)

    du_loc = G - jnp.einsum("jrn,jn->jr", H, du_bound[:Ntst])
    nodes = jnp.zeros((Ntst * m + 1, n), dtype)
    nodes = nodes.at[0].set(du_bound[0])
    idx = (jnp.arange(Ntst)[:, None] * m + jnp.arange(1, m + 1)[None, :])
    nodes = nodes.at[idx.reshape(-1)].set(
        du_loc.reshape(Ntst, m, n).reshape(-1, n))
    nodes = nodes.at[-1].set(du_bound[-1])
    return nodes.reshape(-1)


@dataclasses.dataclass(frozen=True)
class BVPCOPLS:
    """Linear solver consuming BVPBlocks (use with
    bvp_problem(..., use_cop=True))."""

    needs_matrix = True

    def __call__(self, J: BVPBlocks, rhs, a0=0.0, a1=1.0):
        from ..core.state import ravel

        flat, unravel = ravel(rhs)
        return unravel(bvp_cop_solve(J, flat)), jnp.array(True), jnp.array(1)


def bvp_problem(model: BVPModel, disc, X0, params, lens,
                n: Optional[int] = None,
                record_from_solution=None,
                use_cop: bool = False) -> BifurcationProblem:
    """Wrap (model, discretizer) into a BifurcationProblem
    (ref BVPBifProblem, src/bvp/BVPBifProblem.jl:38).

    For BVPCollocation: `use_cop=True` attaches the analytical block
    jacobian + condensed solver (pair with NewtonPar(linsolver=BVPCOPLS())),
    and `disc.adapt_mesh=True` enables de Boor mesh adaptation through the
    update hook (ref BVPBifProblem.jl:225-296) — the mesh then lives in the
    parameter pytree under "_mesh" and the user lens is wrapped."""
    if n is None:
        raise ValueError("pass n (ODE dimension) explicitly")

    is_coll = isinstance(disc, BVPCollocation)
    adaptive = is_coll and disc.adapt_mesh
    if (use_cop or adaptive) and not is_coll:
        raise ValueError("use_cop / adapt_mesh require BVPCollocation")

    def record(X, p, **k):
        u = X.reshape(-1, n)
        return {"param": p, "norm": jnp.linalg.norm(X),
                "max": jnp.max(u[:, 0]), "min": jnp.min(u[:, 0])}

    record_fn = record_from_solution or record

    if not adaptive:
        def F(X, par):
            return disc.residual(model, X, par, n)

        jac = None
        if use_cop:
            jac = lambda X, par: bvp_block_jacobian(disc, model, X, par, n)
        return BifurcationProblem(
            F, u0=X0, params=params, lens=lens, jac=jac,
            record_from_solution=record_fn)

    # adaptive-mesh wrap: mesh rides the parameter pytree
    from ..core.lens import Lens

    inner_lens = as_lens(lens)
    par0 = {"_inner": params,
            "_mesh": jnp.asarray(np.linspace(0, 1, disc.Ntst + 1))}
    wlens = Lens(
        get=lambda par: inner_lens.get(par["_inner"]),
        set=lambda par, v: {**par,
                            "_inner": inner_lens.set(par["_inner"], v)},
        name=f"bvp/{inner_lens.name}")

    def F(X, par):
        return disc.residual(model, X, par["_inner"], n, mesh=par["_mesh"])

    jac = None
    if use_cop:
        jac = lambda X, par: bvp_block_jacobian(disc, model, X,
                                                par["_inner"], n,
                                                mesh=par["_mesh"])

    def update(it, state):
        """Re-equidistribute the mesh on the current solution (de Boor,
        shared with the PO collocation adapt).  The WHOLE continuation
        state (z, z_old, tau) is re-interpolated onto the new mesh so the
        secant tangent stays consistent across the remesh."""
        if state.in_bisection or state.step % disc.adapt_every != 0:
            return None
        par = it.current_params
        old_mesh = par["_mesh"]
        nodes = state.z.u.reshape(disc.n_nodes, n)
        tw = disc._po_coll()
        new_nodes, new_mesh = tw.adapt(nodes, old_mesh)
        times_new = disc.node_times(new_mesh)

        def remap(flat):
            arr = np.asarray(flat).reshape(disc.n_nodes, n)
            out = np.stack([tw.interpolate(arr, np.asarray(old_mesh), t)
                            for t in times_new])
            return jnp.asarray(out.reshape(-1))

        import dataclasses as _dc

        state.z = _dc.replace(state.z, u=new_nodes.reshape(-1))
        if state.z_old is not None and state.z_old.u.shape == \
                state.z.u.shape:
            state.z_old = _dc.replace(state.z_old,
                                      u=remap(state.z_old.u))
        if state.tau is not None:
            state.tau = _dc.replace(state.tau, u=remap(state.tau.u))
        return {**par, "_mesh": new_mesh}

    def record_wrapped(X, p, **k):
        return record_fn(X, p, **k)

    return BifurcationProblem(
        F, u0=X0, params=par0, lens=wlens, jac=jac,
        record_from_solution=record_wrapped, update=update)
