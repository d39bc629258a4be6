"""Condensation of parameters — AUTO's collocation linear algebra
(ref src/periodicorbit/cop.jl).

The collocation jacobian has per-interval block structure: interval j's m*n
collocation rows couple the local nodes 0..m (node m is shared with interval
j+1) plus the period column.  COP eliminates the local unknowns 1..m with one
*batched* LU over all intervals (stage 1 = the reference's blockwise
elimination, cop.jl:215), leaving an external system on (delta u_0, delta T)
of size n+1 only, closed by a `lax.scan` chain recursion (stage 2 — the same
sequential product as the Floquet monodromy), then a batched back-substitution
(cop.jl:484).

This makes the collocation Newton step O(Ntst * (m n)^3) with the heavy part
batched on the MXU, instead of O((Ntst m n)^3) dense LU on the AD jacobian.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .collocation import Collocation, legendre_matrices


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class COPBlocks:
    """Structured collocation jacobian (pytree)."""

    Aint: Any    # (Ntst, m*n, m*n)  d rows / d local nodes 1..m
    B0: Any      # (Ntst, m*n, n)    d rows / d local node 0
    cT: Any      # (Ntst, m*n)       d rows / d T
    rows_rhs_template: Any           # unused placeholder for shape
    phi0: Any    # (Ntst, n)         phase-row coeff of local node 0
    phiI: Any    # (Ntst, m*n)       phase-row coeff of local nodes 1..m
    n: int       # static: vf dimension
    m: int
    Ntst: int

    def tree_flatten(self):
        return ((self.Aint, self.B0, self.cT, self.rows_rhs_template,
                 self.phi0, self.phiI),
                (self.n, self.m, self.Ntst))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def __call__(self, dX):
        """Matvec J @ dX (needed for BorderingBLS residual refinement)."""
        n, m, Ntst = self.n, self.m, self.Ntst
        nodes = dX[:-1].reshape(Ntst * m + 1, n)
        dT = dX[-1]
        idxI = (jnp.arange(Ntst)[:, None] * m
                + jnp.arange(1, m + 1)[None, :])
        loc = nodes[idxI].reshape(Ntst, m * n)
        u0 = nodes[jnp.arange(Ntst) * m]
        rows = (jnp.einsum("jab,jb->ja", self.Aint, loc)
                + jnp.einsum("jan,jn->ja", self.B0, u0)
                + self.cT * dT)
        per = nodes[0] - nodes[-1]
        phase = (jnp.einsum("jn,jn->", self.phi0, u0)
                 + jnp.einsum("jr,jr->", self.phiI, loc))
        return jnp.concatenate([rows.reshape(-1), per, phase[None]])


def collocation_block_jacobian(disc: Collocation, prob_vf, X, po_par
                               ) -> COPBlocks:
    """Analytical block jacobian (ref po_analytical_jacobian,
    PeriodicOrbitCollocation.jl:646-905 and SURVEY appendix):
    d r_{j,i} / d u_l = dL[l,i] I - alpha_j L[l,i] J(p_{j,i})."""
    L, dL, zg, wg = legendre_matrices(disc.m)
    L = jnp.asarray(L)
    dL = jnp.asarray(dL)
    wg = jnp.asarray(wg)
    params = po_par["_inner"]
    mesh = po_par["_mesh"]
    n = po_par["_uref"].shape[1]
    m = disc.m
    Ntst = disc.Ntst
    nodes, T = disc.split(X, n)
    U = disc.local_nodes(nodes)
    d = mesh[1:] - mesh[:-1]
    alpha = T * d / 2.0

    p = jnp.einsum("li,jln->jin", L, U)
    Jp = jax.vmap(lambda x: prob_vf.jacobian(x, params))(
        p.reshape(-1, n)).reshape(Ntst, m, n, n)
    Fp = jax.vmap(lambda x: ravel_vf(prob_vf, x, params))(
        p.reshape(-1, n)).reshape(Ntst, m, n)

    eye = jnp.eye(n, dtype=X.dtype)

    def blocks_for(Jj, aj, Fj, dj):
        # (i, l, n, n) for l = 1..m (Aint) and l = 0 (B0)
        blkI = (dL[1:, :].T[:, :, None, None] * eye[None, None]
                - aj * L[1:, :].T[:, :, None, None] * Jj[:, None])
        Aint = blkI.transpose(0, 2, 1, 3).reshape(m * n, m * n)
        blk0 = (dL[0, :][:, None, None] * eye[None]
                - aj * L[0, :][:, None, None] * Jj)
        B0 = blk0.reshape(m * n, n)
        cT = (-(dj / 2.0) * Fj).reshape(m * n)
        return Aint, B0, cT

    Aint, B0, cT = jax.vmap(blocks_for)(Jp, alpha, Fp, d)

    # phase row: phi(X) = sum_{j,i} w_i (d_j/2) <p_ji - pref_ji, phi_ji>
    # d/d u_l = sum_i w_i (d_j/2) L[l, i] phi_{j,i}
    phi = po_par["_phi"]                                  # (Ntst, m, n)
    coeff = jnp.einsum("i,li,jin->jln", wg, L, phi) * (
        d[:, None, None] / 2.0)                            # (Ntst, m+1, n)
    phi0 = coeff[:, 0, :]                                  # (Ntst, n)
    phiI = coeff[:, 1:, :].reshape(Ntst, m * n)

    return COPBlocks(Aint=Aint, B0=B0, cT=cT,
                     rows_rhs_template=jnp.zeros((0,)),
                     phi0=phi0, phiI=phiI, n=n, m=m, Ntst=Ntst)


def ravel_vf(prob_vf, x, params):
    from ..core.state import ravel

    return ravel(prob_vf.F(x, params))[0]


def cop_solve(blocks: COPBlocks, rhs):
    """Solve J dX = rhs for the collocation jacobian in COP form.

    rhs layout matches Collocation.residual: [collocation rows (Ntst*m*n),
    periodicity (n), phase (1)].  Returns dX = [nodes (Ntst*m+1)*n, dT].
    """
    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    rc = rhs[:Ntst * m * n].reshape(Ntst, m * n)
    r_per = rhs[Ntst * m * n: Ntst * m * n + n]
    r_phase = rhs[-1]

    # stage 1: batched factorization of the interval blocks
    from ..linalg.linear import dense_factor, dense_factor_solve, dense_solve
    fac = jax.vmap(dense_factor)(blocks.Aint)
    solve = jax.vmap(dense_factor_solve)
    H = solve(fac, blocks.B0)                     # (Ntst, m*n, n)
    k = solve(fac, blocks.cT[..., None])[..., 0]  # (Ntst, m*n)
    G = solve(fac, rc[..., None])[..., 0]         # (Ntst, m*n)

    # per-interval boundary map: du_{j+1} = S_j du_j + t_j dT + h_j
    S = -H[:, -n:, :]                              # (Ntst, n, n)
    t = -k[:, -n:]                                 # (Ntst, n)
    h = G[:, -n:]                                  # (Ntst, n)

    # chain recursion: du_j = P_j du_0 + q_j dT + r_j
    eye = jnp.eye(n, dtype=rhs.dtype)

    def chain(carry, inp):
        P, q, r = carry
        Sj, tj, hj = inp
        Pn = Sj @ P
        qn = Sj @ q + tj
        rn = Sj @ r + hj
        return (Pn, qn, rn), (P, q, r)   # emit state BEFORE this interval

    (Pend, qend, rend), (Ps, qs, rs) = jax.lax.scan(
        chain, (eye, jnp.zeros(n, rhs.dtype), jnp.zeros(n, rhs.dtype)),
        (S, t, h))
    # Ps[j], qs[j], rs[j] give du_j for j = 0..Ntst-1; end gives du_Ntst

    # phase row: sum_j [phi0_j du_j + phiI_j du_loc_j],
    # du_loc_j = G_j - H_j du_j - k_j dT
    # coefficient of du_j: phi0_j - phiI_j H_j; of dT: -phiI_j k_j;
    # constant: phiI_j G_j
    cu_j = blocks.phi0 - jnp.einsum("jr,jrn->jn", blocks.phiI, H)
    cT_j = -jnp.einsum("jr,jr->j", blocks.phiI, k)
    cc_j = jnp.einsum("jr,jr->j", blocks.phiI, G)
    # substitute du_j = P_j du_0 + q_j dT + r_j
    phase_u = jnp.einsum("jn,jnk->k", cu_j, Ps)
    phase_T = jnp.sum(cT_j) + jnp.einsum("jn,jn->", cu_j, qs)
    phase_c = jnp.sum(cc_j) + jnp.einsum("jn,jn->", cu_j, rs)

    # external (n+1) system on (du_0, dT):
    #   periodicity: du_0 - du_Ntst = r_per
    #   phase:       phase_u du_0 + phase_T dT = r_phase - phase_c
    Aext = jnp.zeros((n + 1, n + 1), rhs.dtype)
    Aext = Aext.at[:n, :n].set(eye - Pend)
    Aext = Aext.at[:n, n].set(-qend)
    Aext = Aext.at[n, :n].set(phase_u)
    Aext = Aext.at[n, n].set(phase_T)
    bext = jnp.concatenate([r_per + rend, (r_phase - phase_c)[None]])
    sol_ext = dense_solve(Aext, bext)
    du0 = sol_ext[:n]
    dT = sol_ext[n]

    # back-substitution (batched): du_j then du_loc_j
    du_bound = jnp.einsum("jnk,k->jn", Ps, du0) + qs * dT + rs  # (Ntst, n)
    du_loc = (G - jnp.einsum("jrn,jn->jr", H, du_bound)
              - k * dT)                                          # (Ntst, m*n)

    # assemble the node vector: node 0 = du0; interval j contributes local
    # nodes 1..m at indices j*m+1 .. j*m+m
    nodes = jnp.zeros((Ntst * m + 1, n), rhs.dtype)
    nodes = nodes.at[0].set(du0)
    loc = du_loc.reshape(Ntst, m, n)
    idx = (jnp.arange(Ntst)[:, None] * m + jnp.arange(1, m + 1)[None, :])
    nodes = nodes.at[idx.reshape(-1)].set(loc.reshape(-1, n))
    return jnp.concatenate([nodes.reshape(-1), dT[None]])


@dataclasses.dataclass(frozen=True)
class COPLS:
    """Linear solver consuming the structured COPBlocks jacobian
    (ref COPLS, cop.jl:85).  Use via
    `periodic_orbit_problem(..., use_cop=True)` +
    `NewtonPar(linsolver=COPLS())`."""

    needs_matrix = True   # ask Newton for prob.jacobian (the blocks)

    def __call__(self, J: COPBlocks, rhs, a0=0.0, a1=1.0):
        from ..core.state import ravel

        flat, unravel = ravel(rhs)
        sol = cop_solve(J, flat)
        return unravel(sol), jnp.array(True), jnp.array(1)
