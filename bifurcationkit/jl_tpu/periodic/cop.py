"""Condensation of parameters — AUTO's collocation linear algebra
(ref src/periodicorbit/cop.jl).

The collocation jacobian has per-interval block structure: interval j's m*n
collocation rows couple the local nodes 0..m (node m is shared with interval
j+1) plus the period column.  COP eliminates the local unknowns 1..m with one
*batched* pivoted LU over all intervals (stage 1 = the reference's blockwise
elimination, cop.jl:215), leaving an **external block-bidiagonal system** on
the interval-boundary unknowns (du_0..du_Ntst, dT [, dp]) of size
(Ntst+1)*n + 1 [+1], solved dense with pivoting (ref cop.jl:322,484: the
reference gathers exactly this external system and back-substitutes with
pivoting).  Solving the external system directly — instead of eliminating
the boundary unknowns through an unpivoted chain product P <- S_j P — keeps
full accuracy on strongly unstable orbits, where the chain recursion loses
digits exactly like the raw monodromy product (ref the precision caveat,
Floquet.jl:28-31).

`COPBLS` condenses the PALC-bordered system [J dFdp; theta dzu' (1-theta)dzp]
in the SAME single pass (ref COPBLS, cop.jl:107): the parameter column and
the arclength row ride through stage 1 with the period column, so one
continuation corrector iteration costs ONE condensation instead of the two
BorderingBLS inner solves.

This makes the collocation Newton step O(Ntst * (m n)^3) batched on the MXU
plus one dense pivoted solve of the small external system, instead of
O((Ntst m n)^3) dense LU on the AD jacobian.
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
    phi0: Any    # (Ntst, n)         phase-row coeff of local node 0
    phiI: Any    # (Ntst, m*n)       phase-row coeff of local nodes 1..m
    n: int       # static: vf dimension
    m: int
    Ntst: int

    def tree_flatten(self):
        return ((self.Aint, self.B0, self.cT, self.phi0, self.phiI),
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

    return COPBlocks(Aint=Aint, B0=B0, cT=cT, phi0=phi0, phiI=phiI,
                     n=n, m=m, Ntst=Ntst)


def ravel_vf(prob_vf, x, params):
    from ..core.state import ravel

    return ravel(prob_vf.F(x, params))[0]


def _stage1(blocks: COPBlocks, rc, dRc=None):
    """Batched pivoted elimination of the interior collocation unknowns
    (ref condensation_of_parameters2!, cop.jl:215): per-interval LU (row
    pivoting inside each (m n) block) and the triangular solves that reduce
    the node-0 column, the period column, the rhs, and optionally the
    continuation-parameter column.

    The last n rows of each reduced quantity give the boundary map
        du_{j+1} = h_j + S_j du_j + t_j dT [+ tp_j dp]."""
    from ..linalg.linear import dense_factor, dense_factor_solve

    fac = jax.vmap(dense_factor)(blocks.Aint)
    solve = jax.vmap(dense_factor_solve)
    H = solve(fac, blocks.B0)                     # (Ntst, m*n, n)
    k = solve(fac, blocks.cT[..., None])[..., 0]  # (Ntst, m*n)
    G = solve(fac, rc[..., None])[..., 0]         # (Ntst, m*n)
    kp = None
    if dRc is not None:
        kp = solve(fac, dRc[..., None])[..., 0]   # (Ntst, m*n)
    return H, k, G, kp


def cop_interval_maps(blocks: COPBlocks):
    """Per-interval fundamental maps S_j (= B_j^{-1} A_j couples of the
    reference's FloquetColl stage, Floquet.jl:625-659), reusing the stage-1
    factorization: du_{j+1} = S_j du_j on the homogeneous system."""
    n = blocks.n
    H, _, _, _ = _stage1(blocks, jnp.zeros_like(blocks.cT))
    return -H[:, -n:, :]                          # (Ntst, n, n)


def _external_matrix(blocks: COPBlocks, H, k, kp=None, dR_per=None,
                     dR_phase=None, border_row=None):
    """Assemble the (rhs-independent) pivoted external matrix on the
    boundary unknowns y = [du_0..du_Ntst, dT (, dp)] (ref
    build_external_system!, cop.jl:322).

    Rows: Ntst coupling blocks  du_{j+1} - S_j du_j - t_j dT (- tp_j dp),
    n periodicity rows, the phase row, and optionally one border row
    (the PALC arclength constraint, pre-reduced over the local unknowns)."""
    n, Ntst = blocks.n, blocks.Ntst
    dtype = H.dtype
    bordered = border_row is not None
    S = -H[:, -n:, :]
    t = -k[:, -n:]
    Next = (Ntst + 1) * n + 1 + (1 if bordered else 0)
    eye = jnp.eye(n, dtype=dtype)

    # coupling block rows as a (Ntst, n, Ntst+1, n) tensor scatter
    rowsA = jnp.zeros((Ntst, n, Ntst + 1, n), dtype)
    jidx = jnp.arange(Ntst)
    rowsA = rowsA.at[jidx, :, jidx, :].set(-S)
    rowsA = rowsA.at[jidx, :, jidx + 1, :].add(
        jnp.broadcast_to(eye, (Ntst, n, n)))
    coupling = rowsA.reshape(Ntst * n, (Ntst + 1) * n)

    # phase row after substituting the local unknowns:
    # coeff(du_j) = phi0_j - phiI_j H_j; coeff(dT) = sum_j -phiI_j k_j
    cu = blocks.phi0 - jnp.einsum("jr,jrn->jn", blocks.phiI, H)
    cT_phase = -jnp.einsum("jr,jr->", blocks.phiI, k)

    A = jnp.zeros((Next, Next), dtype)
    A = A.at[:Ntst * n, :(Ntst + 1) * n].set(coupling)
    A = A.at[:Ntst * n, (Ntst + 1) * n].set(-t.reshape(-1))
    A = A.at[Ntst * n:(Ntst + 1) * n, 0:n].set(eye)
    A = A.at[Ntst * n:(Ntst + 1) * n, Ntst * n:(Ntst + 1) * n].add(-eye)
    prow = (Ntst + 1) * n   # phase-row index
    A = A.at[prow, :Ntst * n].set(cu.reshape(-1))
    A = A.at[prow, (Ntst + 1) * n].set(cT_phase)

    if bordered:
        tp = -kp[:, -n:]
        cp_phase = (-jnp.einsum("jr,jr->", blocks.phiI, kp)
                    + jnp.asarray(dR_phase, dtype))
        pcol = Next - 1
        A = A.at[:Ntst * n, pcol].set(-tp.reshape(-1))
        A = A.at[Ntst * n:(Ntst + 1) * n, pcol].set(
            jnp.asarray(dR_per, dtype))
        A = A.at[prow, pcol].set(cp_phase)
        A = A.at[Next - 1, :].set(border_row)
    return A


def _external_b(blocks: COPBlocks, G, r_per, r_phase, border_rhs=None):
    """The rhs of the external system for a given reduced rhs G
    (constant parts of the phase row move here)."""
    n = blocks.n
    h = G[:, -n:]
    cc_phase = jnp.einsum("jr,jr->", blocks.phiI, G)
    b = jnp.concatenate([h.reshape(-1), r_per,
                         (r_phase - cc_phase)[None]])
    if border_rhs is not None:
        b = jnp.concatenate([b, jnp.asarray(border_rhs, G.dtype)[None]])
    return b


def _external_system(blocks: COPBlocks, H, k, G, kp, rc, r_per, r_phase,
                     dR_per=None, dR_phase=None,
                     border_row=None, border_rhs=None):
    """Assemble + solve the external system (ref cop.jl:322,484).
    Returns (du_bound (Ntst+1, n), dT, dp_or_None)."""
    from ..linalg.linear import dense_solve

    n, Ntst = blocks.n, blocks.Ntst
    bordered = border_row is not None
    A = _external_matrix(blocks, H, k, kp, dR_per, dR_phase, border_row)
    b = _external_b(blocks, G, r_per, r_phase,
                    border_rhs if bordered else None)
    y = dense_solve(A, b)
    du_bound = y[:(Ntst + 1) * n].reshape(Ntst + 1, n)
    dT = y[(Ntst + 1) * n]
    dp = y[A.shape[0] - 1] if bordered else None
    return du_bound, dT, dp


def _assemble_nodes(blocks: COPBlocks, H, k, G, kp, du_bound, dT, dp=None):
    """Back-substitution (batched): local unknowns from the boundary
    solution, then the node vector in Collocation layout."""
    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    du_loc = (G - jnp.einsum("jrn,jn->jr", H, du_bound[:Ntst])
              - k * dT)                                      # (Ntst, m*n)
    if dp is not None:
        du_loc = du_loc - kp * dp
    nodes = jnp.zeros((Ntst * m + 1, n), G.dtype)
    nodes = nodes.at[0].set(du_bound[0])
    loc = du_loc.reshape(Ntst, m, n)
    idx = (jnp.arange(Ntst)[:, None] * m + jnp.arange(1, m + 1)[None, :])
    nodes = nodes.at[idx.reshape(-1)].set(loc.reshape(-1, n))
    return jnp.concatenate([nodes.reshape(-1), dT[None]])


def cop_solve(blocks: COPBlocks, rhs):
    """Solve J dX = rhs for the collocation jacobian in COP form.

    rhs layout matches Collocation.residual: [collocation rows (Ntst*m*n),
    periodicity (n), phase (1)].  Returns dX = [nodes (Ntst*m+1)*n, dT].
    """
    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    rc = rhs[:Ntst * m * n].reshape(Ntst, m * n)
    r_per = rhs[Ntst * m * n: Ntst * m * n + n]
    r_phase = rhs[-1]

    H, k, G, _ = _stage1(blocks, rc)
    du_bound, dT, _ = _external_system(blocks, H, k, G, None,
                                       rc, r_per, r_phase)
    return _assemble_nodes(blocks, H, k, G, None, du_bound, dT)


def cop_solve_bordered(blocks: COPBlocks, rhs, rn, dR, dzu, dzp,
                       xi_u=1.0, xi_p=1.0, dot_scale=1.0):
    """One-pass bordered condensation (ref COPBLS, cop.jl:107): solve

        | J      dR  | |dX|   |rhs|
        | c^T    cp  | |dp| = |rn |

    with c = xi_u * dot_scale * dzu (dzu over ALL unknowns incl. T) and
    cp = xi_p * dzp.  Returns (dX, dp)."""
    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    dtype = rhs.dtype
    rc = rhs[:Ntst * m * n].reshape(Ntst, m * n)
    r_per = rhs[Ntst * m * n: Ntst * m * n + n]
    r_phase = rhs[-1]
    dRc = dR[:Ntst * m * n].reshape(Ntst, m * n)
    dR_per = dR[Ntst * m * n: Ntst * m * n + n]
    dR_phase = dR[-1]

    H, k, G, kp = _stage1(blocks, rc, dRc)

    # reduce the border row theta*s*<dzu, dX> + xi_p dzp dp = rn over the
    # local unknowns du_loc_j = G_j - H_j du_j - k_j dT - kp_j dp
    w_nodes = dzu[:-1].reshape(Ntst * m + 1, n)
    wT = dzu[-1]
    w0 = w_nodes[jnp.arange(Ntst + 1) * m]                  # (Ntst+1, n)
    idxI = (jnp.arange(Ntst)[:, None] * m + jnp.arange(1, m + 1)[None, :])
    wI = w_nodes[idxI].reshape(Ntst, m * n)                 # (Ntst, m*n)
    # each boundary node (j+1)*m is BOTH interval j's m-th local unknown
    # and the external unknown du_{j+1}; its weight must enter the reduced
    # row exactly once — through the external (w0) path, so zero the
    # right-boundary slice of the local weights before substitution
    wI = wI.at[:, -n:].set(0.0)
    s = xi_u * dot_scale
    c_du = jnp.zeros((Ntst + 1, n), dtype).at[:].set(s * w0)
    c_du = c_du.at[:Ntst].add(-s * jnp.einsum("jr,jrn->jn", wI, H))
    c_T = s * (wT - jnp.einsum("jr,jr->", wI, k))
    c_p = -s * jnp.einsum("jr,jr->", wI, kp) + xi_p * dzp
    c_const = s * jnp.einsum("jr,jr->", wI, G)

    Next = (Ntst + 1) * n + 2
    border_row = jnp.zeros((Next,), dtype)
    border_row = border_row.at[:(Ntst + 1) * n].set(c_du.reshape(-1))
    border_row = border_row.at[(Ntst + 1) * n].set(c_T)
    border_row = border_row.at[Next - 1].set(c_p)
    border_rhs = rn - c_const

    du_bound, dT, dp = _external_system(
        blocks, H, k, G, kp, rc, r_per, r_phase,
        dR_per=dR_per, dR_phase=dR_phase,
        border_row=border_row, border_rhs=border_rhs)
    dX = _assemble_nodes(blocks, H, k, G, kp, du_bound, dT, dp)
    return dX, dp


def cop_bc_sigma(blocks: COPBlocks, a_res, b_unk, s_re, s_im=0.0):
    """MA test function on the DISCRETIZED variational operator (the
    matrix-free PO codim-2 core, ref MinAugPD.jl:35-257 / MinAugNS.jl:36-236
    which formulate sigma on the full collocation problem, not the dense
    monodromy): solve

        [ A_bc   a ] [v]   [0]
        [ b^H    0 ] [sig] [1]

    where A_bc is the collocation linearization (interior blocks Aint/B0,
    NO period column) closed by the Floquet boundary condition
    du_Ntst = (s_re + i s_im) du_0 — singular exactly when s is a Floquet
    multiplier (s = -1: period doubling; s = e^{i theta}: Neimark-Sacker).

    Stage 1 stays REAL (the interior blocks are real; complex a is solved
    by parts); only the small external system is complex, handled by the
    2K real-block embedding — TPU-safe f64 throughout.

    a_res: border column over rows [collocation (Ntst*m*n), boundary (n)],
    b_unk: border row over the node unknowns ((Ntst*m+1)*n); both may be
    complex.  Returns (sig_re, sig_im, v_re, v_im) with v over the nodes.
    """
    from ..linalg.linear import dense_factor, dense_factor_solve, dense_solve

    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    dt = blocks.Aint.dtype
    # real shift + real borders (PD / fold): skip the complex embedding —
    # the K-sized real external system is 8x cheaper to factor
    real_case = (isinstance(s_im, (int, float)) and float(s_im) == 0.0
                 and not jnp.iscomplexobj(a_res)
                 and not jnp.iscomplexobj(b_unk))

    def parts(x):
        return jnp.real(x).astype(dt), jnp.imag(x).astype(dt)

    a_c = a_res[:Ntst * m * n].reshape(Ntst, m * n)
    a_b = a_res[Ntst * m * n:]
    acr, aci = parts(a_c)
    abr, abi = parts(a_b)

    fac = jax.vmap(dense_factor)(blocks.Aint)
    solve = jax.vmap(dense_factor_solve)
    H = solve(fac, blocks.B0)                      # (Ntst, m*n, n)
    kar = solve(fac, acr[..., None])[..., 0]
    kai = solve(fac, aci[..., None])[..., 0]
    S = -H[:, -n:, :]
    tar = -kar[:, -n:]
    tai = -kai[:, -n:]

    # reduce the border row b^H over the local unknowns
    # (du_loc_j = -H_j du_j - ka_j sig); right-boundary weights ride the
    # external path (see cop_solve_bordered)
    w_nodes = b_unk.reshape(Ntst * m + 1, n)
    w0 = w_nodes[jnp.arange(Ntst + 1) * m]
    idxI = (jnp.arange(Ntst)[:, None] * m + jnp.arange(1, m + 1)[None, :])
    wI = w_nodes[idxI].reshape(Ntst, m * n)
    wI = wI.at[:, -n:].set(0.0)
    # b^H coefficients: conj(b) -> (Re b, -Im b)
    w0r, w0i = parts(w0)
    w0i = -w0i
    wIr, wIi = parts(wI)
    wIi = -wIi

    def reduce_row(w0x, wIx, kax):
        c_du = w0x.at[:Ntst].add(-jnp.einsum("jr,jrn->jn", wIx, H))
        c_sig = -jnp.einsum("jr,jr->", wIx, kax)
        return c_du, c_sig

    cdur, csig_rr = reduce_row(w0r, wIr, kar)      # Re-row x Re-col
    cdui, csig_ii = reduce_row(w0i, wIi, kai)      # Im-row x Im-col
    _, csig_ri = reduce_row(w0r, wIr, kai)         # Re-row x Im-col
    _, csig_ir = reduce_row(w0i, wIi, kar)
    c_sig_re = csig_rr - csig_ii
    c_sig_im = csig_ri + csig_ir

    # external complex system on y = [du_0..du_Ntst, sig], K unknowns
    K = (Ntst + 1) * n + 1
    eye = jnp.eye(n, dtype=dt)
    jidx = jnp.arange(Ntst)
    rowsA = jnp.zeros((Ntst, n, Ntst + 1, n), dt)
    rowsA = rowsA.at[jidx, :, jidx, :].set(-S)
    rowsA = rowsA.at[jidx, :, jidx + 1, :].add(
        jnp.broadcast_to(eye, (Ntst, n, n)))
    coupling = rowsA.reshape(Ntst * n, (Ntst + 1) * n)

    Mr = jnp.zeros((K, K), dt)
    Mi = jnp.zeros((K, K), dt)
    Mr = Mr.at[:Ntst * n, :(Ntst + 1) * n].set(coupling)
    Mr = Mr.at[:Ntst * n, K - 1].set(-tar.reshape(-1))
    Mi = Mi.at[:Ntst * n, K - 1].set(-tai.reshape(-1))
    # boundary row block: -s du_0 + du_Ntst + a_b sig = 0
    brow = Ntst * n
    Mr = Mr.at[brow:brow + n, 0:n].add(-jnp.asarray(s_re, dt) * eye)
    Mi = Mi.at[brow:brow + n, 0:n].add(-jnp.asarray(s_im, dt) * eye)
    Mr = Mr.at[brow:brow + n, Ntst * n:(Ntst + 1) * n].add(eye)
    Mr = Mr.at[brow:brow + n, K - 1].set(abr)
    Mi = Mi.at[brow:brow + n, K - 1].set(abi)
    # border row
    Mr = Mr.at[K - 1, :(Ntst + 1) * n].set(cdur.reshape(-1))
    Mi = Mi.at[K - 1, :(Ntst + 1) * n].set(cdui.reshape(-1))
    Mr = Mr.at[K - 1, K - 1].set(c_sig_re)
    Mi = Mi.at[K - 1, K - 1].set(c_sig_im)

    if real_case:
        rhs = jnp.zeros((K,), dt).at[K - 1].set(1.0)
        sol = dense_solve(Mr, rhs)
        du_r = sol[:(Ntst + 1) * n].reshape(Ntst + 1, n)
        sig_re = sol[K - 1]
        du_i = jnp.zeros_like(du_r)
        sig_im = jnp.zeros((), dt)
    else:
        big = jnp.block([[Mr, -Mi], [Mi, Mr]])
        rhs = jnp.zeros((2 * K,), dt).at[K - 1].set(1.0)
        sol = dense_solve(big, rhs)
        du_r = sol[:(Ntst + 1) * n].reshape(Ntst + 1, n)
        sig_re = sol[K - 1]
        du_i = sol[K:K + (Ntst + 1) * n].reshape(Ntst + 1, n)
        sig_im = sol[2 * K - 1]

    # back-substitution for the local unknowns (complex by parts)
    vloc_r = (-jnp.einsum("jrn,jn->jr", H, du_r[:Ntst])
              - kar * sig_re + kai * sig_im)
    vloc_i = (-jnp.einsum("jrn,jn->jr", H, du_i[:Ntst])
              - kar * sig_im - kai * sig_re)

    def assemble(du_bound, vloc):
        nodes = jnp.zeros((Ntst * m + 1, n), dt)
        nodes = nodes.at[0].set(du_bound[0])
        idx = (jnp.arange(Ntst)[:, None] * m
               + jnp.arange(1, m + 1)[None, :])
        nodes = nodes.at[idx.reshape(-1)].set(
            vloc.reshape(Ntst, m, n).reshape(-1, n))
        # the last node is the boundary du_Ntst (vloc's right-boundary
        # entries equal it by the coupling rows, but take the external
        # unknown for exactness)
        nodes = nodes.at[-1].set(du_bound[-1])
        return nodes.reshape(-1)

    return sig_re, sig_im, assemble(du_r, vloc_r), assemble(du_i, vloc_i)


def _cast_blocks(blocks: COPBlocks, dt) -> COPBlocks:
    return COPBlocks(Aint=blocks.Aint.astype(dt), B0=blocks.B0.astype(dt),
                     cT=blocks.cT.astype(dt), phi0=blocks.phi0.astype(dt),
                     phiI=blocks.phiI.astype(dt), n=blocks.n, m=blocks.m,
                     Ntst=blocks.Ntst)


def _border_reduction(blocks: COPBlocks, H, k, kp, dzu, dzp, xi_u, xi_p,
                      dot_scale):
    """Reduce the PALC arclength row over the local unknowns (the
    rhs-independent part): returns (border_row, wI, s) — the G-dependent
    constant is applied per-solve (`- s * <wI, G>`)."""
    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    dtype = H.dtype
    w_nodes = dzu[:-1].reshape(Ntst * m + 1, n)
    wT = dzu[-1]
    w0 = w_nodes[jnp.arange(Ntst + 1) * m]
    idxI = (jnp.arange(Ntst)[:, None] * m + jnp.arange(1, m + 1)[None, :])
    wI = w_nodes[idxI].reshape(Ntst, m * n)
    # each boundary node (j+1)*m is BOTH interval j's m-th local unknown
    # and the external unknown du_{j+1}; its weight enters once — through
    # the external (w0) path
    wI = wI.at[:, -n:].set(0.0)
    # keep every scalar at the factorization dtype: a stray f64 scale would
    # promote the row assembly and trip the f64->f32 scatter cast
    s = jnp.asarray(xi_u, dtype) * jnp.asarray(dot_scale, dtype)
    xi_p = jnp.asarray(xi_p, dtype)
    dzp = jnp.asarray(dzp, dtype)
    c_du = jnp.zeros((Ntst + 1, n), dtype).at[:].set(s * w0)
    c_du = c_du.at[:Ntst].add(-s * jnp.einsum("jr,jrn->jn", wI, H))
    c_T = s * (wT - jnp.einsum("jr,jr->", wI, k))
    c_p = -s * jnp.einsum("jr,jr->", wI, kp) + xi_p * dzp
    Next = (Ntst + 1) * n + 2
    border_row = jnp.zeros((Next,), dtype)
    border_row = border_row.at[:(Ntst + 1) * n].set(c_du.reshape(-1))
    border_row = border_row.at[(Ntst + 1) * n].set(c_T)
    border_row = border_row.at[Next - 1].set(c_p)
    return border_row, wI, s


def cop_factor(blocks: COPBlocks, dRc=None, border=None):
    """Reusable COP factorization at FIXED jacobian: the batched pivoted
    block LU, the reduced couplings (H, k [, kp]) and the FACTORED external
    matrix.  `border = (dzu_flat, dzp, xi_u, xi_p, dot_scale, dR_per,
    dR_phase)` adds the PALC parameter column + pre-reduced arclength row.

    This is the mixed-precision building block (VERDICT r3 #4): factor once
    in f32 (native MXU LU — the f64 path lowers to the 2x-flop QR fallback
    on TPU, docs/TPU_NOTES.md), then refine each solve against the f64
    structured matvec — the IterativeRefinement pattern applied to the COP
    path."""
    from ..linalg.linear import dense_factor, dense_factor_solve

    fac = jax.vmap(dense_factor)(blocks.Aint)
    solve = jax.vmap(dense_factor_solve)
    H = solve(fac, blocks.B0)
    k = solve(fac, blocks.cT[..., None])[..., 0]
    kp = None
    border_row = None
    wI = s = dR_per = dR_phase = None
    if border is not None:
        dzu, dzp, xi_u, xi_p, dot_scale, dR_per, dR_phase = border
        kp = solve(fac, dRc[..., None])[..., 0]
        border_row, wI, s = _border_reduction(blocks, H, k, kp, dzu, dzp,
                                              xi_u, xi_p, dot_scale)
    A = _external_matrix(blocks, H, k, kp, dR_per, dR_phase, border_row)
    A_fac = dense_factor(A)
    return dict(fac=fac, H=H, k=k, kp=kp, A_fac=A_fac, wI=wI, s=s)


def cop_factor_solve(blocks: COPBlocks, F, rhs, rn=None):
    """Solve with a `cop_factor` factorization: only triangular solves,
    the small external back-substitution and the node assembly — no new
    factorization.  Returns (dX, dp_or_None)."""
    from ..linalg.linear import dense_factor_solve

    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    rc = rhs[:Ntst * m * n].reshape(Ntst, m * n)
    r_per = rhs[Ntst * m * n: Ntst * m * n + n]
    r_phase = rhs[-1]
    G = jax.vmap(dense_factor_solve)(F["fac"], rc[..., None])[..., 0]
    bordered = F["kp"] is not None
    border_rhs = None
    if bordered:
        border_rhs = (jnp.asarray(rn, G.dtype)
                      - F["s"] * jnp.einsum("jr,jr->", F["wI"], G))
    b = _external_b(blocks, G, r_per, r_phase, border_rhs)
    y = dense_factor_solve(F["A_fac"], b)
    du_bound = y[:(Ntst + 1) * n].reshape(Ntst + 1, n)
    dT = y[(Ntst + 1) * n]
    dp = y[y.shape[0] - 1] if bordered else None
    dX = _assemble_nodes(blocks, F["H"], F["k"], G, F["kp"], du_bound, dT,
                         dp)
    return dX, dp


def cop_solve_mixed(blocks: COPBlocks, rhs, low_dtype=jnp.float32,
                    refinements: int = 3, rtol: float = 1e-10,
                    atol: float = 1e-13):
    """Mixed-precision COP solve: ONE f32 factorization (batched native-LU
    stage 1 + external LU) + f64 residual refinement through the structured
    matvec.  2-3 refinement passes reach f64-GMRES-grade residuals at
    f32 factorization cost (the TPU answer to the reference's f64 LAPACK
    COP, cop.jl:215-527; VERDICT r3 #4)."""
    lo = low_dtype
    blo = _cast_blocks(blocks, lo)
    F = cop_factor(blo)
    x0, _ = cop_factor_solve(blo, F, rhs.astype(lo))
    x = x0.astype(rhs.dtype)
    b_norm = jnp.linalg.norm(rhs)
    tol = jnp.maximum(rtol * b_norm, atol)

    def body(carry):
        x, _, kk = carry
        r = rhs - blocks(x)
        d, _ = cop_factor_solve(blo, F, r.astype(lo))
        x = x + d.astype(rhs.dtype)
        rn = jnp.linalg.norm(rhs - blocks(x))
        return x, rn, kk + 1

    def cond(carry):
        _, rn, kk = carry
        return jnp.logical_and(rn > tol, kk < refinements)

    x, rn, _ = jax.lax.while_loop(
        cond, body, (x, jnp.linalg.norm(rhs - blocks(x)), jnp.array(0)))
    return x, rn <= tol


def cop_solve_bordered_mixed(blocks: COPBlocks, rhs, rn_s, dR, dzu, dzp,
                             xi_u=1.0, xi_p=1.0, dot_scale=1.0,
                             low_dtype=jnp.float32, refinements: int = 3,
                             rtol: float = 1e-10, atol: float = 1e-13):
    """Mixed-precision one-pass bordered condensation (the COPBLS analogue
    of `cop_solve_mixed`): the f32 factorization carries the parameter
    column and the pre-reduced arclength row; refinement measures the FULL
    bordered residual [J dX + dR dp - rhs; <c,dX> + cp dp - rn]."""
    n, m, Ntst = blocks.n, blocks.m, blocks.Ntst
    lo = low_dtype
    dt = rhs.dtype
    blo = _cast_blocks(blocks, lo)
    dRc = dR[:Ntst * m * n].reshape(Ntst, m * n).astype(lo)
    dR_per = dR[Ntst * m * n: Ntst * m * n + n]
    dR_phase = dR[-1]
    F = cop_factor(blo, dRc,
                   border=(dzu.astype(lo), jnp.asarray(dzp, lo), xi_u,
                           xi_p, dot_scale, dR_per.astype(lo),
                           jnp.asarray(dR_phase, lo)))
    x0, dp0 = cop_factor_solve(blo, F, rhs.astype(lo),
                               rn=jnp.asarray(rn_s, lo))
    x = x0.astype(dt)
    dp = dp0.astype(dt)
    sclu = xi_u * dot_scale

    def resid(x, dp):
        top = rhs - blocks(x) - dp * dR
        bot = (jnp.asarray(rn_s, dt) - sclu * jnp.dot(dzu, x)
               - xi_p * dzp * dp)
        return top, bot

    b_norm = jnp.maximum(jnp.linalg.norm(rhs), jnp.abs(rn_s))
    tol = jnp.maximum(rtol * b_norm, atol)

    def body(carry):
        x, dp, _, kk = carry
        top, bot = resid(x, dp)
        d, ddp = cop_factor_solve(blo, F, top.astype(lo),
                                  rn=bot.astype(lo))
        x = x + d.astype(dt)
        dp = dp + ddp.astype(dt)
        top2, bot2 = resid(x, dp)
        rnorm = jnp.maximum(jnp.linalg.norm(top2), jnp.abs(bot2))
        return x, dp, rnorm, kk + 1

    def cond(carry):
        _, _, rnorm, kk = carry
        return jnp.logical_and(rnorm > tol, kk < refinements)

    top0, bot0 = resid(x, dp)
    r0 = jnp.maximum(jnp.linalg.norm(top0), jnp.abs(bot0))
    x, dp, rnorm, _ = jax.lax.while_loop(cond, body,
                                         (x, dp, r0, jnp.array(0)))
    return x, dp, rnorm <= tol


def cop_solve_block(blocks: COPBlocks, R, C, D, E, s):
    """k-border block solve with the COP inner solver (the explicit
    multi-border elimination of ref solve_bls_block,
    src/LinearBorderSolver.jl:173-206):

        [ J_PO  C ] [x]   [R]       J_PO = blocks ((N+1) square),
        [ D     E ] [y] = [s]       C: (N+1, k), D: (k, N+1), E: (k, k).

    x1 = J\\R, X2 = J\\C (vmapped condensations), Schur y, back-substitute."""
    k = C.shape[1]
    x1 = cop_solve(blocks, R)
    X2 = jax.vmap(lambda c: cop_solve(blocks, c), in_axes=1,
                  out_axes=1)(C)
    Schur = E - D @ X2
    from ..linalg.linear import dense_solve

    y = dense_solve(Schur, s - D @ x1)
    x = x1 - X2 @ y
    return x, y


@dataclasses.dataclass(frozen=True)
class COPLS:
    """Linear solver consuming the structured COPBlocks jacobian
    (ref COPLS, cop.jl:85).  Use via
    `periodic_orbit_problem(..., use_cop=True)` +
    `NewtonPar(linsolver=COPLS())`.

    `low_dtype=jnp.float32` switches to the mixed-precision path: f32
    batched stage-1/external factorizations (native MXU LU instead of the
    emulated-f64 QR fallback) + f64 residual refinement through the
    structured matvec (VERDICT r3 #4)."""

    needs_matrix = True   # ask Newton for prob.jacobian (the blocks)
    low_dtype: Any = None
    refinements: int = 3
    rtol: float = 1e-10
    atol: float = 1e-13

    def __call__(self, J: COPBlocks, rhs, a0=0.0, a1=1.0):
        from ..core.state import ravel

        flat, unravel = ravel(rhs)
        if self.low_dtype is not None:
            sol, cv = cop_solve_mixed(J, flat, low_dtype=self.low_dtype,
                                      refinements=self.refinements,
                                      rtol=self.rtol, atol=self.atol)
            return unravel(sol), cv, jnp.array(1 + self.refinements)
        sol = cop_solve(J, flat)
        return unravel(sol), jnp.array(True), jnp.array(1)


@dataclasses.dataclass(frozen=True)
class COPBLS:
    """Bordered linear solver doing ONE condensation for the whole PALC
    system (ref COPBLS, cop.jl:107) — drop-in for BorderingBLS in the
    continuation kernels when the jacobian is COPBlocks.  Auto-wired by
    `continuation_po(..., use_cop=True)`.  `low_dtype=jnp.float32` =
    mixed-precision condensation (see COPLS)."""

    needs_matrix = True
    low_dtype: Any = None
    refinements: int = 3
    rtol: float = 1e-10
    atol: float = 1e-13

    def __call__(self, J: COPBlocks, dR, dzu, dzp, R, n, xi_u=1.0,
                 xi_p=1.0, shift=None, dotp=None):
        if shift is not None:
            raise NotImplementedError("COPBLS does not support shifts")
        from ..core.state import ravel
        from ..linalg.bordered import _default_dotp, _dotp_row_scale

        dR_flat, _ = ravel(dR)
        dzu_flat, unravel_state = ravel(dzu)
        R_flat, _ = ravel(R)
        N = dzu_flat.shape[0]
        scale = _dotp_row_scale(dotp or _default_dotp, dzu_flat, N)
        if self.low_dtype is not None:
            dX, dp, cv = cop_solve_bordered_mixed(
                J, R_flat, jnp.asarray(n), dR_flat, dzu_flat,
                jnp.asarray(dzp), xi_u=xi_u, xi_p=xi_p, dot_scale=scale,
                low_dtype=self.low_dtype, refinements=self.refinements,
                rtol=self.rtol, atol=self.atol)
            return (unravel_state(dX), dp, cv,
                    jnp.array(1 + self.refinements))
        dX, dp = cop_solve_bordered(J, R_flat, jnp.asarray(n), dR_flat,
                                    dzu_flat, jnp.asarray(dzp),
                                    xi_u=xi_u, xi_p=xi_p, dot_scale=scale)
        return unravel_state(dX), dp, jnp.array(True), jnp.array(1)
