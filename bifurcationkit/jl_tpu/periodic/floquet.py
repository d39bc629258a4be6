"""Floquet stability solvers (ref src/periodicorbit/Floquet.jl).

The discretizations expose `monodromy(prob_vf, X, po_par)`; the eigensolver
below receives that matrix through the engine's `eig_jacobian` hook and
returns Floquet *exponents* log(mu) sorted by decreasing real part — which is
exactly what the detection layer consumes, with `is_floquet=True` switching
the classification to pd/ns (ref src/Bifurcations.jl:103-137).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..linalg.eig import _complex_dtype, dense_eig


@dataclasses.dataclass(frozen=True)
class FloquetEig:
    """Multipliers of the monodromy matrix -> Floquet exponents
    (ref FloquetQaD :48 / FloquetColl :533; the trivial multiplier mu = 1
    sits at exponent 0 — use tol_stability ~ 1e-6 for PO runs, as the
    reference does, e.g. examples/brusselator.jl:140)."""

    is_floquet: bool = True

    def __call__(self, M, nev: int):
        mult, vecs = dense_eig(M)          # sorted by Re(mu) desc
        expo = jnp.log(mult.astype(_complex_dtype()))
        order = jnp.lexsort((-expo.imag, -expo.real))
        expo = expo[order]
        vecs = vecs[:, order]
        nev = min(nev, M.shape[0])
        return expo[:nev], vecs[:, :nev], jnp.array(True), jnp.array(1)


def monodromy_from_maps(maps, method: str = "assoc"):
    """Product M = M_{Ntst-1} @ ... @ M_0 of per-interval fundamental maps
    (the reference computes this as a sequential chain, ref Floquet.jl:
    653-660).

    method="seq":   lax.scan chain — O(Ntst) depth, minimal flops.
    method="assoc": jax.lax.associative_scan tree product — O(log Ntst)
      depth.  This is the time-slice-parallel "ring analog" (SURVEY §2.3):
      with `maps` sharded over a mesh time axis, XLA lowers the tree into
      log2(Ntst) rounds of pairwise matmuls + ICI exchanges instead of a
      serial Ntst-long dependency chain.
    """
    if method == "seq":
        def chain(M, Mi):
            return Mi @ M, None

        n = maps.shape[-1]
        M, _ = jax.lax.scan(chain, jnp.eye(n, dtype=maps.dtype), maps)
        return M

    def compose(a, b):
        # composition "apply a, then b" — associative
        return jnp.einsum("...ij,...jk->...ik", b, a)

    prefixes = jax.lax.associative_scan(compose, maps)
    return prefixes[-1]


@dataclasses.dataclass(frozen=True)
class FloquetColl:
    """COP-reusing Floquet solver for collocation (ref FloquetColl,
    Floquet.jl:533-760): stage-1 blockwise elimination of the collocation
    jacobian yields per-interval fundamental maps S_j (the B_i^{-1} A_i
    couples of :625-659); the multipliers are the spectrum of their
    product, accumulated with per-step max-norm renormalization carried in
    log space so strongly unstable/stable orbits neither overflow nor
    denormalize f64 (the stabilized form of the :653-660 chain).

    Expects `eig_jacobian` to hand over the COPBlocks
    (periodic_orbit_problem(..., use_cop=True, floquet="coll")).

    `low_dtype=jnp.float32` runs the stage-1 factorizations + product at
    f32 (native MXU LU — the f64 path lowers to the 2x-flop QR fallback on
    TPU): multipliers carry ~1e-4 relative error, ample for count-based
    detection at tol_stability >= 1e-3 (the same accuracy argument as the
    engine's f32 stability sweeps, kernels.py eig_dtype); keep the f64
    default when bisection-localizing PD/NS to tight multiplier
    tolerances."""

    is_floquet: bool = True
    low_dtype: object = None

    def device_reduce(self, blocks):
        """Stage-1 elimination + renormalized monodromy product, entirely
        on device in REAL arithmetic.  Returns (P, logs): the max-norm
        scaled product and the accumulated log of the scalings.  The small
        (n, n) eigenproblem then runs host-side (`host_eig`) as an f64 eig
        of this device-precision reduction (accuracy is bounded by the
        reduction dtype, f64 only when x64 is on) — the engine's two-stage
        eig path uses this split on every backend
        (kernels.py::eig_kernel): it avoids both the sequential device
        Francis-QR (latency-bound on a tunneled chip) and the complex64
        precision cap of TPU device complex."""
        from .cop import _cast_blocks, cop_interval_maps

        if self.low_dtype is not None:
            blocks = _cast_blocks(blocks, self.low_dtype)
        S = cop_interval_maps(blocks)              # (Ntst, n, n)
        n = S.shape[-1]

        def chain(carry, Sj):
            P, logs = carry
            P = Sj @ P
            s = jnp.maximum(jnp.max(jnp.abs(P)), float(jnp.finfo(P.dtype).tiny))
            return (P / s, logs + jnp.log(s)), None

        (P, logs), _ = jax.lax.scan(
            chain, (jnp.eye(n, dtype=S.dtype),
                    jnp.zeros((), S.dtype)), S)
        return P, logs

    def host_eig(self, P, logs, nev: int, with_vectors: bool = True):
        """Floquet exponents from the device-reduced (P, logs) — host numpy
        f64 eig of the device-precision reduction (the eig itself runs in
        f64, but it cannot recover precision already lost in an f32
        stage-1/product; the reduction dtype is the accuracy bound).  Same
        division of labor as the Arnoldi Hessenberg eig: device does the
        O(Ntst n^3) reduction, host the O(n^3) small dense eig."""
        P = np.asarray(P)
        nev = min(nev, P.shape[0])
        try:
            w, v = np.linalg.eig(P)
        except np.linalg.LinAlgError:
            # report as converged_eig=False like every other eig path
            # instead of aborting the continuation step (ADVICE r3)
            nan = np.full((nev,), np.nan + 0j, np.complex128)
            return nan, None, False, 1
        expo = np.log(w.astype(np.complex128)) + float(logs)
        order = np.lexsort((-expo.imag, -expo.real))
        expo = expo[order]
        v = v[:, order]
        return (expo[:nev], v[:, :nev] if with_vectors else None,
                True, 1)


    def __call__(self, blocks, nev: int):
        P, logs = self.device_reduce(blocks)
        mult, vecs = dense_eig(P)                  # scaled multipliers
        cdt = _complex_dtype()
        # add the renormalization log in the MATCHING real precision: c64
        # + f64 would promote to complex128, which the TPU compiler
        # rejects outright
        rdt = jnp.float32 if cdt == jnp.complex64 else jnp.float64
        expo = jnp.log(mult.astype(cdt)) + logs.astype(rdt)
        order = jnp.lexsort((-expo.imag, -expo.real))
        expo = expo[order]
        vecs = vecs[:, order]
        nev = min(nev, P.shape[0])
        return expo[:nev], vecs[:, :nev], jnp.array(True), jnp.array(1)


@dataclasses.dataclass(frozen=True)
class FloquetQaDMF:
    """Matrix-free FloquetQaD (ref Floquet.jl:89-109, MF shooting variant
    :164-254): the monodromy is applied as an OPERATOR (chain of
    per-segment flow jvps / per-slice trapeze half-step solves — see
    `Shooting.monodromy_operator` / `Trapeze.monodromy_operator`) and the
    leading multipliers come from Krylov :LM on it.  This is the PDE-scale
    shooting stability path: a `jacfwd` monodromy at n >~ 10^3 costs n
    variational integrations and O(n^2) memory; here a sweep costs
    krylov_dim of them and O(krylov_dim * n).

    Expects `eig_jacobian` to hand over the operator
    (periodic_orbit_problem(..., floquet="qad_mf"))."""

    is_floquet: bool = True
    accepts_v0: bool = True
    eigsolver: object = dataclasses.field(
        default_factory=lambda: _default_mf_eig())

    def __call__(self, op, nev: int, v0=None):
        try:
            mult, vecs, cv, it = self.eigsolver(op, nev, v0=v0)
        except TypeError:
            mult, vecs, cv, it = self.eigsolver(op, nev)
        expo = jnp.log(mult.astype(_complex_dtype()))
        order = jnp.lexsort((-expo.imag, -expo.real))
        return expo[order], vecs[:, order], cv, it

    def seed_cols(self, nev: int):
        # warm-start contract: blocked inner solvers (SubspaceEig) take the
        # full previous block; Arnoldi takes a single recombined direction
        inner = getattr(self.eigsolver, "seed_cols", None)
        return inner(nev) if callable(inner) else None

    def make_seed(self, vecs, ncols: int):
        inner = getattr(self.eigsolver, "make_seed", None)
        if callable(inner):
            return inner(vecs, ncols)
        return jnp.real(vecs[:, :ncols])


def _default_mf_eig():
    from ..linalg.eig import ArnoldiEig

    return ArnoldiEig(which="LM", krylov_dim=30, restarts=3, tol=1e-9)


def floquet_multipliers(disc, prob_vf, X, po_par):
    """Host-friendly: the Floquet multipliers of an orbit."""
    Mn = disc.monodromy(prob_vf, X, po_par)
    mult, _ = dense_eig(Mn)
    return np.asarray(mult)


@dataclasses.dataclass(frozen=True)
class FloquetGEV:
    """Floquet multipliers from the block-bidiagonal periodic pencil
    A X = mu B X over the per-interval maps (ref FloquetGEV,
    Floquet.jl:424-531) — avoids the explicit monodromy product, so the
    accuracy does not degrade with Ntst (ref precision caveat,
    Floquet.jl:28-31).  Expects `eig_jacobian` to return the (Ntst, n, n)
    interval maps (periodic_orbit_problem(..., floquet="gev"))."""

    is_floquet: bool = True

    def __call__(self, maps, nev: int):
        from ..linalg.geig import dense_gev

        Ntst, n, _ = maps.shape
        N = Ntst * n
        A = jnp.zeros((N, N), maps.dtype)
        B = jnp.zeros((N, N), maps.dtype)
        eye = jnp.eye(n, dtype=maps.dtype)
        for j in range(Ntst):
            r = slice(j * n, (j + 1) * n)
            A = A.at[r, r].set(maps[j])
            if j < Ntst - 1:
                A = A.at[r, (j + 1) * n:(j + 2) * n].set(-eye)
            else:
                B = B.at[r, 0:n].set(eye)
        mult, vecs = dense_gev(A, B)
        # keep the finite multipliers (the pencil has N - n infinite ones)
        expo = jnp.log(mult.astype(_complex_dtype()))
        order = jnp.lexsort((-expo.imag, -expo.real))
        expo = expo[order]
        vecs = vecs[:, order]
        # infinite multipliers sort to the front with +inf real part: the
        # detection layer only uses the leading finite ones, so drop them
        finite = jnp.isfinite(expo.real)
        expo = jnp.where(finite, expo, -jnp.inf - 0j)
        order2 = jnp.lexsort((-expo.imag, -expo.real))
        expo = expo[order2]
        vecs = vecs[:, order2]
        nev = min(nev, n)
        return expo[:nev], vecs[:, :nev], jnp.array(True), jnp.array(1)
