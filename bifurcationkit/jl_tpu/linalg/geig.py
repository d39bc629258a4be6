"""Generalized eigenvalue solvers A x = lambda B x
(ref src/GeneralizedEigenSolver.jl) — DAE/mass-matrix stability and the
Floquet-GEV path.

Dense path routes through host LAPACK `scipy`-style QZ via pure_callback
(no TPU QZ exists); the iterative path reduces to a standard eigenproblem
with the Krylov machinery: A x = lambda B x -> (B^{-1} A) x = lambda x using
a linear solver for B (ref `gev`, :19-70)."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .eig import ArnoldiEig, _complex_dtype
from .linear import DenseLS, is_operator


def dense_gev(A, B, with_vectors: bool = True):
    """QZ-based generalized eig on host, sorted by decreasing real part."""
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
            raise NotImplementedError("matrix-free GEV: wrap B^{-1}A "
                                      "yourself with FlatOperator")
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
