"""Eigen solver abstraction (ref src/EigSolver.jl:4-266).

An eigen solver is a callable

    eig(J, nev) -> (values, vectors, converged, n_iter)

returning the ``nev`` *rightmost* eigenvalues sorted by decreasing real part
(the ordering the detection layer relies on — ref src/EigSolver.jl:12-18) and
the matching eigenvectors as columns of `vectors` (or None).

TPU realities shape the implementations:

* XLA has no non-symmetric dense eigendecomposition on TPU, so `DenseEig`
  routes the (small, host-friendly) dense problem through `pure_callback` to
  LAPACK — shape-static, jit-compatible, deterministic.  This replaces the
  reference's `DefaultEig` (LAPACK `eigen`).
* Large / matrix-free problems use `ArnoldiEig` — a JAX-native Arnoldi
  process with a preallocated Krylov basis (all matvecs stay on-device; only
  the tiny (m x m) Hessenberg eigenproblem crosses to the host).  This
  replaces ARPACK/KrylovKit/ArnoldiMethod (ref src/EigSolver.jl:67-244).
* `ShiftInvertEig` composes any eig solver with a linear solver, mapping
  theta -> sigma + 1/theta (ref `ShiftInvert`, src/EigSolver.jl:246-266).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import ravel
from .linear import apply_J, is_operator


def _complex_dtype():
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


def _host_eig_sorted(A):
    """Host LAPACK eig, sorted by decreasing real part (stable tie-break on
    decreasing imag so complex pairs come out adjacently and deterministically)."""
    w, v = np.linalg.eig(np.asarray(A))
    order = np.lexsort((-w.imag, -w.real))
    return w[order].astype(np.complex128), v[:, order].astype(np.complex128)


def dense_eig(A: jnp.ndarray, with_vectors: bool = True):
    """jit-compatible dense non-symmetric eigendecomposition via host callback."""
    n = A.shape[0]
    cdtype = _complex_dtype()
    out_shape = (jax.ShapeDtypeStruct((n,), cdtype),
                 jax.ShapeDtypeStruct((n, n), cdtype))

    def cb(a):
        w, v = _host_eig_sorted(a)
        return (np.asarray(w, dtype=cdtype), np.asarray(v, dtype=cdtype))

    w, v = jax.pure_callback(cb, out_shape, A, vmap_method="sequential")
    return (w, v) if with_vectors else (w, None)


@dataclasses.dataclass(frozen=True)
class DenseEig:
    """Dense eigensolver (ref `DefaultEig`, src/EigSolver.jl:37-64)."""

    def __call__(self, J, nev: int):
        if is_operator(J):
            raise TypeError("DenseEig needs a dense matrix jacobian; use "
                            "ArnoldiEig for matrix-free operators")
        w, v = dense_eig(J, with_vectors=True)
        return w[:nev], v[:, :nev], jnp.array(True), jnp.array(1)


def _host_small_eig(H):
    """Eig of the (m x m) Hessenberg matrix on host, sorted by |.| descending
    magnitude of real part comes later — we sort by decreasing real part."""
    w, v = np.linalg.eig(np.asarray(H))
    order = np.lexsort((-w.imag, -w.real))
    return (w[order].astype(np.complex128), v[:, order].astype(np.complex128))


@dataclasses.dataclass(frozen=True)
class ArnoldiEig:
    """Matrix-free Arnoldi for the rightmost part of the spectrum.

    A fixed `krylov_dim`-step Arnoldi factorization A V_m = V_m H_m + f e_m^T
    is built fully on device (`lax.fori_loop` over matvecs + modified
    Gram-Schmidt with reorthogonalization); only the (m x m) Hessenberg
    eigenproblem is solved on the host.  Ritz residuals |h_{m+1,m}| |e_m^T y|
    give convergence flags.  With `restarts > 1`, explicit polynomial
    restarting re-seeds the start vector with the sum of the wanted Ritz
    directions.
    """

    krylov_dim: int = 40
    tol: float = 1e-10
    restarts: int = 3
    which: str = "LR"     # LR = largest real (default), LM = largest modulus
    seed: int = 7

    def __call__(self, J, nev: int):
        matvec, n, dtype = _as_flat_matvec(J)
        m = min(self.krylov_dim, n)
        cdtype = _complex_dtype()

        key = jax.random.PRNGKey(self.seed)
        v0 = jax.random.normal(key, (n,), dtype)

        which_lm = self.which == "LM"

        def host_ritz(H, fnorm):
            Hm = np.asarray(H)
            w, y = np.linalg.eig(Hm)
            if which_lm:
                order = np.lexsort((-w.imag, -np.abs(w)))
            else:
                order = np.lexsort((-w.imag, -w.real))
            w, y = w[order], y[:, order]
            resid = np.abs(fnorm) * np.abs(y[-1, :])
            return (w.astype(np.complex128), y.astype(np.complex128),
                    resid.astype(np.float64))

        def ritz_callback(H, fnorm):
            out_shape = (jax.ShapeDtypeStruct((m,), cdtype),
                         jax.ShapeDtypeStruct((m, m), cdtype),
                         jax.ShapeDtypeStruct((m,), jnp.float64 if
                                              jax.config.jax_enable_x64
                                              else jnp.float32))

            def cb(Hh, fn):
                w, y, r = host_ritz(Hh, fn)
                return (w.astype(cdtype), y.astype(cdtype),
                        r.astype(out_shape[2].dtype))

            return jax.pure_callback(cb, out_shape, H, fnorm,
                                     vmap_method="sequential")

        def one_factorization(v_start):
            V = jnp.zeros((m + 1, n), dtype)
            H = jnp.zeros((m + 1, m), dtype)
            nrm = jnp.linalg.norm(v_start)
            V = V.at[0].set(v_start / jnp.maximum(nrm, 1e-300))

            def step(j, VH):
                V, H = VH
                w = matvec(V[j])

                def mgs(i, wh):
                    w, h = wh
                    hij = jnp.where(i <= j, jnp.vdot(V[i], w), 0.0)
                    return w - hij * V[i], h.at[i].add(hij)

                h = jnp.zeros((m + 1,), dtype)
                w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, h))
                w, h2 = jax.lax.fori_loop(0, m + 1, mgs,
                                          (w, jnp.zeros_like(h)))
                h = h + h2
                beta = jnp.linalg.norm(w)
                H = H.at[:, j].set(h.at[j + 1].set(beta))
                V = V.at[j + 1].set(w / jnp.maximum(beta, 1e-300))
                return V, H

            V, H = jax.lax.fori_loop(0, m, step, (V, H))
            return V, H

        V, H = one_factorization(v0)
        vals, y, resid = ritz_callback(H[:m, :m], H[m, m - 1])

        for _ in range(self.restarts - 1):
            # explicit restart: recombine the wanted Ritz directions
            conv = jnp.all(resid[:nev] < self.tol)
            wsum = jnp.real(V[:m].T @ jnp.sum(y[:, :nev], axis=1))
            v_new = jnp.where(conv, V[0], wsum / jnp.maximum(
                jnp.linalg.norm(wsum), 1e-300))
            V2, H2 = one_factorization(v_new)
            vals2, y2, resid2 = ritz_callback(H2[:m, :m], H2[m, m - 1])
            V = jnp.where(conv, V, V2)
            vals = jnp.where(conv, vals, vals2)
            y = jnp.where(conv, y, y2)
            resid = jnp.where(conv, resid, resid2)

        vecs = (V[:m].T.astype(cdtype)) @ y[:, :nev]
        converged = jnp.all(resid[:nev] < self.tol)
        return vals[:nev], vecs, converged, jnp.array(m * self.restarts)


@dataclasses.dataclass(frozen=True)
class ShiftInvertEig:
    """Shift-invert wrapper: eigensolve (J - sigma I)^{-1} and map back
    (ref `ShiftInvert`, src/EigSolver.jl:246-266).  Targets the eigenvalues
    nearest `sigma` — the right tool for rightmost-eigenvalue stability
    queries on PDE jacobians whose spectrum extends far left."""

    sigma: float = 0.0
    eigsolver: Any = dataclasses.field(
        default_factory=lambda: ArnoldiEig(which="LM"))
    linsolver: Any = None   # defaults to DenseLS for matrices

    def __call__(self, J, nev: int):
        from .linear import DenseLS

        ls = self.linsolver
        sigma = self.sigma
        if is_operator(J):
            if ls is None:
                raise ValueError("ShiftInvertEig on an operator needs an "
                                 "iterative linsolver")
            probe = getattr(J, "example_vector", None)
            if probe is None:
                raise ValueError("operator J must expose example_vector "
                                 "(wrap with FlatOperator)")
            flat0, _ = ravel(probe)

            def raw_op(v):
                sol, _, _ = ls(lambda w: _shift_op(J, w, sigma), v)
                return sol

            op = FlatOperator(raw_op, flat0.shape[0], flat0.dtype)
        else:
            ls = ls or DenseLS()
            n = J.shape[0]
            A = J - sigma * jnp.eye(n, dtype=J.dtype)
            lu_piv = jax.scipy.linalg.lu_factor(A)

            op = FlatOperator(
                lambda v: jax.scipy.linalg.lu_solve(lu_piv, v), n, J.dtype)

        vals, vecs, cv, it = self.eigsolver(op, nev)
        new_vals = sigma + 1.0 / vals
        order = jnp.lexsort((-new_vals.imag, -new_vals.real))
        new_vals = new_vals[order]
        if vecs is not None:
            vecs = vecs[:, order]
        return new_vals, vecs, cv, it


def _shift_op(J, w, sigma):
    from ..core.state import tree_axpy

    return tree_axpy(-sigma, w, apply_J(J, w))


def _as_flat_matvec(J):
    """Normalize a jacobian representation to a flat-vector matvec."""
    if is_operator(J):
        probe = getattr(J, "example_vector", None)
        if probe is None:
            raise ValueError(
                "matrix-free eigensolve needs the operator to expose "
                "`example_vector` (a pytree with the state structure) or "
                "wrap it with FlatOperator(op, n)")
        flat0, unravel = ravel(probe)
        n = flat0.shape[0]

        def matvec(v):
            out = J(unravel(v))
            of, _ = ravel(out)
            return of

        return matvec, n, flat0.dtype
    n = J.shape[0]

    def matvec(v):
        return J @ v

    return matvec, n, J.dtype


@dataclasses.dataclass(frozen=True)
class FlatOperator:
    """Wrap a flat-vector matvec with its dimension for the eig layer."""

    op: Callable
    n: int
    dtype: Any = None

    @property
    def example_vector(self):
        dt = self.dtype or (jnp.float64 if jax.config.jax_enable_x64
                            else jnp.float32)
        return jnp.zeros((self.n,), dt)

    def __call__(self, v):
        return self.op(v)
