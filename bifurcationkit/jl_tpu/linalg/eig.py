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
    """complex128 when x64 is on AND the backend supports it.  TPU has no
    C128 (FFT/matmul/storage), so device-side complex drops to complex64
    there — host callbacks still do their math in f64 before casting."""
    if jax.config.jax_enable_x64 and jax.default_backend() != "tpu":
        return jnp.complex128
    return jnp.complex64


def _host_eig_sorted(A):
    """Host LAPACK eig, sorted by decreasing real part (stable tie-break on
    decreasing imag so complex pairs come out adjacently and deterministically)."""
    w, v = np.linalg.eig(np.asarray(A))
    order = np.lexsort((-w.imag, -w.real))
    return w[order].astype(np.complex128), v[:, order].astype(np.complex128)


def qr_eigvals(A: jnp.ndarray, iters: int = 120):
    """Eigenvalues of a real square matrix ENTIRELY ON DEVICE — no LAPACK,
    no host callback (the axon TPU runtime supports neither C128 nor
    pure_callback, and XLA has no non-symmetric eig on TPU).

    Explicit Francis double-shift QR iteration in real arithmetic:
        s, t = trace/det of the trailing 2x2
        M = A@A - s A + t I;  Q, R = qr(M);  A <- Q^T A Q
    runs a fixed `iters` count (static shapes), with an exceptional shift
    every 16 sweeps to break symmetric-cycle stagnation.  Eigenvalues are
    then read off the quasi-triangular result: real 1x1 blocks and complex
    pairs from the 2x2 blocks whose subdiagonal survived.  Returns them
    sorted by decreasing real part (the detection layer's contract).

    Accuracy ~1e-9 (f64) / ~1e-4 (f32) relative on well-separated spectra
    — ample for stability counting, classification and bisection."""
    n = A.shape[0]
    if n == 1:
        return A[0, 0].astype(_complex_dtype())[None]
    dt = A.dtype
    eyen = jnp.eye(n, dtype=dt)
    idx = jnp.arange(n)
    tol = 100 * jnp.finfo(dt).eps
    if iters is None or iters < 8 * n:
        iters = max(120, 8 * n)

    def get(Ak, i, j):
        return jax.lax.dynamic_slice(Ak, (i, j), (1, 1))[0, 0]

    # ---- Householder reduction to Hessenberg form (on device) ----------
    def hess_step(j, Ak):
        x = jnp.where(idx > j, Ak[:, j], 0.0)
        nx = jnp.linalg.norm(x)
        xj1 = get(Ak, j + 1, j)
        alpha = -jnp.sign(jnp.where(xj1 == 0, 1.0, xj1)) * nx
        v = x - alpha * (idx == j + 1).astype(dt)
        nv = jnp.linalg.norm(v)
        v = jnp.where(nv > tol * (nx + 1.0), v / jnp.maximum(nv, 1e-300),
                      jnp.zeros_like(v))
        Ak = Ak - 2.0 * jnp.outer(v, v @ Ak)
        Ak = Ak - 2.0 * jnp.outer(Ak @ v, v)
        return Ak

    H = jax.lax.fori_loop(0, n - 2, hess_step, A)
    below = idx[:, None] > idx[None, :] + 1
    H = jnp.where(below, 0.0, H)

    # ---- implicit Francis double-shift sweeps (bulge chasing) ----------
    # Explicit QR of p(H) breaks down exactly when a shift nears an
    # eigenvalue (p(H) singular -> Q trailing columns arbitrary), which is
    # every convergence event; the implicit form only ever applies 3x3
    # Householder reflectors, the textbook-stable formulation
    # (Golub & Van Loan Alg. 7.5.1), and preserves Hessenberg structure
    # by construction.
    def apply_refl(Hk, v):
        # H <- P H P with P = I - 2 v v^T (v already normalized or zero)
        Hk = Hk - 2.0 * jnp.outer(v, v @ Hk)
        Hk = Hk - 2.0 * jnp.outer(Hk @ v, v)
        return Hk

    def house3(px, py, pz, j, q):
        """Normalized Householder vector (as a full-n array, nonzeros at
        j, j+1, j+2) annihilating (py, pz) of (px, py, pz); the third
        component is masked away when j + 2 >= q."""
        use3 = (j + 2 < q)
        pz = jnp.where(use3, pz, 0.0)
        nx = jnp.sqrt(px * px + py * py + pz * pz)
        alpha = -jnp.sign(jnp.where(px == 0, 1.0, px)) * nx
        v0 = px - alpha
        nv = jnp.sqrt(v0 * v0 + py * py + pz * pz)
        ok = nv > 1e-300
        inv = jnp.where(ok, 1.0 / jnp.maximum(nv, 1e-300), 0.0)
        vec3 = jnp.stack([v0, py, pz]) * inv
        # defensive SECOND normalization: the whole sweep rides on
        # ||v|| in {0, 1}; in the degenerate all-roundoff case
        # (Cayley-Hamilton zero first column at a 2x2 window) compiler
        # fusion of the chain above has been observed to yield ||v|| = 2,
        # which turns P = I - 2vv^T into a similarity-breaking scaling.
        # Renormalizing from vec3 itself cannot be cross-fused away.
        nrm3 = jnp.linalg.norm(vec3)
        vec3 = jnp.where(nrm3 > 0.5, vec3 / jnp.maximum(nrm3, 1e-300),
                         jnp.zeros_like(vec3))
        v = jnp.zeros((n + 2,), dt)
        v = jax.lax.dynamic_update_slice(v, vec3, (j,))
        return v[:n]

    def sweep(k, carry):
        Hk, q, stall = carry

        qm2 = jnp.maximum(q - 2, 0)
        blk = jax.lax.dynamic_slice(Hk, (qm2, qm2), (2, 2))
        s = blk[0, 0] + blk[1, 1]
        t = blk[0, 0] * blk[1, 1] - blk[0, 1] * blk[1, 0]
        # randomized exceptional shift on long stalls (deterministic,
        # keyed on the sweep index): breaks shift cycles
        exc = (stall >= 12) & ((stall % 13) == 12)
        nrm = jnp.max(jnp.where(idx < q, jnp.abs(jnp.diag(Hk)), 0.0)) + 1.0
        r = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(11), k),
                              (2,), dt)
        s = jnp.where(exc, nrm * r[0], s)
        t = jnp.where(exc, nrm * nrm * r[1], t)

        # the sweep must act on the LOWEST unreduced Hessenberg block
        # [l, q): a negligible subdiagonal in the middle stops the bulge,
        # so starting at row 0 would never converge the bottom block
        diag_abs = jnp.abs(jnp.diag(Hk))
        sub_abs = jnp.abs(jnp.concatenate([jnp.ones((1,), dt),
                                           jnp.diag(Hk, -1)]))
        neg = sub_abs <= tol * (diag_abs
                                + jnp.concatenate([diag_abs[:1],
                                                   diag_abs[:-1]]) + 1.0)
        cand = jnp.where((idx >= 1) & (idx <= q - 2) & neg, idx, 0)
        l = jnp.max(cand)                      # 0 if no interior split

        def geth(i, j):
            return get(Hk, jnp.clip(i, 0, n - 1), jnp.clip(j, 0, n - 1))

        h00, h01 = geth(l, l), geth(l, l + 1)
        h10, h11 = geth(l + 1, l), geth(l + 1, l + 1)
        h21 = jnp.where(l + 2 < q, geth(l + 2, l + 1), 0.0)
        px = h00 * h00 + h01 * h10 - s * h00 + t
        py = h10 * (h00 + h11 - s)
        pz = h10 * h21

        H1 = apply_refl(Hk, house3(px, py, pz, l, q))

        def chase(j, Hc):
            # annihilate the bulge below the subdiagonal in column j
            px = get(Hc, jnp.clip(j + 1, 0, n - 1), j)
            py = get(Hc, jnp.clip(j + 2, 0, n - 1), j)
            pz = jnp.where(j + 3 < n, get(Hc, jnp.clip(j + 3, 0, n - 1), j),
                           0.0)
            v = house3(px, py, pz, j + 1, q)
            # active only inside the unreduced window [l, q)
            v = jnp.where((j >= l) & (j + 2 < q), v, jnp.zeros_like(v))
            return apply_refl(Hc, v)

        H1 = jax.lax.fori_loop(0, jnp.maximum(q - 2, 0), chase, H1)
        # reflectors act locally; sweep out accumulated roundoff below the
        # subdiagonal (provably O(eps ||H||) here, unlike the explicit form)
        H1 = jnp.where(below, 0.0, H1)
        # skip the sweep entirely for windows that are already done
        H1 = jnp.where(q >= 3, H1, Hk)

        d_last = jnp.abs(get(H1, jnp.maximum(q - 1, 1),
                             jnp.maximum(q - 2, 0)))
        d_blk = jnp.abs(get(H1, jnp.maximum(q - 2, 1),
                            jnp.maximum(q - 3, 0)))
        sc = (jnp.abs(get(H1, jnp.maximum(q - 2, 0), jnp.maximum(q - 2, 0)))
              + jnp.abs(get(H1, jnp.maximum(q - 1, 0),
                            jnp.maximum(q - 1, 0))) + 1.0)
        q_new = jnp.where(q <= 2, 0,
                          jnp.where(d_last <= tol * sc, q - 1,
                                    jnp.where((q >= 4) & (d_blk <= tol * sc),
                                              q - 2, q)))
        # q == 3 with converged block above -> deflate the trailing 2x2
        q_new = jnp.where((q == 3) & (d_blk <= tol * sc), 1, q_new)
        deflated = q_new < q
        stall = jnp.where(deflated, 0, stall + 1)
        q_new = jnp.maximum(q_new, 0)
        return H1, q_new, stall

    T, _, _ = jax.lax.fori_loop(
        0, iters, sweep, (H, jnp.asarray(n, jnp.int32),
                          jnp.asarray(0, jnp.int32)))

    sub = jnp.concatenate([jnp.diag(T, -1), jnp.zeros((1,), dt)])
    dabs = jnp.abs(jnp.diag(T))
    # EXACTLY the deflation scale (|d_i| + |d_{i+1}| + 1): a borderline
    # entry that passed deflation must also read as dead here, or a
    # converged 1x1 pair gets mis-read as a 2x2 block
    scale = dabs + jnp.concatenate([dabs[1:], jnp.zeros((1,), dt)]) + 1.0
    live = jnp.abs(sub) > tol * scale           # subdiag i couples (i, i+1)
    prev_live = jnp.concatenate([jnp.zeros((1,), bool), live[:-1]])
    starts2 = live & (~prev_live)               # i starts a 2x2 block

    diag = jnp.diag(T)
    up = jnp.concatenate([jnp.diag(T, 1), jnp.zeros((1,), dt)])
    a = diag
    b = up
    c = sub
    d = jnp.concatenate([diag[1:], jnp.zeros((1,), dt)])
    half = (a + d) / 2
    disc = ((a - d) / 2) ** 2 + b * c
    sq = jnp.sqrt(jnp.abs(disc))
    cplx = disc < 0
    cdtype = _complex_dtype()
    # build via lax.complex in the matching REAL precision: `half + 1j*sq`
    # would promote to complex128, which the TPU compiler rejects outright
    rdt = jnp.float32 if cdtype == jnp.complex64 else jnp.float64
    re1 = jnp.where(cplx, half, half + sq).astype(rdt)
    im1 = jnp.where(cplx, sq, 0.0).astype(rdt)
    re2 = jnp.where(cplx, half, half - sq).astype(rdt)
    im2 = jnp.where(cplx, -sq, 0.0).astype(rdt)
    lam1 = jax.lax.complex(re1, im1)
    lam2 = jax.lax.complex(re2, im2)
    in_block = prev_live                         # position i is a block tail
    vals = jnp.where(starts2, lam1,
                     jax.lax.complex(diag.astype(rdt),
                                     jnp.zeros_like(diag, rdt)))  # 1x1
    vals = jnp.where(in_block,
                     jnp.concatenate([jnp.zeros((1,), lam2.dtype),
                                      lam2[:-1]]),
                     vals).astype(cdtype)
    order = jnp.lexsort((-vals.imag, -vals.real))
    return vals[order]


def inverse_iteration_vectors(A: jnp.ndarray, vals, sweeps: int = 3,
                              eps: float = 1e-8):
    """Eigenvectors by inverse iteration with the known eigenvalues, in REAL
    arithmetic (a complex shift sigma = alpha + i beta becomes the 2n x 2n
    real block system [[A - aI, bI], [-bI, A - aI]]) — TPU-safe (no complex
    LU, no callback)."""
    n = A.shape[0]
    dt = A.dtype
    eyen = jnp.eye(n, dtype=dt)

    def one(lam):
        alpha = jnp.real(lam).astype(dt)
        beta = jnp.imag(lam).astype(dt)
        shift = eps * jnp.maximum(jnp.abs(lam).real.astype(dt), 1.0)
        from .linear import dense_factor, dense_factor_solve

        Ar = A - (alpha + shift) * eyen
        M = jnp.block([[Ar, beta * eyen], [-beta * eyen, Ar]])
        fac = dense_factor(M)
        v = jnp.concatenate([jnp.ones((n,), dt), jnp.zeros((n,), dt)])

        def it(_, v):
            w = dense_factor_solve(fac, v)
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-300)

        v = jax.lax.fori_loop(0, sweeps, it, v)
        cdtype = _complex_dtype()
        rdt = jnp.float32 if cdtype == jnp.complex64 else jnp.float64
        return jax.lax.complex(v[:n].astype(rdt), v[n:].astype(rdt))

    V = jax.vmap(one)(vals)                     # (k, n) rows
    return V.T.astype(_complex_dtype())


def dense_eig(A: jnp.ndarray, with_vectors: bool = True):
    """jit-compatible dense non-symmetric eigendecomposition.

    CPU/GPU: host LAPACK via pure_callback (exact reference behavior).
    TPU: fully on-device QR eigenvalues + inverse-iteration vectors (the
    axon runtime rejects host callbacks, and keeping the spectrum on-chip
    also saves a host round-trip per continuation step)."""
    n = A.shape[0]
    cdtype = _complex_dtype()

    if jax.default_backend() == "tpu":
        w = qr_eigvals(A)
        if not with_vectors:
            return w, None
        v = inverse_iteration_vectors(A, w)
        return w, v

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
    # Optional reduced-precision compute dtype (e.g. jnp.float32 on TPU,
    # where f64 matmuls are emulated ~10x slower).  Stability *detection* is
    # count-based (src/Bifurcations.jl:5-28) and tolerant of ~1e-6 eigenvalue
    # error, so the spectrum along a branch can run in f32 while Newton
    # residuals stay f64.  Dense inputs are cast; matrix-free operators are
    # built at this dtype by the continuation kernels (kernels.py).
    compute_dtype: Any = None

    def __call__(self, J, nev: int, v0=None):
        """`v0` optionally warm-starts the Arnoldi process (e.g. with the
        previous continuation step's Ritz directions — the spectrum moves
        little between steps, so one factorization usually converges).
        A zero/None v0 falls back to the deterministic random start."""
        if self.compute_dtype is not None and not is_operator(J):
            J = J.astype(self.compute_dtype)
        matvec, n, dtype = _as_flat_matvec(J)
        m = min(self.krylov_dim, n)
        cdtype = _complex_dtype()

        key = jax.random.PRNGKey(self.seed)
        v_rand = jax.random.normal(key, (n,), dtype)
        if v0 is None:
            v0 = v_rand
        else:
            v0 = v0.astype(dtype)
            nrm0 = jnp.linalg.norm(v0)
            v0 = jnp.where(nrm0 > 0, v0, v_rand)

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

        def ritz_device(H, fnorm):
            """Fully on-device Ritz step (TPU: the axon runtime rejects
            host callbacks, and the on-chip path avoids a host round-trip
            per eigensolve): QR eigenvalues + inverse-iteration vectors of
            the small Hessenberg matrix."""
            w = qr_eigvals(H)
            if which_lm:
                order = jnp.lexsort((-w.imag, -jnp.abs(w)))
                w = w[order]
            y = inverse_iteration_vectors(H, w)
            resid = jnp.abs(fnorm) * jnp.abs(y[-1, :])
            return w.astype(cdtype), y.astype(cdtype), resid.real

        def ritz_callback(H, fnorm):
            if jax.default_backend() == "tpu":
                return ritz_device(H, fnorm)
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
            tiny = float(jnp.finfo(dtype).tiny)  # f32-safe guard
            nrm = jnp.linalg.norm(v_start)
            V = V.at[0].set(v_start / jnp.maximum(nrm, tiny))

            def step(j, VH):
                V, H = VH
                w = matvec(V[j])
                # CGS2 via matmuls (rows of V beyond j are exactly zero, so
                # V @ w projects onto the filled basis only) — replaces the
                # latency-bound sequential MGS fori_loop on TPU; same
                # orthogonality class as two-pass MGS
                h1 = V.conj() @ w
                w = w - V.T @ h1
                h2 = V.conj() @ w
                w = w - V.T @ h2
                h = h1 + h2
                beta = jnp.linalg.norm(w)
                H = H.at[:, j].set(h.at[j + 1].set(beta))
                V = V.at[j + 1].set(jnp.where(
                    beta > tiny, w / jnp.maximum(beta, tiny), 0.0))
                return V, H

            V, H = jax.lax.fori_loop(0, m, step, (V, H))
            return V, H

        V, H = one_factorization(v0)
        vals, y, resid = ritz_callback(H[:m, :m], H[m, m - 1])
        # floor the Ritz tolerance at the working precision (an f32 sweep
        # cannot reach the f64 default 1e-10)
        tol_eff = max(self.tol, 50.0 * float(jnp.finfo(dtype).eps))

        def _conv(vals_k, resid_k):
            # ARPACK-style relative test: |Ax - theta x| <= tol * |theta|
            # (absolute for tiny theta) — ref Arpack tol semantics
            scale = jnp.maximum(jnp.abs(vals_k[:nev]), 1.0)
            return jnp.all(resid_k[:nev] < tol_eff * scale)

        for _ in range(self.restarts - 1):
            # explicit restart: recombine the wanted Ritz directions — but
            # only when unconverged (lax.cond: a converged solve must not
            # pay for another m-matvec factorization, the dominant cost of
            # per-step stability sweeps)
            conv = _conv(vals, resid)

            def _restart(op):
                V, vals, y, resid = op
                # cast the basis to the complex dtype BEFORE the product:
                # f64 @ c64 promotes to c128, which the TPU compiler rejects
                wsum = jnp.real(V[:m].T.astype(cdtype)
                                @ jnp.sum(y[:, :nev], axis=1)).astype(dtype)
                v_new = wsum / jnp.maximum(jnp.linalg.norm(wsum),
                                           float(jnp.finfo(dtype).tiny))
                V2, H2 = one_factorization(v_new)
                vals2, y2, resid2 = ritz_callback(H2[:m, :m], H2[m, m - 1])
                return V2, vals2, y2, resid2

            V, vals, y, resid = jax.lax.cond(
                conv, lambda op: op, _restart, (V, vals, y, resid))

        vecs = (V[:m].T.astype(cdtype)) @ y[:, :nev]
        converged = _conv(vals, resid)
        return vals[:nev], vecs, converged, jnp.array(m * self.restarts)


@dataclasses.dataclass(frozen=True)
class SubspaceEig:
    """Block orthogonal (subspace) iteration for the largest-modulus part
    of a NONSYMMETRIC operator spectrum, matrix-free and BATCHED: each
    sweep applies the operator to the whole (n, b) block through one
    `vmap`, so an operator whose single application is a long sequential
    chain — the matrix-free trapeze/shooting monodromy, M-1 inner solves
    per application (`Trapeze.monodromy_operator`) — amortizes its
    dispatch latency over the block.  Per-vector Arnoldi costs
    krylov_dim SEQUENTIAL applications (each a full M-slice chain); one
    subspace sweep costs ONE batched chain, and warm-started from the
    previous continuation step's block (`v0`) a couple of sweeps converge
    the dominant multipliers (the Floquet :LM ordering is exactly the
    dominant part, ref Floquet.jl:4-17).  Rayleigh-Ritz on the projected
    (b, b) matrix runs through the same device-Francis-QR / host-callback
    split as ArnoldiEig."""

    sweeps: int = 2         # power-iteration warmups (1 = none beyond basis)
    krylov_blocks: int = 3  # Ritz space = span[Q, AQ, ..., A^{k-1}Q]
    extra: int = 4          # guard vectors beyond nev
    tol: float = 1e-6
    seed: int = 11

    def seed_cols(self, nev: int) -> int:
        # warm-start block = the previous full block
        return nev + self.extra

    def make_seed(self, vecs, ncols: int):
        """Warm-start block from complex Ritz vectors: interleave Re/Im so
        a conjugate pair contributes its full 2-plane (taking plain real
        parts duplicates the pair's column and loses the rotation plane)."""
        re = jnp.real(vecs)
        im = jnp.imag(vecs)
        inter = jnp.stack([re, im], axis=2).reshape(re.shape[0], -1)
        if inter.shape[1] < ncols:
            inter = jnp.pad(inter, ((0, 0), (0, ncols - inter.shape[1])))
        return inter[:, :ncols]

    def __call__(self, J, nev: int, v0=None):
        matvec, n, dtype = _as_flat_matvec(J)
        b = min(nev + self.extra, n)
        k = max(1, self.krylov_blocks)
        cdtype = _complex_dtype()
        opb = jax.vmap(matvec, in_axes=1, out_axes=1)

        key = jax.random.PRNGKey(self.seed)
        Q_rand = jax.random.normal(key, (n, b), dtype)
        if v0 is None:
            Q = Q_rand
        else:
            v0 = jnp.asarray(v0, dtype)
            if v0.ndim == 1:
                v0 = v0[:, None]
            if v0.shape[1] < b:
                v0 = jnp.concatenate([v0, Q_rand[:, :b - v0.shape[1]]], 1)
            else:
                v0 = v0[:, :b]
            Q = jnp.where(jnp.linalg.norm(v0) > 0, v0, Q_rand)
        Q, _ = jnp.linalg.qr(Q)

        def sweep(_, Qc):
            Z = opb(Qc)
            Qn, _ = jnp.linalg.qr(Z)
            return Qn

        if self.sweeps > 1:
            Q = jax.lax.fori_loop(0, self.sweeps - 1, sweep, Q)
        # block-Krylov Rayleigh-Ritz: project A onto span[Q, AQ, ...] —
        # each extra block costs one batched application and squares the
        # subspace-angle error the plain power sweep would leave
        blocks = [Q]
        for _ in range(k - 1):
            blocks.append(opb(blocks[-1]))
        B, _ = jnp.linalg.qr(jnp.concatenate(blocks, axis=1))
        Z = opb(B)
        # full-precision contractions: TPU's default bf16 matmul passes
        # put ~1e-3 noise on the projected operator — the same order as
        # the stability tolerance the multipliers feed
        hi = jax.lax.Precision.HIGHEST
        H = jnp.matmul(B.T, Z, precision=hi)  # (k b, k b) projected op
        bk_ = B.shape[1]

        def host_ritz(Hm):
            w, y = np.linalg.eig(np.asarray(Hm))
            return (w.astype(np.complex128), y.astype(np.complex128))

        if jax.default_backend() == "tpu":
            w = qr_eigvals(H)
            y = inverse_iteration_vectors(H, w).astype(cdtype)
        else:
            out_shape = (jax.ShapeDtypeStruct((bk_,), cdtype),
                         jax.ShapeDtypeStruct((bk_, bk_), cdtype))
            w, y = jax.pure_callback(
                lambda Hm: tuple(a.astype(cdtype) for a in host_ritz(Hm)),
                out_shape, H, vmap_method="sequential")
        # normalize Ritz vectors; residual R = (A - w I)(B y) = Z y - B y w
        y = y / jnp.maximum(jnp.linalg.norm(y, axis=0, keepdims=True),
                            float(jnp.finfo(dtype).tiny))
        By = jnp.matmul(B.astype(cdtype), y, precision=hi)
        R = jnp.matmul(Z.astype(cdtype), y, precision=hi) - By * w[None, :]
        resid = jnp.linalg.norm(R, axis=0)
        # residual-filtered :LM selection: a Krylov subspace of a nonnormal
        # operator carries SPURIOUS large-modulus Ritz values (field-of-
        # values pollution); rank unconverged candidates behind every
        # plausibly-converged one instead of letting them shadow the true
        # dominant pairs
        tol_eff = max(self.tol, 50.0 * float(jnp.finfo(dtype).eps))
        plaus = resid < jnp.maximum(0.05 * jnp.abs(w), 100.0 * tol_eff)
        rank_mod = jnp.where(plaus, jnp.abs(w), -resid)
        order = jnp.lexsort((-w.imag, -rank_mod))
        w, By, resid = w[order], By[:, order], resid[order]
        scale = jnp.maximum(jnp.abs(w[:nev]), 1.0)
        converged = jnp.all(resid[:nev] < tol_eff * scale)
        return (w[:nev], By[:, :nev], converged,
                jnp.array(b * (self.sweeps - 1) + bk_))


@dataclasses.dataclass(frozen=True)
class LOBPCGEig:
    """Preconditioned blocked LOBPCG for SYMMETRIC jacobians.

    Returns the `nev` algebraically-largest (= rightmost, the spectrum is
    real) eigenpairs.  For gradient-flow PDE jacobians — e.g.
    Swift-Hohenberg's J = -(I+Delta)^2 + diag(l + 2 nu u - 3 u^2) — the
    per-step stability sweep does not need shift-invert inner solves at
    all: with the model's exact spectral preconditioner this converges in
    a handful of *blocked* J@X applications and small dense Rayleigh-Ritz
    problems, all matmul-shaped work for the MXU.  It replaces the
    reference's `EigArpack(0.1, :LM)` shift-invert sweep on the SH2d
    flagship (ref examples/SH2d-fronts.jl:91) where each Arnoldi step
    costs a full preconditioned GMRES solve.

    Each iteration re-applies A to the full orthonormalized [X | W | P]
    basis (one vmapped blocked dispatch of 3k matvecs) rather than rotating
    cached products: ~3x more matvecs than the caching variant, but
    rank-deficient bases near convergence then merely waste a few search
    directions instead of amplifying noise through an ill-conditioned
    triangular solve (see `_ritz`).

    `precond` is a callable v -> T v on flat vectors, T ~ (alpha I - J)^-1
    in the loose preconditioning sense (a fixed spectral/DCT inverse of the
    linear part works; sign and shift need not be exact).

    CONTRACT: J must be symmetric (self-adjoint in the flat inner product);
    a non-symmetric operator would silently yield wrong "eigenvalues" of
    its symmetric part.  When the inputs are concrete (outside jit) the
    call probes `|<Jv,w> - <v,Jw>|` on two random vectors and raises on
    misuse; inside a traced computation the check is skipped (set
    `symmetry_check=False` to skip it always).  With `refine_iters > 0`
    the refine pass needs an f64-capable operator `J_hi` (x64 enabled);
    see `docs/TPU_NOTES.md`.
    """

    maxiter: int = 30
    tol: float = 1e-4
    precond: Optional[Callable] = None
    extra: int = 2          # guard vectors beyond nev (convergence buffer)
    compute_dtype: Any = None
    seed: int = 7
    # Mixed-precision refinement: a reduced-precision (f32) sweep stalls at
    # an eigenvalue error ~ 3k * eps_f32 * ||A|| (the Rayleigh-Ritz matrix
    # G = Q^T A Q carries absolute matvec noise eps*||A||) — for a
    # biharmonic operator with ||A|| ~ 5e3 that is a few 1e-2, useless for
    # detection.  `refine_iters` extra Rayleigh-Ritz + preconditioned-step
    # iterations on the high-precision operator `J_hi` (passed by the
    # caller, or the uncast matrix for dense inputs) restore the full-
    # precision eigenvalues at the cost of ~3k high-precision matvecs:
    # the f32 subspace is accurate (angle ~ noise/gap), and the hi Ritz
    # values inherit only the *squared* angle error.
    refine_iters: int = 2
    symmetry_check: bool = True

    def seed_cols(self, nev: int) -> int:
        # warm-start block = the converged eigenvector block
        return nev

    def _check_symmetry(self, matvec, n, dtype):
        """Probe |<Jv,w> - <v,Jw>| on two random vectors; only possible when
        the operator is concrete (outside jit) — inside a trace the probe
        values are tracers and the check is skipped."""
        key = jax.random.PRNGKey(314)
        v = jax.random.normal(key, (n,), dtype)
        w = jax.random.normal(jax.random.fold_in(key, 1), (n,), dtype)
        try:
            jv, jw = matvec(v), matvec(w)
            asym = abs(float(jnp.vdot(jv, w) - jnp.vdot(v, jw)))
            scale = float(jnp.linalg.norm(jv) * jnp.linalg.norm(w)
                          + jnp.linalg.norm(v) * jnp.linalg.norm(jw))
        except (jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            return
        tol = 1e3 * float(jnp.finfo(dtype).eps)
        if asym > tol * max(scale, 1e-30):
            raise ValueError(
                "LOBPCGEig requires a SYMMETRIC operator: symmetry probe "
                f"|<Jv,w> - <v,Jw>| = {asym:.3e} (scale {scale:.3e}). "
                "Use ArnoldiEig/ShiftInvertEig for non-symmetric jacobians, "
                "or pass symmetry_check=False if the probe misfires.")

    def __call__(self, J, nev: int, v0=None, J_hi=None):
        if self.compute_dtype is not None and not is_operator(J):
            if J_hi is None and self.refine_iters > 0:
                J_hi = J
            J = J.astype(self.compute_dtype)
        matvec, n, dtype = _as_flat_matvec(J)
        if self.symmetry_check:
            self._check_symmetry(matvec, n, dtype)
        cdtype = _complex_dtype()
        k = min(nev + self.extra, n)
        tol_eff = max(self.tol, 50.0 * float(jnp.finfo(dtype).eps))

        def blockA(X):
            return jax.vmap(matvec, in_axes=1, out_axes=1)(X)

        if self.precond is None:
            def blockT(R):
                return R
        else:
            def blockT(R):
                out = jax.vmap(self.precond, in_axes=1, out_axes=1)(R)
                return out.astype(R.dtype)

        key = jax.random.PRNGKey(self.seed)
        X0 = jax.random.normal(key, (n, k), dtype)
        if v0 is not None:
            v0 = jnp.asarray(v0, dtype)
            if v0.ndim == 1:
                v0 = v0.reshape(n, -1)
            cols = min(v0.shape[1], k)
            has_warm = jnp.linalg.norm(v0) > 0
            X0 = jnp.where(has_warm, X0.at[:, :cols].set(v0[:, :cols]), X0)

        eps_c = float(jnp.finfo(dtype).eps) ** 0.5

        def _colnorm(M):
            return jnp.maximum(jnp.linalg.norm(M, axis=0), 1e-30)

        def _cholqr(S):
            # CholQR with diagonal jitter: all matmul/cholesky work (MXU)
            # vs the latency-bound Householder QR; two passes below give
            # QR-grade orthogonality for the moderately conditioned bases
            # this loop produces (X orthonormal, W/P normalized and
            # pre-orthogonalized / randomly refilled)
            m = S.shape[1]
            G = S.T @ S
            jit_eps = 10.0 * float(jnp.finfo(S.dtype).eps)
            G = G + (jit_eps * jnp.trace(G) / m) * jnp.eye(m, dtype=S.dtype)
            L = jnp.linalg.cholesky(G)
            return jax.scipy.linalg.solve_triangular(L, S.T, lower=True).T

        def _ritz(S):
            """Orthonormalize S and Rayleigh-Ritz the top-k pairs.

            A is re-applied to the orthonormalized basis (one vmapped
            blocked dispatch) rather than rotated from cached products:
            rank-deficient S (converged pairs, duplicated directions) then
            merely yields harmless extra search directions instead of
            amplified noise from an ill-conditioned triangular solve."""
            Q = _cholqr(_cholqr(S))
            AQ = blockA(Q)
            G = Q.T @ AQ
            G = 0.5 * (G + G.T)
            w, Y = jnp.linalg.eigh(G)          # ascending
            Yk = Y[:, ::-1][:, :k]
            return w[::-1][:k], Q @ Yk, AQ @ Yk

        X0 = X0 / _colnorm(X0)
        theta0, X0, AX0 = _ritz(X0)
        # seed P with random orthonormalized directions so the first
        # iteration's basis is full rank without a special case in the body
        P0 = jax.random.normal(jax.random.fold_in(key, 1), (n, k), dtype)
        P0 = P0 / _colnorm(P0)

        def _conv(theta, X, AX):
            R = AX - X * theta[None, :]
            rn = _colnorm(R)
            scale = jnp.maximum(jnp.abs(theta), 1.0)
            return R, jnp.all(rn[:nev] < tol_eff * scale[:nev])

        def cond(carry):
            _, _, _, _, it, done = carry
            return (it < self.maxiter) & ~done

        def body(carry):
            X, AX, P, theta, it, _ = carry
            R = AX - X * theta[None, :]
            W = blockT(R)
            # pre-orthogonalize W against X (cheap, keeps the QR well
            # conditioned near convergence)
            W = W - X @ (X.T @ W)
            # a converged pair's residual column can underflow to ~zero;
            # the norm floor would preserve it as a zero column, letting
            # the CholQR jitter admit a spurious theta~0 Ritz pair —
            # refill near-zero W columns with fresh random directions,
            # mirroring the P-block refill below
            wn = _colnorm(W)
            wfill = jax.random.normal(
                jax.random.fold_in(key, 7919 + it), (n, k), dtype)
            okw = (wn > eps_c)[None, :]
            W = jnp.where(okw, W / wn, wfill / _colnorm(wfill))
            S = jnp.concatenate([X, W, P], axis=1)
            theta_n, Xn, AXn = _ritz(S)
            # conjugate-direction block: the component of the new iterate
            # outside the old X span; a converged pair leaves a ~zero
            # column — refill it with a fresh random direction (extra
            # search directions are harmless; zero columns would let the
            # CholQR jitter admit spurious theta=0 Ritz values)
            Pn = Xn - X @ (X.T @ Xn)
            ps = _colnorm(Pn)
            refill = jax.random.normal(jax.random.fold_in(key, 100 + it),
                                       (n, k), dtype)
            refill = refill / _colnorm(refill)
            ok = (ps > eps_c)[None, :]
            Pn = jnp.where(ok, Pn / ps, refill)
            _, done = _conv(theta_n, Xn, AXn)
            return Xn, AXn, Pn, theta_n, it + 1, done

        _, done0 = _conv(theta0, X0, AX0)
        X, AX, P, theta, niter, _ = jax.lax.while_loop(
            cond, body, (X0, AX0, P0, theta0, jnp.array(0), done0))

        if J_hi is not None and self.refine_iters > 0:
            theta, X, AX = self._refine(J_hi, X, k)

        _, converged = _conv(theta, X, AX)
        vals = theta[:nev].astype(cdtype)
        vecs = X[:, :nev].astype(cdtype)
        return vals, vecs, converged, niter

    def _refine(self, J_hi, X_lo, k):
        """High-precision Rayleigh-Ritz + preconditioned-step iterations on
        the reduced-precision subspace (see `refine_iters`).  Unrolled
        (refine_iters is small and static)."""
        matvec, _, dtype = _as_flat_matvec(J_hi)

        def blockA(Y):
            return jax.vmap(matvec, in_axes=1, out_axes=1)(Y)

        if self.precond is None:
            def blockT(R):
                return R.astype(dtype)
        else:
            def blockT(R):
                out = jax.vmap(self.precond, in_axes=1, out_axes=1)(R)
                return out.astype(dtype)

        def _cholqr2(S):
            # the refine bases ([orthonormal X | pre-orthogonalized W]) are
            # well conditioned, so two-pass CholQR is QR-grade and keeps
            # the high-precision pass on emulated-f64 matmuls (MXU) instead
            # of a latency-bound Householder QR
            m = S.shape[1]
            jit_eps = 10.0 * float(jnp.finfo(dtype).eps)
            for _ in range(2):
                G = S.T @ S
                G = (G + (jit_eps * jnp.trace(G) / m)
                     * jnp.eye(m, dtype=S.dtype))
                L = jnp.linalg.cholesky(G)
                S = jax.scipy.linalg.solve_triangular(L, S.T, lower=True).T
            return S

        X = X_lo.astype(dtype)
        W = None
        for i in range(self.refine_iters):
            S = X if W is None else jnp.concatenate([X, W], axis=1)
            Q = _cholqr2(S)
            AQ = blockA(Q)
            G = Q.T @ AQ
            G = 0.5 * (G + G.T)
            w, Y = jnp.linalg.eigh(G)
            Yk = Y[:, ::-1][:, :k]
            theta, X, AX = w[::-1][:k], Q @ Yk, AQ @ Yk
            if i + 1 == self.refine_iters:
                break      # last pass: W would be unused
            R = AX - X * theta[None, :]
            W = blockT(R)
            W = W - X @ (X.T @ W)
            W = W / jnp.maximum(jnp.linalg.norm(W, axis=0), 1e-30)
        return theta, X, AX


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
    # reduced-precision stability path (see ArnoldiEig.compute_dtype): the
    # shift-invert inner solves and the Arnoldi run at this dtype; mapped-back
    # Ritz values carry ~sqrt(eps) error, ample for count-based detection.
    compute_dtype: Any = None

    def __call__(self, J, nev: int, v0=None):
        from .linear import DenseLS

        if self.compute_dtype is not None and not is_operator(J):
            J = J.astype(self.compute_dtype)

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
            from .linear import dense_factor, dense_factor_solve

            ls = ls or DenseLS()
            n = J.shape[0]
            A = J - sigma * jnp.eye(n, dtype=J.dtype)
            fac = dense_factor(A)

            op = FlatOperator(
                lambda v: dense_factor_solve(fac, v), n, J.dtype)

        try:
            vals, vecs, cv, it = self.eigsolver(op, nev, v0=v0)
        except TypeError:
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
