"""Swift-Hohenberg models (ref examples/SH2d-fronts.jl, SH2d-fronts-cuda.jl,
SH3d.jl) — the framework's flagship matrix-free PDE workloads."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import BifurcationProblem


def _lap_neumann(u, h2, axis):
    """1D second difference with the reference's modified-corner (Neumann)
    closure (ref examples/SH2d-fronts.jl:20-24: D2[1,1] = -1/h^2).

    Edge-replicating pad + slice: lowers to fused shifts at HBM bandwidth
    (concatenate-based shifts are several times slower on TPU)."""
    n = u.shape[axis]
    pw = [(0, 0)] * u.ndim
    pw[axis] = (1, 1)
    up2 = jnp.pad(u, pw, mode="edge")
    um = jax.lax.slice_in_dim(up2, 0, n, axis=axis)
    up = jax.lax.slice_in_dim(up2, 2, n + 2, axis=axis)
    return (um - 2 * u + up) / h2


def swift_hohenberg_2d(Nx: int = 151, Ny: int = 100, lx: float = 8 * np.pi,
                       ly: float = 2 * 2 * np.pi / np.sqrt(3),
                       l: float = -0.1, nu: float = 1.3):
    """SH2d-fronts (ref examples/SH2d-fronts.jl:8-60): snaking localized
    patterns.  State is kept as the (Nx, Ny) field (not flattened) so the
    stencil partitions over a device mesh; residual
    F = -(I+Delta)^2 u + l u + nu u^2 - u^3."""
    hx = 2 * lx / Nx
    hy = 2 * ly / Ny
    # python floats (weak-typed) so the stencil follows u's dtype — the
    # f32 stability sweep needs the jvp to stay f32 end-to-end
    hx2, hy2 = float(hx * hx), float(hy * hy)

    def lap(u):
        return _lap_neumann(u, hx2, 0) + _lap_neumann(u, hy2, 1)

    def F(u, par):
        v = u + lap(u)
        L1u = v + lap(v)
        return -L1u + par["l"] * u + par["nu"] * u * u - u ** 3

    # analytic derivatives (ref d2F_sh/d3F_sh, examples/SH2d-fronts.jl:42-43)
    def d2F(u, par, dx1, dx2):
        return (2 * par["nu"] * dx2 - 6 * dx2 * u) * dx1

    def d3F(u, par, dx1, dx2, dx3):
        return -6 * dx1 * dx2 * dx3

    X = -lx + 2 * lx / Nx * np.arange(Nx)
    Y = -ly + 2 * ly / Ny * np.arange(Ny)
    sol0 = (np.cos(X)[:, None]
            + np.cos(X / 2)[:, None] * np.cos(np.sqrt(3) * Y / 2)[None, :])
    sol0 = sol0 - sol0.min()
    sol0 = sol0 / sol0.max()
    sol0 = (sol0 - 0.25) * 1.7

    prob = BifurcationProblem(
        F, u0=jnp.asarray(sol0), params={"l": l, "nu": nu}, lens="l",
        d2F_user=d2F, d3F_user=d3F,
        record_from_solution=lambda x, p, **k: {
            "param": p, "norm": jnp.linalg.norm(x.ravel()),
            "n8": jnp.power(jnp.sum(x.ravel() ** 8), 1.0 / 8)})

    # exact spectral preconditioner: DCT-II diagonalizes the
    # modified-corner Neumann Laplacian (verified to 1e-16), so
    # (-(I+Delta)^2 - shift)^{-1} is diagonal in the 2D cosine basis —
    # the Neumann-BC analogue of the reference's FFT operator
    # (ref examples/SH2d-fronts-cuda.jl:31-65)
    lx_ = 2 * (np.cos(np.pi * np.arange(Nx) / Nx) - 1) / hx2
    ly_ = 2 * (np.cos(np.pi * np.arange(Ny) / Ny) - 1) / hy2
    sym = -(1.0 + lx_[:, None] + ly_[None, :]) ** 2
    sym = jnp.asarray(sym)

    def dct2(u):
        import jax as _jax

        v = _jax.scipy.fft.dct(u, type=2, norm="ortho", axis=0)
        return _jax.scipy.fft.dct(v, type=2, norm="ortho", axis=1)

    def idct2(u):
        import jax as _jax

        v = _jax.scipy.fft.idct(u, type=2, norm="ortho", axis=1)
        return _jax.scipy.fft.idct(v, type=2, norm="ortho", axis=0)

    def precond(v, shift=1.0):
        shp = v.shape
        x = v.reshape(sym.shape)
        if jax.default_backend() == "tpu":
            # TPU FFT is complex64-only; the preconditioner only steers
            # GMRES, so f32 transforms cost nothing in final accuracy
            out = idct2(dct2(x.astype(jnp.float32))
                        / (sym.astype(jnp.float32) - shift))
            out = out.astype(v.dtype)
        else:
            # dtype-preserving: the operator may run an f32 stability sweep
            out = idct2(dct2(x) / (sym - shift)).astype(v.dtype)
        return out.reshape(shp)

    object.__setattr__(prob, "spectral_precond", precond)
    return prob


def _lap_periodic(u, h2, axis):
    """1D periodic second difference: wrap-pad + slice (same fused-shift
    lowering as `_lap_neumann`; `mode="wrap"` rolls the halo in)."""
    n = u.shape[axis]
    pw = [(0, 0)] * u.ndim
    pw[axis] = (1, 1)
    up2 = jnp.pad(u, pw, mode="wrap")
    um = jax.lax.slice_in_dim(up2, 0, n, axis=axis)
    up = jax.lax.slice_in_dim(up2, 2, n + 2, axis=axis)
    return (um - 2 * u + up) / h2


def swift_hohenberg_periodic_2d(Nx: int = 512, Ny: int = None,
                                lx: float = 16 * np.pi,
                                ly: float = 4 * np.pi * 2 / np.sqrt(3),
                                l: float = -0.15, nu: float = 1.3,
                                dtype=None, operator: str = "fd",
                                N: int = None, L: float = None):
    """Periodic SH2d — the reference GPU example's workload
    (ref examples/SH2d-fronts-cuda.jl:19-20,31-65: N = 2^9 x 2^9, Float64)
    re-designed TPU-first.

    operator="fd" (default): the residual/jvp is a real-space 13-point
    periodic finite-difference stencil, f64-capable ON TPU (elementwise f64
    is supported; only the FFT is complex64-only).  The FFT still provides
    the EXACT diagonal inverse of the linear part for preconditioning and
    for the f32 stability sweeps, because the periodic FD Laplacian is
    diagonalized by the DFT with the discrete symbol
    lambda_j = 2(cos(2 pi j / N) - 1)/h^2.  This is the TPU-native answer
    to the reference's Float64-throughout CUDA run: f64 stencil residuals
    + Newton corrections, f32 FFT-preconditioned Krylov, and LOBPCG's f64
    Rayleigh-Ritz refinement against the f64 stencil operator (the
    jacobian is symmetric — gradient flow).

    operator="fft": the literal spectral operator of the CUDA example
    (continuous symbol -(1-k^2)^2), f32-only on TPU (complex64 FFT);
    kept for the spectral-accuracy variant on CPU.

    dtype defaults to float64 when x64 is on (both backends — the FD
    stencil makes f64 viable on TPU), else float32.

    Box, guess and defaults follow the reference: Nx=Ny=2^9 on
    [-lx,lx] x [-ly,ly] with lx = 16 pi, ly = 4 pi * 2/sqrt(3), hexagon
    ansatz 0.5 (cos x + cos(x/2) cos(sqrt(3) y / 2))
    (ref examples/SH2d-fronts-cuda.jl:66-76,117).  The legacy (N, L)
    square-box aliases are accepted."""
    import jax as _jax

    if N is not None:
        Nx = N
    if Ny is None:
        Ny = Nx
    if L is not None:
        lx = ly = L / 2
    if dtype is None:
        if operator == "fd":
            dtype = (jnp.float64 if _jax.config.jax_enable_x64
                     else jnp.float32)
        else:
            dtype = (jnp.float64 if _jax.default_backend() == "cpu"
                     else jnp.float32)
    hx = 2 * lx / Nx
    hy = 2 * ly / Ny

    if operator == "fd":
        # discrete symbols of the periodic 5-point Laplacian: the FFT
        # diagonalizes the FD operator EXACTLY (not just asymptotically)
        hx2, hy2 = float(hx * hx), float(hy * hy)
        lam_x = 2.0 * (np.cos(2 * np.pi * np.arange(Nx) / Nx) - 1.0) / hx2
        lam_y = 2.0 * (np.cos(2 * np.pi * np.arange(Ny) / Ny) - 1.0) / hy2
        sym_np = -((1.0 + lam_x[:, None] + lam_y[None, :]) ** 2)

        def lap(u):
            return _lap_periodic(u, hx2, 0) + _lap_periodic(u, hy2, 1)

        def F(u, par):
            v = u + lap(u)
            L1u = v + lap(v)
            return -L1u + par["l"] * u + par["nu"] * u * u - u ** 3
    else:
        kx = np.fft.fftfreq(Nx, d=hx) * 2 * np.pi
        ky = np.fft.fftfreq(Ny, d=hy) * 2 * np.pi
        sym_np = -((1 - kx[:, None] ** 2 - ky[None, :] ** 2) ** 2)
        sym_op = jnp.asarray(sym_np, dtype=dtype)

        def apply_L(u):
            return jnp.real(jnp.fft.ifft2(sym_op * jnp.fft.fft2(u)))

        def F(u, par):
            return apply_L(u) + par["l"] * u + par["nu"] * u * u - u ** 3

    # analytic second/third derivatives (same algebra as the Neumann model)
    def d2F(u, par, dx1, dx2):
        return (2 * par["nu"] * dx2 - 6 * dx2 * u) * dx1

    def d3F(u, par, dx1, dx2, dx3):
        return -6 * dx1 * dx2 * dx3

    sym = jnp.asarray(sym_np)
    sym32 = jnp.asarray(sym_np, jnp.float32)

    def precond(v, shift=1.0):
        """Exact diagonal inverse of (linear part - shift) in Fourier
        space; steers GMRES/LOBPCG only, so the f32 transform on TPU
        (complex64-only FFT) costs nothing in final accuracy."""
        shp = v.shape
        x = v.reshape(sym.shape)
        if jax.default_backend() == "tpu" or x.dtype == jnp.float32:
            out = jnp.real(jnp.fft.ifft2(
                jnp.fft.fft2(x.astype(jnp.float32)) / (sym32 - shift)))
            out = out.astype(v.dtype)
        else:
            out = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(x) / (sym - shift)))
        return out.reshape(shp)

    # hexagon ansatz (ref examples/SH2d-fronts-cuda.jl:76)
    X = -lx + hx * np.arange(Nx)
    Y = -ly + hy * np.arange(Ny)
    sol0 = 0.5 * (np.cos(X)[:, None]
                  + np.cos(X / 2)[:, None]
                  * np.cos(np.sqrt(3) * Y / 2)[None, :])

    prob = BifurcationProblem(
        F, u0=jnp.asarray(sol0, dtype=dtype),
        params={"l": jnp.asarray(l, dtype), "nu": jnp.asarray(nu, dtype)},
        lens="l", d2F_user=d2F, d3F_user=d3F,
        record_from_solution=lambda x, p, **k: {
            "param": p, "norm": jnp.linalg.norm(x.ravel()),
            "n8": jnp.power(jnp.sum(x.ravel() ** 8), 1.0 / 8)})
    object.__setattr__(prob, "spectral_precond", precond)
    return prob


def mittelmann(Nx: int = 30, Ny: int = 30, lx: float = 0.5, ly: float = 0.5,
               lam: float = 0.01):
    """Mittelmann's 2D Gelfand-Bratu problem (ref examples/mittleman.jl:14-82):
    F(u) = Delta u - 10 (u - lam e^u) with the modified-corner Neumann
    Laplacian on [-lx,lx] x [-ly,ly].  The square's symmetry makes the
    branch points 2d — the reference's showcase for Nd normal forms,
    `multicontinuation` and automatic bifurcation diagrams.

    State is the (Nx, Ny) field; `record_from_solution` provides the
    reference's symmetry-breaking weighted norm `nw` (ref mittleman.jl:7,73)
    so distinct sheets separate in diagram plots."""
    # weak-typed grid constants (see swift_hohenberg_2d): keep the jvp at
    # the state's dtype for the f32 mixed-precision paths
    hx2 = float((2 * lx / Nx) ** 2)
    hy2 = float((2 * ly / Ny) ** 2)

    def lap(u):
        return _lap_neumann(u, hx2, 0) + _lap_neumann(u, hy2, 1)

    def F(u, par):
        return lap(u) - 10.0 * (u - par["lam"] * jnp.exp(u))

    X = np.linspace(-lx, lx, Nx)
    Y = np.linspace(-ly, ly, Ny)
    w = (lx + X)[:, None] * Y[None, :]
    w = jnp.asarray(w - w.min())

    def record(x, p, **k):
        flat = x.ravel()
        return {"param": p,
                "nw": jnp.linalg.norm(flat * w.ravel())
                / np.sqrt(flat.shape[0]),
                "norm": jnp.linalg.norm(flat),
                "n_inf": jnp.max(jnp.abs(flat))}

    return BifurcationProblem(F, u0=jnp.zeros((Nx, Ny)),
                              params={"lam": lam}, lens="lam",
                              record_from_solution=record)


def swift_hohenberg_3d(N: int = 22, L: float = np.pi,
                       l: float = 0.1, nu: float = 1.2, seed: int = 0):
    """SH3d (ref examples/SH3d.jl:69-124): N^3 state, hexagonal-lattice
    initial guess `1.2 * normalized(cos x cos y)`, record (n2, n8, nw) as
    the reference.  Carries the exact DCT-II spectral preconditioner
    (the Neumann analog of the reference's cholesky((I+Delta)^2) at :91)
    and analytic d2F/d3F (ref :63-64)."""
    h = 2 * L / N
    h2 = float(h * h)

    def lap(u):
        return (_lap_neumann(u, h2, 0) + _lap_neumann(u, h2, 1)
                + _lap_neumann(u, h2, 2))

    def F(u, par):
        v = u + lap(u)
        L1u = v + lap(v)
        return -L1u + par["l"] * u + par["nu"] * u * u - u ** 3

    def d2F(u, par, dx1, dx2):
        return (2 * par["nu"] * dx2 - 6 * dx2 * u) * dx1

    def d3F(u, par, dx1, dx2, dx3):
        return -6 * dx1 * dx2 * dx3

    # ref SH3d.jl:74-81: hexa guess from cos(x)cos(y), shifted/normalized
    X = -L + 2 * L / N * np.arange(N)
    sol0 = np.broadcast_to(
        (np.cos(X)[:, None] * np.cos(X)[None, :])[:, :, None],
        (N, N, N)).copy()
    sol0 = sol0 - sol0.min()
    sol0 = sol0 / sol0.max() * 1.2

    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.random((N, N, N)))

    def record(x, p, **k):
        flat = x.ravel()
        return {"param": p, "norm": jnp.linalg.norm(flat),
                "n8": jnp.power(jnp.sum(flat ** 8), 1.0 / 8),
                "nw": jnp.linalg.norm(flat * w.ravel())
                / np.sqrt(flat.shape[0])}

    prob = BifurcationProblem(F, u0=jnp.asarray(sol0),
                              params={"l": l, "nu": nu}, lens="l",
                              d2F_user=d2F, d3F_user=d3F,
                              record_from_solution=record)

    # DCT-II diagonalizes the modified-corner Neumann second difference in
    # each axis, so (-(I+Delta)^2 - shift)^{-1} is exactly diagonal in the
    # 3D cosine basis
    lam1 = 2 * (np.cos(np.pi * np.arange(N) / N) - 1) / h2
    sym = -(1.0 + lam1[:, None, None] + lam1[None, :, None]
            + lam1[None, None, :]) ** 2
    sym = jnp.asarray(sym)

    def dct3(u):
        import jax as _jax

        for ax in range(3):
            u = _jax.scipy.fft.dct(u, type=2, norm="ortho", axis=ax)
        return u

    def idct3(u):
        import jax as _jax

        for ax in range(2, -1, -1):
            u = _jax.scipy.fft.idct(u, type=2, norm="ortho", axis=ax)
        return u

    def precond(v, shift=1.0):
        # the eigensolver path hands over raveled vectors
        shp = v.shape
        x = v.reshape(sym.shape)
        if jax.default_backend() == "tpu":
            # complex64-only TPU FFT; f32 precond does not affect accuracy
            out = idct3(dct3(x.astype(jnp.float32))
                        / (sym.astype(jnp.float32) - shift))
            out = out.astype(v.dtype)
        else:
            out = idct3(dct3(x) / (sym - shift))
        return out.reshape(shp)

    object.__setattr__(prob, "spectral_precond", precond)
    return prob
