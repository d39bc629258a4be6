"""Model library: the reference's example/test problems rebuilt as JAX
residuals (used by tests and benchmarks; ref examples/*.jl, test fixtures).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import BifurcationProblem


def chan(n: int = 101, alpha: float = 3.3, beta: float = 0.01):
    """1D Chan BVP (ref examples/chan.jl:10-23): Dirichlet BCs u(0)=u(1)=beta,
    interior (u[i-1] - 2u[i] + u[i+1])(n-1)^2 + alpha*Nl(u[i], b=beta) with
    Nl(x) = 1 + (x + a x^2)/(1 + b x^2), a = 0.5.  Fold near alpha ~ 3.32."""

    def Nl(x, b, a=0.5):
        return 1.0 + (x + a * x ** 2) / (1.0 + b * x ** 2)

    def F(u, par):
        a, b = par["alpha"], par["beta"]
        interior = (u[:-2] - 2 * u[1:-1] + u[2:]) * (n - 1) ** 2 \
            + a * Nl(u[1:-1], b)
        return jnp.concatenate([u[:1] - b, interior, u[-1:] - b])

    i = np.arange(1, n + 1)
    u0 = jnp.asarray((i - 1) * (n - i) / n ** 2 + 0.1)
    return BifurcationProblem(F, u0=u0,
                              params={"alpha": alpha, "beta": beta},
                              lens="alpha")


def chan_spectral(N: int = 31, alpha: float = 3.3, beta: float = 0.01):
    """Chan BVP discretized by CHEBYSHEV COLLOCATION (the analog of the
    reference's ApproxFun variant, ref examples/chan-af.jl): u'' + alpha *
    Nl(u, b) = 0 on [0, 1], u(0)=u(1)=beta, with the dense spectral
    differentiation matrix replacing the FD stencil.  Same continuum folds
    as `chan` at far fewer dofs."""
    # Chebyshev points and differentiation matrix on [-1, 1] (Trefethen)
    j = np.arange(N + 1)
    xc = np.cos(np.pi * j / N)
    c = np.r_[2.0, np.ones(N - 1), 2.0] * (-1.0) ** j
    Xm = np.tile(xc[:, None], (1, N + 1))
    dX = Xm - Xm.T
    D = np.outer(c, 1.0 / c) / (dX + np.eye(N + 1))
    D -= np.diag(D.sum(axis=1))
    # map [-1,1] -> [0,1]: x = (1 - xc)/2, d/dx = -2 d/dxc
    D = -2.0 * D
    D2 = jnp.asarray(D @ D)

    def Nl(x, b, a=0.5):
        return 1.0 + (x + a * x ** 2) / (1.0 + b * x ** 2)

    def F(u, par):
        a, b = par["alpha"], par["beta"]
        r = D2 @ u + a * Nl(u, b)
        r = r.at[0].set(u[0] - b)
        r = r.at[-1].set(u[-1] - b)
        return r

    x01 = (1.0 - xc) / 2.0
    u0 = jnp.asarray(x01 * (1 - x01) + 0.1)
    return BifurcationProblem(F, u0=u0,
                              params={"alpha": alpha, "beta": beta},
                              lens="alpha")


def carrier(N: int = 200, eps: float = 0.7):
    """Carrier singular-perturbation BVP (ref examples/carrier.jl:7-43):
    eps^2 u'' + 2(1 - x^2) u + u^2 = 1 on (-1, 1), u(+-1) = 0, continued
    in eps.  The deflated-continuation flagship: disconnected
    boundary-layer branches multiply as eps -> 0.  Ships the analytic
    tridiagonal jacobian (the reference's BandedMatrix Jac_carr) to
    exercise the user-J path."""
    X = np.linspace(-1.0, 1.0, N)
    dx = X[1] - X[0]
    Xj = jnp.asarray(X)

    def F(u, par):
        e = par["eps"]
        upp = (jnp.roll(u, 1) - 2 * u + jnp.roll(u, -1)) / dx ** 2
        f = e ** 2 * upp + 2 * (1 - Xj ** 2) * u + u ** 2 - 1.0
        # Dirichlet rows overwrite the wrapped stencil contributions
        f = f.at[0].set(u[0])
        f = f.at[-1].set(u[-1])
        return f

    def jac(u, par):
        e = par["eps"]
        c = e ** 2 / dx ** 2
        main = -2.0 * c + 2 * (1 - Xj ** 2) + 2 * u
        J = (jnp.diag(main) + c * jnp.eye(N, k=1) + c * jnp.eye(N, k=-1))
        J = J.at[0, :].set(0.0).at[0, 0].set(1.0)
        J = J.at[-1, :].set(0.0).at[-1, -1].set(1.0)
        return J

    def record(u, p, **k):
        return {"param": p, "s": dx * jnp.sum(u ** 2),
                "norminf": jnp.max(jnp.abs(u))}

    return BifurcationProblem(F, u0=jnp.zeros(N), params={"eps": eps},
                              lens="eps", jac=jac,
                              record_from_solution=record)


def transcritical_1d(p: float = -0.5):
    """F(u, p) = p*u - u^2: transcritical branch point at (0, 0)."""

    def F(u, par):
        return par["p"] * u - u ** 2

    return BifurcationProblem(F, u0=jnp.zeros(1), params={"p": p}, lens="p")


def pitchfork_1d(p: float = -0.5):
    """F(u, p) = p*u - u^3: supercritical pitchfork at (0, 0)."""

    def F(u, par):
        return par["p"] * u - u ** 3

    return BifurcationProblem(F, u0=jnp.zeros(1), params={"p": p}, lens="p")


def hopf_normal_2d(p: float = -0.5, omega: float = 1.0, l1: float = -1.0):
    """Planar Hopf normal form: z' = (p + i omega) z + l1 z |z|^2.
    Hopf bifurcation at p = 0 with frequency `omega`."""

    def F(u, par):
        x, y = u[0], u[1]
        mu = par["p"]
        r2 = x * x + y * y
        return jnp.array([mu * x - omega * y + l1 * x * r2,
                          omega * x + mu * y + l1 * y * r2])

    return BifurcationProblem(F, u0=jnp.zeros(2), params={"p": p}, lens="p")


def stuart_landau(r: float = 0.5, mu: float = 0.1, nu: float = 1.0,
                  c3: float = 1.0, c5: float = 0.0):
    """Stuart-Landau oscillator in real coordinates
    (ref test/periodic_orbits_function_fd/stuartLandau*.jl)."""

    def F(u, par):
        # z' = (r + i mu) z - (1 + i nu) c3 |z|^2 z - c5 |z|^4 z, expanded in
        # real arithmetic (a bare x + 1j*y builds complex128 under x64,
        # which the TPU compiler rejects)
        x, y = u[0], u[1]
        rr = par["r"]
        m = par["mu"]
        n_ = par["nu"]
        cc3 = par["c3"]
        cc5 = par["c5"]
        ua = x * x + y * y
        fre = (rr * x - m * y) - cc3 * ua * (x - n_ * y) - cc5 * ua ** 2 * x
        fim = (rr * y + m * x) - cc3 * ua * (y + n_ * x) - cc5 * ua ** 2 * y
        return jnp.array([fre, fim])

    return BifurcationProblem(
        F, u0=jnp.array([0.01, 0.01]),
        params={"r": r, "mu": mu, "nu": nu, "c3": c3, "c5": c5}, lens="r")


def lorenz84(params=None):
    """Lorenz-84 atmospheric model (ref test/hopf_codim_2/lorenz84.jl):
    rich codim-2 structure (BT, ZH, HH on fold/hopf curves)."""
    if params is None:
        params = {"a": 0.25, "b": 4.0, "G": 0.25, "F": 1.0}

    def F(u, par):
        X, Y, Z, U = u[0], u[1], u[2], u[3]
        a, b, G, Ff = par["a"], par["b"], par["G"], par["F"]
        return jnp.array([
            -Y ** 2 - Z ** 2 - a * X + a * Ff - G * U ** 2,
            X * Y - b * X * Z - Y + G,
            b * X * Y + X * Z - Z,
            -G * U + G * X * U,
        ])

    # converges to the U=0 equilibrium branch (X ~ 0.984 at F=1)
    u0 = jnp.array([1.2, 0.2, 0.1, 0.0])
    return BifurcationProblem(F, u0=u0, params=params, lens="F")


def co_oxidation(params=None):
    """CO-oxidation model (ref test/hopf_codim_2/COModel.jl):
    fold & hopf curves with GH points."""
    if params is None:
        params = {"q1": 2.5, "q2": 1.0, "q3": 10.0, "q4": 0.0675,
                  "q5": 1.0, "q6": 0.1, "k": 0.4}

    def F(u, par):
        x, y, s = u[0], u[1], u[2]
        q1, q2, q3, q4 = par["q1"], par["q2"], par["q3"], par["q4"]
        q5, q6, k = par["q5"], par["q6"], par["k"]
        z = 1 - x - y - s
        return jnp.array([
            2 * q1 * z ** 2 - 2 * q5 * x ** 2 - q3 * x * y,
            q2 * z - q6 * y - q3 * x * y,
            q4 * z - k * q4 * s,
        ])

    # ref test/hopf_codim_2/COModel.jl:21
    u0 = jnp.array([0.001137, 0.891483, 0.062345])
    return BifurcationProblem(F, u0=u0, params=params, lens="q2")


def lure(alpha: float = -1.0, beta: float = 1.0):
    """Lur'e system (ref test/periodic_orbits_function_sh4_and_collocation/
    testLure.jl:9-16): x'=y, y'=z, z' = -alpha z - beta y - x + x^2.
    Hopf at alpha*beta = 1 (omega^2 = beta); the PO branch carries PD/NS
    points — the reference's canonical PO codim-2 fixture."""

    def F(u, par):
        x, y, z = u[0], u[1], u[2]
        return jnp.array([y, z,
                          -par["alpha"] * z - par["beta"] * y - x + x * x])

    return BifurcationProblem(F, u0=jnp.zeros(3),
                              params={"alpha": alpha, "beta": beta},
                              lens="alpha")


def freire(nu: float = -0.9, beta: float = 0.5, gamma: float = -0.6,
           a3: float = 0.328578, b3: float = 0.933578, r: float = 0.6):
    """Freire electronic oscillator (ref test/periodic_orbits_bp_po/
    freire.jl:5-19): the reference's fixture for BRANCH POINTS of periodic
    orbits (two BPs on the PO branch from the first Hopf; the switched
    branch carries NS and PD points).  Continued in nu."""

    def F(u, par):
        x, y, z = u[0], u[1], u[2]
        d = y - x
        d3 = d ** 3
        return jnp.array([
            (-(par["beta"] + par["nu"]) * x + par["beta"] * y
             - par["a3"] * x ** 3 + par["b3"] * d3) / par["r"],
            par["beta"] * x - (par["beta"] + par["gamma"]) * y - z
            - par["b3"] * d3,
            y,
        ])

    return BifurcationProblem(
        F, u0=jnp.zeros(3),
        params={"nu": nu, "beta": beta, "gamma": gamma, "a3": a3,
                "b3": b3, "r": r},
        lens="nu")


def swift_hohenberg_1d(n: int = 200, l_dom: float = 6.0, lam: float = -0.1,
                       nu: float = 2.0, seed: int = 0):
    """1D quintic Swift-Hohenberg (ref examples/SHpde_snaking.jl:7-35):
    F = -(I+D2)^2 u + lam u + nu u^3 - u^5 with the plain (Dirichlet-closure)
    second difference, localized-pattern guess 1.1 cos(x) — the reference's
    homoclinic-snaking workload for `bifurcationdiagram` and `DefCont`."""
    X = -l_dom + 2 * l_dom / n * np.arange(n)
    h2 = (X[1] - X[0]) ** 2

    def lap(u):
        # Dirichlet closure: zero-pad + slice (ref spdiagm, :16 — corners
        # NOT modified, unlike the Neumann models)
        up = jnp.pad(u, (1, 1))
        return (up[:-2] - 2 * u + up[2:]) / h2

    def F(u, par):
        v = u + lap(u)
        L1u = v + lap(v)
        return -L1u + par["lam"] * u + par["nu"] * u ** 3 - u ** 5

    def d2F(u, par, dx1, dx2):
        return (par["nu"] * 6 * u - 5 * 4 * u ** 3) * dx1 * dx2

    def d3F(u, par, dx1, dx2, dx3):
        return (par["nu"] * 6 - 5 * 4 * 3 * u ** 2) * dx1 * dx2 * dx3

    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.random(n))
    sol0 = 1.1 * np.cos(X)

    def record(x, p, **k):
        return {"param": p, "norm": jnp.linalg.norm(x),
                "nw": jnp.linalg.norm(w * x), "s": jnp.sum(x),
                "s2": x[n // 2], "s4": x[n // 4]}

    return BifurcationProblem(F, u0=jnp.asarray(sol0),
                              params={"lam": lam, "nu": nu}, lens="lam",
                              d2F_user=d2F, d3F_user=d3F,
                              record_from_solution=record)


def bvam_1d(N: int = 100, lx: float = 3 * np.pi / 2, D: float = 0.08,
            C: float = -0.2):
    """Barrio-Varea-Aragon-Maini 1D reaction-diffusion (ref examples/pd-1d.jl
    and Aragon et al., PRE 86 026201): Turing patterns whose oscillations
    period-double — the reference's PD-of-periodic-orbit PDE workload.
    State (2, N) = (u, v); Neumann modified-corner diffusion (D*Lap, Lap);
    continued in C."""
    h2 = (2 * lx / N) ** 2

    def lap(u):
        up = jnp.pad(u, (1, 1), mode="edge")
        return (up[:-2] - 2 * u + up[2:]) / h2

    def F(z, par):
        u, v = z[0], z[1]
        eta, a, b, H, Cc = (par["eta"], par["a"], par["b"], par["H"],
                            par["C"])
        fu = eta * (u + a * v - Cc * u * v - u * v * v)
        gv = eta * (H * u + b * v + Cc * u * v + u * v * v)
        return jnp.stack([par["D"] * lap(u) + fu, lap(v) + gv])

    X = np.linspace(-lx, lx, N)
    u0 = np.cos(2 * X)
    z0 = jnp.asarray(np.stack([u0, u0]))

    def record(z, p, **k):
        return {"param": p, "norm": jnp.max(jnp.abs(z)),
                "n2": jnp.linalg.norm(z.ravel())}

    return BifurcationProblem(
        F, u0=z0,
        params={"eta": 1.0, "a": -1.0, "b": -1.5, "H": 3.0, "D": D, "C": C},
        lens="C", record_from_solution=record)


def tsodyks_markram(params=None):
    """Tsodyks-Markram neural-mass model (ref examples/TMModel.jl:8-20):
    E-x-u synaptic dynamics with a firing-rate softplus.  The equilibrium
    branch in E0 carries two folds and a Hopf; the Hopf curve in (E0, alpha)
    and the PO branches are the reference's ODE-tutorial workload.
    Continued in E0."""
    if params is None:
        params = {"alpha": 1.5, "tau": 0.013, "J": 3.07, "E0": -2.0,
                  "tauD": 0.2, "U0": 0.3, "tauF": 1.5}

    def F(z, par):
        E, x, u = z[0], z[1], z[2]
        SS0 = par["J"] * u * x * E + par["E0"]
        SS1 = par["alpha"] * jnp.logaddexp(0.0, SS0 / par["alpha"])
        return jnp.array([
            (-E + SS1) / par["tau"],
            (1 - x) / par["tauD"] - u * x * E,
            (par["U0"] - u) / par["tauF"] + par["U0"] * (1 - u) * E,
        ])

    # ref examples/TMModel.jl:20
    u0 = jnp.array([0.238616, 0.982747, 0.367876])
    return BifurcationProblem(F, u0=u0, params=params, lens="E0")


def brusselator_1d(n: int = 100, alpha: float = 2.0, beta: float = 5.45,
                   D1: float = 0.008, D2: float = 0.004, l: float = 0.3):
    """1D Brusselator reaction-diffusion (ref examples/brusselator.jl:26-49,
    par at :93): Dirichlet BCs u=alpha, v=beta/alpha at both ends, h = 1/n,
    continued in the domain length `l`; Hopf bifurcations along the branch."""

    h = 1.0 / n

    def F(uv, par):
        a = par["alpha"]
        b = par["beta"]
        ll = par["l"]
        u = uv[:n]
        v = uv[n:]
        c1 = par["D1"] / (ll ** 2 * h ** 2)
        c2 = par["D2"] / (ll ** 2 * h ** 2)
        u_ext = jnp.concatenate([jnp.array([a]), u, jnp.array([a])])
        v_ext = jnp.concatenate([jnp.array([b / a]), v, jnp.array([b / a])])
        lap_u = u_ext[:-2] - 2 * u_ext[1:-1] + u_ext[2:]
        lap_v = v_ext[:-2] - 2 * v_ext[1:-1] + v_ext[2:]
        fu = c1 * lap_u + a - (b + 1) * u + u * u * v
        fv = c2 * lap_v + b * u - u * u * v
        return jnp.concatenate([fu, fv])

    u0 = jnp.concatenate([jnp.full((n,), alpha), jnp.full((n,), beta / alpha)])
    params = {"alpha": alpha, "beta": beta, "D1": D1, "D2": D2, "l": l}
    return BifurcationProblem(F, u0=u0, params=params, lens="l")


def _lap_dirichlet_2d(u, hx2, hy2):
    """5-point Laplacian with homogeneous Dirichlet closure (zero-padded;
    ref examples/cGL2d.jl:6-22: plain -2 diagonal at the corners)."""
    z = jnp.pad(u, ((1, 1), (1, 1)))
    return ((z[:-2, 1:-1] - 2 * u + z[2:, 1:-1]) / hx2
            + (z[1:-1, :-2] - 2 * u + z[1:-1, 2:]) / hy2)


def cgl2d(Nx: int = 41, Ny: int = 21, lx: float = np.pi,
          ly: float = np.pi / 2, r: float = 0.5, mu: float = 0.1,
          nu: float = 1.0, c3: float = -1.0, c5: float = 1.0,
          gamma: float = 0.0):
    """2D complex Ginzburg-Landau in real components (ref examples/cGL2d.jl:
    25-86): state (2, Nx, Ny) fields (u1, u2), Dirichlet Laplacian, Hopf
    bifurcations in r followed by periodic orbits.  BASELINE.json config."""
    hx = 2 * lx / Nx
    hy = 2 * ly / Ny
    hx2, hy2 = hx * hx, hy * hy

    def F(u, par):
        u1, u2 = u[0], u[1]
        rr, m, n_ = par["r"], par["mu"], par["nu"]
        cc3, cc5, g = par["c3"], par["c5"], par["gamma"]
        ua = u1 * u1 + u2 * u2
        f1 = (_lap_dirichlet_2d(u1, hx2, hy2) + rr * u1 - n_ * u2
              - ua * (cc3 * u1 - m * u2) - cc5 * ua ** 2 * u1 + g)
        f2 = (_lap_dirichlet_2d(u2, hx2, hy2) + rr * u2 + n_ * u1
              - ua * (cc3 * u2 + m * u1) - cc5 * ua ** 2 * u2)
        return jnp.stack([f1, f2])

    u0 = jnp.zeros((2, Nx, Ny))
    params = {"r": r, "mu": mu, "nu": nu, "c3": c3, "c5": c5,
              "gamma": gamma}
    prob = BifurcationProblem(
        F, u0=u0, params=params, lens="r",
        record_from_solution=lambda x, p, **k: {
            "param": p, "norm": jnp.linalg.norm(x.ravel()),
            "norminf": jnp.max(jnp.abs(x))})

    # exact spectral preconditioner: DST-I diagonalizes the zero-padded
    # Dirichlet second difference (plain corners), so (Delta - shift)^{-1}
    # applies diagonally per component in the 2D sine basis — the
    # Dirichlet-BC analogue of the SH models' DCT/FFT preconditioners
    # (steers the MF Newton-GMRES / codim-2 MA solves at the reference's
    # cGL2d workload, ref examples/cGL2d.jl:115-160)
    mu_x = 2.0 * (np.cos(np.pi * np.arange(1, Nx + 1) / (Nx + 1)) - 1) / hx2
    mu_y = 2.0 * (np.cos(np.pi * np.arange(1, Ny + 1) / (Ny + 1)) - 1) / hy2
    sym = jnp.asarray(mu_x[:, None] + mu_y[None, :])
    sym32 = jnp.asarray(sym, jnp.float32)

    def _dst1(u, axis):
        """DST-I via FFT of the odd extension (length 2n+2): the transform
        that exactly diagonalizes the Dirichlet second difference."""
        n = u.shape[axis]
        zshape = list(u.shape)
        zshape[axis] = 1
        z = jnp.zeros(zshape, u.dtype)
        y = jnp.concatenate([z, u, z, -jnp.flip(u, axis)], axis=axis)
        Fy = jnp.fft.fft(y, axis=axis)
        return -jnp.imag(jax.lax.slice_in_dim(Fy, 1, n + 1, axis=axis)) / 2.0

    def precond(v, shift=0.0):
        shp = v.shape
        x = v.reshape((2, Nx, Ny))
        lam = sym32 if (jax.default_backend() == "tpu"
                        or x.dtype == jnp.float32) else sym
        xf = x.astype(jnp.float32) if lam is sym32 else x
        t = _dst1(_dst1(xf, 1), 2)
        t = t / (lam - shift)[None]
        t = _dst1(_dst1(t, 1), 2) * (4.0 / ((Nx + 1) * (Ny + 1)))
        return t.astype(v.dtype).reshape(shp)

    object.__setattr__(prob, "spectral_precond", precond)

    def po_spectral_data(r0: float):
        """(sym_blocks, to_modes, from_modes) for the trapeze space-time
        preconditioner (`Trapeze.spectral_precond`): per DST mode k the
        frozen cGL linearization [[lam_k + r0, -nu], [nu, lam_k + r0]] —
        the TPU-native stand-in for the reference's ILU on the cGL2d PO
        jacobian (ref examples/cGL2d.jl:211-213)."""
        nu_ = float(params["nu"])
        lam = np.asarray(sym).reshape(-1)                       # (K,)
        K = lam.shape[0]
        blocks = np.zeros((K, 2, 2))
        blocks[:, 0, 0] = lam + r0
        blocks[:, 1, 1] = lam + r0
        blocks[:, 0, 1] = -nu_
        blocks[:, 1, 0] = nu_
        scale = 4.0 / ((Nx + 1) * (Ny + 1))

        def to_modes(v):
            x = v.reshape(2, Nx, Ny)
            t = _dst1(_dst1(x, 1), 2)
            return t.reshape(2, -1).T                            # (K, 2)

        def from_modes(w):
            t = w.T.reshape(2, Nx, Ny)
            x = _dst1(_dst1(t, 1), 2) * scale
            return x.reshape(-1)

        return blocks, to_modes, from_modes

    object.__setattr__(prob, "po_spectral_data", po_spectral_data)
    return prob


def fold_hopf_interaction_2d(Nx: int = 32, Ny: int = 32,
                             lx: float = np.pi, ly: float = np.pi,
                             p1: float = -0.4, a: float = -0.5,
                             alpha: float = 1.0, nu: float = 1.0):
    """Constructed PDE-scale fold-Hopf (zero-Hopf) interaction with EXACT
    codim-2 geometry — the validation model for matrix-free codim-2
    switching (the dense-path analog is the lorenz84 zh flows,
    ref test/hopf_codim_2/lorenz84.jl:350-371):

        s_t = Lap s + p1 + s^2
        z_t = Lap z + (a + alpha s) z + i nu z      (z = x + i y)

    with Neumann Laplacians, state (3, Nx, Ny).  Constant states
    s = +-sqrt(-p1), z = 0; per DCT mode k the jacobian is block diagonal
    with s-block (lam_k + 2 s) and z-block (lam_k + a + alpha s +- i nu):

      * fold curve in (p1, a):  EXACTLY p1 = 0 (s = 0), all a
      * zero-Hopf ON that curve at a = 0
      * Hopf curve through the ZH:  a + alpha s = 0  ->  p1 = -(a/alpha)^2
        with omega = nu exactly.
    """
    hx2 = (2 * lx / Nx) ** 2
    hy2 = (2 * ly / Ny) ** 2
    from .sh import _lap_neumann

    def lap(u):
        return _lap_neumann(u, hx2, 0) + _lap_neumann(u, hy2, 1)

    def F(u, par):
        s, x, y = u[0], u[1], u[2]
        pp1, aa, al, nn = par["p1"], par["a"], par["alpha"], par["nu"]
        g = aa + al * s
        return jnp.stack([lap(s) + pp1 + s * s,
                          lap(x) + g * x - nn * y,
                          lap(y) + nn * x + g * y])

    s0 = -np.sqrt(max(-p1, 0.0))
    u0 = jnp.zeros((3, Nx, Ny)).at[0].set(s0)
    prob = BifurcationProblem(
        F, u0=u0, params={"p1": p1, "a": a, "alpha": alpha, "nu": nu},
        lens="p1",
        record_from_solution=lambda x, p, **k: {
            "param": p, "norm": jnp.linalg.norm(x.ravel()),
            "smean": jnp.mean(x[0])})

    # DCT-II diagonalizes the modified-corner Neumann second difference:
    # blockdiag (Lap - shift)^{-1} per component
    mu_x = 2.0 * (np.cos(np.pi * np.arange(Nx) / Nx) - 1) / hx2
    mu_y = 2.0 * (np.cos(np.pi * np.arange(Ny) / Ny) - 1) / hy2
    sym = jnp.asarray(mu_x[:, None] + mu_y[None, :], jnp.float32)

    def precond(v, shift=1.0):
        import jax as _jax

        shp = v.shape
        x = v.reshape((3, Nx, Ny)).astype(jnp.float32)
        t = _jax.scipy.fft.dct(_jax.scipy.fft.dct(x, type=2, norm="ortho",
                                                  axis=1),
                               type=2, norm="ortho", axis=2)
        t = t / (sym - shift)[None]
        out = _jax.scipy.fft.idct(_jax.scipy.fft.idct(t, type=2,
                                                      norm="ortho", axis=2),
                                  type=2, norm="ortho", axis=1)
        return out.astype(v.dtype).reshape(shp)

    object.__setattr__(prob, "spectral_precond", precond)
    return prob


def bogdanov_takens_2d(Nx: int = 40, Ny: int = 40,
                       lx: float = np.pi / 4, ly: float = np.pi / 4,
                       b1: float = 0.5, b2: float = 2.0):
    """PDE-promoted Bogdanov-Takens model (the planar bt_model with Neumann
    diffusion), state (2, Nx, Ny):

        u_t = Lap u + v
        v_t = Lap v + b1 + b2 u + u^2 - u v

    Constant states have v = 0 and b1 + b2 u + u^2 = 0; per DCT mode k the
    jacobian block is [[lam_k, 1], [b2 + 2u - v, lam_k - u]], so the mode-0
    block is exactly the ODE bt_model: fold curve b1 = b2^2/4 with an EXACT
    BT at (b1, b2) = (0, 0), u = 0 — the >=3k-dof validation target for the
    bordered/iterative BT normal form.  The default quarter-size domain
    keeps the spurious mode-k fold curves (b1 = -(b2 u* + u*^2) at
    u* = (lam_k^2 - b2)/(2 + lam_k)) far from the mode-0 curve, so the MA
    corrector cannot hop onto them from a coarsely-located start."""
    hx2 = (2 * lx / Nx) ** 2
    hy2 = (2 * ly / Ny) ** 2
    from .sh import _lap_neumann

    def lap(u):
        return _lap_neumann(u, hx2, 0) + _lap_neumann(u, hy2, 1)

    def F(w, par):
        u, v = w[0], w[1]
        return jnp.stack([lap(u) + v,
                          lap(v) + par["b1"] + par["b2"] * u + u * u
                          - u * v])

    u0c = (-b2 + np.sqrt(max(b2 * b2 - 4 * b1, 0.0) + 1e-12)) / 2.0
    w0 = jnp.zeros((2, Nx, Ny)).at[0].set(u0c)
    prob = BifurcationProblem(
        F, u0=w0, params={"b1": b1, "b2": b2}, lens="b1",
        record_from_solution=lambda x, p, **k: {
            "param": p, "norm": jnp.linalg.norm(x.ravel()),
            "umean": jnp.mean(x[0])})

    mu_x = 2.0 * (np.cos(np.pi * np.arange(Nx) / Nx) - 1) / hx2
    mu_y = 2.0 * (np.cos(np.pi * np.arange(Ny) / Ny) - 1) / hy2
    sym = jnp.asarray(mu_x[:, None] + mu_y[None, :], jnp.float32)

    def precond(v, shift=1.0):
        import jax as _jax

        shp = v.shape
        x = v.reshape((2, Nx, Ny)).astype(jnp.float32)
        t = _jax.scipy.fft.dct(_jax.scipy.fft.dct(x, type=2, norm="ortho",
                                                  axis=1),
                               type=2, norm="ortho", axis=2)
        t = t / (sym - shift)[None]
        out = _jax.scipy.fft.idct(_jax.scipy.fft.idct(t, type=2,
                                                      norm="ortho", axis=2),
                                  type=2, norm="ortho", axis=1)
        return out.astype(v.dtype).reshape(shp)

    object.__setattr__(prob, "spectral_precond", precond)
    return prob
