"""Problem layer (ref src/Problems.jl).

`BifurcationProblem(F, u0, params, lens)` holds the residual `F(u, params)`
plus optional user derivatives; everything missing is synthesized with JAX
transforms instead of ForwardDiff (ref src/Problems.jl:141-184):

* jacobian-vector products  -> `jax.jvp`
* adjoint products          -> `jax.vjp`
* dense jacobian            -> `jax.jacfwd` over the raveled state
* dF/dp                     -> `jax.jvp` through the lens (exact, replacing
                               the reference's finite differences at
                               src/continuation/Palc.jl:222-240)
* d2F, d3F, jets R_ij       -> nested `jax.jvp`

The problem object is *static configuration* (callables + metadata); the
dynamic data (u, params) is always passed explicitly so jitted kernels close
over the problem once and never retrace.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .lens import LensLike, as_lens, lens_get, lens_set
from .state import ravel, tree_norm

Pytree = Any


def _default_record(x, p, **kwargs):
    flat, _ = ravel(x)
    return {"param": p, "norm": jnp.linalg.norm(flat)}


@dataclasses.dataclass(frozen=True, eq=False)
class BifurcationProblem:
    """Bifurcation problem F(u, params) = 0 continued in `lens_get(params, lens)`.

    (ref `BifurcationProblem` constructor, src/Problems.jl:439-512)
    """

    F: Callable[[Pytree, Any], Pytree]
    u0: Pytree = None
    params: Any = None
    lens: Optional[LensLike] = None

    # optional user-supplied derivatives (ref BifFunction, src/Problems.jl:89-184)
    jac: Optional[Callable] = None          # (u, params) -> dense matrix
    jac_op: Optional[Callable] = None       # (u, params) -> (v -> J v) operator
    jac_adjoint: Optional[Callable] = None  # (u, params) -> (v -> J^T v)
    d2F_user: Optional[Callable] = None     # (u, params, dx1, dx2)
    d3F_user: Optional[Callable] = None     # (u, params, dx1, dx2, dx3)
    dFdp_user: Optional[Callable] = None    # (u, params) -> dF/d(lens param)

    # hooks (ref src/Problems.jl:458-476)
    record_from_solution: Callable = _default_record
    plot_solution: Optional[Callable] = None
    save_solution: Optional[Callable] = None
    update: Optional[Callable] = None       # problem update hook along branch

    # numerics
    delta: float = 1e-8                     # FD step when FD fallback requested

    # --- residual / parameter access ------------------------------------
    def residual(self, u, params):
        return self.F(u, params)

    def get_lens_param(self, params):
        return lens_get(params, self.lens)

    def set_lens_param(self, params, value):
        return lens_set(params, self.lens, value)

    @property
    def param_value(self):
        return self.get_lens_param(self.params)

    # --- jacobians -------------------------------------------------------
    def jacobian(self, u, params):
        """Dense jacobian as a 2-D array over the raveled state."""
        if self.jac is not None:
            return self.jac(u, params)
        flat, unravel = ravel(u)

        def f_flat(v):
            out = self.F(unravel(v), params)
            of, _ = ravel(out)
            return of

        return jax.jacfwd(f_flat)(flat)

    def jacobian_operator(self, u, params):
        """Matrix-free jacobian: returns `v -> J(u, params) v` on pytrees."""
        if self.jac_op is not None:
            return self.jac_op(u, params)

        def op(v):
            return self.dF(u, params, v)

        return op

    def dF(self, u, params, v):
        """J(u, params) @ v via jvp."""
        if self.jac_op is not None:
            return self.jac_op(u, params)(v)
        _, jv = jax.jvp(lambda x: self.F(x, params), (u,), (v,))
        return jv

    def dFt(self, u, params, v):
        """J(u, params)^T @ v via vjp (real transpose, not conjugate)."""
        if self.jac_adjoint is not None:
            return self.jac_adjoint(u, params)(v)
        _, vjp_fn = jax.vjp(lambda x: self.F(x, params), u)
        (out,) = vjp_fn(v)
        return out

    def dFdp(self, u, params):
        """Exact dF/dp through the lens via jvp (replaces the reference's
        finite differences, src/continuation/Palc.jl:222).  A user override
        (`dFdp_user`) short-circuits the AD path — needed when F itself
        contains an iterative solve (e.g. the matrix-free minimally-
        augmented sigma, codim2/minaug_mf.py) whose jvp would be wasteful."""
        if self.dFdp_user is not None:
            return self.dFdp_user(u, params)
        p0 = self.get_lens_param(params)

        def f_of_p(p):
            return self.F(u, self.set_lens_param(params, p))

        _, dp = jax.jvp(f_of_p, (p0,), (jnp.ones_like(jnp.asarray(p0)),))
        return dp

    # --- higher-order derivatives (jets) ---------------------------------
    def d2F(self, u, params, dx1, dx2):
        """Bilinear form d^2F(u)[dx1, dx2] via nested jvp
        (ref `BilinearMap`, src/Problems.jl:677-694)."""
        if self.d2F_user is not None:
            return self.d2F_user(u, params, dx1, dx2)

        def jv(x):
            _, out = jax.jvp(lambda y: self.F(y, params), (x,), (dx1,))
            return out

        _, d2 = jax.jvp(jv, (u,), (dx2,))
        return d2

    def d3F(self, u, params, dx1, dx2, dx3):
        """Trilinear form d^3F(u)[dx1, dx2, dx3]
        (ref `TrilinearMap`, src/Problems.jl:696-712)."""
        if self.d3F_user is not None:
            return self.d3F_user(u, params, dx1, dx2, dx3)

        def j2(x):
            def jv(y):
                _, out = jax.jvp(lambda z: self.F(z, params), (y,), (dx1,))
                return out

            _, out2 = jax.jvp(jv, (x,), (dx2,))
            return out2

        _, d3 = jax.jvp(j2, (u,), (dx3,))
        return d3

    def d4F(self, u, params, dx1, dx2, dx3, dx4):
        """Quadrilinear form d^4F(u)[dx1..dx4] via nested jvp."""

        def j3(x):
            def j2(y):
                def jv(z):
                    _, o = jax.jvp(lambda w: self.F(w, params), (z,), (dx1,))
                    return o

                _, o2 = jax.jvp(jv, (y,), (dx2,))
                return o2

            _, o3 = jax.jvp(j2, (x,), (dx3,))
            return o3

        _, d4 = jax.jvp(j3, (u,), (dx4,))
        return d4

    def d5F(self, u, params, dx1, dx2, dx3, dx4, dx5):
        """Quintilinear form d^5F(u)[dx1..dx5] via nested jvp."""

        def j4(x):
            return self.d4F(x, params, dx1, dx2, dx3, dx4)

        _, d5 = jax.jvp(j4, (u,), (dx5,))
        return d5

    def _multilinear_complex(self, form, u, params, *dxs):
        """Extend a real multilinear form to complex directions by
        splitting each direction into re/im (2^k real evaluations)."""
        from itertools import product as _product

        re = lambda t: jax.tree_util.tree_map(lambda x: jnp.real(x), t)
        im = lambda t: jax.tree_util.tree_map(lambda x: jnp.imag(x), t)
        out = None
        for combo in _product((0, 1), repeat=len(dxs)):
            coef = 1j ** sum(combo)
            args = [im(d) if c else re(d) for c, d in zip(combo, dxs)]
            term = form(u, params, *args)
            term = jax.tree_util.tree_map(lambda x: coef * x, term)
            out = term if out is None else jax.tree_util.tree_map(
                jnp.add, out, term)
        return out

    def d4F_complex(self, u, params, *dxs):
        return self._multilinear_complex(self.d4F, u, params, *dxs)

    def d5F_complex(self, u, params, *dxs):
        return self._multilinear_complex(self.d5F, u, params, *dxs)

    def d2F_complex(self, u, params, dx1, dx2):
        """Bilinear form extended to complex directions by multilinearity
        (ref `BilinearMap` complex splitting, src/Problems.jl:677-694).
        JAX jvp cannot push complex tangents through real F, so split."""
        re = lambda t: jax.tree_util.tree_map(lambda x: jnp.real(x), t)
        im = lambda t: jax.tree_util.tree_map(lambda x: jnp.imag(x), t)
        b = self.d2F
        rr = b(u, params, re(dx1), re(dx2))
        ri = b(u, params, re(dx1), im(dx2))
        ir = b(u, params, im(dx1), re(dx2))
        ii = b(u, params, im(dx1), im(dx2))
        return jax.tree_util.tree_map(
            lambda t_rr, t_ii, t_ri, t_ir: (t_rr - t_ii) + 1j * (t_ri + t_ir),
            rr, ii, ri, ir)

    def d3F_complex(self, u, params, dx1, dx2, dx3):
        re = lambda t: jax.tree_util.tree_map(lambda x: jnp.real(x), t)
        im = lambda t: jax.tree_util.tree_map(lambda x: jnp.imag(x), t)
        t = self.d3F
        out = None
        # expand (r1 + i i1)(r2 + i i2)(r3 + i i3) by multilinearity
        for s1, f1 in ((1.0, re), (1j, im)):
            for s2, f2 in ((1.0, re), (1j, im)):
                for s3, f3 in ((1.0, re), (1j, im)):
                    term = t(u, params, f1(dx1), f2(dx2), f3(dx3))
                    coef = s1 * s2 * s3
                    term = jax.tree_util.tree_map(lambda x: coef * x, term)
                    out = term if out is None else jax.tree_util.tree_map(
                        jnp.add, out, term)
        return out

    # hooks that are CLOSURES over the functional and state shape; carrying
    # them onto a problem with a different F or a different-shaped u0 would
    # silently apply a stale operator (ADVICE r4) — they are dropped then
    _SHAPE_COUPLED_HOOKS = frozenset({
        "spectral_precond", "eig_jacobian", "anchors_kernel",
        "po_spectral_data", "gm_ext", "gm2"})

    # --- functional update (ref re_make, src/Problems.jl:576-617) ---------
    def re_make(self, **kwargs):
        """dataclasses.replace + carry over non-field attributes
        (spectral_precond, eig_jacobian, the MA/PO metadata, ...): problems
        accrete capability hooks via object.__setattr__, and losing them on
        `re_make(u0=...)` silently downgrades downstream solves (e.g. the
        codim-2 MA path falling back to unpreconditioned GMRES).

        Hooks in `_SHAPE_COUPLED_HOOKS` close over the old problem's
        functional/shapes; when `F` is replaced or the flattened state size
        changes, they are NOT carried (a stale closure is worse than the
        downgrade)."""
        new = dataclasses.replace(self, **kwargs)
        shape_changed = "F" in kwargs
        if not shape_changed and "u0" in kwargs \
                and kwargs["u0"] is not None and self.u0 is not None:
            from .state import ravel as _ravel

            try:
                shape_changed = (_ravel(kwargs["u0"])[0].shape
                                 != _ravel(self.u0)[0].shape)
            except Exception:
                pass
        field_names = {f.name for f in dataclasses.fields(self)}
        for key, val in self.__dict__.items():
            if key not in field_names and key not in new.__dict__:
                if shape_changed and key in self._SHAPE_COUPLED_HOOKS:
                    continue
                object.__setattr__(new, key, val)
        return new

    # hashing by identity: problems are static configuration objects
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


# Aliases matching the reference's ODE/PDE constructors (src/Problems.jl:514-530)
ODEBifProblem = BifurcationProblem
PDEBifProblem = BifurcationProblem
