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

from ..linalg.eig import dense_eig


@dataclasses.dataclass(frozen=True)
class FloquetEig:
    """Multipliers of the monodromy matrix -> Floquet exponents
    (ref FloquetQaD :48 / FloquetColl :533; the trivial multiplier mu = 1
    sits at exponent 0 — use tol_stability ~ 1e-6 for PO runs, as the
    reference does, e.g. examples/brusselator.jl:140)."""

    is_floquet: bool = True

    def __call__(self, M, nev: int):
        mult, vecs = dense_eig(M)          # sorted by Re(mu) desc
        expo = jnp.log(mult.astype(jnp.complex128))
        order = jnp.lexsort((-expo.imag, -expo.real))
        expo = expo[order]
        vecs = vecs[:, order]
        nev = min(nev, M.shape[0])
        return expo[:nev], vecs[:, :nev], jnp.array(True), jnp.array(1)


def floquet_multipliers(disc, prob_vf, X, po_par):
    """Host-friendly: the Floquet multipliers of an orbit."""
    Mn = disc.monodromy(prob_vf, X, po_par)
    mult, _ = dense_eig(Mn)
    return np.asarray(mult)
