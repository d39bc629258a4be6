"""nev auto-raise (ref compute_eigenvalues!, src/Utils.jl:67-105): a branch
destabilizing in more directions than the requested nev must still classify
every crossing — the engine grows the eigensolve window to n_unstable + 5."""
import jax.numpy as jnp
import numpy as np

import bifurcationkit.jl_tpu as bk


def _many_crossings_problem(k=12, extra=4):
    """F_i(u, p) = (p - d_i) u_i - u_i^3 on the trivial branch u = 0:
    the jacobian is diag(p - d_i) with d_i = 0.1..0.1k, so the branch
    gains one unstable direction at each p = d_i — k simple branch
    points."""
    d = jnp.concatenate([0.1 * (1.0 + jnp.arange(k)),
                         10.0 + jnp.arange(extra)])

    def F(u, par):
        return (par["p"] - d) * u - u ** 3

    return bk.BifurcationProblem(F, u0=jnp.zeros(k + extra),
                                 params={"p": 0.0}, lens="p")


def test_saturated_nev_misses_crossings_without_autoraise():
    """Control: with detection counts capped at nev=5 eigenvalues the
    later crossings would be invisible — this asserts the PREMISE by
    checking the auto-raise actually engaged (kernels.nev grew)."""
    prob = _many_crossings_problem()
    cp = bk.ContinuationPar(ds=0.02, dsmax=0.04, dsmin=1e-6, p_min=-0.1,
                            p_max=1.45, max_steps=200, nev=5,
                            detect_bifurcation=3, n_inversion=2,
                            newton_options=bk.NewtonPar(tol=1e-10))
    from bifurcationkit.jl_tpu.continuation.engine import ContIterable

    it = ContIterable(prob, bk.PALC(), cp)
    assert it.kernels.nev == 5
    from bifurcationkit.jl_tpu.continuation.driver import _continuation_loop

    res = _continuation_loop(it)
    assert it.kernels.nev >= 12 + 5 - 3   # grew past the initial window
    bps = [sp for sp in res.specialpoint if sp.type in ("bp", "nd")]
    # all 12 crossings classified (each simple -> bp; coincident within a
    # step may merge to nd, so count total crossing multiplicity)
    mult = sum(2 if sp.type == "nd" else 1 for sp in bps)
    assert mult >= 12
    # every crossing localized inside its bracketing interval
    for sp in bps:
        lo, hi = sp.interval
        assert lo - 1e-8 <= sp.param <= hi + 1e-8
