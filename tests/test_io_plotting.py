"""Save/load + plotting smoke tests (ref test/plot_utils, ext/JLD2Ext)."""
import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

import bifurcationkit.jl_tpu as bk
from bifurcationkit.jl_tpu import models


@pytest.fixture(scope="module")
def branch():
    prob = models.pitchfork_1d(p=-0.5)
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-4, p_min=-1.0,
                            p_max=1.0, max_steps=100, detect_bifurcation=3,
                            nev=2, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-10))
    return bk.continuation(prob, bk.PALC(), cp)


def test_save_load_roundtrip(branch):
    with tempfile.TemporaryDirectory() as d:
        path = bk.save_branch(branch, os.path.join(d, "br"))
        res = bk.load_branch(path)
        assert len(res) == len(branch)
        np.testing.assert_allclose(res.param, branch.param)
        assert len(res.specialpoint) == len(branch.specialpoint)
        assert res.specialpoint[0].type == branch.specialpoint[0].type
        assert res.specialpoint[0].param == pytest.approx(
            branch.specialpoint[0].param)
        # solutions and eigen-elements survive
        assert len(res.sol) == len(branch.sol)
        np.testing.assert_allclose(np.asarray(res.sol[-1]["x"]),
                                   np.asarray(branch.sol[-1]["x"]))
        assert len(res.eig) == len(branch.eig)


def test_save_every_step_hook():
    prob = models.pitchfork_1d(p=-0.5)
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-4, p_min=-1.0,
                            p_max=0.0, max_steps=30, detect_bifurcation=0,
                            newton_options=bk.NewtonPar(tol=1e-10))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck")
        br = bk.continuation(prob, bk.PALC(), cp,
                             finalise_solution=bk.save_every_step(path, 5))
        assert os.path.exists(path + ".npz")
        x, p, res = bk.resume_data(path)
        assert len(res) > 1


def test_plot_branch_smoke(branch):
    ax = bk.plot_branch(branch)
    assert ax is not None
    with tempfile.TemporaryDirectory() as d:
        bk.savefig(ax, os.path.join(d, "branch.png"))
        assert os.path.exists(os.path.join(d, "branch.png"))


def test_plot_po_smoke():
    prob = models.hopf_normal_2d(p=-0.1)
    cp = bk.ContinuationPar(ds=0.01, dsmax=0.05, dsmin=1e-5, p_min=-0.2,
                            p_max=1.0, max_steps=60, detect_bifurcation=3,
                            nev=2, n_inversion=4,
                            newton_options=bk.NewtonPar(tol=1e-10))
    br = bk.continuation(prob, bk.PALC(), cp)
    idx = br.specialpoint.index(br.get_special_points("hopf")[0])
    cp_po = bk.ContinuationPar(ds=0.02, dsmax=0.08, dsmin=1e-5, p_min=0.0,
                               p_max=0.3, max_steps=15, detect_bifurcation=0,
                               detect_fold=False,
                               newton_options=bk.NewtonPar(tol=1e-9))
    br_po = bk.continuation_hopf_po(br, idx, cp_po,
                                    disc=bk.Collocation(Ntst=12, m=3))
    ax = bk.plot_periodic_orbit(br_po)
    assert ax is not None
