"""bifurcationkit.jl_tpu — TPU-native numerical continuation & bifurcation
analysis framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of BifurcationKit.jl
(reference mounted at /root/reference) for TPU hardware: pytree states,
jit-compiled Newton/PALC/Krylov loops, Pallas sparse kernels, and
`jax.sharding` meshes in place of the reference's single-process Julia stack.
"""
import os as _os

import jax as _jax

# Bifurcation tolerances (Newton tol 1e-12, bisection eig tol 1e-16 — ref
# src/ContParameters.jl:81) need f64 accumulation.  Opt out with
# BK_TPU_X64=0 for pure-f32 kernel benchmarking.
if _os.environ.get("BK_TPU_X64", "1") == "1":
    _jax.config.update("jax_enable_x64", True)

from .core import (BifurcationProblem, BorderedState, ContinuationPar,
                   DotTheta, Lens, NewtonPar, ODEBifProblem, PDEBifProblem,
                   as_lens, lens_get, lens_set, setfield)
from .linalg import (ArnoldiEig, BiCGStab, DenseEig, DenseLS, FlatOperator,
                     GMRES, IterativeRefinement, LOBPCGEig, ShiftInvertEig,
                     SubspaceEig)
from .linalg.bordered import (BorderingBLS, LSFromBLS, MatrixBLS,
                              MatrixFreeBLS)
from .newton import (NonLinearSolution, cb_max_norm,
                     cb_max_norm_and_dp, newton)
from .deflation import (DeflationOperator, deflated_newton,
                        deflated_problem)
from .continuation.deflated import DCResult, DefCont, deflated_continuation
from .continuation import (AutoSwitch, Bordered, Branch, ContIterable,
                           ContResult, ContState, MoorePenrose, Multiple,
                           Natural, PALC, Polynomial, Secant, continuation,
                           merge_branches)
from .detection import (ContinuousEvent, DiscreteEvent, PairOfEvents,
                        SetOfEvents, SpecialPoint, bif_detect_event,
                        fold_detect_event, save_at_event)
from .codim2 import (bt_normal_form, bt_predictors, continuation_fold,
                     switch_codim2,
                     continuation_hopf, cusp_normal_form,
                     get_normal_form_codim2, newton_bt, newton_fold,
                     newton_hopf, refine_gh)
from .codim2.zh_hh import hh_normal_form, zh_normal_form
from .codim2.unfolding import (bautin_unfolding, bt_unfolding,
                               hh_unfolding, predictor_fold_po,
                               predictor_homoclinic_bt, predictor_ns_hh,
                               predictor_ns_zh, switch_codim2_po,
                               zh_unfolding)
from .periodic import (Collocation, Flow, FloquetEig, PoincareShooting,
                       Shooting, Trapeze, continuation_hopf_po,
                       continuation_po, newton_po, orbit_from_branch,
                       periodic_orbit_problem)
from .periodic.codim2 import (continuation_fold_po, continuation_ns,
                              bp_po_branch_switch, continuation_pd,
                              pd_branch_switch, po_codim2_test_values)
from .periodic.normal_forms import (get_normal_form_po, neimark_sacker_iooss,
                                    period_doubling_iooss,
                                    poincare_return_map)
from .periodic.cop import (COPBLS, COPLS, collocation_block_jacobian,
                           cop_solve, cop_solve_bordered)
from .periodic import (FloquetColl, FloquetGEV, FloquetQaDMF,
                       get_periodic_orbit)
from .ops import BSRMatrix, DIAMatrix, ELLMatrix, dia_spmv
from .utils import (load_branch, plot_bifurcation_diagram, plot_branch,
                    plot_periodic_orbit, resume_data, save_branch,
                    save_every_step, savefig)
from .wave import travelling_wave_problem
from .bvp import (BVPCollocation, BVPModel, BVPShooting, BVPTrapezoid,
                  bvp_problem, discretize)
from .normal_forms.bautin import bautin_normal_form
from .normal_forms import (BifDiagNode, bifurcationdiagram,
                           continuation_from_bp, get_normal_form,
                           hopf_normal_form, multicontinuation, predictor)

__version__ = "0.1.0"

_LAZY_SUBMODULES = ("models", "ops", "parallel", "linalg", "periodic",
                    "codim2", "normal_forms", "detection", "continuation",
                    "wave", "bvp", "utils", "native", "core")


def __getattr__(name):
    # lazy submodule access (`bk.models.chan(...)`) without paying the
    # import cost of every model/kernel at package import time
    if name in _LAZY_SUBMODULES:
        import importlib
        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
