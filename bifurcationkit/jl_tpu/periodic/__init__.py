from .collocation import Collocation, legendre_matrices
from .flow import Flow
from .floquet import FloquetEig, floquet_multipliers
from .orbits import (continuation_hopf_po, continuation_po, newton_po,
                     orbit_from_branch, periodic_orbit_problem)
from .shooting import PoincareShooting, Shooting
from .trapezoid import Trapeze
from .codim2 import (continuation_fold_po, continuation_ns, continuation_pd,
                     pd_branch_switch)
from .normal_forms import (get_normal_form_po, neimark_sacker_iooss,
                           period_doubling_iooss,
                           poincare_return_map)
from .cop import (COPBLS, COPLS, COPBlocks, collocation_block_jacobian,
                  cop_solve, cop_solve_bordered)
from .floquet import FloquetColl, FloquetGEV, FloquetQaDMF
from .orbits import get_periodic_orbit
from .codim2 import bp_po_branch_switch
