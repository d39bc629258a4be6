from .bvp import (BVPCollocation, BVPModel, BVPShooting, BVPTrapezoid,
                  bvp_problem, discretize)
