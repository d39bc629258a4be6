from .bvp import (BVPCollocation, BVPModel, BVPShooting, bvp_problem,
                  discretize)
