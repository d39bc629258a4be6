from .mesh import make_mesh, shard_state
from .ops import periodic_laplacian_2d, sh_operator_2d
