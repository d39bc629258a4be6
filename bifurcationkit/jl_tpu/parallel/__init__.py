from .halo import pdot, pnorm, sharded_dia_spmv, sharded_gmres_matvec
from .mesh import make_mesh, replicated, shard_state
from .ops import periodic_laplacian_2d, sh_operator_2d
