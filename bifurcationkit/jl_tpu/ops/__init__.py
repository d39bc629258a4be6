from .sparse import BSRMatrix, DIAMatrix, ELLMatrix, laplacian_1d_dia
from .pallas_spmv import dia_spmv, dia_spmv_pallas
