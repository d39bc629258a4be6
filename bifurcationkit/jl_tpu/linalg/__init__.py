from .linear import BiCGStab, DenseLS, GMRES, apply_J, is_operator
from .eig import ArnoldiEig, DenseEig, FlatOperator, ShiftInvertEig, dense_eig
