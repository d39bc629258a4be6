from .algorithms import (AutoSwitch, MoorePenrose, MoorePenroseLS, Multiple,
                         Natural, PALC)
from .driver import continuation
from .engine import ContIterable, ContState
from .results import Branch, ContResult, merge_branches
from .tangents import Bordered, Polynomial, Secant
