from .minaug import (continuation_fold, continuation_hopf, fold_ma_problem,
                     hopf_ma_problem, newton_fold, newton_hopf)
