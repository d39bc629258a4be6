from .minaug import (continuation_fold, continuation_hopf, fold_ma_problem,
                     switch_codim2,
                     hopf_ma_problem, newton_fold, newton_hopf, refine_gh)
from .minaug_mf import (continuation_fold_mf, continuation_hopf_mf,
                        fold_ma_problem_mf, hopf_ma_problem_mf)
from .normal_forms import (bt_normal_form, bt_predictors, cusp_normal_form,
                           get_normal_form_codim2, newton_bt)
from .zh_hh import hh_normal_form, zh_normal_form
from .unfolding import (bautin_unfolding, bt_unfolding, hh_unfolding,
                        predictor_fold_po, predictor_homoclinic_bt,
                        predictor_ns_hh, predictor_ns_zh,
                        switch_codim2_po, zh_unfolding)
