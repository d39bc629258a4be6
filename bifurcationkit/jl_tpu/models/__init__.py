from .equilibria import (brusselator_1d, chan, co_oxidation, hopf_normal_2d,
                         lorenz84, pitchfork_1d, stuart_landau,
                         transcritical_1d)
