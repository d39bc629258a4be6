# Namespace package root for the TPU-native bifurcation framework.
# The actual framework lives in `bifurcationkit.jl_tpu`.
