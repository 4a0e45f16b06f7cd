"""TPU-native pseudocylindrical convolution codec framework.

A from-scratch JAX/XLA implementation of learned omnidirectional (ERP) image
compression with latitude-adaptive tiled convolutions, a learned non-uniform
quantizer, and a group-autoregressive GMM entropy model with arithmetic
coding. Structural reference: limuhit/pseudocylindrical_convolution
(CUDA/PyTorch); see SURVEY.md.
"""

from pseudocylindrical_convolution_tpu.geometry import Geometry, set_weight
from pseudocylindrical_convolution_tpu.utils.compilecache import (
    enable_persistent_cache)

# Every entry point (CLI, training loop, bench, tools) imports this package
# before its first jit compile; cold XLA compiles through the TPU tunnel are
# slow enough (>1 h for a wavefront program on a fresh machine) that the
# on-disk executable cache is required infrastructure, not an optimization.
enable_persistent_cache()

__version__ = "0.1.0"
