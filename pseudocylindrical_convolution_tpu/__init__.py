"""TPU-native pseudocylindrical convolution codec framework.

A from-scratch JAX/XLA implementation of learned omnidirectional (ERP) image
compression with latitude-adaptive tiled convolutions, a learned non-uniform
quantizer, and a group-autoregressive GMM entropy model with arithmetic
coding. Structural reference: limuhit/pseudocylindrical_convolution
(CUDA/PyTorch); see SURVEY.md.
"""

from pseudocylindrical_convolution_tpu.geometry import Geometry, set_weight

__version__ = "0.1.0"
