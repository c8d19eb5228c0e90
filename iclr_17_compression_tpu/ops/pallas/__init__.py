"""Pallas TPU kernels for the fused hot ops.

Import is lazy/safe on CPU: kernels fall back to the pure-XLA ops when
Pallas TPU lowering is unavailable (tests run them in interpreter mode).
"""

from .gdn_kernel import gdn_pallas
from .conv_gdn_kernel import analysis17_fused, conv_gdn

__all__ = ["gdn_pallas", "conv_gdn", "analysis17_fused"]
