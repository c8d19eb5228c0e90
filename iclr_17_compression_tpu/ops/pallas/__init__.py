"""Pallas TPU kernels for the fused hot ops.

Import is lazy/safe on CPU: kernels fall back to the pure-XLA ops when
Pallas TPU lowering is unavailable (tests run them in interpreter mode).
"""

from .gdn_kernel import gdn_pallas

__all__ = ["gdn_pallas"]
