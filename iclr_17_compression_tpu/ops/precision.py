"""Matmul/conv precision policy.

On TPU the MXU natively multiplies bf16; fp32 ops are emulated by multi-pass
bf16 ("HIGHEST" precision). On this environment's TPU backend the GLOBAL
``jax_default_matmul_precision`` config is silently ignored — only the
per-op ``precision=`` argument takes effect (verified empirically: global
config → 2.2e-3 rel error vs CPU; per-op HIGHEST → 7.3e-7). Training with
bf16-noise gradients diverges catastrophically (gradient SNR < 1 at init for
the GDN autoencoder), so every matmul-class op in this framework threads an
explicit precision from this policy.

Default: HIGHEST (exact fp32). Inference-only paths may opt into
``"default"`` (bf16, ~3× faster on the MXU) where quantization error
dominates the 3e-3 conv error anyway; set ``ICLR17C_PRECISION=default`` or
call ``set_default_precision``.
"""

import os
from typing import Optional, Union

from jax import lax

_NAMES = {
    "default": lax.Precision.DEFAULT,
    "bfloat16": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "tensorfloat32": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
    "float32": lax.Precision.HIGHEST,
}

_default = _NAMES.get(os.environ.get("ICLR17C_PRECISION", "highest"), lax.Precision.HIGHEST)


def set_default_precision(name: str) -> None:
    global _default
    _default = _NAMES[name]


def get_precision(override: Optional[Union[str, lax.Precision]] = None) -> lax.Precision:
    if override is None:
        return _default
    if isinstance(override, str):
        return _NAMES[override]
    return override
