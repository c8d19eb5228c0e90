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


def cast_storage(tree, dtype):
    """Cast every floating-point leaf of a pytree (params or inputs) to
    ``dtype`` — the knob for bf16 *storage* inference.

    ``ICLR17C_PRECISION=default`` only switches the MXU multiply to bf16;
    activations still live in HBM as fp32, and learned image codecs are
    HBM-bandwidth heavy (every transform stage reads/writes a full
    B×H/4×W/4×128 tensor). Casting params + input once makes every conv
    emit bf16 (conv output dtype follows input dtype in ops/conv.py), so
    all inter-stage HBM traffic halves. Measured on the axon chip:
    585 → 775 Mpix/s on the Balle-17 Kodak pipeline (+32%), recon probe
    rel-error 6.6e-4 — far below the rounding quantizer's distortion.

    Integer leaves (e.g. step counters) pass through untouched. Keep
    training in fp32: bf16-noise gradients diverge (see module docstring).
    """
    import jax
    import jax.numpy as jnp

    def cast(a):
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return jax.tree.map(cast, tree)
