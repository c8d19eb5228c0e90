from .math import lower_bound
from .conv import conv2d, conv_transpose2d, pixel_shuffle, avg_pool2d
from .gdn import gdn, gdn_param_init, gdn_reparam
from .quant import (
    add_uniform_noise,
    round_ste,
    quantize_coarse,
    quantize_coarse_ste,
    binarize_ste,
)
from .entropy import bitparm_cdf, bit_estimator_cdf, estimate_bits, bit_estimator_init
from .metrics import psnr, ssim, ms_ssim, ms_ssim_db

__all__ = [
    "lower_bound",
    "conv2d",
    "conv_transpose2d",
    "pixel_shuffle",
    "avg_pool2d",
    "gdn",
    "gdn_param_init",
    "gdn_reparam",
    "add_uniform_noise",
    "round_ste",
    "quantize_coarse",
    "quantize_coarse_ste",
    "binarize_ste",
    "bitparm_cdf",
    "bit_estimator_cdf",
    "estimate_bits",
    "bit_estimator_init",
    "psnr",
    "ssim",
    "ms_ssim",
    "ms_ssim_db",
]
