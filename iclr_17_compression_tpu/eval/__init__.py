from .kodak import eval_kodak
from .stereo import eval_stereo_dsc
from .reg_stage import eval_reg_stage, compose_recon
from .passr import eval_passr
from .enhance import eval_enhance
from .similarity import (
    encoder_similarity,
    encoder_distances,
    code_distribution,
    save_channel_images,
    gzip_factor,
)
from .mix import mix_encoder_decoder, eval_single_image, average_two_models

__all__ = [
    "eval_kodak",
    "eval_stereo_dsc",
    "eval_reg_stage",
    "compose_recon",
    "eval_passr",
    "eval_enhance",
    "encoder_similarity",
    "encoder_distances",
    "code_distribution",
    "save_channel_images",
    "gzip_factor",
    "mix_encoder_decoder",
    "eval_single_image",
    "average_two_models",
]
