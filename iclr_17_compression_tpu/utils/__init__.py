from .analysis import conditional_entropy, uncertainty_coefficient
from .cache import enable_compilation_cache
from .svd import low_rank_code, decompose_top_i, compose_requantized, rank_rate_bits
from .dataset_tools import (
    check_image_sizes,
    create_diff_folder,
    save_both_direction_recons,
    warp_side_information,
)

__all__ = [
    "conditional_entropy",
    "uncertainty_coefficient",
    "enable_compilation_cache",
    "low_rank_code",
    "decompose_top_i",
    "compose_requantized",
    "rank_rate_bits",
    "check_image_sizes",
    "create_diff_folder",
    "save_both_direction_recons",
    "warp_side_information",
]
