from .kodak import eval_kodak
from .stereo import eval_stereo_dsc

__all__ = ["eval_kodak", "eval_stereo_dsc"]
