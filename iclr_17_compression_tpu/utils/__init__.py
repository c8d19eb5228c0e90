from .analysis import conditional_entropy, uncertainty_coefficient

__all__ = ["conditional_entropy", "uncertainty_coefficient"]
from .cache import enable_compilation_cache

__all__ = __all__ + ["enable_compilation_cache"]
