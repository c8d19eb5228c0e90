from .config import TrainConfig
from .state import (
    TrainState,
    create_train_state,
    make_balle17_train_step,
    make_dsc_train_step,
    make_hyperprior_train_step,
)
from .schedules import step_decay_schedule, ReduceLROnPlateau
from .meters import AverageMeter, WeightedMeter
from .observability import MetricsLogger, ProfileWindow, profile_trace, step_annotation

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_balle17_train_step",
    "make_dsc_train_step",
    "make_hyperprior_train_step",
    "step_decay_schedule",
    "ReduceLROnPlateau",
    "AverageMeter",
    "WeightedMeter",
    "MetricsLogger",
    "ProfileWindow",
    "profile_trace",
    "step_annotation",
]
