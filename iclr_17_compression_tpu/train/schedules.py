"""LR schedules matching the reference trainers.

- ``step_decay_schedule``: linear warmup → constant base LR → one-shot decay
  ×``decay`` after ``decay_interval`` steps (reference train.py:69-81).
- ``ReduceLROnPlateau``: host-side plateau scheduler matching torch defaults
  used by the DSC trainers (reference train_2StepsNet.py:114,
  train_new.py:94): factor 0.1, patience 10, min mode.
"""

from typing import Callable

import optax


def step_decay_schedule(
    base_lr: float,
    decay: float = 0.1,
    decay_interval: int = 2200000,
    warmup_step: int = 0,
) -> Callable[[int], float]:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step)
        warm = base_lr * step / max(warmup_step, 1)
        flat = base_lr
        decayed = base_lr * decay
        lr = jnp.where(step < decay_interval, flat, decayed)
        if warmup_step > 0:
            lr = jnp.where(step < warmup_step, warm, lr)
        return lr

    return schedule


class ReduceLROnPlateau:
    """Host-side plateau LR controller. Multiply current scale by ``factor``
    after ``patience`` non-improving epochs. Feed the resulting ``scale``
    into an ``optax.scale_by_learning_rate`` via injected hyperparams."""

    def __init__(
        self,
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
        base_lr: float = 1e-4,
    ):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.lr = base_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr
