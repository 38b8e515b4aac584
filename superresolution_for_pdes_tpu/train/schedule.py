"""Host-side training schedules: plateau LR decay and early stopping.

These run between epochs on scalar metrics (one host<->device transfer per
epoch), so plain Python is the right tool — the jitted epoch program stays
pure.

* :class:`ReduceLROnPlateau` replicates torch's scheduler semantics
  (used at reference ``/root/reference/src/train_enhanced.py:311-318``):
  mode 'min', relative threshold 1e-4, cooldown 0; the LR is multiplied by
  ``factor`` when the metric fails to improve for *more than* ``patience``
  epochs, floored at ``min_lr``.
* :class:`EarlyStopping` replicates the reference's counter
  (``train_enhanced.py:57-58, 111-134``): strict ``<`` improvement check,
  stop after ``patience`` stale epochs.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass
class ReduceLROnPlateau:
    lr: float
    factor: float = 0.5
    patience: int = 10
    threshold: float = 1e-4
    min_lr: float = 1e-6
    best: float = math.inf
    num_bad_epochs: int = 0

    def step(self, metric: float) -> float:
        """Record an epoch metric; return the (possibly reduced) LR."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_state_dict(cls, state: dict) -> "ReduceLROnPlateau":
        return cls(**state)


@dataclasses.dataclass
class EarlyStopping:
    patience: int = 20
    best: float = math.inf
    best_epoch: int = 0
    num_bad_epochs: int = 0

    def step(self, metric: float, epoch: int) -> bool:
        """Record an epoch metric; return True when training should stop.

        Also reports whether this epoch is the new best via :attr:`improved`.
        """
        if metric < self.best:
            self.best = metric
            self.best_epoch = epoch
            self.num_bad_epochs = 0
            self.improved = True
        else:
            self.num_bad_epochs += 1
            self.improved = False
        return self.num_bad_epochs >= self.patience

    improved: bool = False

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_state_dict(cls, state: dict) -> "EarlyStopping":
        return cls(**state)
