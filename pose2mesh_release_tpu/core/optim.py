"""Optimizer / LR-schedule factories.

Reference: lib/funcs_utils.py:77-108 (sgd / rmsprop / adam factories and the
step / plateau schedulers; Pose2Mesh trains with rmsprop lr=1e-3 and a
MultiStepLR x0.1 at cfg.TRAIN.lr_step).

Design: the transformations here are *lr-free* preconditioners
(scale_by_rms / scale_by_adam / identity); the engine passes the learning
rate into the jitted train step as a traced scalar and applies
``-lr * update``.  One compiled step serves every epoch — the reference
instead mutates optimizer param groups per epoch (funcs_utils `lr_check`).
"""
from __future__ import annotations

from typing import Callable, Sequence

import optax

__all__ = ["make_preconditioner", "multistep_lr", "ReduceLROnPlateau"]


def make_preconditioner(name: str = "rmsprop") -> optax.GradientTransformation:
    """Matches the torch defaults the reference relies on:
    RMSprop(alpha=0.99, eps=1e-8), Adam(b1=0.9, b2=0.999), plain SGD."""
    name = name.lower()
    if name == "rmsprop":
        return optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False)
    if name == "adam":
        return optax.scale_by_adam()
    if name == "sgd":
        return optax.identity()
    raise ValueError(f"unknown optimizer {name}")


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1) -> Callable[[int], float]:
    """MultiStepLR: lr * gamma**(number of milestones passed). Epoch-indexed,
    matching funcs_utils.py:101-104 + lr_check semantics."""
    ms = sorted(milestones)

    def lr_at(epoch: int) -> float:
        k = sum(1 for m in ms if epoch >= m)
        return base_lr * (gamma ** k)

    return lr_at


class ReduceLROnPlateau:
    """Minimal plateau scheduler (funcs_utils.py:105-108 semantics:
    factor=0.1, patience=5, min_lr=1e-5)."""

    def __init__(self, base_lr: float, factor: float = 0.1, patience: int = 5,
                 min_lr: float = 1e-5):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr
