"""PoseNet: the 2D->3D pose lifting MLP.

Reference: /root/reference/lib/models/posenet.py:11-98 — a 4096-wide MLP
with two pre-activation residual stages (BN -> ReLU -> Dropout -> Dense,
twice per stage).  Input is the flattened 2D pose (J*2), output the
root-relative 3D pose (J*3) in millimeters.  Pure dense matmuls: on TPU
this rides the MXU in bf16 with f32 params untouched.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["PoseNet"]


class ResidualStage(nn.Module):
    hidden: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.hidden, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.hidden, dtype=self.dtype)(y)
        return x + y


class PoseNet(nn.Module):
    """2D joints (B, J*2) -> 3D joints (B, J*3), mm."""

    num_joint: int
    hidden: int = 4096
    num_stages: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x2d: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x2d.reshape(x2d.shape[0], -1).astype(self.dtype)
        y = nn.Dense(self.hidden, dtype=self.dtype)(x)
        for _ in range(self.num_stages):
            y = ResidualStage(self.hidden, self.dropout, self.dtype)(y, train)
        return nn.Dense(self.num_joint * 3, dtype=self.dtype)(y).astype(jnp.float32)
