"""Chebyshev polynomial basis over a graph Laplacian.

Reference semantics: lib/models/backbones/cheby_graph_conv.py:5-42 —
x0 = x, x1 = L x0, x_k = 2 L x_{k-1} - x_{k-2}, stacked and fed to a dense
(Fin*K -> Fout) projection.  The stacked feature layout matches the
reference's `view` chain exactly (feature index = fin * K + k) so converted
PyTorch weights drop in without permutation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graphs.artifact import LevelOperator
from .spmm import spmm

__all__ = ["chebyshev_stack"]


def chebyshev_stack(
    op: LevelOperator, x: jax.Array, K: int, *, strategy: str | None = None
) -> jax.Array:
    """x: (V, ..., Fin) vertex-major -> (V, ..., Fin*K) basis features.

    The stacked layout (feature index = fin*K + k) matches the reference's
    view chain so converted weights drop in unpermuted."""
    xs = [x]
    if K > 1:
        xs.append(spmm(op, x, strategy=strategy))
    for _ in range(2, K):
        xs.append(2.0 * spmm(op, xs[-1], strategy=strategy) - xs[-2])
    stacked = jnp.stack(xs, axis=-1)  # (V, ..., Fin, K)
    return stacked.reshape(x.shape[:-1] + (x.shape[-1] * K,))
