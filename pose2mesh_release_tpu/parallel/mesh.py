"""Device mesh construction for multi-chip SPMD.

The reference's only parallelism is single-process nn.DataParallel
(lib/core/base.py:108).  Here scaling is SPMD over a 2-axis
jax.sharding.Mesh:

  'data'  — batch-dimension data parallelism (gradient psum over ICI/DCN),
  'graph' — vertex-dimension model parallelism: the mesh levels' row-tiles
            and the (B, V, F) activations shard on V, with tile-granular
            halo/all-gather traffic inserted by GSPMD (an explicit
            shard_map + ppermute halo pipeline lives in parallel/halo.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated"]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    graph_axis: int = 1,
) -> Mesh:
    """Create a ('data', 'graph') mesh over the given (or all) devices.

    graph_axis: number of devices on the vertex-sharding axis; the rest go
    to data parallelism.  graph_axis=1 is pure DP.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % graph_axis:
        raise ValueError(f"{n} devices not divisible by graph_axis={graph_axis}")
    arr = np.asarray(devices).reshape(n // graph_axis, graph_axis)
    return Mesh(arr, ("data", "graph"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays: shard dim 0 over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
