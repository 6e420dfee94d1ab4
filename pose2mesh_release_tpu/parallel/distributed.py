"""Multi-host SPMD setup (DCN across hosts, ICI within a slice).

The reference has no multi-node story at all (SURVEY.md §2.3: one process,
nn.DataParallel).  Here multi-host is the standard JAX recipe:
`jax.distributed.initialize` connects the hosts, every process sees the
global device set, and the same `Mesh`/`pjit` program runs SPMD — gradient
psums ride ICI inside a slice and DCN across slices.  The data loader
shards per host via `host_shard()` (data.loader.BatchLoader host_id /
host_count).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

__all__ = ["init_distributed", "host_shard", "is_primary"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX if configured; returns (host_id, host_count).

    No-ops on single-host (the common case in tests/CI): with no
    coordinator configured, returns (0, 1).  On TPU pods the three args
    usually come from the environment automatically.
    """
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord is None and num_processes is None \
            and "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def host_shard() -> Tuple[int, int]:
    """(host_id, host_count) for the data loader's per-host sharding."""
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the checkpoint/logging host (process 0)."""
    return jax.process_index() == 0
