"""Laplacian SpMM strategies for TPU.

The reference's hot kernel is `torch.sparse.mm(L, x)` with L the (V, V)
rescaled Laplacian and x the (V, Fin*B) feature matrix
(/root/reference/lib/models/backbones/cheby_graph_conv.py:25-28).  TPUs have
no sparse unit: the MXU wants dense tiles.  We therefore provide three
interchangeable strategies over the layouts precomputed in
`graphs.artifact.LevelOperator`:

  dense : one (V, V) @ (V, C) matmul — optimal for small levels.
  bcsr  : per row-tile, sum of dense (T, T) @ (T, C) matmuls over the
          nonzero column tiles (RCM ordering keeps ~3 blocks/row-tile).
          Pure-XLA formulation here; the Pallas fused kernel lives in
          `ops.pallas_cheby`.
  ell   : fixed-width neighbor gather + weighted sum — verification
          fallback, also the semantic ground truth for tests.

All functions take x of shape (..., V, C) and return the same shape.  L is
symmetric, so the VJP of `spmm` is `spmm` itself on the cotangent — XLA
differentiates the formulations below to exactly that, no custom VJP needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graphs.artifact import LevelOperator

__all__ = ["spmm", "spmm_dense", "spmm_bcsr", "spmm_ell"]


def spmm_dense(op: LevelOperator, x: jax.Array) -> jax.Array:
    return jnp.einsum(
        "vw,...wc->...vc", op.dense, x, preferred_element_type=x.dtype
    )


def spmm_bcsr(op: LevelOperator, x: jax.Array) -> jax.Array:
    """Block-sparse row SpMM as a batched dense matmul.

    x: (..., V, C).  Gathers the (max_blocks) column tiles each row tile
    needs — a coarse-grained (tile-sized) gather that XLA lowers to
    efficient dynamic slices — then contracts on the MXU.
    """
    T = op.block_size
    V = op.num_vertices
    nt, maxb = op.blk_col.shape
    batch_shape = x.shape[:-2]
    C = x.shape[-1]
    if nt * T != V:  # level size not tile-aligned: zero-pad the vertex axis
        pad = [(0, 0)] * (x.ndim - 2) + [(0, nt * T - V), (0, 0)]
        x = jnp.pad(x, pad)
    xt = x.reshape(batch_shape + (nt, T, C))
    # (..., nt, maxb, T, C): tiles of x needed by each row tile
    gathered = jnp.take(xt, op.blk_col.reshape(-1), axis=-3)
    gathered = gathered.reshape(batch_shape + (nt, maxb, T, C))
    y = jnp.einsum(
        "nbpq,...nbqc->...npc", op.blk_val, gathered,
        preferred_element_type=x.dtype,
    )
    y = y.reshape(batch_shape + (nt * T, C))
    return y[..., :V, :] if nt * T != V else y


def spmm_ell(op: LevelOperator, x: jax.Array) -> jax.Array:
    """ELLPACK gather-based SpMM: y[v] = sum_d w[v, d] * x[idx[v, d]]."""
    nbrs = jnp.take(x, op.ell_idx.reshape(-1), axis=-2)
    nbrs = nbrs.reshape(x.shape[:-2] + op.ell_idx.shape + (x.shape[-1],))
    return jnp.einsum("...vdc,vd->...vc", nbrs, op.ell_w)


def spmm(op: LevelOperator, x: jax.Array, *, strategy: str | None = None) -> jax.Array:
    """Dispatch on the operator's packed kind (or an explicit override)."""
    kind = strategy or op.kind
    if kind == "dense":
        return spmm_dense(op, x)
    if kind == "bcsr":
        return spmm_bcsr(op, x)
    if kind == "ell":
        return spmm_ell(op, x)
    raise ValueError(f"unknown spmm strategy: {kind}")
