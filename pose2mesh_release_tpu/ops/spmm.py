"""Laplacian SpMM strategies for TPU.

The reference's hot kernel is `torch.sparse.mm(L, x)` with L the (V, V)
rescaled Laplacian and x the (V, Fin*B) feature matrix
(/root/reference/lib/models/backbones/cheby_graph_conv.py:18-28 — note the
reference itself permutes to vertex-major before the sparse matmul).  TPUs
have no sparse unit: the MXU wants dense tiles.  We provide four
interchangeable strategies over the layouts precomputed in
`graphs.artifact.LevelOperator`:

  dense : one (V, V) @ (V, C) matmul — optimal for small levels.
  band  : strict block-banded (RCM-ordered) — a sum of 2*band_k+1 shifted
          batched (T, T) x (T, C) MXU matmuls with NO gather at all; the
          production path for large levels.
  bcsr  : general block-sparse with a tile-granular gather (fallback when
          an ordering with small bandwidth is unavailable).
  ell   : fixed-width neighbor gather — verification ground truth.

All functions are **vertex-major**: x has shape (V, ...) and the vertex
axis is contracted; trailing axes are flattened into columns internally.
L is symmetric, so the VJP of `spmm` is `spmm` on the cotangent — XLA
differentiates these formulations to exactly that.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graphs.artifact import LevelOperator

__all__ = ["spmm", "spmm_dense", "spmm_band", "spmm_bcsr", "spmm_ell"]


def spmm_dense(op: LevelOperator, x: jax.Array) -> jax.Array:
    shape = x.shape
    x2 = x.reshape(shape[0], -1)
    # accumulate in f32 even for bf16 activations (matches the Pallas
    # kernels' f32 accumulators; README "fp32 accumulation" contract)
    y = jnp.dot(op.dense.astype(x.dtype), x2,
                preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(shape)


def spmm_band(op: LevelOperator, x: jax.Array) -> jax.Array:
    """Gather-free banded SpMM: y[t] = sum_d band[d, t] @ x[t + d - k]."""
    T = op.block_size
    V = op.num_vertices
    k = op.band_k
    nbd, nt = op.band_val.shape[0], op.band_val.shape[1]
    shape = x.shape
    x2 = x.reshape(V, -1)
    C = x2.shape[1]
    if nt * T != V:
        x2 = jnp.pad(x2, ((0, nt * T - V), (0, 0)))
    xt = x2.reshape(nt, T, C)
    xp = jnp.pad(xt, ((k, k), (0, 0), (0, 0)))
    y = None
    for d in range(nbd):
        xs = jax.lax.slice_in_dim(xp, d, d + nt, axis=0)
        term = jnp.einsum(
            "tpq,tqc->tpc", op.band_val[d].astype(x.dtype), xs,
            preferred_element_type=jnp.float32,
        )
        y = term if y is None else y + term
    y = y.astype(x.dtype).reshape(nt * T, C)
    if nt * T != V:
        y = y[:V]
    return y.reshape(shape)


def spmm_bcsr(op: LevelOperator, x: jax.Array) -> jax.Array:
    """Block-sparse-row SpMM with a tile-granular gather."""
    T = op.block_size
    V = op.num_vertices
    nt, maxb = op.blk_col.shape
    shape = x.shape
    x2 = x.reshape(V, -1)
    C = x2.shape[1]
    if nt * T != V:
        x2 = jnp.pad(x2, ((0, nt * T - V), (0, 0)))
    xt = x2.reshape(nt, T, C)
    gathered = jnp.take(xt, op.blk_col.reshape(-1), axis=0, mode="clip")
    gathered = gathered.reshape(nt, maxb, T, C)
    y = jnp.einsum(
        "nbpq,nbqc->npc", op.blk_val.astype(x.dtype), gathered,
        preferred_element_type=jnp.float32,
    )
    y = y.astype(x.dtype).reshape(nt * T, C)
    if nt * T != V:
        y = y[:V]
    return y.reshape(shape)


def spmm_ell(op: LevelOperator, x: jax.Array) -> jax.Array:
    """ELLPACK gather SpMM: y[v] = sum_d w[v, d] * x[idx[v, d]]."""
    shape = x.shape
    x2 = x.reshape(shape[0], -1)
    nbrs = jnp.take(x2, op.ell_idx.reshape(-1), axis=0, mode="clip")
    nbrs = nbrs.reshape(op.ell_idx.shape + (x2.shape[1],))
    y = jnp.einsum("vdc,vd->vc", nbrs, op.ell_w.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(shape)


def spmm(op: LevelOperator, x: jax.Array, *, strategy: str | None = None) -> jax.Array:
    """Dispatch on the operator's packed kind (or an explicit override)."""
    kind = strategy or op.kind
    if kind == "dense":
        return spmm_dense(op, x)
    if kind == "band":
        return spmm_band(op, x)
    if kind == "bcsr":
        return spmm_bcsr(op, x)
    if kind == "ell":
        return spmm_ell(op, x)
    raise ValueError(f"unknown spmm strategy: {kind}")
