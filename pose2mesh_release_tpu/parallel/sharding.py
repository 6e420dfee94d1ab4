"""Sharding rules: how framework pytrees lay out over the ('data','graph') mesh.

Replaces nn.DataParallel's scatter/gather (lib/core/base.py:108) with
explicit jax.sharding annotations consumed by pjit: XLA GSPMD then inserts
the gradient psums on 'data' and the vertex-halo collectives on 'graph'.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graphs.artifact import LevelOperator, PyramidArtifact

__all__ = ["shard_artifact", "shard_batch", "shard_state", "batch_spec"]


def batch_spec() -> P:
    """Activations / batches: batch on 'data', vertices on 'graph'."""
    return P("data", "graph", None)


def shard_batch(mesh: Mesh, batch: Dict[str, jax.Array]) -> Dict[str, Any]:
    """Shard every batch array's leading (batch) dim over 'data'."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def _level_sharding(mesh: Mesh, op: LevelOperator) -> LevelOperator:
    """Shard a level operator: BCSR row-tiles over 'graph'; dense levels and
    index tables replicated (they are small)."""
    rep = NamedSharding(mesh, P())
    graph_rows = NamedSharding(mesh, P("graph"))
    n_graph = mesh.shape["graph"]
    put = lambda x, s: jax.device_put(x, s)
    if op.kind == "bcsr" and op.blk_val.ndim == 4 and op.blk_val.shape[0] % n_graph == 0:
        return LevelOperator(
            dense=put(op.dense, rep),
            blk_col=put(op.blk_col, graph_rows),
            blk_val=put(op.blk_val, graph_rows),
            band_val=put(op.band_val, rep),
            ell_idx=put(op.ell_idx, rep),
            ell_w=put(op.ell_w, rep),
            strip_val=put(op.strip_val, rep),
            kind=op.kind, num_vertices=op.num_vertices,
            block_size=op.block_size, band_k=op.band_k,
            strip_h=op.strip_h, band_bw=op.band_bw,
        )
    if op.kind == "band" and op.band_val.ndim == 4 and op.band_val.shape[1] % n_graph == 0:
        # band_val: (nbd, nt, T, T) -> shard the row-tile dim over 'graph';
        # strip_val (deploy-only; the halo path hops on band_val) replicated
        graph_tiles = NamedSharding(mesh, P(None, "graph"))
        return LevelOperator(
            dense=put(op.dense, rep),
            blk_col=put(op.blk_col, rep),
            blk_val=put(op.blk_val, rep),
            band_val=put(op.band_val, graph_tiles),
            ell_idx=put(op.ell_idx, rep),
            ell_w=put(op.ell_w, rep),
            strip_val=put(op.strip_val, rep),
            kind=op.kind, num_vertices=op.num_vertices,
            block_size=op.block_size, band_k=op.band_k,
            strip_h=op.strip_h, band_bw=op.band_bw,
        )
    return jax.tree.map(lambda x: put(x, rep), op)


def shard_artifact(mesh: Mesh, art: PyramidArtifact) -> PyramidArtifact:
    rep = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(x, rep)
    return PyramidArtifact(
        mesh_ops=tuple(_level_sharding(mesh, op) for op in art.mesh_ops),
        joint_op=jax.tree.map(put, art.joint_op),
        up_idx=tuple(put(u) for u in art.up_idx),
        vertex_gather=put(art.vertex_gather),
        faces=put(art.faces),
        face_inv=tuple(put(t) for t in art.face_inv),
        joint_num=art.joint_num,
        num_vertices=art.num_vertices,
        face_perm=put(art.face_perm),
        face_sel=put(art.face_sel),
    )


def shard_state(mesh: Mesh, state: Any) -> Any:
    """Model/optimizer state: replicated (the model is ~70M params; DP
    replication is the right default, matching the reference)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
