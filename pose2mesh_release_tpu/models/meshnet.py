"""MeshNet: Chebyshev graph-CNN decoding a pose into a full mesh.

Reference: /root/reference/lib/models/meshnet.py:11-123.  The network walks
the coarsening pyramid coarse -> fine: a block of K=3 Chebyshev convolutions
per level, an FC "upsample" from the joint graph onto the coarsest mesh
level, channel-interpolated residual skips, and x2 nearest vertex upsampling
between levels.  TPU-native differences from the reference:

  * Laplacian SpMMs run through `ops.spmm` on precomputed dense/BCSR tiles
    (MXU matmuls) instead of `torch.sparse.mm`;
  * the x2 nearest upsample (meshnet.py:71-78) and the final un-permutation
    are precomputed index gathers from the artifact (the vertex ordering is
    bandwidth-optimized, not the binary-tree order);
  * the channel-dim linear interpolation used by the residual skips
    (meshnet.py:109-110, torch F.interpolate(mode='linear')) is a constant
    (Fout x Fin) matrix multiply.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graphs.artifact import LevelOperator, PyramidArtifact
from ..ops.cheby import chebyshev_stack

__all__ = ["MeshNet", "ChebConv", "channel_interp_matrix", "SMPL_BLOCKS", "MANO_BLOCKS", "extract_mesh"]

# Per-block channel schedules (reference meshnet.py:23-33).
SMPL_BLOCKS: Tuple[Tuple[int, ...], ...] = (
    (5, 32, 64, 64),
    (64, 128, 256), (256, 256, 256), (256, 256, 256),
    (256, 256, 256), (256, 256, 256), (256, 128, 128),
    (128, 128, 128), (128, 128, 128), (128, 64, 3),
)
MANO_BLOCKS: Tuple[Tuple[int, ...], ...] = (
    (5, 32, 64, 64),
    (64, 128, 256), (256, 256, 256), (256, 256, 256),
    (256, 256, 256), (256, 128, 128), (128, 64, 3),
)


def _ref_uniform_init(key, shape, dtype):
    """uniform(-s, s) with s = sqrt(2 / (fan_in + fan_out)), the reference's
    graph-conv weight init (meshnet.py:48-50)."""
    fan_in, fan_out = shape[0], shape[1]
    s = np.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -s, s)


def channel_interp_matrix(fin: int, fout: int) -> np.ndarray:
    """Constant matrix reproducing torch F.interpolate(mode='linear',
    align_corners=False) along the channel axis: out = x @ M.T."""
    p = (np.arange(fout) + 0.5) * fin / fout - 0.5
    p = np.maximum(p, 0.0)  # torch clamps negative source indices to 0
    i0 = np.floor(p).astype(np.int64)
    frac = p - i0
    i0 = np.clip(i0, 0, fin - 1)
    i1 = np.clip(i0 + 1, 0, fin - 1)
    M = np.zeros((fout, fin), dtype=np.float32)
    np.add.at(M, (np.arange(fout), i0), 1.0 - frac)
    np.add.at(M, (np.arange(fout), i1), frac)
    return M


class ChebConv(nn.Module):
    """One Chebyshev graph convolution: K-term basis -> Dense -> BN -> ReLU.

    Reference: lib/models/backbones/cheby_graph_conv.py:5-42.  The canonical
    kernel layout (row index = fin*K + k) matches the reference so converted
    checkpoints drop in unpermuted.  On banded TPU levels with K=3 the conv
    runs through the fused Pallas kernel (ops.pallas_cheby); elsewhere the
    XLA basis-stack path with identical math.
    """

    fout: int
    K: int = 3
    use_bn: bool = True
    use_relu: bool = True
    dtype: Any = jnp.float32  # compute dtype (bf16 for the fast path)
    use_pallas: bool = True
    # deploy mode: BN pre-folded into kernel/bias (models.fold), ReLU
    # applied inside the Pallas kernel -> ONE HBM pass per conv
    inference_fused: bool = False

    @nn.compact
    def __call__(self, op: LevelOperator, x: jnp.ndarray, train: bool):
        from ..ops.pallas_cheby import (
            fused_cheby_project, fused_cheby_project_relu, pallas_supported,
        )

        x = x.astype(self.dtype)
        fin = x.shape[-1]
        kernel = self.param("kernel", _ref_uniform_init,
                            (fin * self.K, self.fout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.fout,), jnp.float32)

        folded = self.inference_fused and self.use_bn and not train
        if self.use_pallas and self.K == 3 and pallas_supported(op, x):
            # fused kernel wants basis-major rows: [W_x; W_Lx; W_cheb2]
            w_basis = kernel.reshape(fin, self.K, self.fout)
            w_basis = w_basis.transpose(1, 0, 2).reshape(self.K * fin, self.fout)
            conv = fused_cheby_project_relu if folded and self.use_relu                 else fused_cheby_project
            y = conv(op, x, w_basis.astype(self.dtype), bias.astype(self.dtype))
            if folded:
                return y
        else:
            xs = chebyshev_stack(op, x, self.K)
            y = xs @ kernel.astype(self.dtype) + bias.astype(self.dtype)
            if folded:
                return nn.relu(y) if self.use_relu else y

        if self.use_bn:
            # torch BatchNorm1d over B*V rows == flax BN reducing all
            # non-feature axes (momentum 0.9 == torch momentum 0.1);
            # statistics stay in f32 regardless of compute dtype
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype)(y)
        if self.use_relu:
            y = nn.relu(y)
        return y


class MeshNet(nn.Module):
    """Pose features (B, J, C_in) -> mesh vertices (B, V_pad, 3) in device
    (bandwidth-optimized) vertex order; use `extract_mesh` to restore the
    original SMPL/MANO ordering.

    Internally the mesh levels run **vertex-major** (V, B, F) — the same
    layout the reference permutes into for its sparse matmuls
    (cheby_graph_conv.py:18-20) — so the banded SpMM's batched matmuls get
    their batch (row-tile) axis leading and XLA inserts no transposes."""

    blocks: Tuple[Tuple[int, ...], ...] = SMPL_BLOCKS
    K: int = 3
    dtype: Any = jnp.float32
    use_pallas: bool = True
    inference_fused: bool = False

    @nn.compact
    def __call__(self, art: PyramidArtifact, x: jnp.ndarray, train: bool = False):
        n_blocks = len(self.blocks)
        n_mesh = len(art.mesh_ops)
        if n_blocks != n_mesh + 2:
            raise ValueError(
                f"block schedule length {n_blocks} incompatible with pyramid of "
                f"{n_mesh} mesh levels (need n_mesh + 2: one joint block, one "
                f"block per mesh level, one extra finest-level block)"
            )

        def op_for_block(i: int) -> LevelOperator:
            if i == 0:
                return art.joint_op
            if i == n_blocks - 1:
                return art.mesh_ops[0]
            return art.mesh_ops[n_mesh - i]

        B = x.shape[0]
        x = jnp.swapaxes(x, 0, 1)  # (J, B, C_in): vertex-major throughout

        for i, chans in enumerate(self.blocks):
            op = op_for_block(i)
            input_x = x
            for li in range(len(chans) - 1):
                last_conv = i == n_blocks - 1 and li == len(chans) - 2
                x = ChebConv(chans[li + 1], self.K, dtype=self.dtype,
                             use_pallas=self.use_pallas,
                             use_bn=not last_conv, use_relu=not last_conv,
                             inference_fused=self.inference_fused)(op, x, train)

            if i == 0:
                # FC "upsample": joint graph -> coarsest mesh level
                # (meshnet.py:36-37,104-106)
                v_coarse = art.mesh_ops[-1].num_vertices
                f = self.blocks[1][0]
                flat = jnp.swapaxes(x, 0, 1).reshape(B, -1)  # (B, J*F)
                x = nn.Dense(v_coarse * f, dtype=self.dtype)(flat)
                x = jnp.swapaxes(x.reshape(B, v_coarse, f), 0, 1)  # (Vc, B, f)
            elif i < n_blocks - 1:
                # channel-interpolated residual skip (meshnet.py:109-115);
                # when fin == fout torch's interpolate is the identity, so
                # skip the (V*B, F) @ (F, F) matmul entirely (it also forces
                # XLA into transposed layouts + copies before each kernel)
                if input_x.shape[-1] == x.shape[-1]:
                    x = x + input_x.astype(x.dtype)
                else:
                    M = jnp.asarray(
                        channel_interp_matrix(input_x.shape[-1], x.shape[-1]),
                        dtype=x.dtype)
                    x = x + input_x.astype(x.dtype) @ M.T
                if i < n_blocks - 2:
                    # x2 nearest vertex upsample via precomputed gather; the
                    # indices are static and in-bounds — promise it so XLA
                    # emits a bare gather (no fill-value compare/select pass)
                    up = art.up_idx[n_mesh - i - 1]
                    x = jnp.take(x, up, axis=0, mode="clip")
        # (V, B, 3) -> (B, V, 3); coordinates leave the net in f32
        return jnp.swapaxes(x, 0, 1).astype(jnp.float32)


def extract_mesh(art: PyramidArtifact, mesh_out: jnp.ndarray) -> jnp.ndarray:
    """(B, V_pad, 3) device-order output -> (B, V, 3) original vertex order
    (the graph_perm_reverse gather of lib/core/base.py:130)."""
    return jnp.take(mesh_out, art.vertex_gather, axis=1, mode="clip")
