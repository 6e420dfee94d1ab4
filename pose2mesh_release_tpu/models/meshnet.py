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


class _BNFoldStats(nn.Module):
    """BatchNorm reduced to its AFFINE: computes batch (or running) stats
    of y and returns the per-channel (scale, shift) such that
    bn(y) = y*scale + shift — the normalize itself is folded into the NEXT
    conv's in-kernel input read (ops.pallas_cheby.fused_cheby_project_folded),
    so the activated tensor never exists in HBM.  Parameter and batch-stats
    layout matches nn.BatchNorm (pass name="BatchNorm_0"): checkpoints are
    interchangeable with the unfolded path, and the gamma/beta/batch-stat
    gradients flow through scale/shift's cotangents."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, y: jnp.ndarray, sums=None):
        """sums: optional (sum_y, sum_y2) per-channel f32 vectors emitted
        by the fused conv kernel (ops.pallas_cheby.fused_cheby_project_
        stats) — the batch statistics then cost no extra HBM read of y."""
        F = y.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (F,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (F,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((F,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((F,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = y.shape[0] * y.shape[1]
            if sums is not None:
                s, s2 = sums
                mean = s / n
                var = jnp.maximum(s2 / n - mean * mean, 0.0)
            else:
                yf = y.astype(jnp.float32)
                mean = yf.sum(axis=(0, 1)) / n
                # E[y^2]-E[y]^2 can go (slightly) negative under f32
                # cancellation; clamp like flax nn.BatchNorm does, else
                # rsqrt(var+eps) NaNs on large-mean/small-var channels
                var = jnp.maximum(
                    (yf * yf).sum(axis=(0, 1)) / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value \
                    + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value \
                    + (1.0 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * gamma
        return inv, beta - mean * inv


class _MaskedBatchNorm(nn.Module):
    """BatchNorm over (V, B) rows of a ROW-PADDED (Vp, B, F) tensor whose
    pad rows are zero: statistics divide by the REAL row count, reproducing
    plain nn.BatchNorm on the unpadded tensor bit-for-bit in expectation.

    Exists for the graph-sharded training path, which keeps band-level
    activations padded to the pack-time tile count so the halo shard_map's
    splits line up with the activation sharding (slicing/padding between
    6890-row and 7168-row forms made GSPMD reshard — an all-gather — around
    EVERY hop, the round-4 flagship-dryrun audit finding).  Parameter and
    batch-stats layout matches nn.BatchNorm (pass name="BatchNorm_0") so
    checkpoints are interchangeable with the unsharded path."""

    real_rows: int
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        F = y.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (F,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (F,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((F,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((F,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = self.real_rows * y.shape[1]
            yf = y.astype(jnp.float32)
            mean = yf.sum(axis=(0, 1)) / n          # pad rows are zero
            # clamp f32-cancellation negatives (matches flax BatchNorm)
            var = jnp.maximum((yf * yf).sum(axis=(0, 1)) / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value \
                    + (1.0 - self.momentum) * mean
                # flax BatchNorm stores the biased batch var in the
                # running average, same as torch's default
                ra_var.value = self.momentum * ra_var.value \
                    + (1.0 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (y.astype(jnp.float32) - mean) * inv + bias
        return out.astype(self.dtype)


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
    # flat deploy path: x is (Vp, batch*Fp) 2-D, fin is the REAL input
    # channel count (lanes are zero-padded to 128 multiples); param shapes
    # stay canonical so checkpoints are layout-independent
    flat_batch: int = 0
    fin: int = 0
    # lane packing: g batch elements share one 128-lane group (fin*g == 128),
    # with the projection weight expanded to kron(I_g, W) so one matmul
    # computes all g elements — halves (g=2) the hop FLOPs and HBM bytes of
    # sub-128-channel segments vs zero-padding each batch element to 128
    lane_pack: int = 1
    # output packing (strip kernel only, see ops.pallas_cheby.flat_out_pack):
    # emit gr-packed (128 // gr)-lane outputs instead of 128-padded ones —
    # the commuted hops then contract gr-fold fewer lanes, and the
    # downstream packed conv consumes the layout with no repack copy
    out_pack: int = 1
    # explicit vertex-dim model parallelism: when a ('data','graph') Mesh
    # with graph axis > 1 is given, band-level hops run through the
    # shard_map + ppermute halo exchange (parallel.halo) instead of letting
    # GSPMD all-gather the sharded activations (SURVEY.md §2.3 TP row)
    spmd_mesh: Any = None

    @nn.compact
    def __call__(self, op: LevelOperator, x: jnp.ndarray, train: bool,
                 *, skip: jnp.ndarray | None = None,
                 skip_w: jnp.ndarray | None = None, out_3d: bool = False,
                 fold_in=None, emit_fold: bool = False):
        from ..ops.pallas_cheby import (
            fused_cheby_project, fused_cheby_project_folded,
            fused_cheby_project_relu,
            fused_conv_flat_dispatch as fused_conv_flat, pallas_supported,
        )

        from ..ops.pallas_cheby import fused_cheby_project_stats

        if self.flat_batch:
            # flat deploy path (inference only, BN pre-folded)
            B = self.flat_batch
            fin = self.fin
            g = self.lane_pack
            kernel = self.param("kernel", _ref_uniform_init,
                                (fin * self.K, self.fout), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.fout,), jnp.float32)
            w = kernel.reshape(fin, self.K, self.fout).transpose(1, 0, 2)
            if g > 1:
                # packed lanes: g batches x fin channels per 128-lane group
                # (fin*g == 128); per-batch output lanes fout_p, weight
                # blockdiag-expanded so the packed matmul stays exact
                assert fin * g == 128, (fin, g)
                assert skip is None, "residual skips not supported when packed"
                fout_p = -(-self.fout // (128 // g)) * (128 // g)
                w = jnp.pad(w, ((0, 0), (0, 0), (0, fout_p - self.fout)))
                eye = jnp.eye(g, dtype=w.dtype)
                # (K, fin, fout_p) -> (K, g*fin, g*fout_p)
                w = jax.vmap(lambda wk: jnp.kron(eye, wk))(w)
                bp = jnp.tile(jnp.pad(bias, (0, fout_p - self.fout)), g)
                return fused_conv_flat(
                    op, x, B // g,
                    w.reshape(self.K * 128, g * fout_p).astype(self.dtype),
                    bp.astype(self.dtype), relu=self.use_relu,
                    skip=skip, skip_w=skip_w, out_3d=out_3d)
            Fp = x.shape[1] // B
            if self.out_pack > 1:
                # gr-packed output: pad fout only to its 128/gr lane share
                assert skip is None and not out_3d
                Fop = 128 // self.out_pack
                w = jnp.pad(w, ((0, 0), (0, Fp - fin), (0, Fop - self.fout)))
                bp = jnp.pad(bias, (0, Fop - self.fout))
                return fused_conv_flat(
                    op, x, B, w.reshape(self.K * Fp, Fop).astype(self.dtype),
                    bp.astype(self.dtype), relu=self.use_relu,
                    out_pack=self.out_pack)
            Fop = -(-self.fout // 128) * 128
            w = jnp.pad(w, ((0, 0), (0, Fp - fin), (0, Fop - self.fout)))
            bp = jnp.pad(bias, (0, Fop - self.fout))
            return fused_conv_flat(
                op, x, B, w.reshape(self.K * Fp, Fop).astype(self.dtype),
                bp.astype(self.dtype), relu=self.use_relu,
                skip=skip, skip_w=skip_w, out_3d=out_3d)

        x = x.astype(self.dtype)
        fin = x.shape[-1]
        kernel = self.param("kernel", _ref_uniform_init,
                            (fin * self.K, self.fout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.fout,), jnp.float32)

        fold_pallas = (fold_in is not None and self.use_pallas
                       and self.K == 3 and pallas_supported(op, x))
        if fold_in is not None and not fold_pallas:
            # consumer can't fold in-kernel: apply the producer's BN affine
            # + ReLU explicitly and proceed on the activated tensor
            sc, sh = fold_in
            x = nn.relu(x * sc.astype(self.dtype) + sh.astype(self.dtype))
            fold_in = None

        folded = self.inference_fused and self.use_bn and not train
        kstats = None  # kernel-emitted BN batch-stat sums (train path)
        graph_sharded = (self.spmd_mesh is not None
                         and dict(self.spmd_mesh.shape).get("graph", 1) > 1)
        if graph_sharded and x.ndim == 3:
            from ..parallel.halo import halo_banded_hop, halo_supported

            if halo_supported(op, self.spmd_mesh):
                # Chebyshev basis with explicit ppermute halo hops: each hop
                # exchanges one boundary tile per side over ICI instead of
                # the all-gather GSPMD would insert for V-sharded operands.
                hop = lambda v: halo_banded_hop(op, v, self.spmd_mesh)
                xs = [x]
                if self.K > 1:
                    xs.append(hop(x))
                for _ in range(2, self.K):
                    xs.append(2.0 * hop(xs[-1]) - xs[-2])
                stacked = jnp.stack(xs, axis=-1).reshape(
                    x.shape[:-1] + (fin * self.K,))
                y = stacked @ kernel.astype(self.dtype) \
                    + bias.astype(self.dtype)
            else:  # dense/joint levels are small: replicated compute
                xs = chebyshev_stack(op, x, self.K)
                y = xs @ kernel.astype(self.dtype) + bias.astype(self.dtype)
            if folded:
                return nn.relu(y) if self.use_relu else y
        elif self.use_pallas and self.K == 3 and pallas_supported(op, x):
            # fused kernel wants basis-major rows: [W_x; W_Lx; W_cheb2]
            w_basis = kernel.reshape(fin, self.K, self.fout)
            w_basis = w_basis.transpose(1, 0, 2).reshape(self.K * fin, self.fout)
            import os as _os2
            kbn_env = _os2.environ.get("P2M_KERNEL_BN", "1") == "1"
            kernel_stats = (train and self.use_bn and not folded
                            and fold_in is None and kbn_env)
            if fold_pallas:
                # previous conv's BN-apply + ReLU folded into this conv's
                # in-kernel input read (P2M_FOLD_BN training path); with
                # kernel BN on, this conv's own batch-stat sums come out
                # of the same kernel
                if train and self.use_bn and not folded and kbn_env:
                    from ..ops.pallas_cheby import (
                        fused_cheby_project_folded_stats,
                    )
                    y, kbn_s, kbn_s2 = fused_cheby_project_folded_stats(
                        op, x, w_basis.astype(self.dtype),
                        bias.astype(self.dtype), fold_in[0], fold_in[1])
                    kstats = (kbn_s, kbn_s2)
                else:
                    y = fused_cheby_project_folded(
                        op, x, w_basis.astype(self.dtype),
                        bias.astype(self.dtype), fold_in[0], fold_in[1])
            elif kernel_stats:
                # training BN statistics emitted by the kernel itself:
                # the separate stats reduction over y (an extra HBM read
                # per conv) disappears (VERDICT r4 item #7)
                y, kbn_s, kbn_s2 = fused_cheby_project_stats(
                    op, x, w_basis.astype(self.dtype),
                    bias.astype(self.dtype))
                kstats = (kbn_s, kbn_s2)
            else:
                conv = fused_cheby_project_relu if folded and self.use_relu                     else fused_cheby_project
                y = conv(op, x, w_basis.astype(self.dtype), bias.astype(self.dtype))
            if folded:
                return y
        else:
            xs = chebyshev_stack(op, x, self.K)
            y = xs @ kernel.astype(self.dtype) + bias.astype(self.dtype)
            if folded:
                return nn.relu(y) if self.use_relu else y

        row_padded = (y.ndim == 3 and op.kind == "band"
                      and y.shape[0] > op.num_vertices)
        if row_padded:
            # graph-sharded band levels stay padded to the tile count; the
            # projection put bias values on pad rows — zero them so masked
            # BN statistics (and downstream sums) see exact zeros
            mask = (jax.lax.broadcasted_iota(jnp.int32, (y.shape[0], 1, 1), 0)
                    < op.num_vertices)
            y = jnp.where(mask, y, jnp.zeros_like(y))
        if self.use_bn and emit_fold and not row_padded:
            # hand the BN affine to the NEXT conv instead of materializing
            # the activated tensor (caller pairs this with fold_in)
            sc, sh = _BNFoldStats(use_running_average=not train,
                                  momentum=0.9, epsilon=1e-5,
                                  name="BatchNorm_0")(y, sums=kstats)
            return y, (sc, sh)
        if self.use_bn:
            # torch BatchNorm1d over B*V rows == flax BN reducing all
            # non-feature axes (momentum 0.9 == torch momentum 0.1);
            # statistics stay in f32 regardless of compute dtype
            if row_padded:
                y = _MaskedBatchNorm(
                    real_rows=op.num_vertices,
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=self.dtype,
                    name="BatchNorm_0")(y)
                y = jnp.where(mask, y, jnp.zeros_like(y))
            elif kstats is not None:
                # apply via the kernel-emitted sums; parameter/batch-stat
                # layout identical to nn.BatchNorm (name="BatchNorm_0")
                sc, sh = _BNFoldStats(use_running_average=not train,
                                      momentum=0.9, epsilon=1e-5,
                                      name="BatchNorm_0")(y, sums=kstats)
                y = (y.astype(jnp.float32) * sc + sh).astype(self.dtype)
            else:
                y = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype)(y)
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
    spmd_mesh: Any = None  # ('data','graph') Mesh for explicit halo TP

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

        from ..ops.pallas_cheby import _fused_enabled

        B = x.shape[0]
        x = jnp.swapaxes(x, 0, 1)  # (J, B, C_in): vertex-major throughout

        def _flat_ok(op: LevelOperator) -> bool:
            return op.kind != "band" or (1 <= op.band_k <= 2
                                         and op.block_size == 128)

        # deploy fast path: band levels stay in the flat 2-D (Vp, B*Fp)
        # layout end-to-end — no (V, B, F) <-> (V, B*F) re-tiling, no
        # row pad/slice (pack-time padding), residual skips and the final
        # 3-D write fused into the conv kernels' epilogues
        graph_sharded = (self.spmd_mesh is not None
                         and dict(self.spmd_mesh.shape).get("graph", 1) > 1)
        use_flat = (self.inference_fused and not train and self.use_pallas
                    and _fused_enabled() and not graph_sharded
                    and all(_flat_ok(op) for op in art.mesh_ops))
        flat = False  # whether x currently carries the 2-D flat layout

        for i, chans in enumerate(self.blocks):
            op = op_for_block(i)
            block_flat = use_flat and op.kind == "band"
            if block_flat and not flat:
                # entering the flat pipeline without a gather transition
                # (band level directly after the FC): re-tile + pad once
                lanes = -(-chans[0] // 128) * 128
                if x.shape[-1] != lanes:
                    x = jnp.pad(x, ((0, 0), (0, 0), (0, lanes - x.shape[-1])))
                x = x.reshape(x.shape[0], -1)
                if op.padded_vertices != x.shape[0]:
                    x = jnp.pad(x, ((0, op.padded_vertices - x.shape[0]), (0, 0)))
                flat = True
            if graph_sharded and not block_flat:
                # Pin the level's sharding ONCE at block entry (round-4
                # collective audit: without this GSPMD re-derived a partial
                # V-sharding for every dense-level pad/hop and inserted an
                # all-gather per conv per direction — 17+ gathers/step,
                # SCALING_r3's creep).  Band levels: activations PADDED to
                # the pack-time tile count and V-sharded on 'graph' — the
                # padded split is tile-aligned, so the halo shard_map's
                # in_specs match the incoming sharding exactly and no
                # reshard (all-gather) appears around the hops (flagship
                # dryrun audit finding; pad rows are masked through BN by
                # _MaskedBatchNorm).  Dense/joint levels: V replicated, so
                # exactly ONE gather happens at each band->dense boundary
                # and the dense stack computes locally.
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.halo import halo_supported
                shape = dict(self.spmd_mesh.shape)
                vspec = None
                if op.kind == "band" and halo_supported(op, self.spmd_mesh):
                    vp = op.band_val.shape[1] * op.block_size
                    if x.shape[0] == op.num_vertices and vp != x.shape[0]:
                        x = jnp.pad(x, ((0, vp - x.shape[0]), (0, 0), (0, 0)))
                    if x.shape[0] % shape.get("graph", 1) == 0:
                        vspec = "graph"
                bspec = "data" if x.shape[1] % shape.get("data", 1) == 0 else None
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.spmd_mesh, P(vspec, bspec, None)))
            input_x = x
            has_skip = 0 < i < n_blocks - 1
            pack_g = 1  # current lane-packing factor of x (flat path)
            # P2M_FOLD_BN (default ON since round 5): within a block, each
            # conv's BN-apply + ReLU folds into the NEXT conv's in-kernel
            # input read (training path); block-boundary outputs (consumed
            # by skips/upsamples) still materialize normally.  Measured
            # neutral in round 4 (the halo-transform redundancy canceled
            # the saved pointwise passes) but a clear win once the BN
            # batch stats also come from the kernel (P2M_KERNEL_BN):
            # smpl_train 47.7 -> 45.1 ms/batch64 (BENCH_NOTES_r5.md §1.3)
            import os as _os
            bn_fold = (_os.environ.get("P2M_FOLD_BN", "1") == "1"
                       and not block_flat and not graph_sharded
                       and not (self.inference_fused and not train)
                       and self.use_pallas and self.K == 3
                       and op.kind == "band" and 1 <= op.band_k <= 2)
            fold_state = None
            for li in range(len(chans) - 1):
                last_conv = i == n_blocks - 1 and li == len(chans) - 2
                block_last = li == len(chans) - 2
                skip = skip_w = None
                if block_flat and block_last and has_skip:
                    fin_b, fout_b = chans[0], chans[-1]
                    skip = input_x
                    if fin_b != fout_b:
                        fs_lanes = input_x.shape[1] // B
                        fop = -(-fout_b // 128) * 128
                        m_i = channel_interp_matrix(fin_b, fout_b).T  # (fin, fout)
                        skip_w = jnp.asarray(
                            np.pad(m_i, ((0, fs_lanes - fin_b), (0, fop - fout_b))),
                            dtype=self.dtype)
                if block_flat and i == n_blocks - 1:
                    # final block (no residual skip): pack g batch elements
                    # per 128-lane group for sub-128-channel convs — halves
                    # the 64->3 segment's hop FLOPs and bytes vs zero-padding
                    fin_cur = chans[li]
                    want_g = (128 // fin_cur
                              if fin_cur < 128 and 128 % fin_cur == 0 else 1)
                    if want_g > pack_g and B % want_g == 0:
                        # batch-major lanes reshape cleanly at any packing
                        # (a no-op when the producing conv out-packed)
                        x = x.reshape(x.shape[0], B, -1)[:, :, :fin_cur]
                        x = x.reshape(x.shape[0], (B // want_g) * 128)
                        pack_g = want_g
                out_pack = 1
                if (block_flat and i == n_blocks - 1 and not last_conv
                        and pack_g == 1 and skip is None
                        and chans[li + 1] < 128):
                    # strip kernel: emit the down-conv gr-packed so its hops
                    # contract only the real output lanes and the next
                    # conv's repack above becomes a no-op
                    from ..ops.pallas_cheby import flat_out_pack
                    out_pack = flat_out_pack(op, B, x.shape[1] // B,
                                             chans[li + 1])
                emit = bn_fold and not block_last and not last_conv
                out = ChebConv(chans[li + 1], self.K, dtype=self.dtype,
                               use_pallas=self.use_pallas,
                               use_bn=not last_conv, use_relu=not last_conv,
                               inference_fused=self.inference_fused,
                               flat_batch=B if block_flat else 0,
                               fin=chans[li] if block_flat else 0,
                               lane_pack=pack_g, out_pack=out_pack,
                               spmd_mesh=self.spmd_mesh)(
                    op, x, train, skip=skip, skip_w=skip_w,
                    out_3d=last_conv and block_flat,
                    fold_in=fold_state, emit_fold=emit)
                if emit:
                    x, fold_state = out
                else:
                    x, fold_state = out, None
                if out_pack > 1:
                    pack_g = out_pack
            if block_flat and i == n_blocks - 1:
                flat = False  # final conv wrote 3-D directly
                if pack_g > 1:  # (Vp, B//g, g*fout_p) -> (Vp, B, fout_p)
                    x = x.reshape(x.shape[0], B, -1)
                x = x[:op.num_vertices, :, :chans[-1]]

            if i == 0:
                # FC "upsample": joint graph -> coarsest mesh level
                # (meshnet.py:36-37,104-106)
                v_coarse = art.mesh_ops[-1].num_vertices
                f = self.blocks[1][0]
                flat2 = jnp.swapaxes(x, 0, 1).reshape(B, -1)  # (B, J*F)
                x = nn.Dense(v_coarse * f, dtype=self.dtype)(flat2)
                x = jnp.swapaxes(x.reshape(B, v_coarse, f), 0, 1)  # (Vc, B, f)
            elif i < n_blocks - 1:
                if not block_flat:
                    # channel-interpolated residual skip (meshnet.py:109-115);
                    # identity when fin == fout (torch F.interpolate on equal
                    # sizes), in which case the matmul (and the transposed
                    # layouts + copies it forces) is skipped; flat blocks get
                    # this fused into the conv epilogue above
                    if input_x.shape[-1] == x.shape[-1]:
                        x = x + input_x.astype(x.dtype)
                    else:
                        M = jnp.asarray(
                            channel_interp_matrix(input_x.shape[-1], x.shape[-1]),
                            dtype=x.dtype)
                        x = x + input_x.astype(x.dtype) @ M.T
                if i < n_blocks - 2:
                    # x2 nearest vertex upsample via precomputed gather
                    # (static in-bounds indices -> bare gather, no fill pass)
                    up = art.up_idx[n_mesh - i - 1]
                    next_op = op_for_block(i + 1)
                    next_flat = use_flat and next_op.kind == "band"
                    if next_flat and not flat:
                        # enter the flat pipeline: (V, B, F) -> (V, B*Fp);
                        # one cheap re-tile (plus lane pad) at a coarse level
                        lanes = -(-x.shape[-1] // 128) * 128
                        if x.shape[-1] != lanes:
                            x = jnp.pad(
                                x, ((0, 0), (0, 0), (0, lanes - x.shape[-1])))
                        x = x.reshape(x.shape[0], -1)
                        flat = True
                    if flat:
                        vp_next = next_op.padded_vertices
                        up = jnp.pad(up, (0, vp_next - up.shape[0]))
                    x = jnp.take(x, up, axis=0, mode="clip")
        # graph-sharded band path keeps rows padded to the tile count;
        # drop the pad rows once at the very end
        n_fine = art.mesh_ops[0].num_vertices
        if x.shape[0] != n_fine:
            x = x[:n_fine]
        # (V, B, 3) -> (B, V, 3); coordinates leave the net in f32
        return jnp.swapaxes(x, 0, 1).astype(jnp.float32)


def extract_mesh(art: PyramidArtifact, mesh_out: jnp.ndarray) -> jnp.ndarray:
    """(B, V_pad, 3) device-order output -> (B, V, 3) original vertex order
    (the graph_perm_reverse gather of lib/core/base.py:130)."""
    return jnp.take(mesh_out, art.vertex_gather, axis=1, mode="clip")
