"""Training losses.

Reference: /root/reference/lib/core/loss.py + weighting/gating in
lib/core/base.py:110-143.  All losses are pure jittable functions; the
per-element validity masking multiplies *both* prediction and target before
the mean over every element (including masked ones), exactly matching the
reference's CoordLoss semantics.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "coord_l1", "normal_vector_loss", "edge_length_loss", "pose2mesh_loss",
    "make_laplacian_loss", "face_take",
]


@jax.custom_vjp
def face_take(pred: jax.Array, fidx: jax.Array, inv: jax.Array) -> jax.Array:
    """pred[:, fidx] with a GATHER-based VJP.

    MEASURED NEGATIVE (round 4, benchmarks/profile_losses.py +
    BENCH_NOTES_r4.md §1.3): on v5e the plain autodiff scatter-add backward
    costs 6.3 ms/step for the face losses vs 16.0 ms for this gather VJP —
    XLA's sorted-face scatter beats the (B, V, K, 3) ELL row gathers.  The
    default train step therefore does NOT pass `face_inv`
    (core/train.py keeps the scatter path); this variant is retained only
    for A/B measurement.  `inv` is the per-corner ELL inverse
    (graphs.artifact.face_inverse_tables): vertex v receives the cotangent
    rows inv[v] (padded with len(fidx) -> a zero pad row), so the backward
    is one gather + a K-way sum — no scatter anywhere.
    """
    return jnp.take(pred, fidx, axis=1)


def _face_take_fwd(pred, fidx, inv):
    return jnp.take(pred, fidx, axis=1), (inv, pred.shape)


def _face_take_bwd(res, g):
    inv, pshape = res
    gp = jnp.pad(g, ((0, 0), (0, 1), (0, 0)))       # zero pad row at F
    dpred = jnp.take(gp, inv, axis=1).sum(axis=2)    # (B, V, K, 3) -> (B, V, 3)
    if dpred.shape != pshape:  # defensive: tables must match pred's V
        raise ValueError(f"face_inv tables for V={inv.shape[0]} applied to "
                         f"pred of shape {pshape}")
    return dpred, None, None


face_take.defvjp(_face_take_fwd, _face_take_bwd)


def _corner(pred, faces, c, face_inv):
    """Gather corner-c vertices of every face; gradient-efficient when the
    artifact's inverse tables are available."""
    if face_inv:
        return face_take(pred, faces[:, c], face_inv[c])
    return pred[:, faces[:, c]]


@jax.custom_vjp
def face_take3_band(pred: jax.Array, faces: jax.Array, perm: jax.Array,
                    sel: jax.Array, vgather: jax.Array) -> jax.Array:
    """All three face corners in one gather — (B, F, 3corners, 3coords) —
    with a BANDED-MATMUL VJP (round-5 replacement for the autodiff
    scatter-add, measured at 6.3 ms/step of the loss stack):

    the (face, corner) cotangent rows are reordered by the corner vertex's
    128-row DEVICE tile (graphs.artifact.face_band_tables' `perm`, pad
    slots hitting a zero row) and each vertex tile's gradient is ONE
    (T, W) @ (W, B*3) matmul against the precomputed 0/1 selector `sel`
    (nt, T, W) — contiguous MXU work, no scatter anywhere.  `vgather`
    (the artifact's original-vertex -> device-position map) carries the
    accumulated gradient back to pred's ORIGINAL vertex order."""
    return jnp.take(pred, faces, axis=1)


def _ft3_fwd(pred, faces, perm, sel, vgather):
    return jnp.take(pred, faces, axis=1), (perm, sel, vgather, pred.shape)


def _ft3_bwd(res, g):
    perm, sel, vgather, pshape = res
    B, V, _ = pshape
    F = g.shape[1]
    nt, T, W = sel.shape
    # corner-major cotangent rows (3F, B*3): row = c*F + f, plus a zero
    # pad row the pad slots of `perm` select
    rows = g.transpose(2, 1, 0, 3).reshape(3 * F, B * 3)
    rows = jnp.concatenate(
        [rows, jnp.zeros((1, B * 3), rows.dtype)], axis=0)
    gs = jnp.take(rows, perm, axis=0).reshape(nt, W, B * 3)
    out = jnp.einsum("tij,tjk->tik", sel, gs,
                     preferred_element_type=jnp.float32)
    ddev = out.reshape(nt * T, B, 3)  # rows = DEVICE positions
    # back to pred's original vertex order: orig i sits at device vg[i]
    dpred = jnp.take(ddev, vgather, axis=0).transpose(1, 0, 2)
    if dpred.shape != pshape:  # defensive: tables must match pred's V
        raise ValueError(f"face_sel for nt*T={nt*T} applied to {pshape}")
    return dpred.astype(g.dtype), None, None, None, None


face_take3_band.defvjp(_ft3_fwd, _ft3_bwd)


def _face_corners(pred, faces, face_inv=(), face_band=None):
    """(p0, p1, p2) corner gathers shared by the normal and edge losses;
    routes through the banded-matmul VJP when the artifact carries the
    tables (and P2M_FACE_BAND != 0), else the per-corner paths."""
    import os
    if (face_band is not None and face_band[1].size
            and os.environ.get("P2M_FACE_BAND", "1") == "1"):
        c = face_take3_band(pred, faces, *face_band)
        return c[:, :, 0], c[:, :, 1], c[:, :, 2]
    return tuple(_corner(pred, faces, c, face_inv) for c in range(3))


def coord_l1(pred: jax.Array, target: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Masked L1 (loss.py:10-23): mean over ALL elements with masked entries
    contributing zero (the mask scales both operands)."""
    if valid is not None:
        pred = pred * valid
        target = target * valid
    return jnp.abs(pred - target).mean()


def _normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    # torch F.normalize (v / max(||v||, eps)) with a GRAD-safe guard: the
    # derivative of ||v|| at v = 0 is 0/0, and bf16-quantized predictions
    # can produce exactly-coincident vertices (zero edges) early in
    # training — the double-where keeps both branches NaN-free so one
    # degenerate triangle cannot poison the whole gradient.
    # Intentional parity deviation: for 0 < ||v|| <= eps torch returns
    # v/eps (a vector of norm up to 1) while this returns 0.  The band is
    # unreachable in f32 for any non-identical vertex pair (min nonzero
    # |coordinate delta| ~ 1e-38 >> eps after squaring underflows to 0,
    # i.e. n2 is either 0 or >= tiny^2), so forwards agree in practice;
    # the zero branch is the grad-safe choice.
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = n2 > eps * eps
    inv = jax.lax.rsqrt(jnp.where(ok, n2, 1.0))
    return jnp.where(ok, v * inv, jnp.zeros_like(v))


def normal_vector_loss(pred: jax.Array, gt: jax.Array, faces: jax.Array,
                       face_inv: Tuple[jax.Array, ...] = (),
                       corners=None) -> jax.Array:
    """Surface-normal consistency (loss.py:62-88): |cos| between predicted
    edge vectors and ground-truth face normals, averaged over faces.

    corners: optional precomputed (p0, p1, p2) gathers (shared with the
    edge loss); face_inv: optional per-corner inverse tables switching the
    per-corner gathers to the (slower, kept for A/B) gather-VJP."""
    p0, p1, p2 = corners if corners is not None else _face_corners(
        pred, faces, face_inv)

    v1o = _normalize(p1 - p0)
    v2o = _normalize(p2 - p0)
    v3o = _normalize(p2 - p1)

    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    v1g = _normalize(gt[:, f1] - gt[:, f0])
    v2g = _normalize(gt[:, f2] - gt[:, f0])
    ng = _normalize(jnp.cross(v1g, v2g))

    cos1 = jnp.abs((v1o * ng).sum(-1))
    cos2 = jnp.abs((v2o * ng).sum(-1))
    cos3 = jnp.abs((v3o * ng).sum(-1))
    return jnp.stack([cos1, cos2, cos3]).mean()


def edge_length_loss(pred: jax.Array, gt: jax.Array, faces: jax.Array,
                     face_inv: Tuple[jax.Array, ...] = (),
                     corners=None) -> jax.Array:
    """Edge-length preservation (loss.py:91-114)."""
    p = list(corners) if corners is not None else [
        _corner(pred, faces, c, face_inv) for c in range(3)]
    f = [faces[:, c] for c in range(3)]

    def elen2(xa, xb):
        # grad-safe sqrt: d(sqrt)/dx at 0 is inf, and bf16-quantized
        # predictions can make vertices coincide exactly — one zero-length
        # edge must not NaN the whole gradient (same double-where guard as
        # _normalize; forward values are identical to the plain sqrt)
        n2 = ((xa - xb) ** 2).sum(-1)
        ok = n2 > 1e-24
        return jnp.where(ok, jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)

    def elen_gt(a, b):
        return elen2(gt[:, a], gt[:, b])

    d1 = jnp.abs(elen2(p[0], p[1]) - elen_gt(f[0], f[1]))
    d2 = jnp.abs(elen2(p[0], p[2]) - elen_gt(f[0], f[2]))
    d3 = jnp.abs(elen2(p[1], p[2]) - elen_gt(f[1], f[2]))
    return jnp.stack([d1, d2, d3]).mean()


def make_laplacian_loss(faces):
    """Uniform-Laplacian smoothness loss (loss.py:26-59, defined but unused in
    the reference training objective loss.py:117-120).

    The reference materializes a dense V x V row-normalized Laplacian and does
    a per-sample dense matmul; here delta_i = x_i - mean(neighbors(x_i)) is
    computed with two segment-sums over the undirected edge list (O(E), no
    V^2 buffer), identical semantics: loss = mean_i ||delta_i||^2 (or
    sum/batch when average=True).
    """
    import numpy as np

    f = np.asarray(faces)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    e = np.unique(np.sort(e, axis=1), axis=0)  # undirected, deduped
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    num_v = int(f.max()) + 1
    deg = np.bincount(src, minlength=num_v).astype(np.float32)
    src_j = jnp.asarray(src)
    dst_j = jnp.asarray(dst)
    inv_deg = jnp.asarray(1.0 / (deg + 1e-8))

    def loss(x: jax.Array, average: bool = False) -> jax.Array:
        # x: (B, V, 3).  neighbor mean via segment_sum on the vertex axis.
        nbr_sum = jax.ops.segment_sum(
            x[:, dst_j].swapaxes(0, 1), src_j, num_segments=num_v
        ).swapaxes(0, 1)
        delta = x - nbr_sum * inv_deg[None, :, None]
        sq = (delta ** 2).sum(-1)
        return sq.sum() / x.shape[0] if average else sq.mean()

    return loss


def pose2mesh_loss(
    pred_mesh: jax.Array,       # (B, V, 3) meters, original vertex order
    lift_pose: jax.Array,       # (B, J, 3) mm (PoseNet output)
    pred_reg_pose: jax.Array,   # (B, J_t, 3) mm (J_regressor @ mesh*1000)
    targets: Dict[str, jax.Array],
    faces: jax.Array,
    *,
    normal_weight: float = 0.1,
    edge_weight: float = 20.0,
    joint_weight: float = 1e-3,
    use_edge_loss: jax.Array | bool = False,
    face_inv: Tuple[jax.Array, ...] = (),
    face_band=None,
) -> Dict[str, jax.Array]:
    """Full training objective (base.py:134-143).

    targets: mesh (B,V,3) m, mesh_valid, reg_pose3d (B,J_t,3) mm,
    reg_pose3d_valid, lift_pose3d (B,J,3) mm, lift_pose3d_valid.
    `use_edge_loss` gates the edge term (enabled when epoch >
    TRAIN.edge_loss_start); pass a traced bool to keep one compiled step.
    """
    l_vert = coord_l1(pred_mesh, targets["mesh"], targets["mesh_valid"])
    # ONE shared corner gather feeds both face losses (banded-matmul VJP
    # when the artifact carries face_perm/face_sel)
    corners = _face_corners(pred_mesh, faces, face_inv, face_band)
    l_norm = normal_weight * normal_vector_loss(
        pred_mesh, targets["mesh"], faces, corners=corners)
    l_edge = edge_weight * edge_length_loss(
        pred_mesh, targets["mesh"], faces, corners=corners)
    l_edge = jnp.where(use_edge_loss, l_edge, 0.0)
    l_reg = joint_weight * coord_l1(
        pred_reg_pose, targets["reg_pose3d"], targets["reg_pose3d_valid"]
    )
    l_lift = joint_weight * coord_l1(
        lift_pose, targets["lift_pose3d"], targets["lift_pose3d_valid"]
    )
    total = l_vert + l_norm + l_edge + l_reg + l_lift
    return {
        "total": total,
        "vertex": l_vert,
        "normal": l_norm,
        "edge": l_edge,
        "reg_joint": l_reg,
        "lift_joint": l_lift,
    }
