"""Jitted training / evaluation steps.

The reference's per-batch loop body (lib/core/base.py:122-148: H2D copies,
DataParallel forward, un-permute gather, J-regressor matmul, 5 losses,
rmsprop step) becomes ONE jitted function: forward + losses + grads +
optimizer update fused by XLA, with the un-permutation and the (J, V) dense
regressor matmul inside the compiled program.  The learning rate and the
edge-loss gate enter as traced scalars so a single compilation serves every
epoch (the reference instead mutates optimizer state per epoch).

Cross-replica behavior: under pjit/shard_map data parallelism the loss mean
is a global mean, so gradients all-reduce automatically; BatchNorm batch
statistics are per-replica exactly like the reference's nn.DataParallel
(which also computes BN stats per GPU shard, base.py:108).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..graphs.artifact import PyramidArtifact
from ..models.meshnet import extract_mesh
from .losses import coord_l1, pose2mesh_loss

__all__ = ["TrainState", "make_train_step", "make_multi_train_step",
           "make_eval_step", "make_posenet_steps"]


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    j_regressor: jax.Array,
    *,
    normal_weight: float = 0.1,
    edge_weight: float = 20.0,
    joint_weight: float = 1e-3,
) -> Callable:
    """Build the jitted pose2mesh train step.

    j_regressor: (J_target, V) regressor for the mesh->joint loss
    (cfg.DATASET.target_joint_set, base.py:105).
    """

    def train_step(
        state: TrainState,
        art: PyramidArtifact,
        batch: Dict[str, jax.Array],
        lr: jax.Array,
        use_edge_loss: jax.Array,
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        if batch["mesh"].dtype != jnp.float32:
            # f16 transfer path (P2M_MESH_XFER_F16): upcast once on device
            # so the normal/edge losses' cross products run in f32
            batch = dict(batch, mesh=batch["mesh"].astype(jnp.float32))

        def loss_fn(params):
            (mesh_dev, pose3d), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                art, batch["pose2d"], True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            mesh = extract_mesh(art, mesh_dev)  # (B, V, 3), meters
            reg_pose = jnp.einsum(
                "jv,bvc->bjc", j_regressor, mesh * 1000.0,
                preferred_element_type=jnp.float32,
            )
            # face_inv deliberately NOT passed: the ELL-inverse gather VJP
            # measured 16.0 ms vs 6.3 ms for plain autodiff scatter on the
            # real chip (benchmarks/profile_losses.py, round 4).  The
            # round-5 BANDED tables (face_perm/face_sel) replace the
            # scatter entirely with tile-local MXU matmuls.
            losses = pose2mesh_loss(
                mesh, pose3d, reg_pose, batch, art.faces,
                normal_weight=normal_weight, edge_weight=edge_weight,
                joint_weight=joint_weight, use_edge_loss=use_edge_loss,
                face_band=(art.face_perm, art.face_sel, art.vertex_gather),
            )
            return losses["total"], (losses, mutated["batch_stats"])

        grads, (losses, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_bs,
            opt_state=new_opt, step=state.step + 1,
        )
        return new_state, losses

    return train_step


def make_multi_train_step(train_step: Callable) -> Callable:
    """Wrap a train step into a k-step `lax.scan` over a STACKED batch
    (leaves shaped (k, B, ...)): one host dispatch and one H2D transfer
    drive k optimizer steps.  Amortizes per-call dispatch/transfer latency
    (the dominant end-to-end cost on relayed TPUs — measured in
    benchmarks/bench_e2e_train.py); per-step semantics are identical (the
    step's own rng fold keys off state.step, which advances per scan
    iteration).  Losses return stacked (k,) per key."""

    def multi_step(state, art, batches, lr, use_edge_loss, rng):
        def body(s, bd):
            s2, losses = train_step(s, art, bd, lr, use_edge_loss, rng)
            return s2, losses
        return jax.lax.scan(body, state, batches)

    return multi_step


def make_eval_step(model, j_regressor: jax.Array) -> Callable:
    """Eval forward: returns (pred_mesh mm, pred_reg_pose mm, lift pose mm)
    mirroring Tester.test's per-batch compute (base.py:196-206)."""

    def eval_step(state: TrainState, art: PyramidArtifact, pose2d: jax.Array):
        mesh_dev, pose3d = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            art, pose2d, False,
        )
        mesh_mm = extract_mesh(art, mesh_dev) * 1000.0
        reg_pose = jnp.einsum(
            "jv,bvc->bjc", j_regressor, mesh_mm,
            preferred_element_type=jnp.float32,
        )
        return mesh_mm, reg_pose, pose3d

    return eval_step


def make_posenet_steps(model, tx: optax.GradientTransformation):
    """Train/eval steps for the standalone PoseNet lifter
    (LiftTrainer/LiftTester, base.py:233-332): masked L1 on 3D joints."""

    def train_step(state: TrainState, batch, lr, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            pred, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pose2d"], True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            pred = pred.reshape(pred.shape[0], -1, 3)
            loss = coord_l1(pred, batch["pose3d"], batch["pose3d_valid"])
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bs, new_opt, state.step + 1), loss

    def eval_step(state: TrainState, pose2d):
        pred = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pose2d, False,
        )
        return pred.reshape(pred.shape[0], -1, 3)

    return train_step, eval_step
