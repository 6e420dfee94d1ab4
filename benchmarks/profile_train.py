"""Train-step cost breakdown (VERDICT r3 item #3): the full train step costs
98.4 ms/batch64 vs a 10.2 ms deploy forward (9.7x).  A symmetric-L backward
is the same hop, so the step should land near 3-4x forward.  This harness
measures on-chip, with the same relay-safe scan differencing as bench.py,
a ladder of variants that isolates where the extra time goes:

  fwd_eval3d     eval-mode forward, 3-D training layout (BN running stats)
  fwd_train      train-mode forward + losses (BN batch stats + dropout)
  grad_eval      grad of losses with train=False (no BN-stats, no dropout)
  grad_train     grad of the full train-mode loss (no optimizer)
  grad_vertex    grad_train with only the vertex+lift losses (no normal/
                 edge face gathers, no J-regressor term)
  opt_only       rmsprop update alone on full-size grads
  step_full      the production train step (grad_train + opt)

Each measured number prints as a JSON row; differences attribute the cost:
  BN+dropout cost      = grad_train - grad_eval
  face-loss cost       = grad_train - grad_vertex
  optimizer cost       = step_full - grad_train (cross-check vs opt_only)
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_p2m"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H36M_SKELETON = (
    (0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
    (8, 14), (14, 15), (15, 16), (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
)
H36M_FLIP_PAIRS = ((1, 4), (2, 5), (3, 6), (14, 11), (15, 12), (16, 13))


def _measure(fn, carry, *args, small=2, large=12, reps=3):
    """seconds per call of fn(carry, *args) -> carry, relay-safe."""

    @functools.partial(jax.jit, static_argnums=0)
    def loop(n, c, *a):
        def body(c, _):
            return fn(c, *a), ()
        c2, _ = jax.lax.scan(body, c, None, length=n)
        return c2

    def run(n, c, *a):
        out = loop(n, c, *a)
        # fetch one scalar leaf to force completion through the relay (the
        # same eager-sum cost lands on small and large runs, so the
        # difference cancels it)
        np.asarray(jnp.sum(jax.tree.leaves(out)[0]))
        return out

    run(small, carry, *args)
    run(large, carry, *args)
    ts, tl = [], []
    for _ in range(reps):
        t0 = time.time(); run(small, carry, *args); ts.append(time.time() - t0)
        t0 = time.time(); run(large, carry, *args); tl.append(time.time() - t0)
    return max(min(tl) - min(ts), 1e-9) / (large - small)


def main(batch=64):
    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.core.losses import pose2mesh_loss
    from pose2mesh_release_tpu.core.optim import make_preconditioner
    from pose2mesh_release_tpu.core.train import TrainState, make_train_step
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.meshnet import extract_mesh
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        smpl = SMPL()
        pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                            flip_pairs=H36M_FLIP_PAIRS, levels=9)
        art = pack_pyramid(pyr, smpl.face)
        model = Pose2Mesh(num_joint=17, dtype=jnp.bfloat16)
        V, J = art.num_vertices, art.joint_num
        v_t = np.asarray(smpl.layer().v_template, np.float32)
        mesh_gt = v_t[None] + rng.standard_normal(
            (batch, V, 3)).astype(np.float32) * 0.005
        j_reg = jnp.asarray(rng.random((J, V)), jnp.float32)
        j_reg = j_reg / j_reg.sum(axis=1, keepdims=True)
        pose_gt = np.einsum("jv,bvc->bjc", np.asarray(j_reg), mesh_gt) * 1000.0
        batch_d = {
            "pose2d": jnp.asarray(pose_gt[..., :2] / 500.0, jnp.float32),
            "mesh": jnp.asarray(mesh_gt),
            "mesh_valid": jnp.ones((batch, V, 3), jnp.float32),
            "reg_pose3d": jnp.asarray(pose_gt, jnp.float32),
            "reg_pose3d_valid": jnp.ones((batch, J, 3), jnp.float32),
            "lift_pose3d": jnp.asarray(pose_gt, jnp.float32),
            "lift_pose3d_valid": jnp.ones((batch, J, 3), jnp.float32),
        }
        init_model = Pose2Mesh(num_joint=17, dtype=jnp.bfloat16,
                               use_pallas=False)
        variables = jax.jit(init_model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), art, batch_d["pose2d"], False)
        tx = make_preconditioner("rmsprop")
        state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, j_reg)
    dev = jax.devices()[0]
    state, art, batch_d = jax.device_put((state, art, batch_d), dev)

    results = {}
    # optional variant filter: P2M_PROFILE_ONLY="fwd_train,grad_train"
    # skips the other (expensive-to-compile) rungs
    only = os.environ.get("P2M_PROFILE_ONLY", "")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    def report(name, secs):
        results[name] = round(secs * 1e3, 2)
        print(f"# {name:14s} {secs*1e3:8.2f} ms/batch{batch}",
              file=sys.stderr, flush=True)

    # every big operand travels as an explicit jit ARG: closure constants
    # get serialized into the relay's compile request and trip its length
    # limit (same fix as benchmarks/bench_configs d0a15f7)
    def loss_of(params, bs, a, bd, train, keys=None, rngs=None):
        out = model.apply(
            {"params": params, "batch_stats": bs},
            a, bd["pose2d"], train,
            mutable=["batch_stats"] if train else False,
            rngs=rngs)
        (mesh_dev, pose3d), new_bs = out if train else (out, bs)
        mesh = extract_mesh(a, mesh_dev)
        reg_pose = jnp.einsum("jv,bvc->bjc", j_reg, mesh * 1000.0,
                              preferred_element_type=jnp.float32)
        losses = pose2mesh_loss(mesh, pose3d, reg_pose, bd, a.faces,
                                use_edge_loss=jnp.bool_(True))
        if keys is not None:
            return sum(losses[k] for k in keys)
        return losses["total"]

    # --- forward-only ladder; the carry PERTURBS the input so the scan
    # body is not loop-invariant (else XLA hoists the whole forward out of
    # the loop and the measurement reads ~0, bench.py methodology notes) ---
    def _chained(c, bd):
        bd = dict(bd)
        bd["pose2d"] = bd["pose2d"] + c * 1e-30
        return bd

    def fwd_eval3d(c, s, a, bd):
        return c + loss_of(s.params, s.batch_stats, a, _chained(c, bd),
                           False) * 1e-30

    def fwd_train(c, s, a, bd):
        return c + loss_of(s.params, s.batch_stats, a, _chained(c, bd), True,
                           rngs={"dropout": jax.random.PRNGKey(0)}) * 1e-30

    if want("fwd_eval3d"):
        report("fwd_eval3d", _measure(fwd_eval3d, jnp.float32(0.0),
                                      state, art, batch_d))
    if want("fwd_train"):
        report("fwd_train", _measure(fwd_train, jnp.float32(0.0),
                                     state, art, batch_d))

    # --- grad ladder (carry = params; add a tiny grad multiple so the scan
    # serializes and nothing hoists) ---
    def add_grad(params, g, eps=1e-30):
        return jax.tree.map(lambda p, gg: p + eps * gg.astype(p.dtype),
                            params, g)

    def grad_eval(params, bs, a, bd):
        g = jax.grad(lambda p: loss_of(p, bs, a, bd, False))(params)
        return add_grad(params, g)

    def grad_train(params, bs, a, bd):
        g = jax.grad(lambda p: loss_of(
            p, bs, a, bd, True,
            rngs={"dropout": jax.random.PRNGKey(0)}))(params)
        return add_grad(params, g)

    def grad_vertex(params, bs, a, bd):
        g = jax.grad(lambda p: loss_of(
            p, bs, a, bd, True, keys=("vertex", "lift_joint"),
            rngs={"dropout": jax.random.PRNGKey(0)}))(params)
        return add_grad(params, g)

    margs = (state.batch_stats, art, batch_d)
    if want("grad_eval"):
        report("grad_eval", _measure(grad_eval, state.params, *margs,
                                     small=2, large=8))
    if want("grad_train"):
        report("grad_train", _measure(grad_train, state.params, *margs,
                                      small=2, large=8))
    if want("grad_vertex"):
        report("grad_vertex", _measure(grad_vertex, state.params, *margs,
                                       small=2, large=8))

    # --- optimizer alone ---
    grads0 = jax.tree.map(lambda p: jnp.full_like(p, 1e-8), state.params)
    grads0 = jax.device_put(grads0, dev)

    def opt_only(s, g0):
        updates, new_opt = tx.update(g0, s.opt_state, s.params)
        new_params = jax.tree.map(lambda p, u: p - 1e-9 * u, s.params, updates)
        return TrainState(new_params, s.batch_stats, new_opt, s.step + 1)

    if want("opt_only"):
        report("opt_only", _measure(opt_only, state, grads0,
                                    small=2, large=12))

    # --- full step ---
    def step_full(s, a, bd):
        s2, _ = train_step(s, a, bd, jnp.float32(1e-9),
                           jnp.bool_(True), jax.random.PRNGKey(1))
        return s2

    if want("step_full"):
        report("step_full", _measure(step_full, state, art, batch_d,
                                     small=2, large=8))

    if only is None:
        results["derived"] = {
            "bn_dropout_ms": round(results["grad_train"] - results["grad_eval"], 2),
            "face_losses_ms": round(results["grad_train"] - results["grad_vertex"], 2),
            "optimizer_ms": round(results["step_full"] - results["grad_train"], 2),
            "backward_ms": round(results["grad_train"] - results["fwd_train"], 2),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
