"""Training/evaluation engine: Trainer / Tester / LiftTrainer / LiftTester.

Reference: lib/core/base.py (334 LoC) — dataloader assembly, model build,
loss/optim/scheduler build, resume, epoch loop bodies, DataParallel wrap.
TPU redesign:

  * one jitted train step (core.train.make_train_step) instead of a Python
    loop body with H2D copies + DataParallel scatter/gather;
  * datasets come from the name registry (data.get_dataset_class), not
    `eval(...)` dispatch (base.py:28, SURVEY.md §B);
  * multi-chip: batches shard over the ('data','graph') Mesh and GSPMD
    inserts the gradient psums — see parallel.mesh / parallel.sharding;
  * checkpoints are numpy pytrees with the reference's best/final
    semantics (funcs_utils.py:111-128, main/train.py:43-58).
"""
from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..body.mano import MANO
from ..body.smpl import SMPL
from ..config import Config
from ..data import BatchLoader, MultipleDatasets, get_dataset_class
from ..models.pose2mesh import Pose2Mesh
from ..models.posenet import PoseNet
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .optim import make_preconditioner, multistep_lr
from .train import (TrainState, make_eval_step, make_multi_train_step,
                    make_posenet_steps, make_train_step)

__all__ = ["Trainer", "Tester", "LiftTrainer", "LiftTester", "build_datasets"]


def _mesh_model_for(joint_set: str):
    return MANO() if joint_set == "mano" else SMPL()


def _state_dict(state: TrainState) -> Dict[str, Any]:
    """TrainState -> serializable dict (flax msgpack handles the leaves)."""
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}


def _state_from(d: Dict[str, Any]) -> TrainState:
    return TrainState(params=d["params"], batch_stats=d.get("batch_stats", {}),
                      opt_state=d.get("opt_state"),
                      step=jnp.asarray(d.get("step", 0)))


def build_datasets(cfg: Config, split: str, mesh_model, *, model_name: str,
                   debug: bool = False) -> List:
    names = (cfg.DATASET.train_list if split == "train"
             else cfg.DATASET.test_list)
    out = []
    for name in names:
        cls = get_dataset_class(name)
        kwargs: Dict[str, Any] = dict(
            mesh_model=mesh_model,
            input_shape=cfg.MODEL.input_shape,
            use_gt_input=cfg.DATASET.use_gt_input,
            model_name=model_name,
            debug=debug,
        )
        data_dir = osp.join(cfg.data_dir, name)
        ds = cls(split, data_dir=data_dir,
                 input_joint_name=cfg.DATASET.input_joint_set, **kwargs) \
            if name == "Human36M" else cls(split, data_dir=data_dir, **kwargs)
        out.append(ds)
    return out


class _Base:
    """Common: model/optimizer build + checkpoint plumbing + device mesh.

    Multi-chip: cfg.TPU.data_axis x cfg.TPU.graph_axis builds a
    ('data','graph') jax.sharding.Mesh and every Trainer/Tester runs the
    SAME jitted step over it — batches shard on 'data', band-level row
    tiles on 'graph', params/optimizer state replicated; GSPMD inserts the
    gradient psums and vertex-halo collectives.  (The reference's analogue
    is the nn.DataParallel wrap at lib/core/base.py:108.)  The default
    1x1 mesh is plain single-device execution.
    """

    def __init__(self, cfg: Config, *, debug: bool = False):
        self.cfg = cfg
        self.debug = debug
        self.device = jax.devices()[0]
        self.rng = jax.random.PRNGKey(cfg.seed or 0)
        n_dev = cfg.TPU.data_axis * cfg.TPU.graph_axis
        self.mesh = None
        if n_dev > 1:
            from ..parallel.mesh import make_mesh

            devices = jax.devices()
            if len(devices) < n_dev:
                raise ValueError(
                    f"cfg.TPU asks for {cfg.TPU.data_axis}x"
                    f"{cfg.TPU.graph_axis} devices, only {len(devices)} visible"
                )
            self.mesh = make_mesh(devices[:n_dev],
                                  graph_axis=cfg.TPU.graph_axis)

    def _put_art(self, art):
        if self.mesh is not None:
            from ..parallel.sharding import shard_artifact

            return shard_artifact(self.mesh, art)
        return jax.device_put(art, self.device)

    def _put_state(self, state):
        if self.mesh is not None:
            from ..parallel.sharding import shard_state

            return shard_state(self.mesh, state)
        return jax.device_put(state, self.device)

    def _put_batch(self, batch):
        if self.mesh is not None:
            from ..parallel.sharding import shard_batch

            return shard_batch(self.mesh, batch)
        return jax.device_put(batch, self.device)

    def _build_cascade(self, joint_num: int, mano: bool, deploy: bool = False):
        dtype = jnp.bfloat16 if self.cfg.TPU.compute_dtype == "bf16" else jnp.float32
        # graph axis > 1: the model runs its band-level hops through the
        # explicit ppermute halo path instead of implicit GSPMD all-gathers
        spmd = self.mesh if (self.mesh is not None
                             and self.cfg.TPU.graph_axis > 1) else None
        return Pose2Mesh(num_joint=joint_num, mano=mano, dtype=dtype,
                         posenet_hidden=self.cfg.MODEL.posenet_hidden,
                         use_pallas=self.cfg.TPU.use_pallas, spmd_mesh=spmd,
                         inference_fused=deploy)


class Trainer(_Base):
    """Pose2Mesh trainer (lib/core/base.py:97-164)."""

    def __init__(self, cfg: Config, *, resume: bool = False,
                 debug: bool = False, datasets: Optional[List] = None,
                 test_dataset=None, model=None, mesh_model=None):
        super().__init__(cfg, debug=debug)
        if mesh_model is None:
            mesh_model = (datasets[0].mesh_model if datasets
                          else _mesh_model_for(cfg.DATASET.input_joint_set))
        self.mesh_model = mesh_model
        self.datasets = datasets if datasets is not None else build_datasets(
            cfg, "train", mesh_model, model_name="pose2mesh_net", debug=debug
        )
        main = self.datasets[0]
        self.art = main.graph
        self.joint_num = main.joint_num
        self.loader = BatchLoader(
            MultipleDatasets(self.datasets, make_same_len=True)
            if len(self.datasets) > 1 else self.datasets[0],
            cfg.TRAIN.batch_size, shuffle=cfg.TRAIN.shuffle, drop_last=True,
            num_workers=cfg.DATASET.workers,
        )

        self.model = model if model is not None else self._build_cascade(
            self.joint_num, mano=cfg.DATASET.input_joint_set == "mano"
        )
        self.tx = make_preconditioner(cfg.TRAIN.optimizer)
        self.lr_at = multistep_lr(cfg.TRAIN.lr, cfg.TRAIN.lr_step,
                                  cfg.TRAIN.lr_factor)
        j_reg = jnp.asarray(main.target_regressor())
        step_fn = make_train_step(
            self.model, self.tx, j_reg,
            normal_weight=cfg.MODEL.normal_loss_weight,
            edge_weight=cfg.MODEL.edge_loss_weight,
            joint_weight=cfg.MODEL.joint_loss_weight,
        )
        self._train_step = jax.jit(step_fn, donate_argnums=(0,))
        # k > 1: one dispatch + one stacked transfer per k steps (cfg.TPU.
        # steps_per_dispatch; amortizes per-call latency on remote TPUs).
        # Under a device mesh the stacked batch's DATA axis is dim 1, which
        # shard_batch (leading-dim 'data') does not express — multi-step
        # dispatch is a single-device/replicated-path feature for now.
        self.steps_per_dispatch = max(1, cfg.TPU.steps_per_dispatch)
        if self.steps_per_dispatch > 1 and self.mesh is not None:
            raise ValueError("cfg.TPU.steps_per_dispatch > 1 requires a "
                             "1x1 mesh (stacked batches shard on dim 1)")
        self._multi_step = (jax.jit(make_multi_train_step(step_fn),
                                    donate_argnums=(0,))
                            if self.steps_per_dispatch > 1 else None)

        # init / resume — jitted, on the host CPU backend when available:
        # un-jitted flax init dispatches thousands of eager ops, which on a
        # remote/relayed TPU costs ~1 s each (verify skill notes); the
        # state is moved to the accelerator once below (_put_state)
        sample = jnp.zeros((cfg.TRAIN.batch_size, self.joint_num, 2),
                           jnp.float32)
        try:
            init_dev = jax.devices("cpu")[0]
        except RuntimeError:
            init_dev = None
        with jax.default_device(init_dev):
            variables = jax.jit(self.model.init, static_argnums=(3,))(
                self.rng, self.art, sample, False)
        if cfg.MODEL.posenet_pretrained and cfg.MODEL.posenet_path:
            variables = self._load_posenet(variables, cfg.MODEL.posenet_path)
        self.state = TrainState.create(variables, self.tx)
        self.begin_epoch = 1
        self.train_log: List[float] = []
        self.test_log: List[float] = []
        if resume:
            self._resume()
        self.art_dev = self._put_art(self.art)
        self.state = self._put_state(self.state)
        self.tester = Tester(cfg, debug=debug, dataset=test_dataset,
                             mesh_model=mesh_model, model=self.model)

    def _load_posenet(self, variables, path: str):
        """Load a pretrained PoseNet checkpoint into the cascade
        (posenet.py:89-92 semantics: best lifter weights)."""
        raw = load_checkpoint(path, pick_best=True)["state"]
        params = dict(variables["params"])
        params["pose_lifter"] = raw["params"]
        bs = dict(variables.get("batch_stats", {}))
        if raw.get("batch_stats"):
            bs["pose_lifter"] = raw["batch_stats"]
        return {"params": params, "batch_stats": bs}

    def _resume(self):
        path = latest_checkpoint(self.cfg.checkpoint_dir)
        if path is None:
            return
        template = _state_dict(jax.device_get(self.state))
        payload = load_checkpoint(path, target_state=template)
        self.state = jax.tree.map(jnp.asarray, _state_from(payload["state"]))
        self.begin_epoch = int(payload.get("epoch", 0)) + 1
        self.train_log = list(payload.get("train_log", []))
        self.test_log = list(payload.get("test_log", {}).get("joint", []))

    def train_epoch(self, epoch: int, lr_override: Optional[float] = None
                    ) -> float:
        lr = jnp.asarray(
            self.lr_at(epoch) if lr_override is None else lr_override,
            jnp.float32,
        )
        use_edge = jnp.asarray(
            1.0 if epoch > self.cfg.TRAIN.edge_loss_start else 0.0, jnp.float32
        )
        rng = jax.random.fold_in(self.rng, epoch)
        losses = []
        t0 = time.time()
        k = self.steps_per_dispatch
        pending: List[dict] = []

        def flush_pending():
            # stack k host batches -> ONE transfer + ONE k-step dispatch
            stacked = {key: np.stack([b[key] for b in pending])
                       for key in pending[0]}
            self.state, ls = self._multi_step(
                self.state, self.art_dev, self._put_batch(stacked),
                lr, use_edge, rng)
            for j in range(len(pending)):
                losses.append({key: v[j] for key, v in ls.items()})
            pending.clear()

        for i, (inputs, targets, meta) in enumerate(self.loader):
            batch = {
                "pose2d": inputs["pose2d"],
                "mesh": targets["mesh"],
                "lift_pose3d": targets["lift_pose3d"],
                "reg_pose3d": targets["reg_pose3d"],
                **{k2: v for k2, v in meta.items()},
            }
            if k > 1:
                pending.append({key: np.asarray(v)
                                for key, v in batch.items()})
                if len(pending) == k:
                    flush_pending()
            else:
                batch = self._put_batch(batch)
                self.state, loss = self._train_step(
                    self.state, self.art_dev, batch, lr, use_edge, rng
                )
                losses.append(loss)
            if i % self.cfg.TRAIN.print_freq == 0 and losses:
                l_tot = float(losses[-1]["total"])
                rate = (i + 1) * self.cfg.TRAIN.batch_size / (time.time() - t0)
                print(f"epoch {epoch} it {i}/{len(self.loader)} "
                      f"loss {l_tot:.4f} ({rate:.0f} samples/s)")
        # tail shorter than k: run the remaining batches one dispatch each
        for b in pending:
            self.state, loss = self._train_step(
                self.state, self.art_dev, self._put_batch(b),
                lr, use_edge, rng)
            losses.append(loss)
        mean = float(np.mean([float(l["total"]) for l in losses])) if losses else 0.0
        self.train_log.append(mean)
        return mean

    def fit(self) -> Dict[str, float]:
        cfg = self.cfg
        best_err = float("inf")
        result: Dict[str, float] = {}
        from ..utils.metrics_log import MetricsLogger
        mlog = MetricsLogger(osp.join(cfg.output_dir, "metrics.jsonl"))
        plateau = None
        if cfg.TRAIN.scheduler == "plateau":
            from .optim import ReduceLROnPlateau
            plateau = ReduceLROnPlateau(cfg.TRAIN.lr)
        for epoch in range(self.begin_epoch, cfg.TRAIN.end_epoch + 1):
            lr_override = plateau.lr if plateau is not None else None
            mean_loss = self.train_epoch(epoch, lr_override=lr_override)
            err = self.tester.test(
                epoch, state=self.state, art=self.art_dev,
                full_eval=epoch == cfg.TRAIN.end_epoch,
            )
            if plateau is not None:
                plateau.step(err.get("joint_err", mean_loss))
            mlog.log("epoch", epoch=epoch, train_loss=mean_loss, **err)
            self.test_log.append(err.get("joint_err", 0.0))
            result = err
            is_best = err.get("joint_err", np.inf) < best_err
            if is_best:
                best_err = err["joint_err"]
            self._save(epoch, is_best, final=epoch == cfg.TRAIN.end_epoch)
            # loss/error curve PDFs (funcs_utils.py:131-151, main/train.py:60-62)
            from ..utils.plots import save_plot
            save_plot(self.train_log, cfg.graph_dir, title="train_loss")
            if self.test_log:
                save_plot(self.test_log, cfg.graph_dir,
                          title="test_joint_err", ylabel="mm")
            print(f"epoch {epoch}: train loss {mean_loss:.4f}, "
                  f"test joint err {err.get('joint_err', -1):.2f} mm"
                  + (" (best)" if is_best else ""))
        return result

    def _save(self, epoch: int, is_best: bool, final: bool):
        save_checkpoint(
            self.cfg.checkpoint_dir, epoch,
            _state_dict(jax.device_get(self.state)),
            train_log=list(self.train_log),
            test_log={"joint": list(self.test_log)},
            is_best=is_best, is_final=final,
        )


class Tester(_Base):
    """Pose2Mesh evaluator (lib/core/base.py:167-230)."""

    def __init__(self, cfg: Config, *, load_path: str = "", debug: bool = False,
                 dataset=None, mesh_model=None, model=None):
        super().__init__(cfg, debug=debug)
        if mesh_model is None:
            mesh_model = _mesh_model_for(cfg.DATASET.input_joint_set)
        self.mesh_model = mesh_model
        if dataset is None:
            built = build_datasets(cfg, "test", mesh_model,
                                   model_name="pose2mesh_net", debug=debug)
            dataset = built[0] if built else None
        self.dataset = dataset
        self.model = model
        self.state = None
        self._eval_step = None
        # deploy-mode eval only when this Tester builds its own cascade;
        # a caller-provided model (the training loop's in-epoch eval)
        # keeps its graph as-is
        self._deploy = bool(cfg.TEST.deploy) and model is None
        if dataset is not None:
            if self.model is None:
                self.model = self._build_cascade(
                    dataset.joint_num,
                    mano=cfg.DATASET.input_joint_set == "mano",
                    deploy=self._deploy,
                )
            j_reg = jnp.asarray(dataset.target_regressor())
            self._eval_step = jax.jit(make_eval_step(self.model, j_reg))
            self.loader = BatchLoader(dataset, cfg.TEST.batch_size,
                                      shuffle=False, drop_last=False,
                                      num_workers=cfg.DATASET.workers)
        if load_path:
            raw = load_checkpoint(load_path, pick_best=True)["state"]
            self.state = TrainState(
                params=raw["params"], batch_stats=raw.get("batch_stats", {}),
                opt_state=None, step=jnp.asarray(raw.get("step", 0)),
            )

    def test(self, epoch: int = 0, *, state: Optional[TrainState] = None,
             art=None, full_eval: Optional[bool] = None) -> Dict[str, float]:
        ds = self.dataset
        if ds is None:
            return {}
        state = state if state is not None else self.state
        assert state is not None, "no weights: pass state= or load_path="
        if self._deploy and state.batch_stats:
            # fold BN into conv kernels once: the inference_fused cascade
            # consumes folded variables (models.fold; deploy-path parity vs
            # the reference modules is tested in test_ref_checkpoint.py)
            from ..models.fold import fold_bn_variables

            v = fold_bn_variables({"params": state.params,
                                   "batch_stats": state.batch_stats})
            state = TrainState(params=v["params"],
                               batch_stats=v.get("batch_stats", {}),
                               opt_state=None, step=state.step)
        if art is None:
            art = self._put_art(ds.graph)

        j_errs, v_errs = [], []
        meshes, target_meshes = [], []
        # full dataset.evaluate() (which needs every predicted mesh in host
        # memory) only at epoch 0 or when explicitly requested — the
        # reference collects meshes only at epoch 0/end (lib/core/base.py:
        # 217-222); intermediate epochs stream the running joint/vertex
        # errors and keep memory flat
        collect = full_eval if full_eval is not None else epoch == 0
        B = self.cfg.TEST.batch_size
        for inputs, targets, meta in self.loader:
            n = inputs["pose2d"].shape[0]
            pose2d = inputs["pose2d"]
            if n < B:  # pad the tail to the compiled shape
                pad = B - n
                pose2d = np.concatenate(
                    [pose2d, np.repeat(pose2d[-1:], pad, 0)])
            mesh_mm, reg_pose, _ = self._eval_step(
                state, art,
                self._put_batch({"pose2d": jnp.asarray(pose2d)})["pose2d"],
            )
            mesh_mm = np.asarray(mesh_mm[:n], np.float32)
            reg_pose = np.asarray(reg_pose[:n], np.float32)
            gt_mesh = np.asarray(targets["mesh"], np.float32) * 1000.0
            gt_reg = np.asarray(targets["reg_pose3d"], np.float32)
            j, v = ds.compute_both_err(mesh_mm, gt_mesh, reg_pose, gt_reg)
            j_errs.append(j)
            v_errs.append(v)
            if collect:
                meshes.append(mesh_mm)
                target_meshes.append(gt_mesh)

        out = {"joint_err": float(np.mean(j_errs)) if j_errs else 0.0,
               "mesh_err": float(np.mean(v_errs)) if v_errs else 0.0}
        print(f"test epoch {epoch}: joint {out['joint_err']:.2f} mm, "
              f"mesh {out['mesh_err']:.2f} mm")
        if collect and meshes:
            kwargs = {}
            if self.cfg.TEST.vis:  # .obj dumps during eval (config.py TEST.vis)
                kwargs["vis_dir"] = self.cfg.vis_dir
            res = ds.evaluate({
                "mesh_coord": np.concatenate(meshes),
                "mesh_coord_target": np.concatenate(target_meshes),
            }, **kwargs)
            out.update(res)
        return out


class LiftTrainer(_Base):
    """PoseNet-only trainer (lib/core/base.py:233-276)."""

    def __init__(self, cfg: Config, *, debug: bool = False,
                 datasets: Optional[List] = None):
        super().__init__(cfg, debug=debug)
        mesh_model = _mesh_model_for(cfg.DATASET.input_joint_set)
        self.datasets = datasets if datasets is not None else build_datasets(
            cfg, "train", mesh_model, model_name="posenet", debug=debug
        )
        main = self.datasets[0]
        self.joint_num = main.joint_num
        self.loader = BatchLoader(
            MultipleDatasets(self.datasets, make_same_len=True)
            if len(self.datasets) > 1 else self.datasets[0],
            cfg.TRAIN.batch_size, shuffle=True, drop_last=True,
            num_workers=cfg.DATASET.workers,
        )
        self.model = PoseNet(self.joint_num)
        self.tx = make_preconditioner(cfg.TRAIN.optimizer)
        self.lr_at = multistep_lr(cfg.TRAIN.lr, cfg.TRAIN.lr_step,
                                  cfg.TRAIN.lr_factor)
        self._train_step, self._eval_step = make_posenet_steps(self.model, self.tx)
        self._train_step = jax.jit(self._train_step, donate_argnums=(0,))
        sample = jnp.zeros((cfg.TRAIN.batch_size, self.joint_num * 2))
        variables = self.model.init(self.rng, sample, False)
        self.state = TrainState.create(variables, self.tx)
        self.train_log: List[float] = []

    def train_epoch(self, epoch: int) -> float:
        lr = jnp.asarray(self.lr_at(epoch), jnp.float32)
        rng = jax.random.fold_in(self.rng, epoch)
        losses = []
        for joint_img, joint_cam, valid in self.loader:
            batch = jax.device_put({
                "pose2d": jnp.asarray(joint_img.reshape(len(joint_img), -1)),
                "pose3d": jnp.asarray(joint_cam),
                "pose3d_valid": jnp.asarray(valid),
            }, self.device)
            self.state, loss = self._train_step(self.state, batch, lr, rng)
            losses.append(float(loss))
        mean = float(np.mean(losses)) if losses else 0.0
        self.train_log.append(mean)
        return mean

    def save(self, epoch: int, is_best: bool = False):
        save_checkpoint(
            self.cfg.checkpoint_dir, epoch,
            _state_dict(jax.device_get(self.state)),
            train_log=list(self.train_log), is_best=is_best,
        )


class LiftTester(_Base):
    """PoseNet-only evaluator (lib/core/base.py:278-332)."""

    def __init__(self, cfg: Config, *, load_path: str = "", debug: bool = False,
                 dataset=None):
        super().__init__(cfg, debug=debug)
        mesh_model = _mesh_model_for(cfg.DATASET.input_joint_set)
        if dataset is None:
            built = build_datasets(cfg, "test", mesh_model,
                                   model_name="posenet", debug=debug)
            dataset = built[0] if built else None
        self.dataset = dataset
        self.model = PoseNet(dataset.joint_num) if dataset is not None else None
        self.state = None
        if load_path:
            raw = load_checkpoint(load_path, pick_best=True)["state"]
            self.state = TrainState(
                params=raw["params"], batch_stats=raw.get("batch_stats", {}),
                opt_state=None, step=jnp.asarray(raw.get("step", 0)),
            )

    def test(self, epoch: int = 0, *, state: Optional[TrainState] = None
             ) -> Dict[str, float]:
        ds = self.dataset
        if ds is None:
            return {}
        state = state if state is not None else self.state
        _, eval_step = make_posenet_steps(self.model, make_preconditioner())
        eval_step = jax.jit(eval_step)
        preds = []
        loader = BatchLoader(ds, self.cfg.TEST.batch_size, shuffle=False,
                             num_workers=self.cfg.DATASET.workers)
        for joint_img, joint_cam, valid in loader:
            pred = eval_step(state, jnp.asarray(
                joint_img.reshape(len(joint_img), -1)))
            preds.append(np.asarray(pred, np.float32))
        return ds.evaluate_joint({"joint_coord": np.concatenate(preds)})
