"""Measure the ACTUAL reference forward on CPU torch (VERDICT r3 item #9).

BASELINE.md's 12,800 meshes/s target assumes a V100 PyTorch forward of
~25 ms/batch64 (~2,560 meshes/s).  That number was an estimate; this
harness anchors it by running the real reference model code
(/root/reference/lib/models/{posenet,meshnet,pose2mesh_net}.py) at the
flagship config (hid_dim=4096, SMPL 9-level pyramid, batch 64) on the
CPU torch that IS in this environment, and reporting measured ms/batch.
The V100 figure remains an estimate, but the CPU measurement bounds it:
a V100 runs this workload (67M-param MLP + 24 graph convs with sparse
SpMM) far faster than a host CPU, and published V100-vs-CPU ratios for
comparable models sit around 10-30x.

Writes one JSON line {"cpu_torch_ms_batch64", "cpu_torch_meshes_per_sec",
"n_threads", ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

REF_LIB = "/root/reference/lib"

H36M_SKELETON = (
    (0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
    (8, 14), (14, 15), (15, 16), (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
)
H36M_FLIP_PAIRS = ((1, 4), (2, 5), (3, 6), (14, 11), (15, 12), (16, 13))


def build_ref_cascade(torch, graph_L, num_joint=17):
    """The reference cascade from the real modules (cfg/funcs shimmed the
    same way tests/test_ref_checkpoint.py does; .cuda() patched to no-op)."""
    ns = lambda **kw: types.SimpleNamespace(**kw)
    cfg = ns(
        DATASET=ns(target_joint_set="human36"),
        MODEL=ns(posenet_pretrained=False, posenet_path=""),
    )
    core_mod = types.ModuleType("core")
    core_config = types.ModuleType("core.config")
    core_config.cfg = cfg
    core_mod.config = core_config
    funcs = types.ModuleType("funcs_utils")
    funcs.load_checkpoint = lambda **kw: None
    sys.modules["core"] = core_mod
    sys.modules["core.config"] = core_config
    sys.modules["funcs_utils"] = funcs
    sys.path.insert(0, REF_LIB)
    torch.Tensor.cuda = lambda self, *a, **kw: self

    import models.meshnet as ref_meshnet
    import models.posenet as ref_posenet

    class RefFlat(torch.nn.Module):  # pose2mesh_net.py:8-22
        def __init__(s):
            super().__init__()
            s.pose_lifter = ref_posenet.get_model(
                num_joint, hid_dim=4096, num_layer=2, p_dropout=0.5)
            s.pose2mesh = ref_meshnet.get_model(
                num_joint_input_chan=5, num_mesh_output_chan=3,
                graph_L=graph_L)

        def forward(s, pose2d):
            pose3d = s.pose_lifter(pose2d.view(len(pose2d), -1))
            pose3d = pose3d.reshape(-1, num_joint, 3)
            combine = torch.cat((pose2d, pose3d.detach() / 1000), dim=2)
            return s.pose2mesh(combine), pose3d

    torch.manual_seed(0)
    return RefFlat().eval()


def main(batch=64, iters=3):
    import scipy.sparse as sp
    import torch

    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.graphs.build import build_pyramid

    smpl = SMPL()
    pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                        flip_pairs=H36M_FLIP_PAIRS, levels=9)
    # reference ctor wants the undeleted list (it deletes -2 itself,
    # meshnet.py:35); splice a placeholder where ours already dropped it
    graph_L = list(pyr.mesh_laplacians) + [sp.identity(2, format="csr"),
                                           pyr.joint_laplacian]
    model = build_ref_cascade(torch, graph_L)

    x = torch.from_numpy(
        np.random.default_rng(0).standard_normal((batch, 17, 2)).astype(np.float32))
    with torch.no_grad():
        model(x)  # warm
        times = []
        for _ in range(iters):
            t0 = time.time()
            model(x)
            times.append(time.time() - t0)
    ms = min(times) * 1e3
    out = {
        "cpu_torch_ms_batch64": round(ms, 1),
        "cpu_torch_meshes_per_sec": round(batch / (ms / 1e3), 1),
        "n_threads": torch.get_num_threads(),
        "torch_version": torch.__version__,
        "note": "actual /root/reference model code, CPU; anchors the "
                "documented ~25 ms V100 estimate (BASELINE.md)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
