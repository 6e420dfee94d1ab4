"""Real-template readiness tests (VERDICT r2 task 7).

Everything else in CI runs on synthetic `uv_sphere` stand-ins because the
licensed SMPL/MANO .pkl files are absent from this environment.  These
tests assert the reference-exact pyramid properties on the REAL templates
the moment the assets appear — point P2M_SMPL_MODEL_DIR /
P2M_MANO_MODEL_DIR at directories holding the reference's pkl names
(basicModel_*_lbs_10_207_0_v1.0.0.pkl, MANO_RIGHT.pkl; same files
`smplpytorch/native/models/` and `manopth/mano/models/` hold in the
reference checkout).  Skipped cleanly when absent.

Expected values come from the reference pipeline
(`lib/graph_utils.py:75-95` + `lib/coarsening.py:43-64`): SMPL 6890
vertices at levels=9 coarsen to binary-tree-padded
{12288, 6144, 3072, 1536, 768, 384, 192, 96} mesh levels (48 deleted by
`lib/models/meshnet.py:35`, 24 swapped for the joint graph), with the fc
"upsample" sized 17*64 -> 96*64 (`lib/models/meshnet.py:36-37`); MANO 778
vertices at levels=6 give {1088, 544, 272, 136, 68}.
"""
import os

import numpy as np
import pytest

SMPL_DIR = os.environ.get("P2M_SMPL_MODEL_DIR", "")
MANO_DIR = os.environ.get("P2M_MANO_MODEL_DIR", "")


def _has_smpl() -> bool:
    return SMPL_DIR and os.path.exists(
        os.path.join(SMPL_DIR, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))


def _has_mano() -> bool:
    return MANO_DIR and os.path.exists(os.path.join(MANO_DIR, "MANO_RIGHT.pkl"))


@pytest.mark.skipif(not _has_smpl(), reason="real SMPL pkl not present "
                    "(set P2M_SMPL_MODEL_DIR)")
def test_real_smpl_pyramid_sizes():
    from pose2mesh_release_tpu.body.smpl import SMPL, SKELETON, FLIP_PAIRS
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.meshnet import SMPL_BLOCKS

    smpl = SMPL(model_dir=SMPL_DIR)
    assert smpl.face.max() + 1 == 6890
    pyr = build_pyramid(smpl.face, joint_num=17,
                        skeleton=((0, 7), (7, 8), (8, 9), (9, 10), (8, 11),
                                  (11, 12), (12, 13), (8, 14), (14, 15),
                                  (15, 16), (0, 1), (1, 2), (2, 3), (0, 4),
                                  (4, 5), (5, 6)),
                        levels=9)
    # binary-tree padded sizes (reference-exact coarsening)
    padded = tuple(L.shape[0] for L in pyr.mesh_laplacians)
    assert padded == (12288, 6144, 3072, 1536, 768, 384, 192, 96), padded
    # fc layer shape on the converted checkpoint path:
    # joints*64 -> coarsest_mesh*64 (lib/models/meshnet.py:36-37)
    art_tree = pack_pyramid(pyr, smpl.face, ordering="tree",
                            dense_threshold=10_000)
    assert art_tree.mesh_ops[-1].num_vertices == 96
    assert SMPL_BLOCKS[1][0] == 64  # f at the fc boundary
    # rcm deploy artifact: fakes dropped at non-coarsest levels
    art = pack_pyramid(pyr, smpl.face)
    assert art.mesh_ops[0].num_vertices == 6890
    assert art.mesh_ops[-1].num_vertices == 96  # checkpoint-visible level
    assert art.num_vertices == 6890


@pytest.mark.skipif(not _has_mano(), reason="real MANO pkl not present "
                    "(set P2M_MANO_MODEL_DIR)")
def test_real_mano_pyramid_sizes():
    from pose2mesh_release_tpu.body.mano import MANO
    from pose2mesh_release_tpu.graphs.build import build_pyramid

    mano = MANO(model_dir=MANO_DIR)
    assert mano.face.max() + 1 == 778
    pyr = build_pyramid(mano.face, joint_num=21, skeleton=mano.skeleton,
                        levels=6)
    padded = tuple(L.shape[0] for L in pyr.mesh_laplacians)
    assert padded == (1088, 544, 272, 136, 68), padded


@pytest.mark.skipif(not _has_smpl(), reason="real SMPL pkl not present")
def test_real_smpl_lbs_finite():
    """Smoke: the real-template LBS path produces finite meshes."""
    import jax.numpy as jnp

    from pose2mesh_release_tpu.body.model import lbs_forward
    from pose2mesh_release_tpu.body.smpl import SMPL

    smpl = SMPL(model_dir=SMPL_DIR)
    params = smpl.layers["neutral"]
    pose = jnp.zeros((2, 72))
    betas = jnp.zeros((2, 10))
    verts, joints = lbs_forward(params, pose, betas)
    assert verts.shape == (2, 6890, 3)
    assert np.isfinite(np.asarray(verts)).all()


@pytest.mark.slow
@pytest.mark.skipif(not _has_smpl(), reason="real SMPL pkl not present")
@pytest.mark.skipif(not os.path.isdir("/root/reference/lib"),
                    reason="reference checkout not available")
def test_real_smpl_cascade_activation_parity(tmp_path):
    """End-to-end VALUE parity on the REAL 12288-row artifact (VERDICT r3
    item #8): build the real SMPL pyramid, run a reference-format checkpoint
    (random weights) through BOTH the imported reference modules
    (lib/models/{posenet,meshnet}.py) and the converted JAX cascade at fp32,
    and assert mesh/pose activations allclose — not just shapes."""
    import sys
    import types

    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    import scipy.sparse as sp

    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.core.checkpoint import load_checkpoint
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.meshnet import extract_mesh
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    skeleton = ((0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
                (8, 14), (14, 15), (15, 16), (0, 1), (1, 2), (2, 3), (0, 4),
                (4, 5), (5, 6))
    smpl = SMPL(model_dir=SMPL_DIR)
    pyr = build_pyramid(smpl.face, joint_num=17, skeleton=skeleton, levels=9)

    # --- reference modules with the cfg/funcs shim (test_ref_checkpoint) ---
    ns = lambda **kw: types.SimpleNamespace(**kw)
    cfg = ns(DATASET=ns(target_joint_set="human36"),
             MODEL=ns(posenet_pretrained=False, posenet_path=""))
    core_mod = types.ModuleType("core")
    core_config = types.ModuleType("core.config")
    core_config.cfg = cfg
    core_mod.config = core_config
    funcs = types.ModuleType("funcs_utils")
    funcs.load_checkpoint = lambda **kw: None
    saved = {k: sys.modules.get(k) for k in
             ("core", "core.config", "funcs_utils")}
    sys.modules.update({"core": core_mod, "core.config": core_config,
                        "funcs_utils": funcs})
    sys.path.insert(0, "/root/reference/lib")
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    try:
        import models.meshnet as ref_meshnet
        import models.posenet as ref_posenet

        graph_L = list(pyr.mesh_laplacians) + [sp.identity(2, format="csr"),
                                               pyr.joint_laplacian]

        class RefFlat(torch.nn.Module):  # pose2mesh_net.py:8-22
            def __init__(s):
                super().__init__()
                s.pose_lifter = ref_posenet.get_model(
                    17, hid_dim=64, num_layer=2, p_dropout=0.5)
                s.pose2mesh = ref_meshnet.get_model(
                    num_joint_input_chan=5, num_mesh_output_chan=3,
                    graph_L=graph_L)

            def forward(s, pose2d):
                pose3d = s.pose_lifter(pose2d.view(len(pose2d), -1))
                pose3d = pose3d.reshape(-1, 17, 3)
                combine = torch.cat((pose2d, pose3d.detach() / 1000), dim=2)
                return s.pose2mesh(combine), pose3d

        torch.manual_seed(0)
        ref = RefFlat().eval()
        torch.save({"model_state_dict": ref.state_dict(), "epoch": 0,
                    "train_log": [], "test_log": {"joint": []}},
                   str(tmp_path / "final.pth.tar"))

        x = np.random.default_rng(0).standard_normal((2, 17, 2)).astype(np.float32)
        with torch.no_grad():
            t_mesh, t_pose = ref(torch.from_numpy(x))
        t_mesh = t_mesh.numpy()[:, pyr.vertex_slot, :]  # real 6890 rows
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove("/root/reference/lib")
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    payload = load_checkpoint(str(tmp_path))
    variables = {"params": payload["state"]["params"],
                 "batch_stats": payload["state"]["batch_stats"]}
    # production artifact: RCM ordering + banded levels (the conversion is
    # layout-independent; the artifact's own gathers handle the reorder)
    art = pack_pyramid(pyr, smpl.face)
    assert art.mesh_ops[0].num_vertices == 6890  # the real 12288-row pyramid
    model = Pose2Mesh(num_joint=17, posenet_hidden=64, use_pallas=False)
    mesh_dev, pose3d = model.apply(variables, art, jnp.asarray(x), False)
    ours_mesh = np.asarray(extract_mesh(art, mesh_dev))

    np.testing.assert_allclose(np.asarray(pose3d), t_pose.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours_mesh, t_mesh, rtol=1e-3, atol=2e-4)


@pytest.mark.skipif(not _has_smpl(), reason="real SMPL pkl not present")
def test_real_smpl_band_packing():
    """Band packing on the REAL SMPL topology (VERDICT r4 item #8): every
    chip-perf claim so far uses the uv_sphere stand-in; the moment the pkl
    appears this pins down the real mesh's band structure — the fused
    kernels' dispatch eligibility (band kind, T=128, band_k <= 2) and the
    per-level scalar bandwidth / band_k / tile counts that set the hop
    window cost.  Prints the packing so a bench run on the real topology
    (`python bench.py` picks the pkl up automatically via body.loader)
    can be compared against the synthetic-topology numbers."""
    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.ops.pallas_cheby import pallas_supported
    import jax.numpy as jnp

    smpl = SMPL(model_dir=SMPL_DIR)
    skeleton = ((0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12),
                (12, 13), (8, 14), (14, 15), (15, 16), (0, 1), (1, 2),
                (2, 3), (0, 4), (4, 5), (5, 6))
    pyr = build_pyramid(smpl.face, joint_num=17, skeleton=skeleton, levels=9)
    art = pack_pyramid(pyr, smpl.face)
    band = [op for op in art.mesh_ops if op.kind == "band"]
    assert band, "real SMPL pyramid must produce band levels"
    rows = []
    for op in band:
        # fused-kernel eligibility on the real topology
        assert op.block_size == 128
        assert 1 <= op.band_k <= 2, (op.num_vertices, op.band_k)
        assert pallas_supported(op, jnp.zeros((op.num_vertices, 1, 1)))
        # scalar bandwidth consistent with the block structure
        assert op.band_bw <= (op.band_k + 1) * op.block_size - 1
        rows.append((op.num_vertices, op.band_val.shape[1], op.band_k,
                     op.band_bw))
    print(f"real SMPL band packing (V, tiles, band_k, bw): {rows}")
    # the finest level is the real 6890-vertex mesh, tile counts padded to
    # the kernel row-group (pack_pyramid group rounding)
    assert band[0].num_vertices == 6890
    for op in band:
        group = 8 if op.band_k >= 2 else 4
        assert op.band_val.shape[1] % min(group,
                                          op.band_val.shape[1]) == 0
