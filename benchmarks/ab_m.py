"""A/B: row-tiles-per-program (m) for the k=1 deploy group kernels.

Round-3 left `_pick_m` at m=4 for k=1 band levels (m=8 was only the k=2
default), but the round-4 pyramid is k=1 on EVERY band level (bw <= 127
after the bandwidth-minimizing reorder), so the hop-1 halo recompute factor
is (m+2)/m = 1.5 at m=4 vs 1.25 at m=8 — plus per-program overhead halves.
This measures the two biggest production convs through the real dispatch at
P2M_FUSED_M = {4, 8} (fresh interpreter per setting: the env var is read at
trace time).

Usage: python benchmarks/ab_m.py <m>   # prints per-conv us rows
"""
from __future__ import annotations

import json
import os
import sys

m_val = sys.argv[1] if len(sys.argv) > 1 else "4"
os.environ["P2M_FUSED_M"] = m_val

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_p2m"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import H36M_FLIP_PAIRS, H36M_SKELETON, _measure_conv  # noqa: E402


def main():
    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        smpl = SMPL()
        pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                            flip_pairs=H36M_FLIP_PAIRS, levels=9)
        art = pack_pyramid(pyr, smpl.face)

    rows = []
    # (level index into mesh_ops, fin, fout): the two dominant convs plus a
    # mid-size control
    cases = [(0, 128, 128), (1, 128, 128), (2, 256, 128), (3, 256, 256)]
    for li, fin, fout in cases:
        op = art.mesh_ops[li]
        beff, fl = 64, -(-fin // 128) * 128
        fo = -(-fout // 128) * 128
        us = _measure_conv(op, beff, fl, fo, 64) * 1e6
        rows.append({"V": int(op.num_vertices), "conv": f"{fin}->{fout}",
                     "m": int(m_val), "us": round(us, 1)})
        print(f"# m={m_val} V={op.num_vertices} {fin}->{fout}: {us:.1f} us",
              file=sys.stderr, flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
