"""Visualization: 2D/3D skeleton plots, OpenCV-free.

Reference: lib/vis.py (198 LoC; cv2 + matplotlib).  This environment has no
OpenCV, so 2-D overlays draw with matplotlib too; API mirrors the
reference (vis_2d_pose / vis_3d_pose / vis_2d_keypoints).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["vis_2d_pose", "vis_3d_pose", "vis_2d_keypoints"]


def _colors(n: int):
    import matplotlib.cm as cm
    return [cm.hsv(i / max(n, 1)) for i in range(n)]


def vis_2d_pose(pose2d: np.ndarray, img_or_shape, skeleton: Sequence[Tuple[int, int]],
                prefix: str = "pose2d", out_path: Optional[str] = None):
    """Draw a 2-D skeleton over an image array (H, W, 3) or blank canvas."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    if isinstance(img_or_shape, np.ndarray) and img_or_shape.ndim == 3:
        ax.imshow(img_or_shape)
    else:
        h, w = img_or_shape[:2]
        ax.set_xlim(0, w)
        ax.set_ylim(h, 0)
        ax.set_aspect("equal")
    cols = _colors(len(skeleton))
    for c, (a, b) in zip(cols, skeleton):
        ax.plot([pose2d[a, 0], pose2d[b, 0]], [pose2d[a, 1], pose2d[b, 1]],
                color=c, linewidth=2)
    ax.scatter(pose2d[:, 0], pose2d[:, 1], s=8, c="k", zorder=3)
    ax.set_title(prefix)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


vis_2d_keypoints = vis_2d_pose  # reference alias (lib/vis.py:77)


def vis_3d_pose(pose3d: np.ndarray, skeleton: Sequence[Tuple[int, int]],
                prefix: str = "pose3d", out_path: Optional[str] = None):
    """3-D skeleton scatter/line plot (lib/vis.py:146-198)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    cols = _colors(len(skeleton))
    for c, (a, b) in zip(cols, skeleton):
        ax.plot([pose3d[a, 0], pose3d[b, 0]],
                [pose3d[a, 2], pose3d[b, 2]],
                [-pose3d[a, 1], -pose3d[b, 1]], color=c, linewidth=2)
    ax.scatter(pose3d[:, 0], pose3d[:, 2], -pose3d[:, 1], s=8, c="k")
    ax.set_title(prefix)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig
