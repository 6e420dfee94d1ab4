"""Training-curve plots (lib/funcs_utils.py:131-151 equivalent).

Writes loss/error PDF curves into <output_dir>/graph like the reference's
save_plot; headless (Agg) and dependency-light.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Optional, Sequence

__all__ = ["save_plot"]


def save_plot(values: Sequence[float], out_dir: str, *,
              title: str = "loss", ylabel: str = "loss",
              epoch: Optional[int] = None) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots()
    ax.plot(range(1, len(values) + 1), list(values), marker="o")
    ax.set_xlabel("epoch")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    suffix = f"_{epoch}" if epoch is not None else ""
    path = osp.join(out_dir, f"{title}{suffix}.pdf")
    fig.savefig(path)
    plt.close(fig)
    return path
