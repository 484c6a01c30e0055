"""Debug visualization: 3D sanity plots of frustums, section ladders, boxes.

Equivalent of the reference's `datasets/check_utils.py:45-108` matplotlib
overlays (not on the training path). Gated on matplotlib availability; every
function returns the figure so callers can save instead of show.
"""

from __future__ import annotations

import numpy as np


def _require_mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: F401

        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError("matplotlib is required for visualization") from e


_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_box3d(ax, corners: np.ndarray, color="g"):
    for a, b in _BOX_EDGES:
        ax.plot(*zip(corners[a], corners[b]), color=color, linewidth=1)


def check_box_frustum(points: np.ndarray, refs, box_corners: np.ndarray,
                      labels: np.ndarray | None = None, save_path: str | None = None):
    """Point cloud + section ladders + GT box in one 3D axes."""
    plt = _require_mpl()
    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(points[:, 0], points[:, 2], -points[:, 1], s=1, c="gray", alpha=0.4)
    colors = ["C0", "C1", "C2", "C3", "C4"]
    for i, r in enumerate(refs):
        ax.scatter(r[:, 0], r[:, 2], -r[:, 1], s=6, c=colors[i % 5], label=f"scale {i + 1}")
    c = np.asarray(box_corners)
    for a, b in _BOX_EDGES:
        ax.plot([c[a, 0], c[b, 0]], [c[a, 2], c[b, 2]], [-c[a, 1], -c[b, 1]],
                color="g", linewidth=1.5)
    if labels is not None:
        pos = refs[1][np.asarray(labels) == 1]
        ax.scatter(pos[:, 0], pos[:, 2], -pos[:, 1], s=40, marker="*", c="red",
                   label="positive sections")
    ax.set_xlabel("x")
    ax.set_ylabel("z (depth)")
    ax.set_zlabel("-y (up)")
    ax.legend(loc="upper right", fontsize=8)
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def check_norm(points: np.ndarray, seg_labels: np.ndarray,
               box_corners: np.ndarray, save_path: str | None = None):
    """Normalized frustum with per-point fg/bg coloring."""
    plt = _require_mpl()
    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d")
    fg = np.asarray(seg_labels) > 0
    ax.scatter(points[~fg, 0], points[~fg, 2], -points[~fg, 1], s=1, c="gray", alpha=0.3)
    ax.scatter(points[fg, 0], points[fg, 2], -points[fg, 1], s=3, c="red")
    c = np.asarray(box_corners)
    for a, b in _BOX_EDGES:
        ax.plot([c[a, 0], c[b, 0]], [c[a, 2], c[b, 2]], [-c[a, 1], -c[b, 1]],
                color="g", linewidth=1.5)
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig
