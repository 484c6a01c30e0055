"""Fixed-size greedy rotated NMS on device (jit-able).

For fully-fused streaming inference the suppression step can stay on the
TPU instead of round-tripping candidate boxes to the host C++ op the
reference uses (`/root/reference/ops/pybind11/rbbox_iou.py:294`). The
formulation is static-shape: a precomputed (N, N) rotated 3D IoU matrix and
a ``fori_loop`` of ``max_out`` greedy picks over alive masks. Per-frustum
candidate counts are small (<= a few hundred), so the O(N^2) IoU matrix is
cheap on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from frustum_convnet_tpu.core.geometry import box3d_corners
from frustum_convnet_tpu.core.iou import iou_matrix_3d

NEG = -1e30


def greedy_nms_from_iou(iou: jnp.ndarray, scores: jnp.ndarray,
                        valid: jnp.ndarray, thresh: float, max_out: int):
    """Greedy suppression given a precomputed IoU matrix.

    Args: iou (N, N); scores (N,); valid (N,) bool — candidates to consider.
    Returns (keep_idx (max_out,) int32 with -1 padding, keep_count ()).
    """
    n = scores.shape[0]

    def body(i, state):
        alive, keep = state
        masked = jnp.where(alive, scores, NEG)
        j = jnp.argmax(masked)
        ok = masked[j] > NEG
        keep = keep.at[i].set(jnp.where(ok, j.astype(jnp.int32), -1))
        suppress = (iou[j] > thresh) | (jnp.arange(n) == j)
        alive = alive & ~(suppress & ok)
        return alive, keep

    alive0 = valid
    keep0 = jnp.full((max_out,), -1, dtype=jnp.int32)
    _, keep = jax.lax.fori_loop(0, max_out, body, (alive0, keep0))
    return keep, jnp.sum(keep >= 0)


def rotate_nms_3d_device(centers: jnp.ndarray, sizes: jnp.ndarray,
                         headings: jnp.ndarray, scores: jnp.ndarray,
                         valid: jnp.ndarray, thresh: float, max_out: int):
    """3D rotated NMS from box parameters, entirely on device.

    centers (N, 3), sizes (N, 3 lwh), headings (N,), scores (N,),
    valid (N,) bool. Returns (keep_idx (max_out,), keep_count).
    """
    corners = box3d_corners(centers, headings, sizes)
    iou = iou_matrix_3d(corners, corners)
    return greedy_nms_from_iou(iou, scores, valid, thresh, max_out)
