"""Box parameter codecs: heading-bin, size-template, and center offset coding.

jit-able jnp implementations of the reference codecs
(`/root/reference/models/box_transform.py:5-65`), plus numpy variants used by
the host-side decode path. Numerics are identical:

* angle_encode: wrap gt to [0, 2pi), shift by half a bin, bin id =
  floor(shifted / bin_width), residual normalized by half-bin-width.
* angle_decode: bin_id * bin_width + residual * half-bin-width, optionally
  wrapped to (-pi, pi] ("label format").
* size codec: residual relative to the per-class mean size template.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def angle_encode(gt_angle: jnp.ndarray, num_bins: int = 12):
    """(...,) angle -> (bin id int32, normalized residual)."""
    two_pi = 2.0 * np.pi
    per_class = two_pi / num_bins
    a = jnp.mod(gt_angle, two_pi)
    shifted = jnp.mod(a + per_class / 2.0, two_pi)
    cls = jnp.floor(shifted / per_class).astype(jnp.int32)
    res = shifted - (cls.astype(shifted.dtype) * per_class + per_class / 2.0)
    return cls, res / (per_class / 2.0)


def angle_decode(res_norm: jnp.ndarray, cls_id: jnp.ndarray, num_bins: int = 12,
                 to_label_format: bool = True) -> jnp.ndarray:
    """res_norm (..., num_bins), cls_id (...,) int -> angle (...,)."""
    per_class = 2.0 * np.pi / num_bins
    res_sel = jnp.take_along_axis(res_norm, cls_id[..., None], axis=-1)[..., 0]
    angle = cls_id.astype(res_norm.dtype) * per_class + res_sel * (per_class / 2.0)
    if to_label_format:
        angle = jnp.where(angle > np.pi, angle - 2.0 * np.pi, angle)
    return angle


def size_encode(gt_size: jnp.ndarray, mean_size_array: jnp.ndarray,
                size_cls: jnp.ndarray) -> jnp.ndarray:
    """gt (..., 3), templates (S, 3), cls (...,) -> normalized residual (..., 3)."""
    ex = mean_size_array[size_cls]
    return (gt_size - ex) / ex

def size_decode(res_norm: jnp.ndarray, mean_size_array: jnp.ndarray,
                size_cls: jnp.ndarray) -> jnp.ndarray:
    """res_norm (..., S, 3), cls (...,) -> size (..., 3)."""
    sel = jnp.take_along_axis(
        res_norm, size_cls[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    ex = mean_size_array[size_cls]
    return sel * ex + ex


def center_encode(gt_center: jnp.ndarray, ref_center: jnp.ndarray) -> jnp.ndarray:
    return gt_center - ref_center


def center_decode(ref_center: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    return ref_center + offset


# ---------------------------------------------------------------------------
# numpy variants (host-side decode/oracles)
# ---------------------------------------------------------------------------

def angle_encode_np(gt_angle, num_bins: int = 12):
    two_pi = 2.0 * np.pi
    per_class = two_pi / num_bins
    a = np.mod(gt_angle, two_pi)
    shifted = np.mod(a + per_class / 2.0, two_pi)
    cls = np.floor(shifted / per_class).astype(np.int64)
    res = shifted - (cls * per_class + per_class / 2.0)
    return cls, res / (per_class / 2.0)


def angle_decode_np(res_norm_sel, cls_id, num_bins: int = 12, to_label_format: bool = True):
    """Already-selected residual (...,) + bin id (...,) -> angle."""
    per_class = 2.0 * np.pi / num_bins
    angle = np.asarray(cls_id, dtype=np.float64) * per_class + res_norm_sel * (per_class / 2.0)
    angle = np.where(angle > np.pi, angle - 2.0 * np.pi, angle) if to_label_format else angle
    return angle
