"""Device-side (JAX) 3D geometry — jit-able twins of ``geometry_np``.

All functions are batched/vmappable, use only static shapes, and avoid
data-dependent control flow so they fuse cleanly under XLA on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_points_along_y(pc: jnp.ndarray, rot_angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate points (..., N, C>=3) about y by per-batch angles (...,).

    x' = cos*x - sin*z ; z' = sin*x + cos*z (reference sign convention,
    `datasets/data_utils.py:7-21`).
    """
    c = jnp.cos(rot_angle)[..., None]
    s = jnp.sin(rot_angle)[..., None]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    xz = jnp.stack([c * x - s * z, s * x + c * z], axis=-1)
    rest = pc[..., 3:]
    return jnp.concatenate([xz[..., 0:1], y[..., None], xz[..., 1:2], rest], axis=-1)


def box3d_corners(centers: jnp.ndarray, headings: jnp.ndarray, sizes: jnp.ndarray) -> jnp.ndarray:
    """Differentiable 8-corner computation, (N, 3)+(N,)+(N, 3 lwh) -> (N, 8, 3).

    Corner ordering matches the reference (`models/model_util.py:48-72`):
    bottom (y=+h/2) face first, x: + + - - + + - -, z: + - - + + - - +.
    """
    l, w, h = sizes[..., 0], sizes[..., 1], sizes[..., 2]
    sx = jnp.asarray([1, 1, -1, -1, 1, 1, -1, -1], dtype=sizes.dtype)
    sy = jnp.asarray([1, 1, 1, 1, -1, -1, -1, -1], dtype=sizes.dtype)
    sz = jnp.asarray([1, -1, -1, 1, 1, -1, -1, 1], dtype=sizes.dtype)
    x = 0.5 * l[..., None] * sx  # (N, 8)
    y = 0.5 * h[..., None] * sy
    z = 0.5 * w[..., None] * sz
    c, s = jnp.cos(headings), jnp.sin(headings)
    # roty(heading) applied row-wise: x' = c*x + s*z ; z' = -s*x + c*z
    xr = c[..., None] * x + s[..., None] * z
    zr = -s[..., None] * x + c[..., None] * z
    corners = jnp.stack([xr, y, zr], axis=-1)  # (N, 8, 3)
    return corners + centers[..., None, :]


def points_in_box3d(points: jnp.ndarray, center: jnp.ndarray, size: jnp.ndarray,
                    heading: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Inclusive inside-test of points (..., N, 3) against one box per batch.

    center (..., 3), size (..., 3 lwh), heading (...,) -> bool (..., N).
    Replaces the reference's scipy-Delaunay ``in_hull`` with an equivalent
    oriented-box half-space test.
    """
    l, w, h = size[..., 0], size[..., 1], size[..., 2]
    d = points[..., :3] - center[..., None, :]
    c, s = jnp.cos(heading)[..., None], jnp.sin(heading)[..., None]
    # local = roty(heading)^T @ d
    lx = c * d[..., 0] - s * d[..., 2]
    ly = d[..., 1]
    lz = s * d[..., 0] + c * d[..., 2]
    return (
        (jnp.abs(lx) <= 0.5 * l[..., None] + eps)
        & (jnp.abs(ly) <= 0.5 * h[..., None] + eps)
        & (jnp.abs(lz) <= 0.5 * w[..., None] + eps)
    )


def project_image_to_rect(uv_depth: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """Back-project (..., N, 3) pixel+depth through per-batch P (..., 3, 4)."""
    c_u, c_v = P[..., 0, 2], P[..., 1, 2]
    f_u, f_v = P[..., 0, 0], P[..., 1, 1]
    b_x = P[..., 0, 3] / (-f_u)
    b_y = P[..., 1, 3] / (-f_v)
    z = uv_depth[..., 2]
    x = (uv_depth[..., 0] - c_u[..., None]) * z / f_u[..., None] + b_x[..., None]
    y = (uv_depth[..., 1] - c_v[..., None]) * z / f_v[..., None] + b_y[..., None]
    return jnp.stack([x, y, z], axis=-1)
