"""Vectorized rotated-box IoU in JAX (BEV and 3D), TPU-friendly.

Replaces the reference's boost::geometry polygon IoU
(`/root/reference/ops/pybind11/box_ops.h:24-260`) with a fully vectorized
candidate-vertex formulation that needs no sequential polygon clipping:

1. candidates = {vertices of A inside B} + {vertices of B inside A} +
   {all 16 edge-edge intersection points}, each with a validity mask;
2. order valid candidates by angle around their centroid;
3. shoelace over the ordered ring -> intersection area.

Everything is fixed-shape (24-slot candidate buffer) so it vmaps/jits cleanly
and runs on the VPU; no host round-trip like the reference's per-step
`.detach().cpu().numpy()` metric (`models/det_base.py:495`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _ensure_ccw(quad: jnp.ndarray) -> jnp.ndarray:
    """Orient a quad (4, 2) counter-clockwise (flip if signed area < 0)."""
    x, y = quad[:, 0], quad[:, 1]
    area2 = jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
    return jnp.where(area2 >= 0, quad, quad[::-1])


def _points_in_quad(pts: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """pts (P, 2) inside CCW quad (4, 2) -> bool (P,). Inclusive.

    The on-edge tolerance must scale with the magnitude of the cross-product
    terms: float32 ulp at coordinate~70 products is far above any absolute
    epsilon, and backend-dependent FMA fusion flips the sign of exact-zero
    crosses (a quad vertex must always test inside its own quad).
    """
    a = quad  # (4, 2)
    b = jnp.roll(quad, -1, axis=0)
    e = b - a  # (4, 2)
    d = pts[:, None, :] - a[None, :, :]  # (P, 4, 2)
    t1 = e[None, :, 0] * d[:, :, 1]
    t2 = e[None, :, 1] * d[:, :, 0]
    cross = t1 - t2
    tol = 1e-5 * (jnp.abs(t1) + jnp.abs(t2) + 1.0)
    return jnp.all(cross >= -tol, axis=1)


def _edge_intersections(qa: jnp.ndarray, qb: jnp.ndarray):
    """All 16 segment-segment intersection points between two quads.

    Returns (pts (16, 2), valid (16,)).
    """
    p0 = jnp.repeat(qa, 4, axis=0)  # (16, 2) edge starts of A
    p1 = jnp.repeat(jnp.roll(qa, -1, axis=0), 4, axis=0)
    q0 = jnp.tile(qb, (4, 1))
    q1 = jnp.tile(jnp.roll(qb, -1, axis=0), (4, 1))
    d1 = p1 - p0
    d2 = q1 - q0
    denom = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    dq = q0 - p0
    t = (dq[:, 0] * d2[:, 1] - dq[:, 1] * d2[:, 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    u = (dq[:, 0] * d1[:, 1] - dq[:, 1] * d1[:, 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    valid = (jnp.abs(denom) >= _EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p0 + t[:, None] * d1
    return pts, valid


def quad_intersection_area(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quads (4, 2) each. Fixed-shape."""
    qa = _ensure_ccw(qa)
    qb = _ensure_ccw(qb)
    in_b = _points_in_quad(qa, qb)  # (4,)
    in_a = _points_in_quad(qb, qa)  # (4,)
    inter_pts, inter_valid = _edge_intersections(qa, qb)  # (16, 2), (16,)

    pts = jnp.concatenate([qa, qb, inter_pts], axis=0)  # (24, 2)
    valid = jnp.concatenate([in_b, in_a, inter_valid], axis=0)  # (24,)

    num = jnp.sum(valid)
    centroid = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / jnp.maximum(num, 1)
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid slots sort last
    order = jnp.argsort(ang)
    spts = pts[order]  # valid ring first, sorted by angle

    idx = jnp.arange(24)
    nxt = jnp.where(idx + 1 < num, idx + 1, 0)
    ring_mask = idx < num
    x, y = spts[:, 0], spts[:, 1]
    terms = x * y[nxt] - x[nxt] * y
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(ring_mask, terms, 0.0)))
    return jnp.where(num >= 3, area, 0.0)


def _quad_area(q: jnp.ndarray) -> jnp.ndarray:
    x, y = q[:, 0], q[:, 1]
    return 0.5 * jnp.abs(jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y))


def bev_polygon(corners3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 3) reference-order corners -> (..., 4, 2) (x, z) footprint."""
    return corners3d[..., :4, ::2]  # last-dim stride 2 picks (x, z)


def iou_pair_3d(corners1: jnp.ndarray, corners2: jnp.ndarray):
    """Paired (BEV IoU, 3D IoU) for (N, 8, 3) vs (N, 8, 3) camera-frame boxes.

    On-device replacement for the reference training metric
    `rbbox_iou_3d_pair` (`ops/pybind11/box_ops.h:173-260`,
    called at `models/det_base.py:495`). Returns two (N,) arrays.
    """

    def one(c1, c2):
        p1, p2 = bev_polygon(c1), bev_polygon(c2)
        inter = quad_intersection_area(p1, p2)
        a1, a2 = _quad_area(_ensure_ccw(p1)), _quad_area(_ensure_ccw(p2))
        union = a1 + a2 - inter
        iou_bev = jnp.where(union > 0, inter / jnp.maximum(union, _EPS), 0.0)

        ymin1, ymax1 = jnp.min(c1[:, 1]), jnp.max(c1[:, 1])
        ymin2, ymax2 = jnp.min(c2[:, 1]), jnp.max(c2[:, 1])
        y_ov = jnp.maximum(0.0, jnp.minimum(ymax1, ymax2) - jnp.maximum(ymin1, ymin2))
        inter3d = inter * y_ov
        union3d = a1 * (ymax1 - ymin1) + a2 * (ymax2 - ymin2) - inter3d
        iou3d = jnp.where(union3d > 0, inter3d / jnp.maximum(union3d, _EPS), 0.0)
        return iou_bev, iou3d

    return jax.vmap(one)(corners1, corners2)


def iou_matrix_bev(polys1: jnp.ndarray, polys2: jnp.ndarray) -> jnp.ndarray:
    """Full BEV IoU matrix between (N, 4, 2) and (K, 4, 2) polygons -> (N, K)."""

    def one_vs_all(p1):
        def one(p2):
            inter = quad_intersection_area(p1, p2)
            a1 = _quad_area(_ensure_ccw(p1))
            a2 = _quad_area(_ensure_ccw(p2))
            union = a1 + a2 - inter
            return jnp.where(union > 0, inter / jnp.maximum(union, _EPS), 0.0)

        return jax.vmap(one)(polys2)

    return jax.vmap(one_vs_all)(polys1)


def iou_matrix_3d(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Full 3D IoU matrix between (N, 8, 3) and (K, 8, 3) boxes -> (N, K)."""

    def one_vs_all(c1):
        def one(c2):
            _, iou3d = iou_pair_3d(c1[None], c2[None])
            return iou3d[0]

        return jax.vmap(one)(corners2)

    return jax.vmap(one_vs_all)(corners1)
