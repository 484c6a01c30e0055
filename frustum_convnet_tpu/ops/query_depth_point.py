"""Depth-window point query: the TPU-native replacement for the reference's
``query_depth_point`` CUDA kernel.

Reference semantics (`/root/reference/ops/query_depth_point/
query_depth_point_cuda_kernel.cu:42-64`): for every frustum-section center
(query), scan the frustum's points **in storage order** and pick the *first*
``nsample`` whose depth lies within ``dis_z`` of the query's depth
(strictly ``|z_p - z_q| < dis_z``). Slots beyond the number of matches repeat
the first match's index; with zero matches all slots are index 0. Also return
the (capped) match count per query.

This module holds the portable pure-XLA formulation (used on CPU and as the
reference for tests) plus the numpy oracle: build a composite sort key
``k(n) = n  if |z_n - z_q| < dis_z else n + N`` and take the ``nsample``
smallest keys with ``lax.top_k``. Because keys of matching points are their
own (unique, ascending) positions, the top-k result *is* the
order-preserving prefix of matches — bit-identical to the CUDA scan. The
production TPU path is the Pallas kernel in
``frustum_convnet_tpu/ops/select_pallas.py`` (~6x faster; same outputs),
dispatched via ``select_pallas.group_depth_point_auto`` /
``group_depth_point_multi_auto`` (the model entry points).

Gather indices (not masked features) are what the reference feeds BatchNorm,
so downstream statistics see the same duplicated points; we reproduce that
exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def query_depth_point(z_points: jnp.ndarray, z_ref: jnp.ndarray, dis_z: float,
                      nsample: int):
    """Select per-query gather indices by depth window.

    Args:
      z_points: (B, N) depth (z) of frustum points, in storage order.
      z_ref:    (B, M) depth of section centers (queries).
      dis_z:    half-window; a point matches iff ``|z_p - z_q| < dis_z``.
      nsample:  number of slots per query (K). Must satisfy K <= N.

    Returns:
      idx: (B, M, K) int32 gather indices into the N axis.
      cnt: (B, M) int32 number of matches, capped at K.
    """
    n = z_points.shape[-1]
    mask = jnp.abs(z_points[:, None, :] - z_ref[:, :, None]) < dis_z  # (B, M, N)
    arange = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, arange, arange + n)  # unique keys; matches sort first
    neg_sorted, _ = jax.lax.top_k(-key, nsample)  # K smallest keys, ascending
    sel = -neg_sorted  # (B, M, K)
    cnt = jnp.minimum(jnp.sum(mask, axis=-1), nsample).astype(jnp.int32)
    has_match = cnt[..., None] > 0
    first_hit = jnp.where(has_match, sel[..., :1], 0)
    slot = jnp.arange(nsample, dtype=jnp.int32)
    # cnt == 0 makes every slot take first_hit, which has_match already
    # forced to 0 — no extra masking needed
    idx = jnp.where(slot < cnt[..., None], sel, first_hit)
    return idx, cnt


def group_points(points: jnp.ndarray, ref: jnp.ndarray, idx: jnp.ndarray):
    """Gather point channels per (query, slot) and center xyz on the query.

    Args:
      points: (B, N, C) with xyz in channels 0:3 (extra feat channels after).
      ref:    (B, M, 3) query centers.
      idx:    (B, M, K) gather indices from :func:`query_depth_point`.

    Returns:
      (B, M, K, C) grouped features; channels 0:3 are xyz minus query center
      (matching the reference's center-subtract, `models/det_base.py:74-93`).
    """

    def gather_one(p, i):  # p (N, C), i (M, K)
        return p[i]  # (M, K, C)

    grouped = jax.vmap(gather_one)(points, idx)  # (B, M, K, C)
    centered_xyz = grouped[..., :3] - ref[:, :, None, :]
    return jnp.concatenate([centered_xyz, grouped[..., 3:]], axis=-1)


def query_depth_point_np(z_points: np.ndarray, z_ref: np.ndarray, dis_z: float,
                         nsample: int):
    """Brute-force oracle with the exact CUDA scan semantics (for tests)."""
    b, n = z_points.shape
    m = z_ref.shape[1]
    idx = np.zeros((b, m, nsample), dtype=np.int32)
    cnt = np.zeros((b, m), dtype=np.int32)
    for bi in range(b):
        for mi in range(m):
            c = 0
            for k in range(n):
                if c == nsample:
                    break
                if abs(z_points[bi, k] - z_ref[bi, mi]) < dis_z:
                    if c == 0:
                        idx[bi, mi, :] = k
                    idx[bi, mi, c] = k
                    c += 1
            cnt[bi, mi] = c
    return idx, cnt
