"""Depth-window point query: the TPU-native replacement for the reference's
``query_depth_point`` CUDA kernel.

Reference semantics (`/root/reference/ops/query_depth_point/
query_depth_point_cuda_kernel.cu:42-64`): for every frustum-section center
(query), scan the frustum's points **in storage order** and pick the *first*
``nsample`` whose depth lies within ``dis_z`` of the query's depth
(strictly ``|z_p - z_q| < dis_z``). Slots beyond the number of matches repeat
the first match's index; with zero matches all slots are index 0. Also return
the (capped) match count per query.

The TPU formulation avoids any sequential scan or scatter: build a composite
sort key ``k(n) = n  if |z_n - z_q| < dis_z else n + N`` and take the
``nsample`` smallest keys with ``lax.top_k``. Because keys of matching points
are their own (unique, ascending) positions, the top-k result *is* the
order-preserving prefix of matches — bit-identical to the CUDA scan — and
top_k maps onto a fast XLA TPU reduction instead of a serial loop.

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
    idx = jnp.where(slot < cnt[..., None], sel, first_hit)
    idx = jnp.where(has_match, idx, 0)
    return idx, cnt


def query_depth_point_grid(z_points: jnp.ndarray, z_ref: jnp.ndarray,
                           dis_z: float, nsample: int, max_run: int):
    """Fast exact query for *sorted* section ladders (the production case).

    Every provider builds its section centers as an ascending z grid (stage-1:
    ``arange(0, max_depth, s) + s/2`` back-projected — rotation to center view
    maps it through an affine function of z, preserving order and near-uniform
    spacing; refine: ``arange(z1, z2, s) + s/2`` along the box axis). For a
    sorted ladder, the sections matching a point form a contiguous index run
    of length <= ``max_run`` (a static bound: ceil(2*dis_z/stride) + 1). That
    turns the dense (M, N) mask + per-section top_k into:

      1. per point: first matching section via ``searchsorted`` (log M), then
         ``max_run`` candidate (section, point) pairs with validity;
      2. one small sort of N*max_run composite keys ``m * N + p`` — ascending
         point order within each section, i.e. exactly the CUDA kernel's
         storage-order scan (`query_depth_point_cuda_kernel.cu:42-64`);
      3. per section: start offset via ``searchsorted`` over the sorted pair
         keys, slot gather, first-hit fill, capped count.

    Bit-identical to :func:`query_depth_point` whenever ``z_ref`` is sorted
    ascending and no point matches more than ``max_run`` sections; ~5-10x
    cheaper on TPU (sort of N*R keys vs top_k over M*N).

    Returns (idx (B, M, K) int32, cnt (B, M) int32).
    """
    B, N = z_points.shape
    M = z_ref.shape[1]
    R = max_run

    def one(zp, zr):  # zp (N,), zr (M,) ascending
        # first section strictly above the window's lower edge
        m_lo = jnp.searchsorted(zr, zp - dis_z, side="right").astype(jnp.int32)  # (N,)
        r = jnp.arange(R, dtype=jnp.int32)  # (R,)
        m_cand = m_lo[:, None] + r[None, :]  # (N, R)
        in_range = m_cand < M
        m_safe = jnp.minimum(m_cand, M - 1)
        valid = in_range & (jnp.abs(zp[:, None] - zr[m_safe]) < dis_z)  # (N, R)

        p = jnp.arange(N, dtype=jnp.int32)
        key = jnp.where(valid, m_safe * N + p[:, None], M * N)  # invalid sorts last
        keys_flat = key.reshape(-1)
        ps_flat = jnp.broadcast_to(p[:, None], (N, R)).reshape(-1)
        keys_sorted, ps_sorted = jax.lax.sort((keys_flat, ps_flat), num_keys=1)

        # per-section segment starts in the sorted pair list
        starts = jnp.searchsorted(keys_sorted, jnp.arange(M, dtype=jnp.int32) * N,
                                  side="left").astype(jnp.int32)  # (M,)
        ends = jnp.searchsorted(keys_sorted, (jnp.arange(M, dtype=jnp.int32) + 1) * N,
                                side="left").astype(jnp.int32)
        cnt_full = ends - starts
        cnt = jnp.minimum(cnt_full, nsample).astype(jnp.int32)

        slot = jnp.arange(nsample, dtype=jnp.int32)
        gather_pos = jnp.minimum(starts[:, None] + slot[None, :], N * R - 1)
        idx = ps_sorted[gather_pos]  # (M, K)
        has = cnt[:, None] > 0
        first_hit = jnp.where(has, idx[:, :1], 0)
        idx = jnp.where(slot[None, :] < cnt[:, None], idx, first_hit)
        idx = jnp.where(has, idx, 0)
        return idx, cnt

    return jax.vmap(one)(z_points, z_ref)


def grid_max_run(dis_z: float, stride: float) -> int:
    """Static bound on sections matched by one point (sorted-grid path)."""
    import math

    return int(math.ceil(2.0 * dis_z / stride)) + 1


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
