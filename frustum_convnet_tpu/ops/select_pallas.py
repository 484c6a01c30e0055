"""Pallas TPU kernels for the depth-window point query and fused grouping.

Replaces the XLA ``top_k`` + gather formulation on TPU. Reference semantics
(`/root/reference/ops/query_depth_point/query_depth_point_cuda_kernel.cu:42-64`
and the gather + center-subtract consumer `models/det_base.py:74-93`): per
section center, scan points in storage order, keep the first ``nsample`` with
``|z_p - z_q| < dis_z``; pad unused slots with the first hit; emit the capped
match count; gather the selected points' channels and subtract the section
center from xyz.

Why a kernel: profiling (BENCH_NOTES.md) shows selection + gather dominate
the whole model — XLA's per-section ``top_k`` costs ~3 ms/scale/batch and the
(B, M, K, C) gather another ~5 ms/batch. The TPU formulation, per
(batch row, section tile), entirely in VMEM:

  1. ``mask[m, n]`` — depth-window compare (VPU, (MT, Np) in one tile),
  2. ``S[m, n]`` — inclusive running match count along n, via ONE int8 MXU
     matmul against the upper-triangular ones matrix (exact: 0/1 products,
     int32 accumulation, counts <= Np),
  3. slot k's index = first n with ``S[m, n] == k + 1`` — two-level binary
     search over the monotone S row: a 128-lane coarse row (S at stride
     Np/128) probed with single-tile ``tpu.dynamic_gather``s, then log2(
     Np/128) composite probes (static loop over the Np/128 tiles,
     within-tile gather by ``probe % 128``, select by ``probe // 128``),
  4. (fused variant) the same composite gather pulls each channel's value at
     the selected indices and subtracts the section center from xyz;
     ``group_depth_point_multi`` runs EVERY scale of the model in one
     launch via per-section dis_z/nsample planes.

No sort, no searchsorted, no ordering assumption on the section ladder —
padded refine ladders (duplicated tail sections) are handled exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _gather_lanes(src, pos, n_tiles):
    """src (MT, Np) gathered at per-lane positions pos (MT, L), Np = 128*T.

    Mosaic's dynamic_gather needs index shape == source-slice shape, so wide
    position rows (L > 128, e.g. nsample 256) are processed 128 lanes at a
    time.
    """
    outs = []
    for j in range(pos.shape[1] // _LANES):
        p = pos[:, j * _LANES:(j + 1) * _LANES]
        tile_of = p // _LANES
        local = p - tile_of * _LANES
        out = None
        for t in range(n_tiles):
            got = jnp.take_along_axis(src[:, t * _LANES:(t + 1) * _LANES],
                                      local, axis=1)
            out = got if out is None else jnp.where(tile_of == t, got, out)
        outs.append(out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _select_core(zp, zr, dis_z, nsample, n_pow2, L, k_chunks=None):
    """Shared kernel body: (idx, cnt) for one (MT,) tile of sections.

    zp (1, Np) f32 (padded +inf); zr (MT, 1) f32 (padded -inf).
    ``dis_z`` may be a python float or a per-section (MT, 1) plane;
    ``nsample`` a python int or a per-section (MT,) plane (then ``k_chunks``
    — slot lanes / 128 — must be given statically). ``L`` is the
    (Np, Np + 128) int8 matrix driving the MXU scan (int32 accumulation —
    exact, counts <= Np, 2x the bf16 MXU rate on v5e): upper-triangular
    ones for the running count S, plus 128 block-end summary columns that
    yield the coarse binary-search row in the SAME matmul (``_scan_matrix``).
    """
    mt = zr.shape[0]
    n_tiles = n_pow2 // _LANES
    if k_chunks is None:
        k_chunks = -(-nsample // _LANES)

    # depth-window hit mask (strict <, matching the CUDA kernel); padded
    # points are +inf and padded sections -inf, so neither ever matches
    mask = jnp.abs(zp - zr) < dis_z  # (MT, Np)

    # inclusive running match count along n, as ONE MXU matmul against the
    # upper-triangular ones matrix: S[m, j] = sum_n mask[m, n] * [n <= j].
    # int8 0/1 products accumulated in int32 are exact (counts <= Np), run
    # at 2x the bf16 MXU rate on v5e, and the matmul is ~10x faster than a
    # lane-roll Hillis-Steele scan (pltpu.roll across a 1024-lane row is
    # the kernel's former hot spot).
    s_full = jax.lax.dot_general(mask.astype(jnp.int8), L,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
    s = s_full[:, :n_pow2]

    cnt = jnp.minimum(s[:, n_pow2 - 1], nsample)  # (MT,)

    # slot k resolves to the first n with S[n] >= k + 1 (S increments
    # exactly at matches, so that n IS the (k+1)-th match). Two-level
    # search: the coarse 128-lane row (S at stride g = Np/128) falls out of
    # the scan matmul's 128 summary columns for free, and is binary-searched
    # with cheap SINGLE-tile probes; the remaining log2(g) in-range steps
    # use composite probes. This cuts composite (8-tile) gathers from 10
    # per chunk to log2(g), with none spent building the coarse row.
    g_stride = n_pow2 // _LANES
    coarse = s_full[:, n_pow2:]
    idx_parts = []
    for kc in range(0, k_chunks * _LANES, _LANES):
        slot = jax.lax.broadcasted_iota(jnp.int32, (mt, _LANES), 1) + kc
        target = slot + 1  # slot k targets the (k+1)-th match
        posc = jnp.zeros((mt, _LANES), jnp.int32)
        step = _LANES
        while step > 1:
            step //= 2
            val = jnp.take_along_axis(coarse, posc + step - 1, axis=1)
            posc = jnp.where(val < target, posc + step, posc)
        pos = posc * g_stride
        step = g_stride
        while step > 1:
            step //= 2
            # last index of the candidate half, < Np
            val = _gather_lanes(s, pos + step - 1, n_tiles)
            pos = jnp.where(val < target, pos + step, pos)
        idx_parts.append(pos)

    pos = jnp.concatenate(idx_parts, axis=1) if len(idx_parts) > 1 else idx_parts[0]
    # slots beyond cnt repeat the first hit; no hit at all selects index 0
    slot = jax.lax.broadcasted_iota(jnp.int32, (mt, pos.shape[1]), 1)
    first = jnp.where(cnt[:, None] > 0, pos[:, 0:1], 0)
    idx = jnp.where(slot < cnt[:, None], pos, first)
    # idx is lane-padded to a 128 multiple: slots >= nsample are first-hit
    # fills, safe to gather from and sliced off by the caller
    return idx, cnt


def _select_kernel(zp_ref, zr_ref, L_ref, idx_ref, cnt_ref, *, dis_z, nsample, n_pow2):
    idx, cnt = _select_core(zp_ref[0], zr_ref[0], dis_z, nsample, n_pow2, L_ref[:])
    idx_ref[0] = idx[:, :nsample]
    cnt_ref[0] = cnt[:, None]


def _gather_grouped(chan_refs, idx, center, row_scratch, n_pow2):
    """Gather every channel row at ``idx`` and center-subtract xyz.

    Shared post-select body of the single- and multi-scale group kernels.
    """
    mt = idx.shape[0]
    n_tiles = n_pow2 // _LANES
    zeros = jnp.zeros((mt, n_pow2), jnp.float32)
    parts = []
    for c in range(len(chan_refs)):
        # round-trip the broadcast row through VMEM scratch: Mosaic's
        # dynamic_gather / lane-slice crash on replicated-layout operands
        row_scratch[:] = zeros + chan_refs[c][0]
        g = _gather_lanes(row_scratch[:], idx, n_tiles)  # (MT, Kpad)
        if c < 3:
            g = g - center[c]  # center-subtract xyz
        parts.append(g)
    return jnp.concatenate(parts, axis=1)  # (MT, C*Kpad)


def _group_kernel(*refs, dis_z, nsample, n_pow2, n_channels):
    """Fused select + gather + center-subtract.

    refs: C channel inputs (1, 1, Np) f32 each (xyz first, z = channel 2,
    z carrying the +inf padding), 3 section-center coordinate inputs
    (1, MT, 1) f32 each (x, y, z — z doubles as the query depth); outputs
    grouped (1, MT, C*Kpad) f32 channel-major segments (slot lanes padded to
    a 128 multiple, sliced off by the caller), cnt (1, MT, 1) i32.
    """
    chan_refs = refs[:n_channels]
    rx_ref, ry_ref, rz_ref, L_ref = refs[n_channels:n_channels + 4]
    grouped_ref, cnt_ref, row_scratch = refs[n_channels + 4:]
    idx, cnt = _select_core(chan_refs[2][0], rz_ref[0], dis_z, nsample, n_pow2,
                            L_ref[:])
    cnt_ref[0] = cnt[:, None]
    grouped_ref[0] = _gather_grouped(
        chan_refs, idx, (rx_ref[0], ry_ref[0], rz_ref[0]), row_scratch, n_pow2)


def _scan_matrix(n_pow2: int) -> jnp.ndarray:
    """(Np, Np + 128) int8 scan matrix for the MXU running-count matmul.

    Columns 0:Np are upper-triangular ones (incl. diagonal) producing the
    inclusive running match count S; the last 128 columns are block-end
    summaries ``[n <= l*g + g - 1]`` (g = Np/128) producing the coarse
    binary-search row S[::g] in the same matmul — one composite gather
    fewer per program. Passed as a kernel input with a constant block
    index, so Pallas DMAs it once and reuses it across grid steps."""
    r = np.arange(n_pow2)
    tri = r[:, None] <= r[None, :]
    g = n_pow2 // _LANES
    ends = np.arange(_LANES) * g + g - 1
    coarse = r[:, None] <= ends[None, :]
    return jnp.asarray(np.concatenate([tri, coarse], axis=1), jnp.int8)


def _pad_inputs(z_points, z_ref, mt):
    b, n = z_points.shape
    m = z_ref.shape[1]
    n_pow2 = max(_LANES, 1 << (n - 1).bit_length())
    m_pad = -m % mt
    big = jnp.float32(np.finfo(np.float32).max)
    zp = jnp.pad(z_points.astype(jnp.float32), ((0, 0), (0, n_pow2 - n)),
                 constant_values=big)
    zr = jnp.pad(z_ref.astype(jnp.float32), ((0, 0), (0, m_pad)),
                 constant_values=-big)
    return zp, zr, n_pow2, m_pad


def _prep_group_inputs(points, ref, mt):
    """Channel rows + section-center planes for the grouping kernels.

    Shared by the single- and multi-scale wrappers: one (B, 1, Np) input per
    point channel (channel 2 carries the +inf z padding) and three
    (B*m_tiles, MT, 1) section-center coordinate planes — the z plane is
    ``zr`` (it carries the -inf section padding and doubles as the query).
    """
    b, n, c = points.shape
    zp, zr, n_pow2, m_pad = _pad_inputs(points[..., 2], ref[..., 2], mt)
    m_tiles = (ref.shape[1] + m_pad) // mt

    chans = []
    for ci in range(c):
        if ci == 2:
            chans.append(zp.reshape(b, 1, n_pow2))
        else:
            chans.append(jnp.pad(points[..., ci], ((0, 0), (0, n_pow2 - n)))
                         .reshape(b, 1, n_pow2))
    ref_pad = jnp.pad(ref.astype(jnp.float32), ((0, 0), (0, m_pad), (0, 0)))
    coords = [ref_pad[..., 0].reshape(b * m_tiles, mt, 1),
              ref_pad[..., 1].reshape(b * m_tiles, mt, 1),
              zr.reshape(b * m_tiles, mt, 1)]
    return chans, coords, n_pow2, m_pad, m_tiles


def query_depth_point_pallas(z_points: jnp.ndarray, z_ref: jnp.ndarray,
                             dis_z: float, nsample: int,
                             interpret: bool = False,
                             m_tile: int = 128):
    """Drop-in TPU-kernel equivalent of ``query_depth_point`` (idx, cnt).

    z_points (B, N) f32; z_ref (B, M) f32 in ANY order (no sorted-ladder
    assumption). Returns idx (B, M, K) i32, cnt (B, M) i32, bit-identical to
    the CUDA-scan oracle.
    """
    b, n = z_points.shape
    m = z_ref.shape[1]
    mt = m_tile
    zp, zr, n_pow2, m_pad = _pad_inputs(z_points, z_ref, mt)
    m_tiles = (m + m_pad) // mt
    zp3 = zp.reshape(b, 1, n_pow2)
    zr3 = zr.reshape(b * m_tiles, mt, 1)

    kernel = functools.partial(_select_kernel, dis_z=float(dis_z),
                               nsample=nsample, n_pow2=n_pow2)
    idx, cnt = pl.pallas_call(
        kernel,
        grid=(b, m_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_pow2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, 1), lambda i, j, mts=m_tiles: (i * mts + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pow2, n_pow2 + _LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, mt, nsample),
                         lambda i, j, mts=m_tiles: (i * mts + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, 1), lambda i, j, mts=m_tiles: (i * mts + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * m_tiles, mt, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b * m_tiles, mt, 1), jnp.int32),
        ),
        interpret=interpret,
    )(zp3, zr3, _scan_matrix(n_pow2))
    idx = idx.reshape(b, m + m_pad, nsample)[:, :m]
    cnt = cnt.reshape(b, m + m_pad)[:, :m]
    return idx, cnt


def group_depth_point_pallas(points: jnp.ndarray, ref: jnp.ndarray,
                             dis_z: float, nsample: int,
                             interpret: bool = False,
                             m_tile: int = 128):
    """Fused select + gather + center-subtract (the model's grouping stage).

    points (B, N, C) f32 with xyz in channels 0:3; ref (B, M, 3) f32 section
    centers in any order. Returns grouped (B, M, K, C) f32 — channels 0:3 are
    xyz minus the section center, exactly ``group_points(points, ref,
    query_depth_point(...))`` — and cnt (B, M) i32.
    """
    b, n, c = points.shape
    m = ref.shape[1]
    mt = m_tile
    chans, coords, n_pow2, m_pad, m_tiles = _prep_group_inputs(points, ref, mt)

    k_pad = -nsample % _LANES + nsample
    kernel = functools.partial(_group_kernel, dis_z=float(dis_z),
                               nsample=nsample, n_pow2=n_pow2, n_channels=c)
    tile_spec = pl.BlockSpec((1, mt, 1),
                             lambda i, j, mts=m_tiles: (i * mts + j, 0, 0),
                             memory_space=pltpu.VMEM)
    L_spec = pl.BlockSpec((n_pow2, n_pow2 + _LANES), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    grouped, cnt = pl.pallas_call(
        kernel,
        grid=(b, m_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_pow2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(c)
        ] + [tile_spec] * 3 + [L_spec],
        out_specs=(
            pl.BlockSpec((1, mt, c * k_pad),
                         lambda i, j, mts=m_tiles: (i * mts + j, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * m_tiles, mt, c * k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * m_tiles, mt, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((mt, n_pow2), jnp.float32)],
        interpret=interpret,
    )(*chans, *coords, _scan_matrix(n_pow2))
    # channel-major padded segments -> (B, M, K, C)
    grouped = grouped.reshape(b, m + m_pad, c, k_pad)[:, :m, :, :nsample]
    grouped = jnp.transpose(grouped, (0, 1, 3, 2))
    cnt = cnt.reshape(b, m + m_pad)[:, :m]
    return grouped, cnt


def _group_multi_kernel(*refs, n_pow2, n_channels, k_pad):
    """Fused multi-scale select + gather + center-subtract.

    Like ``_group_kernel`` but ``dis_z`` / ``nsample`` arrive as per-section
    VMEM planes, so ONE launch covers every grouping scale of the model
    (4x fewer programs than per-scale calls; the section rows of all scales
    are concatenated and tiled together).
    """
    chan_refs = refs[:n_channels]
    rx_ref, ry_ref, rz_ref, dz_ref, ns_ref, L_ref = refs[n_channels:n_channels + 6]
    grouped_ref, cnt_ref, row_scratch = refs[n_channels + 6:]
    idx, cnt = _select_core(chan_refs[2][0], rz_ref[0], dz_ref[0],
                            ns_ref[0][:, 0], n_pow2, L_ref[:],
                            k_chunks=k_pad // _LANES)
    cnt_ref[0] = cnt[:, None]
    grouped_ref[0] = _gather_grouped(
        chan_refs, idx, (rx_ref[0], ry_ref[0], rz_ref[0]), row_scratch, n_pow2)


def group_depth_point_multi(points: jnp.ndarray, refs, dis_zs, nsamples,
                            interpret: bool = False):
    """All grouping scales in ONE kernel launch.

    points (B, N, C); refs = [(B, M_i, 3), ...] with per-scale window
    ``dis_zs[i]`` and slot count ``nsamples[i]``. Returns a list of
    ``(grouped (B, M_i, K_i, C), cnt (B, M_i))`` — bit-identical to calling
    ``group_depth_point_pallas`` per scale (the per-scale launches are what
    this replaces; see BENCH_NOTES.md round-2 profile).
    """
    b, n, c = points.shape
    ms = [int(r.shape[1]) for r in refs]
    mtot = sum(ms)
    n_pow2 = max(_LANES, 1 << (n - 1).bit_length())

    # tile size: as few programs as possible while (MT, Np) stays VMEM-sized
    cap = max(8, min(256, (262144 // n_pow2) // 8 * 8))
    m_tiles = -(-mtot // cap)
    mt = -(-(-(-mtot // m_tiles)) // 8) * 8

    ref_cat = jnp.concatenate(list(refs), axis=1)  # (B, Mtot, 3)
    chans, coords, n_pow2, m_pad, m_tiles = _prep_group_inputs(
        points, ref_cat, mt)

    # per-section window / slot-count planes (constant within a scale)
    dz = jnp.concatenate([jnp.full((m_,), float(d), jnp.float32)
                          for m_, d in zip(ms, dis_zs)])
    ns = jnp.concatenate([jnp.full((m_,), int(k), jnp.int32)
                          for m_, k in zip(ms, nsamples)])
    dz = jnp.broadcast_to(jnp.pad(dz, (0, m_pad)), (b, mtot + m_pad))
    ns = jnp.broadcast_to(jnp.pad(ns, (0, m_pad)), (b, mtot + m_pad))
    planes = [dz.reshape(b * m_tiles, mt, 1), ns.reshape(b * m_tiles, mt, 1)]

    k_pad = max(-k % _LANES + k for k in nsamples)
    kernel = functools.partial(_group_multi_kernel, n_pow2=n_pow2,
                               n_channels=c, k_pad=k_pad)
    tile_spec = pl.BlockSpec((1, mt, 1),
                             lambda i, j, mts=m_tiles: (i * mts + j, 0, 0),
                             memory_space=pltpu.VMEM)
    L_spec = pl.BlockSpec((n_pow2, n_pow2 + _LANES), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    grouped, cnt = pl.pallas_call(
        kernel,
        grid=(b, m_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_pow2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(c)
        ] + [tile_spec] * 5 + [L_spec],
        out_specs=(
            pl.BlockSpec((1, mt, c * k_pad),
                         lambda i, j, mts=m_tiles: (i * mts + j, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * m_tiles, mt, c * k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * m_tiles, mt, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((mt, n_pow2), jnp.float32)],
        interpret=interpret,
    )(*chans, *coords, *planes, _scan_matrix(n_pow2))

    grouped = grouped.reshape(b, mtot + m_pad, c, k_pad)
    cnt = cnt.reshape(b, mtot + m_pad)
    outs = []
    off = 0
    for m_, k in zip(ms, nsamples):
        g = jnp.transpose(grouped[:, off:off + m_, :, :k], (0, 1, 3, 2))
        outs.append((g, cnt[:, off:off + m_]))
        off += m_
    return outs


def group_depth_point_multi_auto(points: jnp.ndarray, refs, dis_zs, nsamples):
    """Backend dispatch for the multi-scale grouping (TPU kernel vs XLA)."""
    if jax.default_backend() == "tpu":
        return group_depth_point_multi(points, refs, dis_zs, nsamples)
    from frustum_convnet_tpu.ops.query_depth_point import (group_points,
                                                           query_depth_point)

    outs = []
    for ref, d, k in zip(refs, dis_zs, nsamples):
        idx, cnt = query_depth_point(points[..., 2], ref[..., 2], d, k)
        outs.append((group_points(points, ref, idx), cnt))
    return outs


def group_depth_point_auto(points: jnp.ndarray, ref: jnp.ndarray,
                           dis_z: float, nsample: int):
    """Backend dispatch: the fused Pallas kernel on TPU, XLA elsewhere.

    Both paths are bit-identical (the XLA path is select + gather +
    center-subtract with the same semantics), so tests running on the
    virtual CPU mesh exercise what the TPU kernel computes.
    """
    if jax.default_backend() == "tpu":
        return group_depth_point_pallas(points, ref, dis_z, nsample)
    from frustum_convnet_tpu.ops.query_depth_point import (group_points,
                                                           query_depth_point)

    idx, cnt = query_depth_point(points[..., 2], ref[..., 2], dis_z, nsample)
    return group_points(points, ref, idx), cnt
