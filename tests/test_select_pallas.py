"""Pallas depth-window select kernel: bit-equality vs the CUDA-scan oracle.

The kernel runs in interpret mode on the CPU test backend; the compiled TPU
path is exercised by bench.py / the driver's entry check. Both must match
``query_depth_point_np`` (the brute-force reproduction of
`/root/reference/ops/query_depth_point/query_depth_point_cuda_kernel.cu:42-64`)
bit-for-bit, including first-hit slot fill and capped counts.
"""

import numpy as np
import pytest

from frustum_convnet_tpu.ops.query_depth_point import (group_points,
                                                       query_depth_point,
                                                       query_depth_point_np)
from frustum_convnet_tpu.ops.select_pallas import (group_depth_point_pallas,
                                                   query_depth_point_pallas)


def check(zp, zr, d, k):
    idx_o, cnt_o = query_depth_point_np(zp, zr, d, k)
    idx, cnt = query_depth_point_pallas(zp, zr, d, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_array_equal(np.asarray(cnt), cnt_o)


@pytest.mark.parametrize("b,n,m,d,k", [
    (2, 1024, 280, 0.25, 32),   # KITTI scale 1 shapes
    (2, 1024, 140, 0.5, 64),    # scale 2
    (2, 1024, 35, 2.0, 128),    # scale 4 (K > 64)
    (1, 128, 16, 1.0, 8),       # tiny
    (2, 200, 50, 0.3, 8),       # N not a multiple of 128, M not of tile
    (3, 512, 7, 0.5, 16),       # M smaller than one tile
])
def test_matches_oracle(rng, b, n, m, d, k):
    zp = rng.uniform(0, 70, (b, n)).astype(np.float32)
    zr = np.sort(rng.uniform(0, 70, (b, m)).astype(np.float32), axis=1)
    check(zp, zr, d, k)


def test_unsorted_and_duplicate_refs(rng):
    """Padded refine ladders: unsorted + edge-duplicated section centers."""
    zp = rng.uniform(0, 20, (2, 256)).astype(np.float32)
    zr = rng.uniform(0, 20, (2, 40)).astype(np.float32)  # unsorted
    zr[:, 30:] = zr[:, 29:30]  # repeat-last edge padding
    check(zp, zr, 0.5, 16)


def test_empty_and_overflow_sections(rng):
    """Sections with zero matches and sections matching every point."""
    zp = np.full((1, 64), 5.0, np.float32)
    zr = np.array([[5.0, 50.0]], np.float32)  # all match / none match
    check(zp, zr, 1.0, 8)


def test_duplicate_depths_preserve_storage_order(rng):
    """Ties in z must select by storage position (CUDA scan order)."""
    zp = np.tile(rng.uniform(0, 10, (1, 16)).astype(np.float32), (1, 8))
    zr = np.sort(rng.uniform(0, 10, (1, 24)).astype(np.float32), axis=1)
    check(zp, zr, 0.7, 12)


def test_matches_xla_path(rng):
    """The CPU/XLA dense path and the kernel agree (model uses either)."""
    zp = rng.uniform(0, 70, (2, 512)).astype(np.float32)
    zr = np.sort(rng.uniform(0, 70, (2, 96)).astype(np.float32), axis=1)
    idx_x, cnt_x = query_depth_point(zp, zr, 0.5, 32)
    idx_p, cnt_p = query_depth_point_pallas(zp, zr, 0.5, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_x), np.asarray(idx_p))
    np.testing.assert_array_equal(np.asarray(cnt_x), np.asarray(cnt_p))


@pytest.mark.parametrize("c,k", [(3, 32), (4, 64), (6, 16)])
def test_fused_grouping_matches_gather(rng, c, k):
    """Fused kernel == select + gather + center-subtract, bit-for-bit."""
    b, n, m = 2, 384, 72
    pts = rng.uniform(-3, 70, (b, n, c)).astype(np.float32)
    ref = rng.uniform(0, 70, (b, m, 3)).astype(np.float32)
    idx, cnt = query_depth_point_np(pts[..., 2], ref[..., 2], 0.8, k)
    expect = np.asarray(group_points(pts, ref, idx))
    got, cnt_p = group_depth_point_pallas(pts, ref, 0.8, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), expect)
    np.testing.assert_array_equal(np.asarray(cnt_p), cnt)


def test_multi_scale_matches_per_scale(rng):
    """One fused multi-scale launch == per-scale fused kernels, bit-for-bit
    (KITTI-like ladder: 4 scales, mixed M/K/dis_z)."""
    from frustum_convnet_tpu.ops.select_pallas import group_depth_point_multi

    b, n, c = 2, 512, 4
    pts = rng.uniform(-3, 70, (b, n, c)).astype(np.float32)
    ms = [140, 70, 35, 18]
    ds = [0.25, 0.5, 1.0, 2.0]
    ks = [32, 64, 64, 128]
    refs = [rng.uniform(0, 70, (b, m, 3)).astype(np.float32) for m in ms]

    outs = group_depth_point_multi(pts, refs, ds, ks, interpret=True)
    for (g, cnt), ref, d, k in zip(outs, refs, ds, ks):
        g1, cnt1 = group_depth_point_pallas(pts, ref, d, k, interpret=True)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g1))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt1))


def test_multi_scale_matches_xla_auto(rng):
    """multi_auto's XLA fallback == the oracle path per scale."""
    from frustum_convnet_tpu.ops.select_pallas import group_depth_point_multi

    b, n, c = 1, 256, 3
    pts = rng.uniform(0, 20, (b, n, c)).astype(np.float32)
    ms, ds, ks = [50, 25], [0.3, 0.6], [16, 8]
    refs = [np.sort(rng.uniform(0, 20, (b, m, 3)).astype(np.float32), axis=1)
            for m in ms]
    outs = group_depth_point_multi(pts, refs, ds, ks, interpret=True)
    for (g, cnt), ref, d, k in zip(outs, refs, ds, ks):
        idx_o, cnt_o = query_depth_point_np(pts[..., 2], ref[..., 2], d, k)
        expect = np.asarray(group_points(pts, ref, idx_o))
        np.testing.assert_array_equal(np.asarray(g), expect)
        np.testing.assert_array_equal(np.asarray(cnt), cnt_o)


def test_multi_scale_k256_sunrgbd_shapes(rng):
    """K=256 slot rows (SUN-RGBD nsamples) exercise the chunked wide-index
    gather — a Mosaic dynamic_gather requires index shape == source shape,
    so 256-lane index rows must be gathered 128 lanes at a time."""
    from frustum_convnet_tpu.ops.select_pallas import group_depth_point_multi

    b, n, c = 2, 512, 6
    pts = rng.uniform(-3, 8, (b, n, c)).astype(np.float32)
    ms, ds, ks = [80, 40, 20, 10, 5], [0.1, 0.2, 0.4, 0.8, 1.6], [128, 128, 256, 256, 256]
    refs = [np.sort(rng.uniform(0, 8, (b, m, 3)).astype(np.float32), axis=1)
            for m in ms]
    outs = group_depth_point_multi(pts, refs, ds, ks, interpret=True)
    for (g, cnt), ref, d, k in zip(outs, refs, ds, ks):
        idx_o, cnt_o = query_depth_point_np(pts[..., 2], ref[..., 2], d, k)
        expect = np.asarray(group_points(pts, ref, idx_o))
        np.testing.assert_array_equal(np.asarray(g), expect)
        np.testing.assert_array_equal(np.asarray(cnt), cnt_o)
