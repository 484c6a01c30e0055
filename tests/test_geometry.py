import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import Delaunay

from frustum_convnet_tpu.core import geometry_np as gnp
from frustum_convnet_tpu.core import geometry as gj
from frustum_convnet_tpu.core import codecs


def random_box(rng):
    center = rng.uniform(-5, 5, 3)
    size = rng.uniform(0.5, 4.0, 3)  # l, w, h
    heading = rng.uniform(-np.pi, np.pi)
    return center, size, heading


def test_rotate_pc_along_y_roundtrip(rng):
    pc = rng.normal(size=(100, 4))
    ang = 0.7
    out = gnp.rotate_pc_along_y(gnp.rotate_pc_along_y(pc, ang), -ang)
    np.testing.assert_allclose(out, pc, atol=1e-12)
    # extra channels untouched
    np.testing.assert_array_equal(gnp.rotate_pc_along_y(pc, ang)[:, 3], pc[:, 3])


def test_rotate_pc_jax_matches_np(rng):
    pc = rng.normal(size=(2, 50, 4)).astype(np.float32)
    angs = np.array([0.3, -1.2], dtype=np.float32)
    out_j = np.asarray(gj.rotate_points_along_y(jnp.asarray(pc), jnp.asarray(angs)))
    for b in range(2):
        np.testing.assert_allclose(out_j[b], gnp.rotate_pc_along_y(pc[b], angs[b]), atol=1e-5)


def test_corners_jax_matches_np(rng):
    for _ in range(10):
        center, size, heading = random_box(rng)
        c_np = gnp.box3d_corners(center, size, heading)
        c_j = np.asarray(
            gj.box3d_corners(
                jnp.asarray(center)[None], jnp.asarray(heading)[None], jnp.asarray(size)[None]
            )
        )[0]
        np.testing.assert_allclose(c_j, c_np, atol=1e-5)


def test_points_in_box_matches_delaunay(rng):
    """Half-space test vs the reference's scipy Delaunay in_hull."""
    for _ in range(5):
        center, size, heading = random_box(rng)
        corners = gnp.box3d_corners(center, size, heading)
        pts = rng.uniform(-8, 8, (500, 3))
        hull = Delaunay(corners)
        ref_mask = hull.find_simplex(pts) >= 0
        ours = gnp.points_in_box3d(pts, center, size, heading)
        # allow disagreement only within a thin boundary band
        disagree = ref_mask != ours
        if disagree.any():
            border = gnp.points_in_box3d(pts[disagree], center, size, heading, eps=1e-6) != \
                gnp.points_in_box3d(pts[disagree], center, size, heading, eps=-1e-6)
            assert border.all()


def test_points_in_box_corners_variant(rng):
    for _ in range(5):
        center, size, heading = random_box(rng)
        corners = gnp.box3d_corners(center, size, heading)
        pts = rng.uniform(-8, 8, (300, 3))
        m1 = gnp.points_in_box3d(pts, center, size, heading)
        m2 = gnp.points_in_box3d_corners(pts, corners)
        np.testing.assert_array_equal(m1, m2)


def test_points_in_box_jax(rng):
    center, size, heading = random_box(rng)
    pts = rng.uniform(-8, 8, (200, 3)).astype(np.float32)
    m_np = gnp.points_in_box3d(pts, center, size, heading)
    m_j = np.asarray(
        gj.points_in_box3d(
            jnp.asarray(pts)[None],
            jnp.asarray(center, dtype=jnp.float32)[None],
            jnp.asarray(size, dtype=jnp.float32)[None],
            jnp.asarray(np.float32(heading))[None],
        )
    )[0]
    # float32 vs float64 boundary wiggle: only allow near-boundary mismatch
    disagree = m_np != m_j
    if disagree.any():
        band = gnp.points_in_box3d(pts[disagree], center, size, heading, eps=1e-4) != \
            gnp.points_in_box3d(pts[disagree], center, size, heading, eps=-1e-4)
        assert band.all()


def test_project_image_to_rect_roundtrip(rng):
    # P[2,3] must be 0 for an exact roundtrip: the back-projection formula
    # (like the reference's) assumes the homogeneous scale w equals rect z.
    P = np.array([[721.5, 0.0, 609.6, 44.9], [0.0, 721.5, 172.9, 0.2], [0.0, 0.0, 1.0, 0.0]])
    pts = rng.uniform([-10, -2, 5], [10, 2, 60], (50, 3))
    uv = gnp.project_rect_to_image(pts, P)
    uvd = np.hstack([uv, pts[:, 2:3]])
    back = gnp.project_image_to_rect(uvd, P)
    np.testing.assert_allclose(back, pts, atol=1e-6)
    # jax twin (float32 on device -> coarser tolerance)
    back_j = np.asarray(gj.project_image_to_rect(jnp.asarray(uvd), jnp.asarray(P)))
    np.testing.assert_allclose(back_j, pts, rtol=1e-3, atol=1e-2)


def test_angle_codec_roundtrip(rng):
    angles = rng.uniform(-np.pi, np.pi, 64).astype(np.float32)
    cls, res = codecs.angle_encode(jnp.asarray(angles), num_bins=12)
    res_full = np.zeros((64, 12), dtype=np.float32)
    res_full[np.arange(64), np.asarray(cls)] = np.asarray(res)
    dec = np.asarray(codecs.angle_decode(jnp.asarray(res_full), cls, num_bins=12))
    # decode wraps to (-pi, pi]
    diff = np.abs(np.mod(dec - angles + np.pi, 2 * np.pi) - np.pi)
    assert diff.max() < 1e-5
    # residuals normalized to [-1, 1]
    assert np.abs(np.asarray(res)).max() <= 1.0 + 1e-6


def test_angle_codec_np_matches_jax(rng):
    angles = rng.uniform(-np.pi, np.pi, 64)
    cls_j, res_j = codecs.angle_encode(jnp.asarray(angles), num_bins=12)
    cls_n, res_n = codecs.angle_encode_np(angles, num_bins=12)
    np.testing.assert_array_equal(np.asarray(cls_j), cls_n)
    np.testing.assert_allclose(np.asarray(res_j), res_n, atol=1e-5)  # f32 vs f64


def test_size_codec_roundtrip(rng):
    mean = jnp.asarray(rng.uniform(0.5, 4.0, (3, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0.5, 4.0, (10, 3)).astype(np.float32))
    cls = jnp.asarray(rng.integers(0, 3, 10))
    enc = codecs.size_encode(gt, mean, cls)
    res_full = jnp.zeros((10, 3, 3)).at[jnp.arange(10), cls].set(enc)
    dec = codecs.size_decode(res_full, mean, cls)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), rtol=1e-5)


def test_frozen_cfg_blocks_item_and_attr_writes_and_clone_is_deep():
    """Freeze guards both attribute AND item assignment (merge machinery
    writes via d[k]=v), and clone() deep-copies mutable leaves so a clone
    cannot corrupt the original (ref collections.py:24-65 contract)."""
    from frustum_convnet_tpu.configs import (assert_and_infer_cfg,
                                             get_default_cfg,
                                             merge_cfg_from_list)

    cfg = get_default_cfg()
    clone = cfg.clone()
    clone.TRAIN.LR_STEPS.append(40)
    assert cfg.TRAIN.LR_STEPS == [20]  # original untouched

    merge_cfg_from_list(["MODEL.FILE", "det_base"], cfg)
    assert_and_infer_cfg(cfg)
    with pytest.raises(AttributeError):
        cfg.TRAIN.BATCH_SIZE = 64
    with pytest.raises(AttributeError):
        cfg.TRAIN["BATCH_SIZE"] = 64
    with pytest.raises(AttributeError):
        cfg.TRAIN.update(BATCH_SIZE=64)
    with pytest.raises(AttributeError):
        cfg.TRAIN.setdefault("NEW_KEY", 1)
    with pytest.raises(AttributeError):
        cfg.TRAIN.pop("BATCH_SIZE")
    with pytest.raises(AttributeError):
        del cfg.TRAIN["BATCH_SIZE"]
    with pytest.raises(AttributeError):
        # post-freeze merge must not silently succeed either
        merge_cfg_from_list(["TRAIN.BATCH_SIZE", "64"], cfg)
