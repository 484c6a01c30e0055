"""Native boxgeom library + KITTI evaluator binary vs the numpy oracles."""

import os
import subprocess

import numpy as np
import pytest

from frustum_convnet_tpu.core import geometry_np as gnp
from frustum_convnet_tpu.core import iou_np
from frustum_convnet_tpu.core import nms as np_nms
from frustum_convnet_tpu.ops import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.build_native():
        pytest.skip("native toolchain unavailable")
    assert native.native_available()


def random_corners(rng, n, spread=5.0):
    out = []
    for _ in range(n):
        center = np.array([rng.uniform(-spread, spread), rng.uniform(-1, 1),
                           rng.uniform(-spread, spread)])
        out.append(gnp.box3d_corners(center, rng.uniform(0.5, 4, 3),
                                     rng.uniform(-np.pi, np.pi)))
    return np.stack(out)


def test_native_iou_pair_matches_oracle(rng):
    c1 = random_corners(rng, 32)
    c2 = c1 + rng.normal(0, 0.0, c1.shape)  # identical
    out = native.rbbox_iou_3d_pair(c1, c2)
    np.testing.assert_allclose(out, 1.0, atol=1e-9)

    c2 = random_corners(rng, 32)
    out = native.rbbox_iou_3d_pair(c1, c2)
    for i in range(32):
        bev, i3d = iou_np.rotated_iou_3d_np(c1[i], c2[i])
        np.testing.assert_allclose(out[i, 0], bev, atol=1e-9)
        np.testing.assert_allclose(out[i, 1], i3d, atol=1e-9)


def test_native_iou_matrix(rng):
    c1, c2 = random_corners(rng, 4, 2.0), random_corners(rng, 6, 2.0)
    mat = native.rbbox_iou_3d_matrix(c1, c2)
    for i in range(4):
        for j in range(6):
            np.testing.assert_allclose(
                mat[i, j], iou_np.rotated_iou_3d_np(c1[i], c2[j])[1], atol=1e-9)


def test_native_nms_matches_numpy(rng):
    for _ in range(5):
        n = 20
        dets = np.column_stack([
            rng.uniform(-5, 5, n), rng.uniform(-1, 1, n), rng.uniform(-5, 5, n),
            rng.uniform(1, 4, n), rng.uniform(1, 2, n), rng.uniform(1, 2, n),
            rng.uniform(-np.pi, np.pi, n), rng.uniform(0, 1, n),
        ])
        assert native.rotate_nms_3d(dets, 0.3) == np_nms.rotate_nms_3d(dets, 0.3)
    dets6 = np.column_stack([
        rng.uniform(-5, 5, 15), rng.uniform(-5, 5, 15), rng.uniform(1, 4, 15),
        rng.uniform(1, 2, 15), rng.uniform(-np.pi, np.pi, 15), rng.uniform(0, 1, 15),
    ])
    assert native.rotate_nms_bev(dets6, 0.3) == np_nms.rotate_nms_bev(dets6, 0.3)


def _gt_line(t, ry, l=3.9, w=1.6, h=1.5, cls="Car", y1=100.0, y2=180.0):
    return (f"{cls} 0.00 0 0.0 300.0 {y1} 400.0 {y2} "
            f"{h:.2f} {w:.2f} {l:.2f} {t[0]:.2f} {t[1]:.2f} {t[2]:.2f} {ry:.2f}")


def test_native_evaluator_matches_python(tmp_path, rng):
    """The C++ evaluator binary reproduces the Python evaluator's AP."""
    from frustum_convnet_tpu.evaluation import kitti_eval

    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res" / "data"
    gt_dir.mkdir()
    res_dir.mkdir(parents=True)
    for i in range(16):
        gts, dets = [], []
        for j in range(3):
            t = (rng.uniform(-10, 10), 1.65, rng.uniform(8, 40))
            ry = rng.uniform(-np.pi, np.pi)
            gts.append(_gt_line(t, ry))
            if j == 2:
                continue  # drop one det per image
            dets.append(_gt_line((t[0] + rng.normal(0, 0.15), t[1], t[2]), ry)
                        + f" {rng.uniform(0.5, 1.0):.4f}")
        (gt_dir / f"{i:06d}.txt").write_text("\n".join(gts) + "\n")
        (res_dir / f"{i:06d}.txt").write_text("\n".join(dets) + "\n")

    py = kitti_eval.evaluate(str(gt_dir), str(tmp_path / "res"),
                             classes=("car",), compute_aos=False)
    out = native.evaluate_kitti_native(str(gt_dir), str(tmp_path / "res"))
    assert out is not None
    native_aps = {}
    for line in out.strip().split("\n"):
        name, _, vals = line.partition(" AP: ")
        native_aps[name] = [float(x) for x in vals.split()]
    for metric in ("detection", "detection_ground", "detection_3d"):
        np.testing.assert_allclose(
            native_aps[f"car_{metric}"], py["car"][metric], atol=1e-3,
            err_msg=metric)
