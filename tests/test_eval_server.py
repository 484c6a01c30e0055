"""KITTI-server evaluator variant (`/root/reference/train/kitti_eval/
evaluate_object.cpp`) vs the offline binary, in both rebuilds.

The server protocol differs from the offline one in three observable ways
(see the reference diff, `evaluate_object.cpp` vs
`evaluate_object_3d_offline.cpp`):

1. gt difficulty gate ``height <= MIN_HEIGHT`` (`:413`) vs ``<`` (`:412`) —
   a GT box exactly 40 px tall is evaluated at Easy offline but *ignored*
   by the server;
2. the evaluated image set is every test image, and a missing result file
   aborts (`:683-706`) vs dir discovery offline;
3. BEV/3D metrics are skipped per class unless some detection carries the
   full 3D fields (`:144-151`).

Each is asserted on directed scenes for the Python evaluator, and the
native C++ binary must agree (the randomized sweep lives in
test_eval_fuzz.py).
"""

import os

import numpy as np
import pytest

from frustum_convnet_tpu.evaluation import kitti_eval
from frustum_convnet_tpu.ops import native

GT_40PX = ("Car 0.00 0 1.50 100.0000 100.0000 180.0000 140.0000 "
           "1.50 1.60 3.90 5.0000 1.5000 20.0000 1.50")
DET_FULL = ("Car 0.00 0 1.50 100.0000 100.0000 180.0000 140.0000 "
            "1.50 1.60 3.90 5.0000 1.5000 20.0000 1.50 0.900000")
# 2D-only detection: no 3D fields (t=-1000, hwl=-1)
DET_2D = ("Car 0.00 0 1.50 100.0000 100.0000 180.0000 140.0000 "
          "-1 -1 -1 -1000 -1000 -1000 -10 0.900000")


def _write_scene(root, gt_lines_by_img, det_lines_by_img):
    gt_dir = os.path.join(root, "gt")
    data_dir = os.path.join(root, "res", "data")
    os.makedirs(gt_dir)
    os.makedirs(data_dir)
    for i, lines in gt_lines_by_img.items():
        open(os.path.join(gt_dir, f"{i:06d}.txt"), "w").write(
            "\n".join(lines) + ("\n" if lines else ""))
    for i, lines in det_lines_by_img.items():
        open(os.path.join(data_dir, f"{i:06d}.txt"), "w").write(
            "\n".join(lines) + ("\n" if lines else ""))
    return gt_dir, os.path.join(root, "res")


def test_strict_height_gate_40px(tmp_path):
    """A 40-px GT with a perfect det: Easy AP is >0 offline, 0 on server."""
    gt_dir, result_dir = _write_scene(
        str(tmp_path), {0: [GT_40PX]}, {0: [DET_FULL]})

    off = kitti_eval.evaluate(gt_dir, result_dir, classes=("car",),
                              metrics=(0,), protocol="offline")
    srv = kitti_eval.evaluate(gt_dir, result_dir, classes=("car",),
                              metrics=(0,), protocol="server")
    # evaluated at Easy offline: 1 GT => single-threshold ceiling 100/11
    assert off["car"]["detection"][0] == pytest.approx(100.0 / 11.0)
    assert srv["car"]["detection"][0] == 0.0  # <= gate ignores it
    # at Moderate/Hard (MIN_HEIGHT 25) a 40-px box clears both gates
    assert srv["car"]["detection"][1] == pytest.approx(
        off["car"]["detection"][1], abs=1e-9)

    native_out = native.evaluate_kitti_native(gt_dir, result_dir,
                                              protocol="server")
    if native_out is not None:
        line = [l for l in native_out.splitlines()
                if l.startswith("car_detection AP")][0]
        vals = [float(x) for x in line.partition(" AP: ")[2].split()]
        np.testing.assert_allclose(vals, srv["car"]["detection"], atol=1e-4)


def test_server_requires_result_for_every_gt_image(tmp_path):
    gt_dir, result_dir = _write_scene(
        str(tmp_path), {0: [GT_40PX], 1: [GT_40PX]}, {0: [DET_FULL]})
    # offline: image 1 simply isn't discovered from the result dir
    kitti_eval.evaluate(gt_dir, result_dir, classes=("car",),
                        metrics=(0,), protocol="offline")
    with pytest.raises(FileNotFoundError):
        kitti_eval.evaluate(gt_dir, result_dir, classes=("car",),
                            metrics=(0,), protocol="server")
    # the native binary exits non-zero => binding returns None
    assert native.evaluate_kitti_native(
        gt_dir, result_dir, protocol="server") is None


def test_server_skips_3d_metrics_without_3d_fields(tmp_path):
    gt_dir, result_dir = _write_scene(
        str(tmp_path), {0: [GT_40PX]}, {0: [DET_2D]})

    off = kitti_eval.evaluate(gt_dir, result_dir, classes=("car",),
                              protocol="offline")
    srv = kitti_eval.evaluate(gt_dir, result_dir, classes=("car",),
                              protocol="server")
    assert "detection_ground" in off["car"] and "detection_3d" in off["car"]
    assert "detection_ground" not in srv["car"]
    assert "detection_3d" not in srv["car"]
    assert "detection" in srv["car"]

    native_out = native.evaluate_kitti_native(gt_dir, result_dir,
                                              protocol="server")
    if native_out is not None:
        assert "car_detection AP" in native_out
        assert "detection_ground" not in native_out
        assert "detection_3d" not in native_out
