import os

import numpy as np

from frustum_convnet_tpu.core import geometry_np as gnp
from frustum_convnet_tpu.core.nms import nms_axis_aligned, rotate_nms_3d, rotate_nms_bev
from frustum_convnet_tpu.evaluation import kitti_eval
from frustum_convnet_tpu.evaluation.kitti_writer import write_detection_results


def test_nms_suppresses_duplicates():
    # three near-identical boxes + one far box
    dets = np.array([
        [0, 0, 10, 4, 2, 1.5, 0.3, 0.9],
        [0.1, 0, 10.05, 4, 2, 1.5, 0.31, 0.8],
        [0, 0.05, 10, 4, 2, 1.5, 0.3, 0.7],
        [50, 0, 30, 4, 2, 1.5, -0.5, 0.6],
    ])
    keep = rotate_nms_3d(dets, 0.1)
    assert keep == [0, 3]


def test_nms_bev_and_aa():
    dets = np.array([
        [0, 10, 4, 2, 0.0, 0.9],
        [0.05, 10, 4, 2, 0.0, 0.8],
        [20, 30, 4, 2, 1.0, 0.95],
    ])
    keep = rotate_nms_bev(dets, 0.1)
    assert sorted(keep) == [0, 2]
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60.0]])
    keep = nms_axis_aligned(boxes, np.array([0.5, 0.9, 0.7]), 0.3)
    assert keep == [1, 2]


def test_writer_format_and_fill(tmp_path):
    det_results = {
        3: {"Car": [[10.0, 20.0, 110.0, 80.0, 1.0, 1.6, 20.0, 1.5, 1.6, 3.9, 0.3, 2.5]]}
    }
    data_dir = write_detection_results(str(tmp_path), det_results, split_ids=[3, 4])
    lines = open(os.path.join(data_dir, "000003.txt")).read().strip().split("\n")
    assert len(lines) == 1
    parts = lines[0].split()
    assert parts[0] == "Car"
    assert parts[1] == "-1" and parts[2] == "-1"
    assert len(parts) == 16
    assert float(parts[15]) == 2.5  # score
    assert float(parts[8]) == 1.5  # h
    # empty fill for id 4
    assert open(os.path.join(data_dir, "000004.txt")).read() == ""


def _gt_line(t, ry, l=3.9, w=1.6, h=1.5, cls="Car", y1=100.0, y2=180.0):
    return (f"{cls} 0.00 0 0.0 300.0 {y1} 400.0 {y2} "
            f"{h:.2f} {w:.2f} {l:.2f} {t[0]:.2f} {t[1]:.2f} {t[2]:.2f} {ry:.2f}")


def _make_eval_dirs(tmp_path, jitter=0.0, drop_last=False, seed=0):
    rng = np.random.default_rng(seed)
    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res" / "data"
    gt_dir.mkdir()
    res_dir.mkdir(parents=True)
    n_img, n_obj = 16, 3
    for i in range(n_img):
        gts, dets = [], []
        for j in range(n_obj):
            t = (rng.uniform(-10, 10), 1.65, rng.uniform(8, 40))
            ry = rng.uniform(-np.pi, np.pi)
            gts.append(_gt_line(t, ry))
            if drop_last and j == n_obj - 1:
                continue
            t2 = (t[0] + jitter * rng.normal(), t[1], t[2] + jitter * rng.normal())
            score = rng.uniform(0.5, 1.0)
            dets.append(_gt_line(t2, ry) + f" {score:.4f}")
        (gt_dir / f"{i:06d}.txt").write_text("\n".join(gts) + "\n")
        (res_dir / f"{i:06d}.txt").write_text("\n".join(dets) + "\n" if dets else "")
    return str(gt_dir), str(tmp_path / "res")


def test_eval_perfect_detections_ap100(tmp_path):
    gt_dir, res_dir = _make_eval_dirs(tmp_path, jitter=0.0)
    results = kitti_eval.evaluate(gt_dir, res_dir, classes=("car",), compute_aos=False)
    for metric in ("detection", "detection_ground", "detection_3d"):
        aps = results["car"][metric]
        # perfect dets at every recall point -> 100 on all difficulties
        assert all(a > 99.0 for a in aps), (metric, aps)


def test_eval_missing_detections_lower_ap(tmp_path):
    gt_dir, res_dir = _make_eval_dirs(tmp_path, jitter=0.0, drop_last=True)
    results = kitti_eval.evaluate(gt_dir, res_dir, classes=("car",), compute_aos=False)
    aps = results["car"]["detection_3d"]
    assert all(a < 99.0 for a in aps), aps
    assert all(a > 30.0 for a in aps), aps  # still finds 2/3


def test_eval_difficulty_gating(tmp_path):
    """GT below the easy 40px height gate counts only for moderate/hard."""
    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res" / "data"
    gt_dir.mkdir()
    res_dir.mkdir(parents=True)
    # per image: one tall gt (easy) detected, one short gt (mod/hard only)
    # NOT detected. >=41 tall gts so the 41-point recall grid fills.
    rng = np.random.default_rng(7)
    for i in range(45):
        t1 = (rng.uniform(-8, 8), 1.65, rng.uniform(8, 30))
        t2 = (rng.uniform(-8, 8), 1.65, rng.uniform(30, 50))
        gt_lines = [
            _gt_line(t1, 0.1, y1=100, y2=180),
            _gt_line(t2, -0.2, y1=100, y2=130),
        ]
        det_lines = [_gt_line(t1, 0.1, y1=100, y2=180) + f" {rng.uniform(0.5, 1.0):.4f}"]
        (gt_dir / f"{i:06d}.txt").write_text("\n".join(gt_lines) + "\n")
        (res_dir / f"{i:06d}.txt").write_text("\n".join(det_lines) + "\n")
    results = kitti_eval.evaluate(str(gt_dir), str(tmp_path / "res"),
                                  classes=("car",), compute_aos=False)
    easy, mod, hard = results["car"]["detection_3d"]
    assert easy > 99.0  # the short gt is ignored at easy
    assert mod < 99.0 and hard < 99.0  # missing detection hurts mod/hard
