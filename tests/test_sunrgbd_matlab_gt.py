"""Pin the SUN-RGBD VOC-AP evaluator to the reference's MATLAB GT dumps.

The reference ships its MATLAB evaluator's ground truth
(`/root/reference/train/sunrgbd_eval/gt_boxes/*_gt_boxes.dat|*_gt_imgids.txt`)
and pins its Python evaluator to MATLAB through them
(`compare_matlab_python_eval.py:25-79`). Here the same real artifacts are
loaded with our conversion (`load_matlab_gt_cls`), deterministic predictions
are synthesized from them, and BOTH our evaluator and the reference's own
Python `eval_det_cls` (imported read-only from the reference tree, run with
its pure-python IoU) must produce the same AP.
"""

import os
import sys
import types

import numpy as np
import pytest

from frustum_convnet_tpu.evaluation import sunrgbd_eval

REF_ROOT = "/root/reference"
GT_DIR = os.path.join(REF_ROOT, "train", "sunrgbd_eval", "gt_boxes")

pytestmark = pytest.mark.skipif(not os.path.isdir(GT_DIR),
                                reason="reference MATLAB GT dumps not mounted")

CLASSES = ["bed", "table", "sofa", "chair", "toilet",
           "desk", "dresser", "night_stand", "bookshelf", "bathtub"]


def _import_reference_eval():
    """Import the reference's eval_det module as an oracle (read-only).

    Its module-level ``from ops.pybind11 import box_ops_cc`` needs the
    compiled extension, which isn't built here — stub the module and route
    IoU through the reference's own pure-python ``box3d_iou`` instead.
    """
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    ops_pkg = types.ModuleType("ops")
    pybind_pkg = types.ModuleType("ops.pybind11")
    pybind_pkg.box_ops_cc = types.SimpleNamespace()
    sys.modules.setdefault("ops", ops_pkg)
    sys.modules["ops.pybind11"] = pybind_pkg

    import importlib

    ref_eval = importlib.import_module("train.sunrgbd_eval.eval_det")
    ref_eval.get_iou_cc = ref_eval.get_iou  # pure-python IoU path
    return ref_eval


def test_loads_all_classes():
    total = 0
    for cls in CLASSES:
        gt = sunrgbd_eval.load_matlab_gt_cls(GT_DIR, cls)
        assert gt, cls
        for boxes in gt.values():
            for b in boxes:
                assert b.shape == (8, 3)
                # camera convention: first quad below (larger y) the second
                assert b[:4, 1].mean() > b[4:, 1].mean() - 1e-9
        total += sum(len(v) for v in gt.values())
    assert total > 1000  # the dumps cover the full val split


def _make_predictions(gt, rng):
    """Deterministic preds: GT hits with high scores + clear misses.

    Perturbations are far from the 0.25 IoU threshold so tiny IoU-formula
    differences between the two evaluators cannot flip a match.
    """
    pred = {}
    for img_id, boxes in gt.items():
        plist = []
        for b in boxes:
            r = rng.random()
            if r < 0.7:  # clear hit: tiny jitter
                plist.append((b + rng.normal(0, 0.01, b.shape),
                              float(rng.uniform(0.5, 1.0))))
            elif r < 0.85:  # miss: shifted far away
                plist.append((b + np.array([5.0, 0.0, 5.0]),
                              float(rng.uniform(0.0, 0.5))))
            # else: undetected GT
        if rng.random() < 0.2:  # extra false positive
            plist.append((boxes[0] + np.array([8.0, 0.0, 8.0]),
                          float(rng.uniform(0.0, 1.0))))
        if plist:
            pred[img_id] = plist
    return pred


@pytest.mark.parametrize("cls", ["bed", "chair", "toilet"])
def test_ap_matches_reference_evaluator(cls):
    ref_eval = _import_reference_eval()
    gt_full = sunrgbd_eval.load_matlab_gt_cls(GT_DIR, cls)
    # subsample images to keep the O(n_pred * n_gt) python IoU loop fast
    keys = sorted(gt_full.keys())[:120]
    gt = {k: gt_full[k] for k in keys}

    rng = np.random.default_rng(3)
    pred = _make_predictions(gt, rng)

    _, _, ap_ours = sunrgbd_eval.eval_det_cls(pred, gt, ovthresh=0.25)
    _, _, ap_ref = ref_eval.eval_det_cls(
        {k: list(v) for k, v in pred.items()},
        {k: list(v) for k, v in gt.items()}, ovthresh=0.25)
    assert ap_ours == pytest.approx(ap_ref, abs=1e-9), (ap_ours, ap_ref)
    assert 0.3 < ap_ours < 1.0  # sanity: the synthetic PR structure
