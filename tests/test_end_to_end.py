"""Full-loop smoke: raw synthetic KITTI -> prep -> train 2 epochs -> test -> AP.

The minimum end-to-end slice from SURVEY.md §7, on a tiny config (small depth
ladder / point count / batch) so the whole thing compiles and runs on the CPU
test mesh in minutes.
"""

import os
import sys

import numpy as np
import pytest

from frustum_convnet_tpu.data.kitti.prepare import (
    extract_frustum_data,
    extract_frustum_data_rgb_detection,
)
from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    kitti_root = str(root / "kitti_raw")
    make_synthetic_kitti(kitti_root, num_frames=8, cars_per_frame=2, seed=1)
    pickle_dir = str(root / "pickles")
    os.makedirs(pickle_dir)
    extract_frustum_data(
        os.path.join(kitti_root, "image_sets", "train.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_train.pickle"), kitti_root,
        perturb_box2d=True, augmentX=3, type_whitelist=("Car",))
    extract_frustum_data(
        os.path.join(kitti_root, "image_sets", "val.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_val.pickle"), kitti_root,
        perturb_box2d=False, augmentX=1, type_whitelist=("Car",))
    extract_frustum_data_rgb_detection(
        os.path.join(kitti_root, "rgb_detections", "rgb_detection_val.txt"),
        "training",
        os.path.join(pickle_dir, "frustum_caronly_val_rgb_detection.pickle"),
        kitti_root, type_whitelist=("Car",))
    return {"kitti_root": kitti_root, "pickle_dir": pickle_dir,
            "output_dir": str(root / "output")}


TINY_OVERRIDES = [
    "DATA.MAX_DEPTH", "48",
    "DATA.NUM_SAMPLES", "128",
    "DATA.STRIDE", "(1.0, 2.0, 4.0, 8.0)",
    "DATA.HEIGHT_HALF", "(1.0, 2.0, 4.0, 8.0)",
    "TRAIN.BATCH_SIZE", "8",
    "TEST.BATCH_SIZE", "8",
    "TRAIN.MAX_EPOCH", "2",
    "USE_TFBOARD", "True",
    "disp", "1",
]


def test_train_then_test_end_to_end(workdir, monkeypatch):
    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.engine import train as train_mod
    from frustum_convnet_tpu.engine import test as test_mod

    # fresh global cfg per stage (the global is frozen by each driver)
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)

    overrides = TINY_OVERRIDES + [
        "DATA.DATA_ROOT", workdir["pickle_dir"],
        "OUTPUT_DIR", workdir["output_dir"],
    ]
    train_mod.main(["--cfg", "cfgs/det_sample.yaml"] + overrides)

    ckpt_dir = os.path.join(workdir["output_dir"], "checkpoints")
    final = os.path.join(ckpt_dir, "model_final.msgpack")
    assert os.path.exists(final)
    # model_best only appears once the IoU metric beats 0 (reference
    # semantics: strict improvement, train_net_det.py:376-382)
    # scalar logs written
    assert os.path.exists(os.path.join(workdir["output_dir"], "tb_logger", "train.jsonl"))

    # ---- test stage on rgb detections, NMS method, then official-protocol AP
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(test_mod, "cfg", config_mod.cfg, raising=True)
    gt_dir = os.path.join(workdir["kitti_root"], "training", "label_2")
    idx_path = os.path.join(workdir["kitti_root"], "image_sets", "val.txt")
    results = test_mod.main([
        "--cfg", "cfgs/det_sample.yaml",
        "--gt_dir", gt_dir, "--idx_path", idx_path,
    ] + overrides + ["TEST.WEIGHTS", final, "FROM_RGB_DET", "True"])

    result_data = os.path.join(workdir["output_dir"], "val_nms", "result", "data")
    files = os.listdir(result_data)
    assert files, "no result files written"
    # every val id has a file (empty-fill contract)
    val_ids = [int(l) for l in open(idx_path)]
    for idx in val_ids:
        assert os.path.exists(os.path.join(result_data, f"{idx:06d}.txt"))
    # evaluator ran and returned the AP structure
    assert results is not None and "car" in results
    assert set(results["car"].keys()) >= {"detection", "detection_ground", "detection_3d"}
