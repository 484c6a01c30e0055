"""Refinement cascade: refine prep (GT + det + rgb paths) -> provider -> train/test."""

import os

import numpy as np
import pytest

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.data import pickle_io
from frustum_convnet_tpu.data.kitti.prepare_refine import (
    extract_frustum_data,
    extract_frustum_data_rgb_detection,
    extract_frustum_det_data,
)
from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti
from frustum_convnet_tpu.data.provider_refine import FrustumRefineProvider
from frustum_convnet_tpu.data.provider import collate_batch

pytestmark = pytest.mark.slow  # full-pipeline test: excluded from the quick tier


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("refine")
    kitti_root = str(root / "kitti_raw")
    make_synthetic_kitti(kitti_root, num_frames=8, cars_per_frame=2, seed=2)

    # fabricate a stage-1 result dir: GT boxes with jitter + scores
    res_dir = str(root / "stage1" / "data")
    os.makedirs(res_dir)
    rng = np.random.default_rng(0)
    label_dir = os.path.join(kitti_root, "training", "label_2")
    for f in os.listdir(label_dir):
        lines = []
        for line in open(os.path.join(label_dir, f)):
            p = line.split()
            vals = [float(x) for x in p[1:]]
            vals[10] += rng.normal(0, 0.1)  # tx jitter
            vals[12] += rng.normal(0, 0.1)  # tz jitter
            lines.append(p[0] + " " + " ".join(f"{v:.2f}" for v in vals) + f" {rng.uniform(0.6, 0.95):.3f}")
        open(os.path.join(res_dir, f), "w").write("\n".join(lines) + "\n")

    pickle_dir = str(root / "pickles")
    os.makedirs(pickle_dir)
    sets = os.path.join(kitti_root, "image_sets")
    n = extract_frustum_data(
        os.path.join(sets, "train.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_train.pickle"), kitti_root,
        perturb_box3d=True, augmentX=3)
    assert n > 0
    n = extract_frustum_data(
        os.path.join(sets, "val.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_val.pickle"), kitti_root,
        perturb_box3d=False, augmentX=1)
    assert n > 0
    n = extract_frustum_det_data(
        os.path.join(sets, "train.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_train_det.pickle"), kitti_root,
        res_dir)
    assert n > 0
    n = extract_frustum_data_rgb_detection(
        os.path.join(sets, "val.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_val_rgb_detection.pickle"),
        kitti_root, res_dir)
    assert n > 0
    return {"kitti_root": kitti_root, "pickle_dir": pickle_dir,
            "output_dir": str(root / "output")}


def refine_cfg(pickle_dir):
    cfg = get_default_cfg()
    merge_cfg_from_list(
        ["MODEL.FILE", "det_base", "DATA.FILE", "provider_sample_refine",
         "DATA.WITH_EXTRA_FEAT", "False", "DATA.DATA_ROOT", pickle_dir,
         "DATA.NUM_SAMPLES", "128",
         "DATA.STRIDE", "(0.1, 0.2, 0.4, 0.8)",
         "DATA.HEIGHT_HALF", "(0.1, 0.2, 0.4, 0.8)",
         "DATA.REFINE_MAX_SPAN", "6.4"],
        cfg,
    )
    return cfg


def test_refine_pickle_formats(setup):
    d = pickle_io.read_stream_pickle(
        os.path.join(setup["pickle_dir"], "frustum_caronly_train.pickle"),
        pickle_io.REFINE_LABELED_FIELDS)
    assert d["pred_box3d"][0].shape == (8, 3)
    assert len(d["pred_box3d_size"][0]) == 3
    # enlarged pseudo-pred boxes contain the gt fg points
    assert all(s.sum() > 0 for s in d["seg"])


def test_refine_provider_labeled(setup):
    cfg = refine_cfg(setup["pickle_dir"])
    ds = FrustumRefineProvider(cfg, "train", random_flip=True, random_shift=True)
    rng = np.random.default_rng(3)
    item = ds.__getitem__(0, rng)
    assert item["point_cloud"].shape == (128, 3)
    assert [r.shape for r in item["refs"]] == [(64, 3), (32, 3), (16, 3), (8, 3)]
    assert (item["cls_label"] == 1).sum() >= 1
    # normalized frame: gt box center near origin (pred box frame)
    assert np.linalg.norm(item["box3d_center"]) < 3.0
    assert "ref_center" in item and item["ref_center"].shape == (3,)


def test_refine_provider_rgbdet(setup):
    cfg = refine_cfg(setup["pickle_dir"])
    ds = FrustumRefineProvider(cfg, "val", from_rgb_detection=True)
    item = ds.__getitem__(0, np.random.default_rng(0))
    assert "rgb_prob" in item
    assert item["refs"][1].shape == (32, 3)
    batch = collate_batch([item, item], num_scales=4)
    assert batch["refs"][1].shape == (2, 32, 3)


def test_refine_train_and_test(setup, monkeypatch):
    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.engine import train as train_mod
    from frustum_convnet_tpu.engine import test as test_mod

    overrides = [
        "MODEL.FILE", "det_base", "DATA.FILE", "provider_sample_refine",
        "DATA.WITH_EXTRA_FEAT", "False",
        "DATA.DATA_ROOT", setup["pickle_dir"],
        "DATA.NUM_SAMPLES", "128",
        "DATA.STRIDE", "(0.1, 0.2, 0.4, 0.8)",
        "DATA.HEIGHT_HALF", "(0.1, 0.2, 0.4, 0.8)",
        "DATA.REFINE_MAX_SPAN", "6.4",
        "TRAIN.BATCH_SIZE", "8", "TEST.BATCH_SIZE", "8",
        "TRAIN.MAX_EPOCH", "1", "disp", "1",
        "OUTPUT_DIR", setup["output_dir"],
    ]
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)
    train_mod.main(["--cfg", "cfgs/refine_car.yaml"] + overrides)
    final = os.path.join(setup["output_dir"], "checkpoints", "model_final.msgpack")
    assert os.path.exists(final)

    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(test_mod, "cfg", config_mod.cfg, raising=True)
    gt_dir = os.path.join(setup["kitti_root"], "training", "label_2")
    idx_path = os.path.join(setup["kitti_root"], "image_sets", "val.txt")
    results = test_mod.main([
        "--cfg", "cfgs/refine_car.yaml", "--gt_dir", gt_dir,
        "--idx_path", idx_path,
    ] + overrides + ["TEST.WEIGHTS", final, "FROM_RGB_DET", "True"])
    assert results is not None and "car" in results
    data_dir = os.path.join(setup["output_dir"], "val_nms", "result", "data")
    assert os.listdir(data_dir)


def test_refine_provider_extend_from_det(setup):
    """extend_from_det appends the stage-1-detection-assigned `_det` pickle
    (reference `provider_sample_refine.py:118-135`); items past the base
    length come from the det stream and remain fully usable."""
    cfg = refine_cfg(setup["pickle_dir"])
    base = FrustumRefineProvider(cfg, "train")
    ext = FrustumRefineProvider(cfg, "train", extend_from_det=True)
    assert len(ext) > len(base)
    rng = np.random.default_rng(0)
    item = ext.__getitem__(len(base), rng)  # first det-stream record
    assert item["point_cloud"].shape == (128, 3)
    assert "ref_center" in item


def test_refine_prep_workers_deterministic(setup, tmp_path):
    """Parallel refine GT prep is bit-identical to sequential."""
    from frustum_convnet_tpu.data import pickle_io

    sets = os.path.join(setup["kitti_root"], "image_sets", "train.txt")
    a, b = str(tmp_path / "a.pickle"), str(tmp_path / "b.pickle")
    n1 = extract_frustum_data(sets, "training", a, setup["kitti_root"],
                              perturb_box3d=True, augmentX=2, workers=1)
    n2 = extract_frustum_data(sets, "training", b, setup["kitti_root"],
                              perturb_box3d=True, augmentX=2, workers=3)
    assert n1 == n2 > 0
    da = pickle_io.read_stream_pickle(a, pickle_io.REFINE_LABELED_FIELDS)
    db = pickle_io.read_stream_pickle(b, pickle_io.REFINE_LABELED_FIELDS)
    for k in pickle_io.REFINE_LABELED_FIELDS:
        for x, y in zip(da[k], db[k]):
            if isinstance(x, dict):
                for kk in x:
                    np.testing.assert_array_equal(x[kk], y[kk], err_msg=k)
            else:
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                              err_msg=k)
