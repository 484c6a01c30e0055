"""SUN-RGBD family: synthetic scenes -> prep -> provider -> train -> test/VOC AP."""

import os

import numpy as np
import pytest

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.data import pickle_io
from frustum_convnet_tpu.data.provider import collate_batch
from frustum_convnet_tpu.data.provider_sunrgbd import FrustumSunrgbdProvider
from frustum_convnet_tpu.data.sunrgbd.prepare import (
    extract_frustum_data,
    extract_frustum_data_rgb_detection,
)
from frustum_convnet_tpu.data.sunrgbd.synthetic import make_synthetic_sunrgbd
from frustum_convnet_tpu.evaluation.sunrgbd_eval import (build_gt_all, eval_det,
                                                        voc_ap)

pytestmark = pytest.mark.slow  # full-pipeline test: excluded from the quick tier

WHITELIST = ("bed", "chair", "table", "sofa",
             "bathtub", "bookshelf", "desk", "dresser", "night_stand", "toilet")

SUN_TINY = [
    "MODEL.FILE", "det_base_sunrgbd", "DATA.FILE", "provider_sample_sunrgbd",
    "DATA.DATASET_NAME", "SUNRGBD", "DATA.MAX_DEPTH", "8",
    "DATA.WITH_EXTRA_FEAT", "False", "DATA.NUM_SAMPLES", "256",
    "DATA.STRIDE", "(0.25, 0.5, 1.0, 2.0, 4.0)",
    "DATA.HEIGHT_HALF", "(0.25, 0.5, 1.0, 2.0, 4.0)",
    "TEST.METHOD", "top", "IOU_THRESH", "0.25",
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("sunrgbd")
    sun_root = str(root / "mysunrgbd")
    make_synthetic_sunrgbd(sun_root, num_frames=8, objects_per_frame=2, seed=4)
    pickle_dir = str(root / "pickles")
    os.makedirs(pickle_dir)
    sets = os.path.join(sun_root, "image_sets")
    n = extract_frustum_data(
        sun_root, os.path.join(sets, "train.txt"), "training",
        os.path.join(pickle_dir, "sunrgbd_train_aug5x.pickle"),
        WHITELIST, perturb_box2d=True, augmentX=3)
    assert n > 0
    n = extract_frustum_data(
        sun_root, os.path.join(sets, "val.txt"), "training",
        os.path.join(pickle_dir, "sunrgbd_val.pickle"),
        WHITELIST, perturb_box2d=False, augmentX=1)
    assert n > 0
    n = extract_frustum_data_rgb_detection(
        sun_root, os.path.join(sun_root, "det_val.txt"), "training",
        os.path.join(pickle_dir, "sunrgbd_rgb_det_val.pickle"), WHITELIST)
    assert n > 0
    return {"sun_root": sun_root, "pickle_dir": pickle_dir,
            "output_dir": str(root / "output")}


def sun_cfg(pickle_dir):
    cfg = get_default_cfg()
    merge_cfg_from_list(SUN_TINY + ["DATA.DATA_ROOT", pickle_dir], cfg)
    return cfg


def test_prepared_pickles(setup):
    d = pickle_io.read_dict_pickle(
        os.path.join(setup["pickle_dir"], "sunrgbd_train_aug5x.pickle"))
    assert d["box3d"][0].shape == (8, 3)
    assert d["input"][0].shape[1] == 6  # xyz + rgb
    assert all(l.sum() >= 5 for l in d["label"])
    assert d["calib_K"][0].shape == (3, 3)


def test_provider_item(setup):
    cfg = sun_cfg(setup["pickle_dir"])
    ds = FrustumSunrgbdProvider(cfg, "train", random_flip=True, random_shift=True)
    item = ds.__getitem__(0, np.random.default_rng(3))
    assert item["point_cloud"].shape == (256, 3)
    assert [r.shape[0] for r in item["refs"]] == [32, 16, 8, 4, 2]
    assert (item["cls_label"] == 1).sum() >= 1
    assert item["one_hot"].shape == (10,)
    batch = collate_batch([item, item], num_scales=5)
    assert batch["refs"][0].shape == (2, 32, 3)


def test_provider_rgbdet(setup):
    cfg = sun_cfg(setup["pickle_dir"])
    ds = FrustumSunrgbdProvider(
        cfg, "val", from_rgb_detection=True,
        overwritten_data_path=os.path.join(setup["pickle_dir"], "sunrgbd_rgb_det_val.pickle"))
    item = ds.__getitem__(0, np.random.default_rng(0))
    assert "rgb_prob" in item


def test_voc_ap_properties():
    rec = np.array([0.1, 0.2, 0.5, 1.0])
    prec = np.array([1.0, 1.0, 0.8, 0.6])
    ap = voc_ap(rec, prec)
    assert 0.6 <= ap <= 1.0
    assert voc_ap(rec, np.ones(4)) == 1.0


def test_eval_det_perfect(setup):
    """GT boxes as predictions -> AP 1.0 per class."""
    idx_list = [int(l) for l in open(os.path.join(setup["sun_root"], "image_sets", "val.txt"))]
    gt_all = build_gt_all(setup["sun_root"], idx_list, WHITELIST)
    pred_all = {cls: {img: [(box, 0.9 - 0.01 * i) for i, box in enumerate(boxes)]
                      for img, boxes in per_img.items()}
                for cls, per_img in gt_all.items()}
    _, _, aps = eval_det(pred_all, gt_all, ovthresh=0.25)
    assert all(abs(ap - 1.0) < 1e-6 for ap in aps.values()), aps


def test_sunrgbd_train_and_test(setup, monkeypatch):
    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.engine import train as train_mod
    from frustum_convnet_tpu.engine import test_sunrgbd as test_mod

    overrides = SUN_TINY + [
        "DATA.DATA_ROOT", setup["pickle_dir"],
        "OUTPUT_DIR", setup["output_dir"],
        "TRAIN.BATCH_SIZE", "8", "TEST.BATCH_SIZE", "8",
        "TRAIN.MAX_EPOCH", "1", "disp", "1",
        "OVER_WRITE_TEST_FILE",
        os.path.join(setup["pickle_dir"], "sunrgbd_rgb_det_val.pickle"),
    ]
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)
    train_mod.main(["--cfg", "cfgs/det_sample_sunrgbd.yaml"] + overrides)
    final = os.path.join(setup["output_dir"], "checkpoints", "model_final.msgpack")
    assert os.path.exists(final)

    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(test_mod, "cfg", config_mod.cfg, raising=True)
    aps = test_mod.main([
        "--cfg", "cfgs/det_sample_sunrgbd.yaml",
        "--sunrgbd_dir", setup["sun_root"],
        "--val_idx", os.path.join(setup["sun_root"], "image_sets", "val.txt"),
    ] + overrides + ["TEST.WEIGHTS", final, "FROM_RGB_DET", "True"])
    assert isinstance(aps, dict) and len(aps) > 0
    assert os.path.exists(os.path.join(setup["output_dir"], "test", "result", "sunrgbd_ap.json"))


def test_sunrgbd_prep_workers_deterministic(setup, tmp_path):
    """Parallel SUN-RGBD prep is bit-identical to sequential."""
    from frustum_convnet_tpu.data import pickle_io

    sets = os.path.join(setup["sun_root"], "image_sets", "train.txt")
    a, b = str(tmp_path / "a.pickle"), str(tmp_path / "b.pickle")
    n1 = extract_frustum_data(setup["sun_root"], sets, "training", a,
                              WHITELIST, perturb_box2d=True, augmentX=2,
                              workers=1)
    n2 = extract_frustum_data(setup["sun_root"], sets, "training", b,
                              WHITELIST, perturb_box2d=True, augmentX=2,
                              workers=3)
    assert n1 == n2 > 0
    da = pickle_io.read_dict_pickle(a)
    db = pickle_io.read_dict_pickle(b)
    assert set(da) == set(db)
    for k in da:
        for x, y in zip(da[k], db[k]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=k)
