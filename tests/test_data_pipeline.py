"""End-to-end data path: synthetic raw KITTI -> prep CLI -> provider -> batch."""

import os

import numpy as np
import pytest

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.data import pickle_io
from frustum_convnet_tpu.data.kitti.prepare import (
    extract_frustum_data,
    extract_frustum_data_rgb_detection,
)
from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti
from frustum_convnet_tpu.data.provider import FrustumProvider, collate_batch


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_raw"))
    make_synthetic_kitti(root, num_frames=4, cars_per_frame=2, seed=0)
    return root


@pytest.fixture(scope="module")
def pickle_dir(kitti_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pickles"))
    n = extract_frustum_data(
        os.path.join(kitti_root, "image_sets", "train.txt"), "training",
        os.path.join(out, "frustum_caronly_train.pickle"), kitti_root,
        perturb_box2d=True, augmentX=3, type_whitelist=("Car",))
    assert n > 0
    n = extract_frustum_data(
        os.path.join(kitti_root, "image_sets", "val.txt"), "training",
        os.path.join(out, "frustum_caronly_val.pickle"), kitti_root,
        perturb_box2d=False, augmentX=1, type_whitelist=("Car",))
    assert n > 0
    n = extract_frustum_data_rgb_detection(
        os.path.join(kitti_root, "rgb_detections", "rgb_detection_val.txt"),
        "training",
        os.path.join(out, "frustum_caronly_val_rgb_detection.pickle"),
        kitti_root, type_whitelist=("Car",))
    assert n > 0
    return out


def make_cfg(pickle_dir):
    cfg = get_default_cfg()
    merge_cfg_from_list(
        ["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT", "False",
         "DATA.DATA_ROOT", pickle_dir, "DATA.CAR_ONLY", "True",
         "DATA.NUM_SAMPLES", "256"],
        cfg,
    )
    return cfg


def test_pickle_roundtrip(pickle_dir):
    data = pickle_io.read_stream_pickle(
        os.path.join(pickle_dir, "frustum_caronly_train.pickle"),
        pickle_io.KITTI_LABELED_FIELDS)
    n = len(data["id"])
    assert n > 0
    assert data["box3d"][0].shape == (8, 3)
    assert data["points"][0].shape[1] == 4
    # foreground labels exist
    assert sum(s.sum() for s in data["seg"]) > 0


def test_provider_item_labeled(pickle_dir):
    cfg = make_cfg(pickle_dir)
    ds = FrustumProvider(cfg, "train", random_flip=True, random_shift=True)
    rng = np.random.default_rng(3)
    item = ds.__getitem__(0, rng)
    assert item["point_cloud"].shape == (256, 3)
    assert len(item["refs"]) == 4
    assert item["refs"][0].shape == (280, 3)
    assert item["refs"][1].shape == (140, 3)
    # at least one positive section (nearest forced if none inside)
    assert (item["cls_label"] == 1).sum() >= 1
    assert item["one_hot"].shape == (3,)
    assert item["one_hot"][0] == 1  # Car

    # after rotate-to-center, the gt box center should sit near the z axis
    c = item["box3d_center"]
    assert abs(c[0]) < 0.3 * abs(c[2]) + 2.0


def test_provider_rgb_detection(pickle_dir):
    cfg = make_cfg(pickle_dir)
    ds = FrustumProvider(cfg, "val", from_rgb_detection=True)
    item = ds.__getitem__(0, np.random.default_rng(0))
    assert "rgb_prob" in item and "cls_label" not in item
    assert item["point_cloud"].shape == (256, 3)


def test_collate_matches_model_layout(pickle_dir):
    cfg = make_cfg(pickle_dir)
    ds = FrustumProvider(cfg, "train")
    rng = np.random.default_rng(0)
    items = [ds.__getitem__(i % len(ds), rng) for i in range(4)]
    batch = collate_batch(items, num_scales=4)
    assert batch["point_cloud"].shape == (4, 256, 3)
    assert batch["refs"][1].shape == (4, 140, 3)
    assert batch["cls_label"].shape == (4, 140)
    assert batch["box3d_center"].shape == (4, 3)


def test_section_labels_sane(pickle_dir):
    """Positive sections must actually be near the gt center in depth."""
    cfg = make_cfg(pickle_dir)
    ds = FrustumProvider(cfg, "val")
    rng = np.random.default_rng(1)
    for i in range(min(4, len(ds))):
        item = ds.__getitem__(i, rng)
        pos = item["refs"][1][item["cls_label"] == 1]
        gt_z = item["box3d_center"][2]
        assert np.abs(pos[:, 2] - gt_z).min() < 3.0


def test_ref_basis_reconstructs_ladders(pickle_dir):
    """Device-side ladder rebuild contract: ref(z) = z * dir + off must
    reproduce the host-generated (rotated, possibly flipped) ladders."""
    cfg = make_cfg(pickle_dir)
    ds = FrustumProvider(cfg, "train", one_hot=True, random_flip=True,
                         random_shift=True)
    depths = ds.ref_depths()
    rng = np.random.default_rng(7)
    for index in range(min(len(ds), 8)):
        item = ds.__getitem__(index, rng)
        d, o = item["ref_dir"], item["ref_off"]
        for z, ref in zip(depths, item["refs"]):
            rebuilt = o[None, :] + z[:, None].astype(np.float32) * d[None, :]
            np.testing.assert_allclose(rebuilt, ref, atol=2e-4)


def test_video_dataset_and_draw_util_viz(tmp_path):
    """KittiVideoDataset (video calib convention) + draw_util-equivalent
    visualizations run end-to-end on a synthetic raw dump
    (ref kitti_object.py:71-102, draw_util.py:26-145)."""
    import numpy as np
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti
    from frustum_convnet_tpu.data.kitti.object import (KittiObjectDataset,
                                                       KittiVideoDataset)
    from frustum_convnet_tpu.utils import visualize as viz

    root = str(tmp_path / "kitti")
    make_synthetic_kitti(root, num_frames=2)
    ds = KittiObjectDataset(root, "training")
    calib = ds.get_calibration(0)

    # raw-video layout: reuse the object-split files, video-format calib
    vdir = tmp_path / "video"
    (vdir / "img").mkdir(parents=True)
    (vdir / "velo").mkdir()
    for i in range(2):
        img = ds.get_image(i)
        from PIL import Image

        Image.fromarray(img).save(vdir / "img" / f"{i:010d}.png")
        ds.get_lidar(i).tofile(vdir / "velo" / f"{i:010d}.bin")
    r0 = " ".join(str(v) for v in calib.R0.reshape(-1))
    p2 = " ".join(str(v) for v in calib.P.reshape(-1))
    rv = " ".join(str(v) for v in calib.V2C[:3, :3].reshape(-1))
    tv = " ".join(str(v) for v in calib.V2C[:, 3].reshape(-1))
    (vdir / "calib_cam_to_cam.txt").write_text(
        f"R_rect_00: {r0}\nP_rect_02: {p2}\n")
    (vdir / "calib_velo_to_cam.txt").write_text(f"R: {rv}\nT: {tv}\n")

    vds = KittiVideoDataset(str(vdir / "img"), str(vdir / "velo"), str(vdir))
    assert len(vds) == 2
    vcal = vds.get_calibration()
    np.testing.assert_allclose(vcal.P, calib.P)
    np.testing.assert_allclose(vcal.V2C, calib.V2C)
    np.testing.assert_allclose(vcal.R0, calib.R0)
    img = vds.get_image(0)
    pc = vds.get_lidar(0)
    assert img.ndim == 3 and pc.shape[1] == 4

    objects = ds.get_label_objects(0)
    viz.show_image_with_boxes(img, objects, vcal,
                              save_path=str(tmp_path / "boxes.png"))
    viz.show_lidar_on_image(pc, img, vcal,
                            save_path=str(tmp_path / "lidar.png"))
    viz.show_lidar_with_boxes(pc, objects, vcal,
                              save_path=str(tmp_path / "lidar3d.png"))
    for f in ("boxes.png", "lidar.png", "lidar3d.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_calib_image_to_velo_roundtrip(tmp_path):
    """image_to_velo inverts velo_to_image at the projected depth
    (ref kitti_util.py:236-238). The reference back-projection formula
    ignores P[2,3], so the roundtrip is exact only for a pure-pinhole P;
    the synthetic calib (nonzero P[2,3], like real KITTI) stays within the
    same centimeter-scale approximation the reference accepts."""
    import numpy as np
    from frustum_convnet_tpu.data.kitti.calib import Calibration
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti
    from frustum_convnet_tpu.data.kitti.object import KittiObjectDataset

    root = str(tmp_path / "kitti")
    make_synthetic_kitti(root, num_frames=1)
    calib = KittiObjectDataset(root, "training").get_calibration(0)

    pinhole = calib.as_dict()
    P = pinhole["P2"].copy()
    P[2, 3] = 0.0
    pinhole["P2"] = P
    exact = Calibration(pinhole)

    rng = np.random.default_rng(0)
    velo = rng.uniform([5, -10, -2], [40, 10, 2], size=(64, 3))
    for cal, tol in ((exact, 1e-5), (calib, 0.15)):  # float32 calib arrays
        rect = cal.velo_to_rect(velo)
        uv = cal.velo_to_image(velo)
        uv_depth = np.concatenate([uv, rect[:, 2:3]], axis=1)
        back = cal.image_to_velo(uv_depth)
        np.testing.assert_allclose(back, velo, rtol=0, atol=tol)


def test_rotation_helpers_and_orientation_3d(tmp_path):
    """rotx/rotz are proper rotations; compute_orientation_3d endpoints are
    center and center + l*heading (ref kitti_util.py:241-266,362-389)."""
    import numpy as np
    from frustum_convnet_tpu.core.geometry_np import rotx, roty, rotz
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti
    from frustum_convnet_tpu.data.kitti.object import KittiObjectDataset
    from frustum_convnet_tpu.utils.visualize import compute_orientation_3d

    for rot in (rotx(0.3), roty(-1.1), rotz(2.0)):
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(rot), 1.0)
    # rotz rotates x toward y for positive angles
    np.testing.assert_allclose(rotz(np.pi / 2) @ [1, 0, 0], [0, 1, 0],
                               atol=1e-12)

    root = str(tmp_path / "kitti")
    make_synthetic_kitti(root, num_frames=1)
    ds = KittiObjectDataset(root, "training")
    calib = ds.get_calibration(0)
    obj = ds.get_label_objects(0)[0]

    ori2d, ori3d = compute_orientation_3d(obj, calib)
    np.testing.assert_allclose(ori3d[0], obj.t, atol=1e-12)
    head = np.array([np.cos(obj.ry) * obj.l, 0.0, -np.sin(obj.ry) * obj.l])
    np.testing.assert_allclose(ori3d[1] - ori3d[0], head, atol=1e-9)
    if np.all(ori3d[:, 2] >= 0.1):
        assert ori2d is not None and ori2d.shape == (2, 2)
        np.testing.assert_allclose(ori2d, calib.rect_to_image(ori3d))


def test_people_classes_flow_through_prep_and_provider(tmp_path):
    """Pedestrian/Cyclist synthetic scenes -> pedcyc prep -> provider item
    (exercises the det-file typeid mapping 1:Ped/3:Cyc and the people
    pickle prefix, ref `prepare_data.py:428-446,616-687`)."""
    import numpy as np
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti
    from frustum_convnet_tpu.data.kitti.prepare import (
        extract_frustum_data, extract_frustum_data_rgb_detection)
    from frustum_convnet_tpu.data.provider import FrustumProvider

    root = str(tmp_path / "kitti")
    make_synthetic_kitti(root, num_frames=6, cars_per_frame=2, seed=5,
                         classes=("Pedestrian", "Cyclist"))
    pk = str(tmp_path / "pickles")
    os.makedirs(pk)
    sets = os.path.join(root, "image_sets")
    wh = ("Pedestrian", "Cyclist")
    n = extract_frustum_data(
        os.path.join(sets, "val.txt"), "training",
        os.path.join(pk, "frustum_pedcyc_val.pickle"), root,
        perturb_box2d=False, augmentX=1, type_whitelist=wh)
    assert n > 0
    n = extract_frustum_data_rgb_detection(
        os.path.join(root, "rgb_detections", "rgb_detection_val.txt"),
        "training", os.path.join(pk, "frustum_pedcyc_val_rgb_detection.pickle"),
        root, type_whitelist=wh)
    assert n > 0

    cfg = get_default_cfg()
    merge_cfg_from_list(
        ["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT", "False",
         "DATA.DATA_ROOT", pk, "DATA.CAR_ONLY", "False",
         "DATA.PEOPLE_ONLY", "True",
         "DATA.NUM_SAMPLES", "128",
         "DATA.STRIDE", "(0.1, 0.2, 0.4, 0.8)",
         "DATA.HEIGHT_HALF", "(0.1, 0.2, 0.4, 0.8)"], cfg)
    ds = FrustumProvider(cfg, "val", one_hot=True)
    rng = np.random.default_rng(0)
    types = {ds.data["type"][i] for i in range(len(ds))}
    assert types <= {"Pedestrian", "Cyclist"} and len(types) == 2
    item = ds.__getitem__(0, rng)
    assert item["one_hot"].shape == (3,) and item["one_hot"].sum() == 1
    ds_det = FrustumProvider(cfg, "val", one_hot=True, from_rgb_detection=True)
    item = ds_det.__getitem__(0, rng)
    assert "rgb_prob" in item


def test_prep_workers_deterministic(kitti_root, tmp_path):
    """Parallel prep (--workers) is bit-identical to sequential: per-frame
    rng keying makes the output independent of worker count."""
    a = str(tmp_path / "a.pickle")
    b = str(tmp_path / "b.pickle")
    train_txt = os.path.join(kitti_root, "image_sets", "train.txt")
    n1 = extract_frustum_data(train_txt, "training", a, kitti_root,
                              perturb_box2d=True, augmentX=3,
                              type_whitelist=("Car",), workers=1)
    n3 = extract_frustum_data(train_txt, "training", b, kitti_root,
                              perturb_box2d=True, augmentX=3,
                              type_whitelist=("Car",), workers=3)
    assert n1 == n3 > 0
    da = pickle_io.read_stream_pickle(a, pickle_io.KITTI_LABELED_FIELDS)
    db = pickle_io.read_stream_pickle(b, pickle_io.KITTI_LABELED_FIELDS)
    for k in pickle_io.KITTI_LABELED_FIELDS:
        assert len(da[k]) == len(db[k]), k
        for x, y in zip(da[k], db[k]):
            if isinstance(x, dict):
                for kk in x:
                    np.testing.assert_array_equal(x[kk], y[kk], err_msg=k)
            else:
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                              err_msg=k)


def test_synthetic_difficulty_mix(tmp_path):
    """``difficulty_mix=True`` spans the three KITTI difficulty gates
    (`evaluate_object_3d_offline.cpp:43-45`): occlusion levels 0/1/2,
    truncations across the 0.15/0.3/0.5 boundaries, heights above and below
    the 40px easy gate but never under the 25px floor — and stays
    deterministic under a fixed seed. The default path is unchanged."""
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti

    root = str(tmp_path / "mix")
    make_synthetic_kitti(root, num_frames=40, cars_per_frame=2, seed=1,
                         difficulty_mix=True)
    occ, trunc, heights = [], [], []
    label_dir = os.path.join(root, "training", "label_2")
    for f in sorted(os.listdir(label_dir)):
        for line in open(os.path.join(label_dir, f)):
            p = line.split()
            trunc.append(float(p[1]))
            occ.append(int(p[2]))
            heights.append(float(p[7]) - float(p[5]))
    occ, trunc, heights = map(np.asarray, (occ, trunc, heights))
    assert set(occ) == {0, 1, 2}
    assert (trunc > 0.30).any() and (trunc <= 0.15).any()
    assert heights.min() >= 25.0
    assert (heights < 40.0).any() and (heights >= 40.0).any()
    easy = (heights >= 40) & (occ == 0) & (trunc <= 0.15)
    mod = (heights >= 25) & (occ <= 1) & (trunc <= 0.30)
    assert 0.15 < easy.mean() < 0.65
    assert easy.mean() < mod.mean() < 1.0

    # deterministic regeneration (the protocol cache is rebuilt each round)
    root2 = str(tmp_path / "mix2")
    make_synthetic_kitti(root2, num_frames=40, cars_per_frame=2, seed=1,
                         difficulty_mix=True)
    for f in sorted(os.listdir(label_dir)):
        a = open(os.path.join(label_dir, f)).read()
        b = open(os.path.join(root2, "training", "label_2", f)).read()
        assert a == b
