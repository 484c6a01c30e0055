"""Synthetic raw-KITTI scene generator (for tests and CI — no real data ships).

Writes a miniature dataset in the exact on-disk layout the prep CLI consumes:
``<root>/training/{velodyne/*.bin, calib/*.txt, label_2/*.txt, image_2/*.png}``
plus ``image_sets/{train,val}.txt`` and an rgb-detections file. Scenes contain
a ground plane plus a few cars with dense interior points so frustum
extraction finds real foreground.
"""

from __future__ import annotations

import os

import numpy as np

from frustum_convnet_tpu.core import geometry_np as gnp

# A realistic KITTI P2/Tr/R0 (velo x-forward -> rect z-forward) calibration.
_P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 172.854, 0.2163791],
    [0.0, 0.0, 1.0, 0.002745884],
])
_TR = np.array([
    [7.533745e-03, -9.999714e-01, -6.166020e-04, -4.069766e-03],
    [1.480249e-02, 7.280733e-04, -9.998902e-01, -7.631618e-02],
    [9.998621e-01, 7.523790e-03, 1.480755e-02, -2.717806e-01],
])
_R0 = np.array([
    [9.999239e-01, 9.837760e-03, -7.445048e-03],
    [-9.869795e-03, 9.999421e-01, -4.278459e-03],
    [7.402527e-03, 4.351614e-03, 9.999631e-01],
])

IMG_W, IMG_H = 1242, 375


def _calib_text() -> str:
    rows = {
        "P0": _P2, "P1": _P2, "P2": _P2, "P3": _P2,
        "R0_rect": _R0, "Tr_velo_to_cam": _TR, "Tr_imu_to_velo": _TR,
    }
    return "\n".join(f"{k}: " + " ".join(f"{v:.12e}" for v in m.flatten())
                     for k, m in rows.items()) + "\n"


_CLASS_SPECS = {
    # class -> ((l, w, h) means, (l, w, h) jitter sigmas, det-file typeid)
    "Car": ((3.9, 1.6, 1.5), (0.2, 0.1, 0.1), 2),
    "Pedestrian": ((0.8, 0.6, 1.75), (0.1, 0.05, 0.1), 1),
    "Cyclist": ((1.75, 0.6, 1.75), (0.1, 0.05, 0.1), 3),
}


def make_synthetic_kitti(root: str, num_frames: int = 4, cars_per_frame: int = 2,
                         seed: int = 0, classes=("Car",)) -> None:
    from PIL import Image
    from frustum_convnet_tpu.data.kitti.calib import Calibration

    rng = np.random.default_rng(seed)
    split = os.path.join(root, "training")
    for d in ("velodyne", "calib", "label_2", "image_2"):
        os.makedirs(os.path.join(split, d), exist_ok=True)
    os.makedirs(os.path.join(root, "image_sets"), exist_ok=True)

    calib = Calibration({"P2": _P2, "Tr_velo_to_cam": _TR, "R0_rect": _R0})
    det_lines = []

    for idx in range(num_frames):
        labels = []
        car_clouds = []
        for _ in range(cars_per_frame):
            # draw a class only for multi-class scenes, so single-class
            # generation consumes the same rng stream as before the
            # Pedestrian/Cyclist extension
            cls = (classes[0] if len(classes) == 1
                   else classes[int(rng.integers(len(classes)))])
            means, sigmas, typeid = _CLASS_SPECS[cls]
            depth = rng.uniform(8, 35) if cls == "Car" else rng.uniform(5, 20)
            lateral = rng.uniform(-0.25, 0.25) * depth  # keep inside image FOV
            l, w, h = (m + rng.normal(0, s) for m, s in zip(means, sigmas))
            ry = rng.uniform(-np.pi, np.pi)
            bottom_y = 1.65  # camera height above road
            t = np.array([lateral, bottom_y, depth])
            center = t - np.array([0, h / 2, 0])

            # dense points on the car (in rect frame)
            n_car = 400
            local = rng.uniform(-0.5, 0.5, (n_car, 3)) * np.array([l, h, w])
            R = gnp.roty(ry)
            pts = local @ R.T + center[None]
            car_clouds.append(pts)

            corners = gnp.box3d_corners(center, (l, w, h), ry)
            uv = calib.rect_to_image(corners)
            xmin, ymin = uv.min(0)
            xmax, ymax = uv.max(0)
            xmin, xmax = np.clip([xmin, xmax], 0, IMG_W - 1)
            ymin, ymax = np.clip([ymin, ymax], 0, IMG_H - 1)
            if ymax - ymin < 30:  # keep boxes comfortably above the 25px gate
                ymax = min(IMG_H - 1, ymin + 30)
            alpha = gnp.compute_alpha(t[0], t[2], ry)
            labels.append(
                f"{cls} 0.00 0 {alpha:.2f} {xmin:.2f} {ymin:.2f} {xmax:.2f} {ymax:.2f} "
                f"{h:.2f} {w:.2f} {l:.2f} {t[0]:.2f} {t[1]:.2f} {t[2]:.2f} {ry:.2f}"
            )
            # mimic an external 2D detector: jitter the GT box a little
            jw, jh = (xmax - xmin) * 0.05, (ymax - ymin) * 0.05
            dx1, dy1, dx2, dy2 = rng.uniform(-1, 1, 4) * [jw, jh, jw, jh]
            det_lines.append(
                f"training/image_2/{idx:06d}.png {typeid} "
                f"{rng.uniform(0.7, 0.99):.3f} "
                f"{max(0, xmin + dx1):.2f} {max(0, ymin + dy1):.2f} "
                f"{min(IMG_W - 1, xmax + dx2):.2f} {min(IMG_H - 1, ymax + dy2):.2f}"
            )

        # background: road plane + clutter, in rect frame
        n_bg = 3000
        bg = np.stack([
            rng.uniform(-20, 20, n_bg),
            np.full(n_bg, 1.65) + rng.normal(0, 0.02, n_bg),
            rng.uniform(3, 60, n_bg),
        ], axis=1)
        pc_rect = np.concatenate([bg] + car_clouds, axis=0)
        pc_velo_xyz = calib.rect_to_velo(pc_rect)
        intensity = rng.uniform(0, 1, (len(pc_velo_xyz), 1))
        pc_velo = np.hstack([pc_velo_xyz, intensity]).astype(np.float32)
        pc_velo.tofile(os.path.join(split, "velodyne", f"{idx:06d}.bin"))

        with open(os.path.join(split, "calib", f"{idx:06d}.txt"), "w") as f:
            f.write(_calib_text())
        with open(os.path.join(split, "label_2", f"{idx:06d}.txt"), "w") as f:
            f.write("\n".join(labels) + "\n")
        Image.new("RGB", (IMG_W, IMG_H), (90, 90, 90)).save(
            os.path.join(split, "image_2", f"{idx:06d}.png"))

    ids = [f"{i:06d}" for i in range(num_frames)]
    half = max(1, num_frames // 2)
    with open(os.path.join(root, "image_sets", "train.txt"), "w") as f:
        f.write("\n".join(ids[:half]) + "\n")
    with open(os.path.join(root, "image_sets", "val.txt"), "w") as f:
        f.write("\n".join(ids[half:]) + "\n")
    os.makedirs(os.path.join(root, "rgb_detections"), exist_ok=True)
    train_ids = set(range(half))
    train_lines = [ln for ln in det_lines
                   if int(os.path.basename(ln.split(" ")[0])[:6]) in train_ids]
    val_lines = [ln for ln in det_lines
                 if int(os.path.basename(ln.split(" ")[0])[:6]) not in train_ids]
    with open(os.path.join(root, "rgb_detections", "rgb_detection_train.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(root, "rgb_detections", "rgb_detection_val.txt"), "w") as f:
        f.write("\n".join(val_lines) + "\n")
