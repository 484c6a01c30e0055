"""Headless smoke of the dataset browser tools.

The KITTI frame browser (`tools/viz_kitti.py`, rebuild of the reference's
`kitti/draw_util.py:151-172` loop) and the SUN-RGBD scene browser
(`tools/viz_sunrgbd.py`, rebuild of `sunrgbd/o3d_vis.py`) must run
end-to-end on synthetic scenes in batch (PNG/PLY) mode, and the
dependency-free PLY export must be structurally valid.
"""

import os
import sys

import numpy as np

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tools")
sys.path.insert(0, _TOOLS)


def test_viz_kitti_batch_mode(tmp_path):
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti
    import viz_kitti

    root = str(tmp_path / "kitti")
    make_synthetic_kitti(root, num_frames=2, cars_per_frame=1, seed=0)
    out = str(tmp_path / "viz")
    viz_kitti.main(["--data_root", root, "--idx", "0",
                    "--save_dir", out])
    files = sorted(os.listdir(out))
    assert files == ["000000_boxes.png", "000000_lidar3d.png",
                     "000000_lidar_img.png"], files
    for f in files:
        assert os.path.getsize(os.path.join(out, f)) > 1000


def test_viz_sunrgbd_batch_and_ply(tmp_path):
    from frustum_convnet_tpu.data.sunrgbd.synthetic import make_synthetic_sunrgbd
    import viz_sunrgbd

    root = str(tmp_path / "sun")
    make_synthetic_sunrgbd(root, num_frames=1)
    out = str(tmp_path / "viz")
    viz_sunrgbd.main(["--data_root", root, "--idx", "1",
                      "--save_dir", out, "--ply"])
    files = sorted(os.listdir(out))
    assert "000001_scene.png" in files
    assert "000001_points.ply" in files
    assert any(f.startswith("000001_box") for f in files)

    # points PLY: header counts match the body
    lines = open(os.path.join(out, "000001_points.ply")).read().splitlines()
    assert lines[0] == "ply"
    n = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == n
    xyz_rgb = body[0].split()
    assert len(xyz_rgb) == 6  # xyz + uchar rgb
    r, g, b = (int(c) for c in xyz_rgb[3:])
    assert all(0 <= c <= 255 for c in (r, g, b))

    # box PLY: 8 vertices, 12 edges with valid indices
    box = open(os.path.join(out, "000001_box0.ply")).read().splitlines()
    nv = int([l for l in box if l.startswith("element vertex")][0].split()[-1])
    ne = int([l for l in box if l.startswith("element edge")][0].split()[-1])
    assert (nv, ne) == (8, 12)
    body = box[box.index("end_header") + 1:]
    verts = np.array([[float(x) for x in l.split()] for l in body[:8]])
    assert verts.shape == (8, 3)
    for l in body[8:]:
        a, bb = int(l.split()[0]), int(l.split()[1])
        assert 0 <= a < 8 and 0 <= bb < 8
