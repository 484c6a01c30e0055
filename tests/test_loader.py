"""BatchLoader contracts: multi-host sharding, pad_last, worker invariance.

The loader replaces the reference's torch DataLoader
(`/root/reference/train/train_net_det.py:262-286`) and adds the multi-host
shard split SURVEY §2.3 calls for (each host reads only its
``process_index`` sub-shard of every global batch). These tests pin that
contract directly, independent of the engine drivers.
"""

import os

import numpy as np
import pytest

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.data.kitti.prepare import extract_frustum_data
from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti
from frustum_convnet_tpu.data.provider import FrustumProvider
from frustum_convnet_tpu.engine.loader import BatchLoader


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_raw"))
    make_synthetic_kitti(root, num_frames=6, cars_per_frame=2, seed=0)
    out = str(tmp_path_factory.mktemp("pickles"))
    n = extract_frustum_data(
        os.path.join(root, "image_sets", "val.txt"), "training",
        os.path.join(out, "frustum_caronly_val.pickle"), root,
        perturb_box2d=False, augmentX=1, type_whitelist=("Car",))
    assert n >= 5
    cfg = get_default_cfg()
    merge_cfg_from_list(
        ["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT", "False",
         "DATA.DATA_ROOT", out, "DATA.CAR_ONLY", "True",
         "DATA.NUM_SAMPLES", "128", "DATA.MAX_DEPTH", "48"], cfg)
    # no flip/shift augmentation: items are deterministic, so host shards
    # can be compared against the single-process global batch exactly
    return FrustumProvider(cfg, "val", one_hot=True)


def _batches(ds, **kw):
    loader = BatchLoader(ds, batch_size=4, num_scales=4, shuffle=True,
                         seed=7, **kw)
    return [b for b in loader.epoch(epoch=2)], loader


def test_multihost_shards_tile_the_global_batch(dataset):
    """Concatenating the per-host index sub-shards of batch b reproduces the
    single-process global batch b's indices: same shuffle order, disjoint
    contiguous splits, full coverage. (Item tensors are compared via indices
    because per-frustum point resampling legitimately draws from a per-host
    rng stream — provider semantics, not a loader concern.)"""
    global_batches, _ = _batches(dataset, drop_last=True, pad_last=True)
    host_batches = [
        _batches(dataset, drop_last=True, pad_last=True,
                 process_index=i, process_count=4)[0]
        for i in range(4)
    ]
    assert all(len(hb) == len(global_batches) for hb in host_batches)
    for b, gb in enumerate(global_batches):
        merged = np.concatenate(
            [host_batches[i][b]["_indices"] for i in range(4)])
        np.testing.assert_array_equal(merged, gb["_indices"])
        assert sum(int(host_batches[i][b]["_real"]) for i in range(4)) \
            == int(gb["_real"])
        # deterministic per-item fields agree row-for-row with the global
        # batch (ladders are a pure function of the frustum record)
        for i in range(4):
            hb = host_batches[i][b]
            lo = i * hb["rot_angle"].shape[0]
            hi = lo + hb["rot_angle"].shape[0]
            np.testing.assert_allclose(hb["rot_angle"], gb["rot_angle"][lo:hi])
            for s in range(4):
                np.testing.assert_allclose(hb["refs"][s], gb["refs"][s][lo:hi])


def test_pad_last_marks_real_count(dataset):
    n = len(dataset)
    batches, loader = _batches(dataset, pad_last=True)
    assert len(batches) == (n + 3) // 4
    total_real = sum(int(b["_real"]) for b in batches)
    assert total_real == n
    last = batches[-1]
    assert last["point_cloud"].shape[0] == 4  # static shape held by padding
    # pad rows repeat the last real item's index
    if int(last["_real"]) < 4:
        idx = last["_indices"]
        assert (idx[int(last["_real"]):] == idx[int(last["_real"]) - 1]).all()
    # every dataset index appears exactly once among real rows
    seen = np.concatenate(
        [b["_indices"][:int(b["_real"])] for b in batches])
    assert sorted(seen.tolist()) == list(range(n))


def test_worker_count_does_not_change_batches(dataset):
    a, _ = _batches(dataset, drop_last=False, pad_last=True, num_workers=1)
    b, _ = _batches(dataset, drop_last=False, pad_last=True, num_workers=3)
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        for key in ba:
            if key == "refs":
                for s in range(4):
                    np.testing.assert_array_equal(ba["refs"][s], bb["refs"][s])
            else:
                np.testing.assert_array_equal(
                    np.atleast_1d(ba[key]), np.atleast_1d(bb[key]), err_msg=key)
