"""Real multi-process (multi-host) execution path.

The virtual 8-device mesh used everywhere else runs in ONE process, where
global==local and the multi-host bugs the reference upgrade must avoid
(host-local device_put masquerading as a global batch, checkpoint write
races, host-divergent val metrics) cannot fire. Here two actual processes
join through ``jax.distributed.initialize`` (localhost coordinator, gloo CPU
collectives, 2 local devices each) and run the driver primitives end to end;
the result must match a single-process run over the same global batch.

Replaces/upgrades the reference's whole distributed surface
(`/root/reference/train/train_net_det.py:308-309`, single-process
DataParallel).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CHILD = os.path.join(_ROOT, "tests", "multihost_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _base_env(local_devices: int):
    env = os.environ.copy()
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    for k in ("FRUSTUM_COORDINATOR", "FRUSTUM_NUM_PROCESSES",
              "FRUSTUM_PROCESS_ID", "FRUSTUM_DIST"):
        env.pop(k, None)
    return env


def _launch(env, out_json, params_npy, ckpt_dir):
    return subprocess.Popen(
        [sys.executable, _CHILD, out_json, params_npy, ckpt_dir],
        cwd=_ROOT, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def _run_training_matches_single_process(tmp_path, num_procs: int,
                                         local_devices: int = 2):
    """N actual processes (gloo, `local_devices` CPU devices each) vs one
    single-process run over the same global mesh/batches."""
    port = _free_port()
    procs, outs = [], []
    for pid in range(num_procs):
        env = _base_env(local_devices=local_devices)
        env["FRUSTUM_COORDINATOR"] = f"localhost:{port}"
        env["FRUSTUM_NUM_PROCESSES"] = str(num_procs)
        env["FRUSTUM_PROCESS_ID"] = str(pid)
        out = str(tmp_path / f"p{pid}.json")
        npy = str(tmp_path / f"p{pid}.npy")
        outs.append((out, npy))
        procs.append(_launch(env, out, npy, str(tmp_path / "mh_ckpt")))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    # single-process reference over the same global mesh
    n_dev = num_procs * local_devices
    env = _base_env(local_devices=n_dev)
    ref_out = str(tmp_path / "ref.json")
    ref_npy = str(tmp_path / "ref.npy")
    p = _launch(env, ref_out, ref_npy, str(tmp_path / "ref_ckpt"))
    log = p.communicate(timeout=900)[0]
    assert p.returncode == 0, log[-4000:]

    rs = [json.load(open(o)) for o, _ in outs]
    ref = json.load(open(ref_out))
    assert all(r["process_count"] == num_procs for r in rs), rs
    assert all(r["device_count"] == n_dev for r in rs)
    assert ref["process_count"] == 1 and ref["device_count"] == n_dev

    # write gating: exactly one chief (process 0), and only it wrote
    assert rs[0]["chief"] and not any(r["chief"] for r in rs[1:])
    assert os.path.exists(
        tmp_path / "mh_ckpt" / "checkpoints" / "model_final.msgpack")

    # every host holds bitwise-identical replicated parameters after training
    ps = [np.load(npy) for _, npy in outs]
    for pk in ps[1:]:
        np.testing.assert_array_equal(ps[0], pk)

    # and host-consistent val metrics (incl. the replicated global tail)
    for r in rs[1:]:
        assert abs(rs[0]["val_prec"] - r["val_prec"]) < 1e-6
        assert abs(rs[0]["last_loss"] - r["last_loss"]) < 1e-6

    # the N-process result matches the single-process run over the same
    # global batches; tolerances absorb cross-process psum reduction order
    # through two adam steps (cf. tests/test_parallel.py bounds)
    pref = np.load(ref_npy)
    assert ps[0].shape == pref.shape
    assert float(np.max(np.abs(ps[0] - pref))) < 5e-3
    # loss bound is relative-aware: the total loss is O(60) at this fixture
    # scale, and a 4-way psum reduces in a different order than the
    # single-process mesh (measured ~4e-3 absolute = 7e-5 relative)
    assert (abs(rs[0]["last_loss"] - ref["last_loss"])
            < 2e-3 + 1e-4 * abs(ref["last_loss"]))
    assert abs(rs[0]["val_prec"] - ref["val_prec"]) < 2e-3


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    _run_training_matches_single_process(tmp_path, num_procs=2)


@pytest.mark.slow
def test_four_process_training_matches_single_process(tmp_path):
    """4-way run: global batch 8 shards 2 per process and the 4-item global
    tail shards 1 per process — non-trivial
    make_array_from_process_local_data arithmetic the 2-way test can't hit
    (there every shard split is a clean halving)."""
    _run_training_matches_single_process(tmp_path, num_procs=4)


def test_batch_not_divisible_by_process_count_errors():
    from frustum_convnet_tpu.engine.loader import BatchLoader

    with pytest.raises(ValueError, match="divisible by the process count"):
        BatchLoader(dataset=[], batch_size=10, num_scales=4, process_count=4)


def test_loader_worker_exception_carries_traceback():
    from frustum_convnet_tpu.engine.loader import BatchLoader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i, rng=None):
            raise KeyError(f"corrupt pickle record {i}")

    loader = BatchLoader(Broken(), 4, num_scales=4)
    with pytest.raises(RuntimeError) as ei:
        list(loader.epoch(0))
    msg = str(ei.value)
    assert "corrupt pickle record" in msg  # root cause visible
    assert "KeyError" in msg
    assert "__getitem__" in msg  # full traceback, not just repr


@pytest.mark.slow
def test_two_process_inference_matches_single_process(tmp_path):
    """Multi-host inference: dataset sharded BY BATCH across processes, each
    on its own local mesh, detections merged with one all-gather, chief-only
    writes. The merged result files must match a single-process run's up to
    detection order (the writer's NMS sorts by score; cross-host arrival
    order is not meaningful)."""
    from frustum_convnet_tpu.data.kitti.prepare import extract_frustum_data
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti

    kitti_root = str(tmp_path / "kitti_raw")
    make_synthetic_kitti(kitti_root, num_frames=6, cars_per_frame=2, seed=1)
    pickle_dir = str(tmp_path / "pickles")
    os.makedirs(pickle_dir)
    extract_frustum_data(
        os.path.join(kitti_root, "image_sets", "val.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_val.pickle"), kitti_root,
        perturb_box2d=False, augmentX=1, type_whitelist=("Car",))
    idx_path = os.path.join(kitti_root, "image_sets", "val.txt")

    child = os.path.join(_ROOT, "tests", "multihost_infer_child.py")

    def launch(env, out_dir):
        return subprocess.Popen(
            [sys.executable, child, pickle_dir, idx_path, out_dir],
            cwd=_ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    port = _free_port()
    procs = []
    mh_out = str(tmp_path / "mh_out")
    for pid in range(2):
        env = _base_env(local_devices=2)
        env["FRUSTUM_COORDINATOR"] = f"localhost:{port}"
        env["FRUSTUM_NUM_PROCESSES"] = "2"
        env["FRUSTUM_PROCESS_ID"] = str(pid)
        procs.append(launch(env, mh_out))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    ref_out = str(tmp_path / "ref_out")
    p = launch(_base_env(local_devices=4), ref_out)
    log = p.communicate(timeout=900)[0]
    assert p.returncode == 0, log[-4000:]

    mh_data = os.path.join(mh_out, "val_nms", "result", "data")
    ref_data = os.path.join(ref_out, "val_nms", "result", "data")
    mh_files = sorted(os.listdir(mh_data))
    assert mh_files == sorted(os.listdir(ref_data)) and mh_files

    def rows(path):
        out = []
        for line in open(path).read().splitlines():
            parts = line.split()
            out.append((parts[0], np.asarray([float(x) for x in parts[1:]])))
        # canonical order: by values (cross-host arrival order isn't
        # meaningful; the different executables round ~1e-6 apart)
        out.sort(key=lambda r: (r[0],) + tuple(np.round(r[1], 4)))
        return out

    for name in mh_files:
        got, want = rows(os.path.join(mh_data, name)), rows(
            os.path.join(ref_data, name))
        assert len(got) == len(want), name
        for (gc, gv), (wc, wv) in zip(got, want):
            assert gc == wc, name
            np.testing.assert_allclose(gv, wv, rtol=1e-4, atol=1e-4,
                                       err_msg=name)
