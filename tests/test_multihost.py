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


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        env = _base_env(local_devices=2)
        env["FRUSTUM_COORDINATOR"] = f"localhost:{port}"
        env["FRUSTUM_NUM_PROCESSES"] = "2"
        env["FRUSTUM_PROCESS_ID"] = str(pid)
        out = str(tmp_path / f"p{pid}.json")
        npy = str(tmp_path / f"p{pid}.npy")
        outs.append((out, npy))
        procs.append(_launch(env, out, npy, str(tmp_path / "mh_ckpt")))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    # single-process reference over the same 4-device global mesh
    env = _base_env(local_devices=4)
    ref_out = str(tmp_path / "ref.json")
    ref_npy = str(tmp_path / "ref.npy")
    p = _launch(env, ref_out, ref_npy, str(tmp_path / "ref_ckpt"))
    log = p.communicate(timeout=900)[0]
    assert p.returncode == 0, log[-4000:]

    r0 = json.load(open(outs[0][0]))
    r1 = json.load(open(outs[1][0]))
    ref = json.load(open(ref_out))
    assert (r0["process_count"], r1["process_count"]) == (2, 2), (r0, r1)
    assert r0["device_count"] == r1["device_count"] == 4
    assert ref["process_count"] == 1 and ref["device_count"] == 4

    # write gating: exactly one chief, and only it wrote the checkpoint
    assert r0["chief"] and not r1["chief"]
    assert os.path.exists(
        tmp_path / "mh_ckpt" / "checkpoints" / "model_final.msgpack")

    # both hosts hold bitwise-identical replicated parameters after training
    p0 = np.load(outs[0][1])
    p1 = np.load(outs[1][1])
    np.testing.assert_array_equal(p0, p1)

    # and host-consistent val metrics (incl. the replicated global tail)
    assert abs(r0["val_prec"] - r1["val_prec"]) < 1e-6
    assert abs(r0["last_loss"] - r1["last_loss"]) < 1e-6

    # the 2-process result matches the single-process run over the same
    # global batches; tolerances absorb cross-process psum reduction order
    # through two adam steps (cf. tests/test_parallel.py bounds)
    pref = np.load(ref_npy)
    assert p0.shape == pref.shape
    assert float(np.max(np.abs(p0 - pref))) < 5e-3
    assert abs(r0["last_loss"] - ref["last_loss"]) < 2e-3
    assert abs(r0["val_prec"] - ref["val_prec"]) < 2e-3


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
