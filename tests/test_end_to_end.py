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

pytestmark = pytest.mark.slow  # full-pipeline test: excluded from the quick tier


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    kitti_root = str(root / "kitti_raw")
    # 12 frames: enough val GT boxes that the 41-point AP discriminator in
    # test_learning_signal_and_ap_beats_random is not dominated by one box
    make_synthetic_kitti(kitti_root, num_frames=12, cars_per_frame=2, seed=1)
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


def _read_last_val_scalars(output_dir):
    import json
    path = os.path.join(output_dir, "tb_logger", "train.jsonl")
    last = {}
    for line in open(path):
        rec = json.loads(line)
        if rec.get("key", "").startswith("val/"):
            last[rec["key"]] = rec["value"]
    return last


def _ap3d_easy(results):
    return results["car"]["detection_3d"][0]


def test_learning_signal_and_ap_beats_random(workdir, monkeypatch):
    """Gradient-path guard (VERDICT r1 weak #7): train long enough that the
    val metrics and official-protocol AP clearly beat random init — a
    silently broken loss/gradient would fail this."""
    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.engine import test as test_mod
    from frustum_convnet_tpu.engine import train as train_mod

    out_dir = os.path.join(workdir["output_dir"], "learn")
    overrides = TINY_OVERRIDES + [
        "DATA.DATA_ROOT", workdir["pickle_dir"],
        "OUTPUT_DIR", out_dir,
        "TRAIN.MAX_EPOCH", "10",
        "TRAIN.BASE_LR", "3e-3",
        "TRAIN.LR_STEPS", "(8,)",
    ]
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)
    train_mod.main(["--cfg", "cfgs/det_sample.yaml"] + overrides)

    val = _read_last_val_scalars(out_dir)
    # random init sits at IoU_3D ~0.08 and cls_acc ~0.5 on this data
    assert val["val/IoU_3D"] > 0.30, val
    assert val["val/cls_acc"] > 0.85, val
    # reproducibility snapshot written (ref utils/utils.py:12-25 equivalent)
    assert os.path.exists(os.path.join(out_dir, "config_snapshot.yaml"))

    gt_dir = os.path.join(workdir["kitti_root"], "training", "label_2")
    idx_path = os.path.join(workdir["kitti_root"], "image_sets", "val.txt")
    final = os.path.join(out_dir, "checkpoints", "model_final.msgpack")

    # the official 0.7 3D-IoU car threshold is unreachable for this tiny
    # synthetic run; 0.25 keeps AP a sharp trained-vs-random discriminator
    from frustum_convnet_tpu.evaluation import kitti_eval
    monkeypatch.setitem(kitti_eval.MIN_OVERLAP, "car", 0.25)

    def run_eval(weights):
        monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
        monkeypatch.setattr(test_mod, "cfg", config_mod.cfg, raising=True)
        args = ["--cfg", "cfgs/det_sample.yaml", "--gt_dir", gt_dir,
                "--idx_path", idx_path] + overrides + ["TEST.METHOD", "nms"]
        if weights:
            args += ["TEST.WEIGHTS", weights]
        return test_mod.main(args)

    ap_random = _ap3d_easy(run_eval(None))
    ap_trained = _ap3d_easy(run_eval(final))
    assert ap_trained > ap_random + 5.0, (ap_trained, ap_random)


def test_extend_from_det_end_to_end(workdir, monkeypatch):
    """DATA.EXTEND_FROM_DET: det-assigned pickles feed train AND val
    (ref `train_net_det.py:270-277`, `provider_sample.py:110-126`)."""
    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.data.kitti.prepare import extract_frustum_det_data
    from frustum_convnet_tpu.engine import train as train_mod

    kitti_root = workdir["kitti_root"]
    pickle_dir = workdir["pickle_dir"]
    n_train = extract_frustum_det_data(
        os.path.join(kitti_root, "image_sets", "train.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_train_det.pickle"), kitti_root,
        os.path.join(kitti_root, "rgb_detections", "rgb_detection_train.txt"),
        perturb_box2d=True, augmentX=2, type_whitelist=("Car",))
    n_val = extract_frustum_det_data(
        os.path.join(kitti_root, "image_sets", "val.txt"), "training",
        os.path.join(pickle_dir, "frustum_caronly_val_det.pickle"), kitti_root,
        os.path.join(kitti_root, "rgb_detections", "rgb_detection_val.txt"),
        perturb_box2d=False, augmentX=1, type_whitelist=("Car",))
    assert n_train > 0 and n_val > 0

    # provider sees base + det frustums concatenated
    from frustum_convnet_tpu.data.provider import FrustumProvider
    cfg2 = config_mod.get_default_cfg()
    config_mod.merge_cfg_from_file("cfgs/det_sample.yaml", cfg2)
    config_mod.merge_cfg_from_list(
        ["DATA.DATA_ROOT", pickle_dir, "DATA.NUM_SAMPLES", "128",
         "DATA.MAX_DEPTH", "48", "DATA.STRIDE", "(1.0, 2.0, 4.0, 8.0)",
         "DATA.HEIGHT_HALF", "(1.0, 2.0, 4.0, 8.0)"], cfg2)
    base = FrustumProvider(cfg2, "train", one_hot=True)
    ext = FrustumProvider(cfg2, "train", one_hot=True, extend_from_det=True)
    assert len(ext) == len(base) + n_train
    item = ext.__getitem__(len(ext) - 1, np.random.default_rng(0))
    assert item["point_cloud"].shape[0] == 128

    out_dir = os.path.join(workdir["output_dir"], "ext_det")
    overrides = TINY_OVERRIDES + [
        "DATA.DATA_ROOT", pickle_dir,
        "OUTPUT_DIR", out_dir,
        "TRAIN.MAX_EPOCH", "1",
        "DATA.EXTEND_FROM_DET", "True",
    ]
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)
    train_mod.main(["--cfg", "cfgs/det_sample.yaml"] + overrides)
    assert os.path.exists(os.path.join(out_dir, "checkpoints", "model_final.msgpack"))


def test_grouped_dispatch_small_ladder(workdir, monkeypatch):
    """Regression: the grouped nms dispatch must clamp its fg cap to the
    section count (top_k(k) with k > L is a trace-time error; the tiny
    sample ladder has L=24 < the default cap of 64). TEST.BATCH_SIZE=1
    forces >= `group` batches so `build_infer_group_fn` actually runs."""
    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.engine import test as test_mod

    out_dir = os.path.join(workdir["output_dir"], "small_ladder")
    overrides = TINY_OVERRIDES + [
        "DATA.DATA_ROOT", workdir["pickle_dir"],
        "OUTPUT_DIR", out_dir,
        "TEST.BATCH_SIZE", "1",
        "TEST.METHOD", "nms",
    ]
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(test_mod, "cfg", config_mod.cfg, raising=True)
    gt_dir = os.path.join(workdir["kitti_root"], "training", "label_2")
    idx_path = os.path.join(workdir["kitti_root"], "image_sets", "val.txt")
    results = test_mod.main(["--cfg", "cfgs/det_sample.yaml", "--gt_dir",
                             gt_dir, "--idx_path", idx_path] + overrides)
    assert results is not None and "car" in results


def test_resume_and_finetune_paths(workdir, monkeypatch):
    """RESUME continues from the checkpointed epoch; resuming a finished run
    (start_epoch == MAX_EPOCH) takes the fine-tune quirk: epoch counters
    reset AND the LR schedule restarts at base LR with adam moments kept
    (ref `train_net_det.py:345-361`)."""
    import json

    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.engine import train as train_mod

    out_dir = os.path.join(workdir["output_dir"], "resume")
    base = TINY_OVERRIDES + [
        "DATA.DATA_ROOT", workdir["pickle_dir"],
        "OUTPUT_DIR", out_dir,
    ]

    def run(extra):
        monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
        monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)
        train_mod.main(["--cfg", "cfgs/det_sample.yaml"] + base + extra)

    run(["TRAIN.MAX_EPOCH", "2"])
    final = os.path.join(out_dir, "checkpoints", "model_final.msgpack")
    assert os.path.exists(final)

    # continue-training resume: 2 -> 4
    run(["TRAIN.MAX_EPOCH", "4", "RESUME", "True"])
    log_epochs = []
    for line in open(os.path.join(out_dir, "tb_logger", "train.jsonl")):
        rec = json.loads(line)
        if rec.get("key") == "val/total_loss":
            log_epochs.append(rec["step"])
    # first run logged epochs 0..1, the resumed run 2..3 — never re-ran 0..1
    assert log_epochs == [0, 1, 2, 3], log_epochs

    # fine-tune quirk: resume with MAX_EPOCH == checkpointed epoch
    run(["TRAIN.MAX_EPOCH", "4", "RESUME", "True"])
    # counters reset to 0 and trained 4 fresh epochs (logged 0..3 again)
    log_epochs2 = []
    for line in open(os.path.join(out_dir, "tb_logger", "train.jsonl")):
        rec = json.loads(line)
        if rec.get("key") == "val/total_loss":
            log_epochs2.append(rec["step"])
    assert log_epochs2[-4:] == [0, 1, 2, 3], log_epochs2


def test_f32_finetune_precision_schedule(workdir, monkeypatch):
    """cfg.TPU.F32_FINETUNE_EPOCHS: a float16 run whose final epoch switches
    to the float32 step graphs (BENCH_NOTES "float16 compute") — the engine
    logs the switch, trains through it on the same TrainState, and finishes
    with a loadable checkpoint."""
    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.engine import train as train_mod

    out_dir = os.path.join(workdir["output_dir"], "f32ft")
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)
    train_mod.main(["--cfg", "cfgs/det_sample.yaml"] + TINY_OVERRIDES + [
        "DATA.DATA_ROOT", workdir["pickle_dir"],
        "OUTPUT_DIR", out_dir,
        "TPU.COMPUTE_DTYPE", "float16",
        "TPU.F32_FINETUNE_EPOCHS", "1",
    ])
    final = os.path.join(out_dir, "checkpoints", "model_final.msgpack")
    assert os.path.exists(final)
    log = open(os.path.join(out_dir, "train.log")).read()
    assert "switching to float32 fine-tune steps" in log
    # both epochs ran (epoch 0 in f16, epoch 1 in f32) and losses stayed
    # finite through the switch
    assert "epoch 0 done" in log and "epoch 1 done" in log
    assert "nan" not in log.lower()

    # RESUME directly INTO the fine-tune window: with MAX_EPOCH extended to
    # 3 the resumed run starts at epoch 2 >= ft_start (3 - 1 = 2) and must
    # train that epoch on the f32 graphs (switch log line re-emitted at the
    # resumed epoch)
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)
    train_mod.main(["--cfg", "cfgs/det_sample.yaml"] + TINY_OVERRIDES + [
        "DATA.DATA_ROOT", workdir["pickle_dir"],
        "OUTPUT_DIR", out_dir,
        "TPU.COMPUTE_DTYPE", "float16",
        "TPU.F32_FINETUNE_EPOCHS", "1",
        "TRAIN.MAX_EPOCH", "3", "RESUME", "True",
    ])
    log = open(os.path.join(out_dir, "train.log")).read()
    assert "epoch 2: switching to float32 fine-tune" in log
    assert "epoch 2 done" in log


def test_eval_mode_early_exit(workdir, monkeypatch):
    """EVAL_MODE runs one validation pass on loaded weights and exits
    without training (ref `train_net_det.py:363-365`)."""
    import json

    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.engine import train as train_mod

    # weights from the resume test's output dir (already trained)
    ckpt = os.path.join(workdir["output_dir"], "resume", "checkpoints",
                        "model_final.msgpack")
    assert os.path.exists(ckpt)
    out_dir = os.path.join(workdir["output_dir"], "evalmode")
    overrides = TINY_OVERRIDES + [
        "DATA.DATA_ROOT", workdir["pickle_dir"],
        "OUTPUT_DIR", out_dir,
        "EVAL_MODE", "True", "TRAIN.WEIGHTS", ckpt,
        "USE_TFBOARD", "True",
    ]
    monkeypatch.setattr(config_mod, "cfg", config_mod.get_default_cfg())
    monkeypatch.setattr(train_mod, "cfg", config_mod.cfg, raising=True)
    train_mod.main(["--cfg", "cfgs/det_sample.yaml"] + overrides)

    # no training happened: no checkpoints written to this output dir
    assert not os.path.exists(os.path.join(out_dir, "checkpoints"))
    # but the val pass logged its scalars
    vals = [json.loads(l) for l in
            open(os.path.join(out_dir, "tb_logger", "train.jsonl"))]
    assert any(r.get("key", "").startswith("val/") for r in vals)


def test_sharded_driver_matches_single_device(workdir):
    """`run_test` over the 8-device virtual mesh must write the same result
    files as the single-device path (VERDICT r2 item 2: the reference test
    driver is DataParallel, `test_net_det.py:404-405`). batch 2 gives 12+
    batches so at least one full group of 8 goes through the sharded
    dispatch; the remainder exercises the unsharded tail path."""
    import logging

    import frustum_convnet_tpu.configs.config as config_mod
    from frustum_convnet_tpu.data.provider import FrustumProvider
    from frustum_convnet_tpu.engine.test import load_state_for_test, run_test
    from frustum_convnet_tpu.evaluation.kitti_writer import (
        write_detection_results)
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.parallel.mesh import make_mesh

    cfg2 = config_mod.get_default_cfg()
    config_mod.merge_cfg_from_file("cfgs/det_sample.yaml", cfg2)
    config_mod.merge_cfg_from_list(
        TINY_OVERRIDES + ["DATA.DATA_ROOT", workdir["pickle_dir"]], cfg2)
    spec = get_model_spec(cfg2)
    model = FrustumConvNet(spec)
    dataset = FrustumProvider(cfg2, "val", one_hot=True,
                              from_rgb_detection=True)
    logger = logging.getLogger("sharded_driver_test")
    state = load_state_for_test(model, spec, cfg2, dataset, logger)

    kwargs = dict(batch_size=2, method="nms", logger=logger, num_workers=2,
                  group=8)
    det_1 = run_test(model, spec, state, dataset, mesh=None, **kwargs)
    det_n = run_test(model, spec, state, dataset, mesh=make_mesh(), **kwargs)

    assert set(det_1) == set(det_n)
    for idx in det_1:
        assert set(det_1[idx]) == set(det_n[idx])
        for cls in det_1[idx]:
            a = np.asarray(sorted(map(tuple, det_1[idx][cls])))
            b = np.asarray(sorted(map(tuple, det_n[idx][cls])))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    # and the written artifacts agree byte-for-byte (the writer's fixed
    # decimal formatting absorbs the partitioned executable's ~1e-6 rounding)
    ids = [int(l) for l in
           open(os.path.join(workdir["kitti_root"], "image_sets", "val.txt"))]
    root = os.path.join(workdir["output_dir"], "sharded_cmp")
    d1 = write_detection_results(os.path.join(root, "one"), det_1, ids,
                                 nms_threshold=cfg2.TEST.THRESH)
    dn = write_detection_results(os.path.join(root, "mesh"), det_n, ids,
                                 nms_threshold=cfg2.TEST.THRESH)
    files1, filesn = sorted(os.listdir(d1)), sorted(os.listdir(dn))
    assert files1 == filesn and files1
    for name in files1:
        assert open(os.path.join(d1, name)).read() == \
            open(os.path.join(dn, name)).read(), name
