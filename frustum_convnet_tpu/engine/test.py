"""Inference/eval driver CLI: ``python -m frustum_convnet_tpu.engine.test --cfg <yaml> [KEY VAL]...``

The TPU counterpart of `/root/reference/train/test_net_det.py:193-321`:
batched no-grad inference over the (val|test) provider, per-frustum
foreground selection (``TEST.METHOD``: 'nms' keeps every section scored
foreground with an argmax fallback, 'top' keeps the single best section,
ref `:254-263`), decode back to global-frame KITTI boxes via
``from_prediction_to_label_format``, score = section cls prob + 2D detector
prob (ref `:270`), 3D rotated NMS at ``TEST.THRESH``, bit-compatible result
files, and AP evaluation via the official-protocol evaluator.

TPU specifics: forward + decode run as one jitted graph at a fixed batch
shape (the final short batch is padded and trimmed on host), so the whole
val set streams through a single compiled executable.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from frustum_convnet_tpu.configs import (assert_and_infer_cfg, cfg,
                                         merge_cfg_from_file, merge_cfg_from_list)
from frustum_convnet_tpu.data.provider import from_prediction_to_label_format
from frustum_convnet_tpu.data.registry import get_provider_class
from frustum_convnet_tpu.engine import checkpoints as ckpt
from frustum_convnet_tpu.evaluation.kitti_writer import write_detection_results
from frustum_convnet_tpu.models.net import FrustumConvNet
from frustum_convnet_tpu.models.registry import get_model_spec
from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig, TrainState,
                                                     init_state, make_optimizer)
from frustum_convnet_tpu.models.det import decode_outputs
from frustum_convnet_tpu.utils.logger import get_logger
from frustum_convnet_tpu.utils.metrics import AverageMeter


def build_infer_fn(model, spec):
    @jax.jit
    def infer(state_params, state_stats, pts, one_hot, refs):
        cls_logits, reg = model.apply(
            {"params": state_params, "batch_stats": state_stats},
            pts, one_hot, list(refs), train=False)
        return decode_outputs(spec, cls_logits, reg, refs[1])

    return infer


def select_foreground(cls_probs_b: np.ndarray, method: str) -> np.ndarray:
    """Per-frustum section selection (ref test_net_det.py:254-263)."""
    if method == "nms":
        fg = np.nonzero(cls_probs_b[:, 0] < cls_probs_b[:, 1])[0]
        if fg.size == 0:
            fg = np.array([np.argmax(cls_probs_b[:, 1])])
        return fg
    return np.array([np.argmax(cls_probs_b[:, 1])])


def run_test(model, spec, state, dataset, batch_size: int, method: str,
             logger) -> dict:
    """Stream the dataset through the jitted graph; accumulate detections."""
    from frustum_convnet_tpu.data.provider import collate_batch

    infer = build_infer_fn(model, spec)
    n = len(dataset)
    det_results: dict = {}
    fw_meter = AverageMeter()
    rng = np.random.default_rng(0)

    num_batches = (n + batch_size - 1) // batch_size
    for bi in range(num_batches):
        idxs = list(range(bi * batch_size, min((bi + 1) * batch_size, n)))
        real = len(idxs)
        # pad the short final batch to the compiled shape
        idxs_padded = idxs + [idxs[-1]] * (batch_size - real)
        items = [dataset.__getitem__(i, rng) for i in idxs_padded]
        batch = collate_batch(items, spec.num_scales)

        t0 = time.time()
        out = infer(state.params, state.batch_stats,
                    jnp.asarray(batch["point_cloud"]),
                    jnp.asarray(batch["one_hot"]),
                    tuple(jnp.asarray(r) for r in batch["refs"]))
        out = jax.device_get(out)
        fw_meter.update(time.time() - t0)

        rgb_probs = batch.get("rgb_prob", np.ones(batch_size, np.float32)).reshape(-1)
        rot_angles = batch["rot_angle"].reshape(-1)
        ref_centers = batch.get("ref_center", np.zeros((batch_size, 3), np.float32))

        for k, gi in enumerate(idxs):  # trims padding (k < real)
            cls_probs = out["cls_probs"][k]
            fg_idx = select_foreground(cls_probs, method)
            centers = out["centers"][k][fg_idx]
            headings = out["headings"][k][fg_idx]
            sizes = out["sizes"][k][fg_idx]
            scores = cls_probs[fg_idx, 1] + rgb_probs[k]

            data_idx = int(dataset.data["id"][gi])
            class_type = dataset.data["type"][gi]
            box2d = np.asarray(dataset.data["box2d"][gi])

            per_img = det_results.setdefault(data_idx, {})
            per_cls = per_img.setdefault(class_type, [])
            for m in range(len(fg_idx)):
                h, w, l, tx, ty, tz, ry = from_prediction_to_label_format(
                    centers[m], headings[m], sizes[m], rot_angles[k], ref_centers[k])
                if h < 0.01 or w < 0.01 or l < 0.01:
                    continue
                per_cls.append([box2d[0], box2d[1], box2d[2], box2d[3],
                                tx, ty, tz, h, w, l, ry, float(scores[m])])
        if (bi + 1) % 20 == 0:
            logger.info(f"batch {bi + 1}/{num_batches} fwd {fw_meter.val:.3f}s")

    logger.info(f"avg fwd: {fw_meter.avg:.4f}s/batch, "
                f"{fw_meter.avg / batch_size * 1e3:.2f} ms/frustum")
    return det_results


def load_state_for_test(model, spec, cfg_, dataset, logger) -> TrainState:
    from frustum_convnet_tpu.data.provider import collate_batch

    rng = np.random.default_rng(0)
    items = [dataset.__getitem__(0, rng)]
    batch = collate_batch(items, spec.num_scales)
    example = {
        "point_cloud": jnp.asarray(batch["point_cloud"]),
        "one_hot": jnp.asarray(batch["one_hot"]),
        "refs": tuple(jnp.asarray(r) for r in batch["refs"]),
    }
    tx = make_optimizer(TrainStepConfig())
    state = init_state(model, tx, example, seed=3)
    weights = cfg_.TEST.WEIGHTS
    if weights:
        payload = ckpt.load_checkpoint(weights, state)
        state = TrainState(params=payload["params"],
                           batch_stats=payload["batch_stats"],
                           opt_state=state.opt_state,
                           step=jnp.asarray(payload["step"], jnp.int32))
        logger.info(f"loaded weights {weights} (epoch {payload['epoch']})")
    else:
        logger.warning("TEST.WEIGHTS not set — evaluating random init")
    return state


def main(argv=None):
    parser = argparse.ArgumentParser(description="Test FrustumConvNet on TPU")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--gt_dir", default="data/kitti/training/label_2")
    parser.add_argument("--idx_path", default="",
                        help="split id file for empty-result fill")
    parser.add_argument("--no_eval", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args(argv)

    merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg()

    result_dir = os.path.join(cfg.OUTPUT_DIR, cfg.SAVE_SUB_DIR, "result")
    os.makedirs(result_dir, exist_ok=True)
    logger = get_logger(os.path.join(result_dir, "test.log"))

    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec)
    provider_cls = get_provider_class(cfg)
    dataset = provider_cls(cfg, cfg.TEST.DATASET, one_hot=True,
                           from_rgb_detection=cfg.FROM_RGB_DET,
                           overwritten_data_path=cfg.OVER_WRITE_TEST_FILE)
    logger.info(f"test frustums: {len(dataset)}")

    state = load_state_for_test(model, spec, cfg, dataset, logger)
    det_results = run_test(model, spec, state, dataset, cfg.TEST.BATCH_SIZE,
                           cfg.TEST.METHOD, logger)

    split_ids = []
    if args.idx_path and os.path.exists(args.idx_path):
        split_ids = [int(line.strip()) for line in open(args.idx_path) if line.strip()]
    nms_thresh = cfg.TEST.THRESH if cfg.TEST.METHOD == "nms" else None
    data_dir = write_detection_results(result_dir, det_results, split_ids,
                                       nms_threshold=nms_thresh)
    logger.info(f"results written to {data_dir}")

    if not args.no_eval and "test" not in cfg.TEST.DATASET:
        from frustum_convnet_tpu.evaluation import kitti_eval
        results = kitti_eval.evaluate(args.gt_dir, result_dir,
                                      classes=("car", "pedestrian", "cyclist")
                                      if not cfg.DATA.CAR_ONLY else ("car",))
        logger.info(f"AP results: {results}")
        return results


if __name__ == "__main__":
    main()
