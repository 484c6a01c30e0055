"""SUN-RGBD inference/eval driver CLI.

The TPU counterpart of `/root/reference/train/test_net_det_sunrgbd.py`:
batched inference over the SUN-RGBD provider, per-frustum selection
(``nms`` keeps sections with fg prob > 0.5, argmax fallback; ``top`` keeps
the best section — ref :208-221), score = 2D detector prob + max size prob
(ref :229), decode to centroid-anchored boxes, convert to 8-corner form,
optional 3D NMS, then in-process VOC AP at 3D IoU ``cfg.IOU_THRESH``
(default 0.25) against GT built from the label files.
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
from frustum_convnet_tpu.core import geometry_np as gnp
from frustum_convnet_tpu.core.nms import rotate_nms_3d
from frustum_convnet_tpu.data.provider_sunrgbd import (
    FrustumSunrgbdProvider, from_prediction_to_label_format)
from frustum_convnet_tpu.data.sunrgbd.prepare import TYPE_WHITELIST_10
from frustum_convnet_tpu.engine.test import load_state_for_test
from frustum_convnet_tpu.models.det import decode_outputs
from frustum_convnet_tpu.evaluation.sunrgbd_eval import build_gt_all, eval_det
from frustum_convnet_tpu.models.net import FrustumConvNet
from frustum_convnet_tpu.models.registry import (get_compute_dtype,
                                                  get_trunk_dtype,
                                                  get_model_spec)
from frustum_convnet_tpu.utils.logger import get_logger

FG_PROB_THRESH = 0.5


def corners_from_params(center, size, heading) -> np.ndarray:
    """Centroid-anchored box -> 8 corners (camera convention, l/w/h order)."""
    return gnp.box3d_corners(np.asarray(center), np.asarray(size), float(heading))


def build_infer_group_flat_fn(model, spec, mesh=None):
    """G stacked batches -> ONE flattened (G*B) dispatch, full decode back.

    Same flattening rationale as `engine/test.build_infer_group_fn`: at the
    reference batch (32) the conv trunk is latency-bound well off MXU peak,
    so the G batches run as one (G*B) model batch (eval-mode BN has no
    cross-batch coupling). Unlike the KITTI driver, the SUN-RGBD
    postprocess scores with the full per-section size probabilities
    (score = rgb prob + max size prob, ref `test_net_det_sunrgbd.py:229`),
    so outputs return undecimated, reshaped to (G, B, ...).

    With ``mesh`` the group axis is sharded over the data-parallel devices
    and outputs come back replicated (DataParallel counterpart, ref
    `test_net_det.py:404-405`); G must be a multiple of the mesh size.
    """

    def infer_group(state_params, state_stats, pts_g, one_hot_g, refs_g):
        g, b = pts_g.shape[:2]
        flat = lambda x: x.reshape((g * b,) + x.shape[2:])
        refs = [flat(r) for r in refs_g]
        # decode the reduced upload dtype (float16 point stream) on device
        cls_logits, reg = model.apply(
            {"params": state_params, "batch_stats": state_stats},
            flat(pts_g).astype(jnp.float32), flat(one_hot_g), refs,
            train=False)
        out = decode_outputs(spec, cls_logits, reg, refs[1])
        return {k: v.reshape((g, b) + v.shape[1:]) for k, v in out.items()}

    if mesh is not None:
        from frustum_convnet_tpu.parallel.mesh import data_sharding, replicated

        repl, dp = replicated(mesh), data_sharding(mesh)
        return jax.jit(infer_group,
                       in_shardings=(repl, repl, dp, dp, dp),
                       out_shardings=repl)
    return jax.jit(infer_group)


def run_test_sunrgbd(model, spec, state, dataset, batch_size, method, logger,
                     num_workers: int = 4, inflight: int = 2, group: int = 8,
                     mesh=None, points_dtype: str = "float16"):
    """Streaming SUN-RGBD inference, pipelined like `engine/test.run_test`:
    BatchLoader worker threads prepare batches ahead; ``group`` batches
    flatten into one device dispatch (trunk at G*B); up to ``inflight``
    dispatches queue on the device while the host post-processes completed
    ones (dispatch is async; the queue hides per-call latency)."""
    from collections import deque

    from frustum_convnet_tpu.engine.loader import BatchLoader

    group = max(int(group), 1)
    if mesh is not None and getattr(mesh, "size", 1) <= 1:
        mesh = None
    if mesh is not None:
        from frustum_convnet_tpu.parallel.mesh import (replicated,
                                                       shard_full_batch)

        ndev = int(mesh.size)
        if group % ndev:
            group = -(-group // ndev) * ndev
            logger.info(f"group rounded up to {group} "
                        f"(multiple of the {ndev}-device mesh)")
        state = jax.device_put(state, replicated(mesh))

        def put_group(tree):
            return shard_full_batch(tree, mesh)
    else:
        put_group = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    infer_group = build_infer_group_flat_fn(model, spec, mesh=mesh)
    det_results: dict = {}
    # multi-process: shard the dataset by batch; merge detections at the end
    pc, pi = jax.process_count(), jax.process_index()
    loader = BatchLoader(dataset, batch_size, spec.num_scales, shuffle=False,
                         drop_last=False, pad_last=True, seed=0,
                         num_workers=num_workers,
                         batch_shard=(pi, pc) if pc > 1 else None)
    num_batches = len(loader)
    t_start = time.time()

    def dispatch(batches):
        """<=group host batches -> one stacked dispatch (tail pads by repeat)."""
        g = len(batches)
        if g < group:
            batches = batches + [batches[-1]] * (group - g)
        pts = np.stack([b["point_cloud"] for b in batches]).astype(points_dtype)
        one_hot = np.stack([b["one_hot"] for b in batches])
        refs = tuple(np.stack([b["refs"][i] for b in batches])
                     for i in range(spec.num_scales))
        pts, one_hot, refs = put_group((pts, one_hot, refs))
        return infer_group(state.params, state.batch_stats, pts, one_hot, refs)

    def process_one(out, batch):
        idxs = [int(i) for i in batch["_indices"][:int(batch["_real"])]]
        rgb_probs = batch.get("rgb_prob",
                              np.ones(batch_size, np.float32)).reshape(-1)
        rot_angles = batch["rot_angle"].reshape(-1)

        for k, gi in enumerate(idxs):
            cls_probs = out["cls_probs"][k]
            if method == "nms":
                fg_idx = np.nonzero(cls_probs[:, 1] > FG_PROB_THRESH)[0]
                if fg_idx.size == 0:
                    fg_idx = np.array([np.argmax(cls_probs[:, 1])])
            else:
                fg_idx = np.array([np.argmax(cls_probs[:, 1])])

            scores = rgb_probs[k] + out["size_probs"][k][fg_idx].max(axis=1)
            data_idx = int(dataset.data["id"][gi])
            class_type = dataset.data["type"][gi]
            box2d = np.asarray(dataset.data["box2d"][gi])
            per_cls = det_results.setdefault(data_idx, {}).setdefault(class_type, [])
            for m, s in zip(fg_idx, scores):
                tx, ty, tz, l, w, h, ry = from_prediction_to_label_format(
                    out["centers"][k][m], out["headings"][k][m],
                    out["sizes"][k][m], rot_angles[k])
                if h < 0.01 or w < 0.01 or l < 0.01:
                    continue
                per_cls.append([box2d[0], box2d[1], box2d[2], box2d[3],
                                tx, ty, tz, l, w, h, ry, float(s)])

    def process(out_dev_g, batches):
        out = jax.device_get(out_dev_g)
        for j, batch in enumerate(batches):  # padded replicas are not listed
            process_one({k: v[j] for k, v in out.items()}, batch)

    pending: deque = deque()
    acc: list = []
    for bi, batch in enumerate(loader.epoch(0)):
        acc.append(batch)
        if len(acc) == group:
            pending.append((dispatch(acc), acc))
            acc = []
            while len(pending) >= max(inflight, 1):
                process(*pending.popleft())
        if (bi + 1) % (20 * group) == 0:
            rate = (bi + 1) * batch_size / (time.time() - t_start)
            logger.info(f"batch {bi + 1}/{num_batches}  {rate:.0f} frustums/s")
    if acc:
        pending.append((dispatch(acc), acc))
    while pending:
        process(*pending.popleft())
    n = len(dataset) if pc == 1 else max(len(dataset) // pc, 1)
    elapsed = time.time() - t_start
    logger.info(f"streamed ~{n} frustums in {elapsed:.2f}s = "
                f"{n / elapsed:.0f} frustums/s end-to-end")
    if pc > 1:  # one collective merges the per-host detection dicts
        from frustum_convnet_tpu.parallel.mesh import allgather_detections

        det_results = allgather_detections(det_results)
    return det_results


def to_corner_results(det_results, nms_threshold=None):
    """{img: {cls: [entry]}} -> {cls: {img: [(corners, score)]}} (+ 3D NMS)."""
    all_results: dict = {}
    for idx, per_class in det_results.items():
        for cls, dets in per_class.items():
            arr = np.asarray(dets, dtype=np.float64)
            if nms_threshold is not None and len(arr) > 1:
                # (tx,ty,tz,l,w,h,ry,score): already center-anchored
                keep = rotate_nms_3d(arr[:, 4:], nms_threshold)
                arr = arr[keep]
            for det in arr:
                corners = corners_from_params(det[4:7], det[7:10], det[10])
                all_results.setdefault(cls, {}).setdefault(idx, []).append(
                    (corners, float(det[11])))
    return all_results


def main(argv=None):
    parser = argparse.ArgumentParser(description="Test FrustumConvNet on SUN-RGBD")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--sunrgbd_dir", default="sunrgbd/mysunrgbd")
    parser.add_argument("--val_idx", default="sunrgbd/image_sets/val.txt")
    parser.add_argument("--no_eval", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args(argv)

    merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg()

    from frustum_convnet_tpu.parallel.mesh import (is_chief, make_mesh,
                                                   maybe_initialize_distributed)

    maybe_initialize_distributed()
    chief = is_chief()
    result_dir = os.path.join(cfg.OUTPUT_DIR, cfg.SAVE_SUB_DIR, "result")
    if chief:
        os.makedirs(result_dir, exist_ok=True)
    # filesystem writes belong to process 0; other hosts log to console only
    logger = get_logger(os.path.join(result_dir, "test.log") if chief else None)
    # single process: all devices; multi-process: this host's devices only
    # (batch-sharded inference; see engine/test.py)
    devices = jax.local_devices() if jax.process_count() > 1 else jax.devices()
    mesh = (make_mesh(devices, mesh_shape=tuple(cfg.TPU.MESH_SHAPE),
                      axis_names=tuple(cfg.TPU.MESH_AXES))
            if len(devices) > 1 else None)
    if mesh is not None:
        logger.info(f"mesh: {mesh}")

    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=False),
                           trunk_dtype=get_trunk_dtype(cfg))
    dataset = FrustumSunrgbdProvider(
        cfg, cfg.TEST.DATASET, one_hot=True,
        from_rgb_detection=cfg.FROM_RGB_DET,
        overwritten_data_path=cfg.OVER_WRITE_TEST_FILE)
    logger.info(f"test frustums: {len(dataset)}")

    state = load_state_for_test(model, spec, cfg, dataset, logger)
    det_results = run_test_sunrgbd(model, spec, state, dataset,
                                   cfg.TEST.BATCH_SIZE, cfg.TEST.METHOD, logger,
                                   num_workers=cfg.NUM_WORKERS,
                                   inflight=cfg.TPU.INFER_INFLIGHT,
                                   group=cfg.TPU.INFER_GROUP, mesh=mesh,
                                   points_dtype=cfg.TPU.INFER_POINTS_DTYPE)
    if not chief:
        # each host streamed its own batch shard and run_test_sunrgbd already
        # merged all detections with one all-gather, so every host holds
        # identical det_results; the result dir belongs to process 0
        return None
    nms_thresh = cfg.TEST.THRESH if cfg.TEST.METHOD == "nms" else None
    pred_all = to_corner_results(det_results, nms_thresh)

    if not args.no_eval:
        idx_list = [int(l) for l in open(args.val_idx) if l.strip()]
        gt_all = build_gt_all(args.sunrgbd_dir, idx_list, TYPE_WHITELIST_10)
        recs, precs, aps = eval_det(pred_all, gt_all, ovthresh=cfg.IOU_THRESH,
                                    result_dir=result_dir)
        return aps
    return pred_all


if __name__ == "__main__":
    main()
