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
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from frustum_convnet_tpu.configs import (assert_and_infer_cfg, cfg,
                                         merge_cfg_from_file, merge_cfg_from_list)
from frustum_convnet_tpu.data.provider import from_prediction_to_label_format_batch
from frustum_convnet_tpu.data.registry import get_provider_class
from frustum_convnet_tpu.engine import checkpoints as ckpt
from frustum_convnet_tpu.evaluation.kitti_writer import write_detection_results
from frustum_convnet_tpu.models.net import FrustumConvNet
from frustum_convnet_tpu.models.registry import (get_compute_dtype,
                                                  get_trunk_dtype,
                                                  get_model_spec)
from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig, TrainState,
                                                     init_state, make_optimizer)
from frustum_convnet_tpu.models.det import decode_outputs
from frustum_convnet_tpu.utils.logger import get_logger


def build_infer_fn(model, spec):
    @jax.jit
    def infer(state_params, state_stats, pts, one_hot, refs):
        # pts may arrive as a reduced upload dtype (cfg.TPU.INFER_POINTS_DTYPE
        # float16 halves the dominant h2d stream); model compute is f32
        cls_logits, reg = model.apply(
            {"params": state_params, "batch_stats": state_stats},
            pts.astype(jnp.float32), one_hot, list(refs), train=False)
        return decode_outputs(spec, cls_logits, reg, refs[1])

    return infer


def build_infer_group_fn(model, spec, method: str, cap: int, z_grids=None,
                         mesh=None):
    """G stacked batches -> one dispatch, with on-device fg compaction.

    Per-dispatch latency and device->host bytes dominate a naive per-batch
    loop (BENCH_NOTES.md), so the driver sends a group of G batches in one
    jitted call and returns, per frustum, only the selected sections packed
    as (B, S, 8) = [cx, cy, cz, heading, l, w, h, fg_prob] plus the
    uncapped fg count — ~7x fewer bytes than the full decode. The G batches
    are FLATTENED to one (G*B) model batch (not scanned): at the reference
    serving batch 32 the conv trunk is latency-bound ~10x off MXU peak, and
    running it at G*32 recovers the large-batch throughput while the
    user-facing batch size stays 32 (VERDICT r1 weak #4). Selection matches
    `select_foreground_batch`: 'nms' keeps every fg section (first-S in
    section order; the host re-runs the rare frustum whose fg count exceeds
    S through the full path, so semantics stay exact), 'top' keeps the
    argmax section.

    With ``mesh`` the group axis is sharded over the data-parallel devices
    (params/stats replicated, packed outputs gathered back replicated) — the
    SPMD counterpart of the reference test driver's ``DataParallel`` wrap
    (`/root/reference/train/test_net_det.py:404-405`); G must then be a
    multiple of the mesh size (``run_test`` rounds the group up).
    """
    sel_top = method != "nms"
    # device-side ladder rebuild: the stage-1 ladders are affine in depth
    # (`FrustumProvider.ref_basis`), so when z_grids is given the dispatch
    # uploads 6 floats/frustum instead of the full (sum M_i, 3) ladders
    z_consts = (None if z_grids is None
                else [jnp.asarray(z, jnp.float32) for z in z_grids])

    def infer_group(state_params, state_stats, pts_g, one_hot_g, refs_g):
        g, b = pts_g.shape[:2]
        flat = lambda x: x.reshape((g * b,) + x.shape[2:])
        # decode the reduced upload dtype (float16 point stream) on device
        pts, one_hot = flat(pts_g).astype(jnp.float32), flat(one_hot_g)
        if z_consts is None:
            refs = tuple(flat(r) for r in refs_g)
        else:
            rdir, roff = flat(refs_g[0]), flat(refs_g[1])
            refs = tuple(
                roff[:, None, :] + rdir[:, None, :] * z[None, :, None]
                for z in z_consts)
        cls_logits, reg = model.apply(
            {"params": state_params, "batch_stats": state_stats},
            pts, one_hot, list(refs), train=False)
        out = decode_outputs(spec, cls_logits, reg, refs[1])
        probs = out["cls_probs"]  # (G*B, L, 2)
        length = probs.shape[1]
        top = jnp.argmax(probs[:, :, 1], axis=1)  # (G*B,)
        if sel_top:
            sel = top[:, None]  # (G*B, 1)
            cnt = jnp.ones((g * b,), jnp.int32)
        else:
            fg = probs[:, :, 1] > probs[:, :, 0]
            none = ~jnp.any(fg, axis=1)
            ar = jnp.arange(length, dtype=jnp.int32)
            fg = fg | (none[:, None] & (ar[None, :] == top[:, None]))
            key = jnp.where(fg, ar, ar + length)
            neg, _ = jax.lax.top_k(-key, cap)
            sel_all = jnp.minimum(-neg, length - 1)  # first-cap fg sections
            cnt = jnp.sum(fg, axis=1).astype(jnp.int32)
            slot = jnp.arange(cap, dtype=jnp.int32)
            sel = jnp.where(slot[None, :] < cnt[:, None], sel_all, 0)

        def take(x):
            return jnp.take_along_axis(x, sel[..., None] if x.ndim == 3
                                       else sel, axis=1)

        packed = jnp.concatenate([
            take(out["centers"]),                       # 3
            take(out["headings"])[..., None],           # 1
            take(out["sizes"]),                         # 3
            take(probs[:, :, 1])[..., None],            # 1
        ], axis=-1)  # (G*B, S, 8)
        return packed.reshape(g, b, *packed.shape[1:]), cnt.reshape(g, b)

    if mesh is not None:
        from frustum_convnet_tpu.parallel.mesh import data_sharding, replicated

        repl, dp = replicated(mesh), data_sharding(mesh)
        return jax.jit(infer_group,
                       in_shardings=(repl, repl, dp, dp, dp),
                       out_shardings=(repl, repl))
    return jax.jit(infer_group)


def select_foreground_batch(cls_probs: np.ndarray, real: int, method: str):
    """Vectorized per-frustum section selection (ref test_net_det.py:254-263).

    cls_probs (B, L, 2). Returns (det_b, det_m) index arrays over the first
    ``real`` frustums: 'nms' keeps every section with fg > bg (argmax
    fallback per frustum), 'top' keeps the per-frustum argmax.
    """
    probs = cls_probs[:real]
    top = np.argmax(probs[:, :, 1], axis=1)  # (real,)
    if method != "nms":
        return np.arange(real), top
    fg = probs[:, :, 0] < probs[:, :, 1]  # (real, L)
    none = ~fg.any(axis=1)
    if none.any():
        fg[np.nonzero(none)[0], top[none]] = True
    return np.nonzero(fg)


def _accumulate_detections(centers, headings, sizes, fg_probs, det_b,
                           batch: dict, dataset, det_results: dict) -> int:
    """Shared decode tail: vectorized KITTI-frame box decode, degenerate-size
    filter (ref test_net_det.py:276-281), score = fg prob + 2D detector prob,
    per-detection result-dict append. ``det_b`` indexes the batch's real
    frustums; the per-detection arrays are already gathered to (D, ...).
    Returns the number of accumulated detections."""
    idxs = batch["_indices"]
    rgb_probs = np.asarray(
        batch.get("rgb_prob",
                  np.ones(len(idxs), np.float32))).reshape(-1)
    rot_angles = np.asarray(batch["rot_angle"]).reshape(-1)
    ref_centers = batch.get("ref_center")

    boxes = from_prediction_to_label_format_batch(
        centers, headings, sizes, rot_angles[det_b],
        None if ref_centers is None else np.asarray(ref_centers)[det_b],
    )  # (D, 7) = h w l tx ty tz ry
    scores = fg_probs + rgb_probs[det_b]

    ok = (boxes[:, 0] >= 0.01) & (boxes[:, 1] >= 0.01) & (boxes[:, 2] >= 0.01)
    det_b, boxes, scores = det_b[ok], boxes[ok], scores[ok]

    ids = dataset.data["id"]
    types = dataset.data["type"]
    box2ds = dataset.data["box2d"]
    for d in range(len(det_b)):
        gi = int(idxs[det_b[d]])
        b2 = box2ds[gi]
        h, w, l, tx, ty, tz, ry = boxes[d]
        det_results.setdefault(int(ids[gi]), {}).setdefault(types[gi], []).append(
            [b2[0], b2[1], b2[2], b2[3], tx, ty, tz, h, w, l, ry, float(scores[d])])
    return len(det_b)


def postprocess_batch(out: dict, batch: dict, dataset, method: str,
                      det_results: dict) -> int:
    """Decode one full-decode device batch into detections (all-numpy)."""
    real = int(batch["_real"])
    cls_probs = out["cls_probs"]
    det_b, det_m = select_foreground_batch(cls_probs, real, method)
    if det_b.size == 0:
        return 0
    return _accumulate_detections(
        out["centers"][det_b, det_m], out["headings"][det_b, det_m],
        out["sizes"][det_b, det_m], cls_probs[det_b, det_m, 1],
        det_b, batch, dataset, det_results)


def postprocess_packed(packed: np.ndarray, cnt: np.ndarray, batch: dict,
                       dataset, det_results: dict, cap: int) -> tuple[int, bool]:
    """Decode one packed device batch into detections (all-numpy).

    packed (B, S, 8) = [cx, cy, cz, heading, l, w, h, fg_prob]; cnt (B,)
    uncapped fg counts. Returns (n_detections, overflowed) — overflowed
    means some frustum had more fg sections than the device cap and the
    caller must re-run this batch through the full path.
    """
    real = int(batch["_real"])
    cnt = cnt[:real]
    if (cnt > cap).any():
        return 0, True
    slot = np.arange(packed.shape[1])
    det_b, det_s = np.nonzero(slot[None, :] < cnt[:, None])
    if det_b.size == 0:
        return 0, False

    rows = packed[det_b, det_s]  # (D, 8)
    n = _accumulate_detections(rows[:, 0:3], rows[:, 3], rows[:, 4:7],
                               rows[:, 7], det_b, batch, dataset, det_results)
    return n, False


def run_test(model, spec, state, dataset, batch_size: int, method: str,
             logger, num_workers: int = 4, group: int = 8,
             fg_cap: int = 64, inflight: int = 2, mesh=None,
             points_dtype: str = "float16") -> dict:
    """Stream the dataset through the jitted graph; accumulate detections.

    Pipelined four ways: BatchLoader worker threads prepare batches ahead;
    G batches go to the device as ONE dispatch (`build_infer_group_fn` —
    per-dispatch latency dominates on relayed TPU setups); only compacted
    per-frustum selections come back (device->host bytes are the next
    bottleneck); and the host post-processes completed groups while up to
    ``inflight`` dispatches are queued on the device (JAX dispatch is async;
    a deeper queue hides round-trip latency on relayed setups). All
    per-detection math is vectorized numpy. End-to-end streaming throughput
    is logged so the driver's frustums/sec is directly comparable to
    bench.py.

    With ``mesh`` (>1 device) the grouped dispatch is sharded over the
    data-parallel devices. Multi-process runs shard the dataset BY BATCH
    (`BatchLoader(batch_shard=...)`): inference is embarrassingly parallel,
    so each host streams its own batches through its own (local-mesh)
    graph — host-side prep scales with hosts — and the compacted detection
    dicts merge at the end with one all-gather
    (`parallel.mesh.allgather_detections`). Every host returns the full
    merged results; result-dir writes are chief-gated in ``main``.
    """
    from frustum_convnet_tpu.engine.loader import BatchLoader
    from frustum_convnet_tpu.parallel.mesh import allgather_detections

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

    use_basis = hasattr(dataset, "ref_basis")
    # the point stream dominates h2d bytes (16 KB/frustum in f32); float16
    # halves it and is decoded to f32 on device (cfg.TPU.INFER_POINTS_DTYPE)
    pts_np_dtype = np.dtype(points_dtype)
    # top_k(k) requires k <= section count; small refine/sample ladders have
    # L < the default cap (overflow re-runs keep semantics exact regardless)
    fg_cap = min(fg_cap, spec.num_out)
    infer_group = build_infer_group_fn(
        model, spec, method, 1 if method != "nms" else fg_cap,
        z_grids=dataset.ref_depths() if use_basis else None, mesh=mesh)
    infer_full = build_infer_fn(model, spec)  # rare overflow fallback
    pc, pi = jax.process_count(), jax.process_index()
    loader = BatchLoader(dataset, batch_size, spec.num_scales, shuffle=False,
                         drop_last=False, pad_last=True, seed=0,
                         num_workers=num_workers,
                         batch_shard=(pi, pc) if pc > 1 else None)
    num_batches = len(loader)
    num_groups = (num_batches + group - 1) // group
    det_results: dict = {}
    n_dets = 0
    n_overflow = 0
    cap = 1 if method != "nms" else fg_cap

    def full_path(batch) -> int:
        out = infer_full(state.params, state.batch_stats,
                         jnp.asarray(batch["point_cloud"].astype(pts_np_dtype)),
                         jnp.asarray(batch["one_hot"]),
                         tuple(jnp.asarray(r) for r in batch["refs"]))
        return postprocess_batch(jax.device_get(out), batch, dataset, method,
                                 det_results)

    warm = {"t": None, "n": 0}

    def process_group(out_dev, batches) -> None:
        nonlocal n_dets, n_overflow
        packed_g, cnt_g = jax.device_get(out_dev)
        if warm["t"] is None:
            # first fetch completes compile + cold caches; steady-state
            # throughput is measured from here
            warm["t"] = time.time()
        else:
            warm["n"] += sum(int(b["_real"]) for b in batches)
        for g, batch in enumerate(batches):
            nd, overflow = postprocess_packed(packed_g[g], cnt_g[g], batch,
                                              dataset, det_results, cap)
            if overflow:  # > cap fg sections: exact semantics via full path
                n_overflow += 1
                nd = full_path(batch)
            n_dets += nd

    t_start = time.time()
    pending: deque = deque()  # (device out, host batches), oldest first
    batches: list = []
    gi = 0
    for batch in loader.epoch(0):
        batches.append(batch)
        if len(batches) < group:
            continue
        stack = [b for b in batches]
        pts_g = np.stack([b["point_cloud"] for b in stack]).astype(pts_np_dtype)
        oh_g = np.stack([b["one_hot"] for b in stack])
        if use_basis:  # ladders rebuilt on device from 6 floats/frustum
            refs_g = (np.stack([b["ref_dir"] for b in stack]),
                      np.stack([b["ref_off"] for b in stack]))
        else:
            refs_g = tuple(np.stack([b["refs"][i] for b in stack])
                           for i in range(spec.num_scales))
        pts_g, oh_g, refs_g = put_group((pts_g, oh_g, refs_g))
        out_dev = infer_group(state.params, state.batch_stats,
                              pts_g, oh_g, refs_g)
        pending.append((out_dev, stack))
        while len(pending) >= max(inflight, 1):
            process_group(*pending.popleft())
        batches = []
        gi += 1
        if gi % 10 == 0:
            rate = gi * group * batch_size / (time.time() - t_start)
            logger.info(f"group {gi}/{num_groups}  {rate:.0f} frustums/s e2e")
    while pending:
        process_group(*pending.popleft())
    # final partial group: per-batch full path (one-off, off the hot loop)
    for batch in batches:
        n_dets += full_path(batch)

    elapsed = time.time() - t_start
    # under multi-process batch sharding this host saw ~len(dataset)/pc
    n = len(dataset) if pc == 1 else max(len(dataset) // pc, 1)
    warm_note = ""
    if warm["t"] is not None and warm["n"] > 0:
        warm_rate = warm["n"] / max(time.time() - warm["t"], 1e-9)
        warm_note = f"; steady-state {warm_rate:.0f} frustums/s after compile"
    logger.info(f"streamed ~{n} frustums in {elapsed:.2f}s = "
                f"{n / elapsed:.0f} frustums/s end-to-end "
                f"({n_dets} detections, {n_overflow} overflow re-runs)"
                f"{warm_note}")
    if pc > 1:  # one collective merges the per-host detection dicts
        det_results = allgather_detections(det_results)
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


def package_test_results(result_dir: str) -> str:
    """Zip ``result_dir``'s contents into a sibling ``results.zip`` for
    KITTI test-server submission (ref train/test_net_det.py:317-319, which
    shells out to ``zip -r ../results.zip *`` from inside the result dir).
    Archive paths are relative to ``result_dir`` (``data/xxxxxx.txt``)."""
    import zipfile

    zip_path = os.path.join(os.path.dirname(os.path.abspath(result_dir)),
                            "results.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(result_dir):
            for name in sorted(files):
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, result_dir))
    return zip_path


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

    from frustum_convnet_tpu.parallel.mesh import (is_chief, make_mesh,
                                                   maybe_initialize_distributed)

    maybe_initialize_distributed()
    chief = is_chief()
    result_dir = os.path.join(cfg.OUTPUT_DIR, cfg.SAVE_SUB_DIR, "result")
    if chief:
        os.makedirs(result_dir, exist_ok=True)
    # filesystem writes belong to process 0; other hosts log to console only
    logger = get_logger(os.path.join(result_dir, "test.log") if chief else None)
    # single process: shard the grouped dispatch over all devices.
    # multi-process: inference is embarrassingly parallel — each host runs
    # its batch shard on a mesh of its OWN devices (no cross-host
    # collectives until the final detection all-gather in run_test).
    devices = jax.local_devices() if jax.process_count() > 1 else jax.devices()
    mesh = (make_mesh(devices, mesh_shape=tuple(cfg.TPU.MESH_SHAPE),
                      axis_names=tuple(cfg.TPU.MESH_AXES))
            if len(devices) > 1 else None)
    if mesh is not None:
        logger.info(f"mesh: {mesh}")

    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=False),
                           trunk_dtype=get_trunk_dtype(cfg))
    provider_cls = get_provider_class(cfg)
    dataset = provider_cls(cfg, cfg.TEST.DATASET, one_hot=True,
                           from_rgb_detection=cfg.FROM_RGB_DET,
                           overwritten_data_path=cfg.OVER_WRITE_TEST_FILE)
    logger.info(f"test frustums: {len(dataset)}")

    # the empty-file fill is part of the devkit protocol: the evaluator
    # iterates result-dir files, so a frame with no result file is silently
    # excluded (its GT never counted as FNs) and AP inflates. The reference
    # unconditionally opens `kitti/image_sets/<split>.txt` (and crashes if
    # absent, `test_net_det.py:120-123`); we auto-discover the split file
    # ONLY next to the dataset's own DATA_ROOT (a cwd-relative fallback
    # could silently pick a split unrelated to the streamed pickles) and
    # refuse to evaluate without it — checked BEFORE the inference pass so
    # a misconfiguration cannot discard a full streaming run.
    idx_path = args.idx_path
    if not idx_path:
        split = cfg.TEST.DATASET.replace("_rgb_detection", "")
        for cand in (os.path.join(cfg.DATA.DATA_ROOT, "image_sets",
                                  f"{split}.txt"),
                     os.path.join(cfg.DATA.DATA_ROOT, "..", "image_sets",
                                  f"{split}.txt")):
            if os.path.exists(cand):
                idx_path = cand
                logger.info(f"using split ids from {cand} for empty-file fill")
                break
    split_ids = []
    if idx_path and os.path.exists(idx_path):
        split_ids = [int(line.strip()) for line in open(idx_path) if line.strip()]
    elif "test" not in cfg.TEST.DATASET and not args.no_eval:
        raise FileNotFoundError(
            "no split id file found for the empty-result fill — pass "
            "--idx_path <image_sets/{split}.txt>; evaluating without it "
            "excludes zero-detection frames from AP (devkit iterates "
            "result-dir files)")

    state = load_state_for_test(model, spec, cfg, dataset, logger)
    det_results = run_test(model, spec, state, dataset, cfg.TEST.BATCH_SIZE,
                           cfg.TEST.METHOD, logger,
                           group=cfg.TPU.INFER_GROUP,
                           inflight=cfg.TPU.INFER_INFLIGHT, mesh=mesh,
                           points_dtype=cfg.TPU.INFER_POINTS_DTYPE)
    if not chief:
        # each host streamed its own batch shard and run_test already merged
        # all detections with one all-gather, so every host holds identical
        # det_results; the result dir belongs to process 0
        return None
    nms_thresh = cfg.TEST.THRESH if cfg.TEST.METHOD == "nms" else None
    data_dir = write_detection_results(result_dir, det_results, split_ids,
                                       nms_threshold=nms_thresh)
    logger.info(f"results written to {data_dir}")

    if "test" in cfg.TEST.DATASET:
        # package the result dir for KITTI test-server submission
        # (ref train/test_net_det.py:317-319: zip of result/* -> results.zip)
        zip_path = package_test_results(result_dir)
        logger.info(f"results file saved in {result_dir}; packaged {zip_path}")
    elif not args.no_eval:
        from frustum_convnet_tpu.evaluation import kitti_eval
        results = kitti_eval.evaluate(args.gt_dir, result_dir,
                                      classes=("car", "pedestrian", "cyclist")
                                      if not cfg.DATA.CAR_ONLY else ("car",))
        logger.info(f"AP results: {results}")
        return results


if __name__ == "__main__":
    main()
