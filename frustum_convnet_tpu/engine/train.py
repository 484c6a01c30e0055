"""Training driver CLI: ``python -m frustum_convnet_tpu.engine.train --cfg <yaml> [KEY VAL]...``

The TPU-native counterpart of `/root/reference/train/train_net_det.py:206-400`:
config merge + seeded setup + provider/model resolution (registry instead of
dynamic file import), epoch loop with disp-interval logging, per-epoch
validation with best-model selection on the in-loop ``IoU_<thresh>`` metric,
and the reference checkpoint cadence. Differences by design:

* one jitted SPMD train step over a ``data`` mesh replaces the per-batch
  ``.cuda()`` + DataParallel scatter/gather;
* the host loader prefetches while the device computes; batches are already
  static-shaped so there is exactly one compilation per (train/eval) graph;
* resume restores params/optimizer/BN statistics from msgpack checkpoints
  (incl. the reference's fine-tune quirk: resuming at MAX_EPOCH resets the
  counters, `train_net_det.py:358-361`).
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
from frustum_convnet_tpu.data.registry import get_provider_class
from frustum_convnet_tpu.engine import checkpoints as ckpt
from frustum_convnet_tpu.engine.loader import BatchLoader
from frustum_convnet_tpu.models.net import FrustumConvNet
from frustum_convnet_tpu.models.registry import (get_compute_dtype,
                                                  get_model_spec,
                                                  get_trunk_dtype)
from frustum_convnet_tpu.parallel.mesh import (is_chief, make_mesh,
                                               maybe_initialize_distributed,
                                               shard_batch)
from frustum_convnet_tpu.models import det
from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig, TrainState,
                                                     build_eval_step,
                                                     build_train_step_accum,
                                                     init_accum, init_state,
                                                     make_optimizer,
                                                     reset_schedule_count
                                                     as _reset_schedule)
from frustum_convnet_tpu.utils.logger import ScalarWriter, get_logger
from frustum_convnet_tpu.utils.metrics import TrainingStates


def save_cfg_snapshot(path: str, spec) -> None:
    """Dump the resolved frozen cfg + model spec for reproducibility."""
    import dataclasses

    import yaml

    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [plain(v) for v in o]
        if isinstance(o, (np.integer, np.floating)):
            return o.item()
        if isinstance(o, np.ndarray):
            return o.tolist()
        return o

    payload = {"cfg": plain(dict(cfg)), "spec": plain(dataclasses.asdict(spec))}
    with open(path, "w") as f:
        yaml.safe_dump(payload, f, default_flow_style=None, sort_keys=True)

BATCH_KEYS = ("point_cloud", "one_hot", "refs", "cls_label", "box3d_center",
              "box3d_heading", "box3d_size", "size_class")


def device_batch(batch_np: dict, mesh) -> dict:
    # host numpy straight into shard_batch: single-process it device_puts
    # with the batch sharding; multi-process it assembles the global array
    # from each host's local shard
    picked = {k: batch_np[k] for k in BATCH_KEYS if k in batch_np}
    picked["refs"] = tuple(picked["refs"])
    return shard_batch(picked, mesh)


def run_epoch_train(step, state, accum, loader, epoch, logger, writer, disp,
                    metric_interval=1):
    """One training epoch with on-device per-iteration stat accumulation.

    Loss averages cover EVERY step (reference semantics,
    `train_net_det.py:134-154`) — the accumulator lives on device and is
    fetched once at epoch end; only disp-interval logging syncs mid-epoch.

    ``metric_interval`` samples the monitoring metrics (rotated IoU,
    accuracies — `det_base.py:478-503` computes them per step on the CPU)
    every N steps through the metric-carrying compiled step, running the
    metric-free step otherwise; epoch metric averages cover the sampled
    steps. 1 = reference every-step parity. The per-step IoU metric costs
    ~13% of the batch-32 step (21.6 -> 18.8 ms, BENCH_NOTES), which is why
    the engine defaults the interval to ``cfg.disp``
    (``cfg.TPU.METRIC_INTERVAL``).
    """
    n_steps = 0
    n_metric = 0
    for i, batch_np in enumerate(loader.epoch(epoch)):
        batch = device_batch(batch_np, step.mesh) if hasattr(step, "mesh") else batch_np
        on_metric = (step.fast_fn is None or metric_interval <= 1
                     or (i + 1) % metric_interval == 0 or i == 0)
        if on_metric:
            state, accum, losses, metrics = step.fn(state, accum, batch)
            n_metric += 1
        else:
            # loss-only step: pass (and donate) just the loss slots of the
            # accumulator; the metric slots ride along untouched
            sub = {k: accum[k] for k in step.loss_keys}
            state, sub, losses, metrics = step.fast_fn(state, sub, batch)
            accum = {**accum, **sub}
        n_steps += 1
        if (i + 1) % disp == 0 or i == 0:
            vals = {k: float(v) for k, v in {**losses, **metrics}.items()}
            line = " ".join(f"{k} {v:.4f}" for k, v in vals.items())
            logger.info(f"epoch {epoch} it {i + 1}/{len(loader)} {line}")
            # fail loudly on numeric blow-up (the half-precision overflow
            # class: f16 weight-grad reductions outside the guarded layers
            # can go inf -> nan and would otherwise diverge silently);
            # piggybacks on the disp-interval sync, costing nothing extra
            if not np.isfinite(vals.get("total_loss", 0.0)):
                raise RuntimeError(
                    f"non-finite total_loss at epoch {epoch} it {i + 1}: "
                    f"{vals} — with TPU.COMPUTE_DTYPE=float16 this is the "
                    f"weight-gradient overflow hazard (see configs/config.py "
                    f"COMPUTE_DTYPE); use float32/bfloat16 or the "
                    f"F32_FINETUNE_EPOCHS schedule")
    loss_keys = frozenset(step.loss_keys)
    avg = {k: float(v) / max(n_steps if k in loss_keys else n_metric, 1)
           for k, v in jax.device_get(accum).items()}
    if writer:
        writer.scalars({f"train/{k}": v for k, v in avg.items()}, epoch)
    return state, avg


def run_epoch_eval(eval_fn, eval_fn_tail, mesh, state, loader, epoch, logger,
                   writer, iou_key):
    """Validation epoch: batch-size-weighted averages over the FULL val set.

    ``drop_last=False`` per the reference (`train_net_det.py:162-203,
    279-286`): full batches run through the mesh-sharded graph; the short
    tail batch (not divisible over the data axis) runs once per epoch
    through an unsharded specialization, so no val item is dropped and no
    padding biases the averages.
    """
    states = TrainingStates()
    for batch_np in loader.epoch(epoch):
        bsz = len(batch_np["point_cloud"])
        if batch_np.pop("_global_tail", False):
            # the loader yields the short global tail identically on every
            # host; it runs unsharded (same inputs, same jit) so the metrics
            # — and hence best-model selection — stay host-consistent
            picked = {k: batch_np[k] for k in BATCH_KEYS if k in batch_np}
            picked["refs"] = tuple(jnp.asarray(r) for r in picked["refs"])
            batch = {k: (v if k == "refs" else jnp.asarray(v))
                     for k, v in picked.items()}
            losses, metrics = eval_fn_tail(state, batch)
            weight = bsz  # global item count, counted once
        else:
            batch = device_batch(batch_np, mesh)
            losses, metrics = eval_fn(state, batch)
            # sharded metrics are means over the GLOBAL batch
            weight = loader.global_batch
        vals = {k: float(v) for k, v in {**losses, **metrics}.items()}
        states.update_states(vals, n=weight)
    result = states.get_states()
    logger.info(f"[val] epoch {epoch} " + states.format_states())
    if writer:
        writer.scalars({f"val/{k}": v for k, v in result.items()}, epoch)
    return result.get(iou_key, 0.0)


class _Step:
    """Bundles the jitted step(s) with their mesh for run_epoch_train.

    ``fn`` carries the monitoring metrics; ``fast_fn`` (optional) is the
    metric-free compilation used between metric samples, whose accumulator
    pytree holds only ``loss_keys``.
    """

    def __init__(self, fn, mesh, fast_fn=None, loss_keys=()):
        self.fn = fn
        self.mesh = mesh
        self.fast_fn = fast_fn
        self.loss_keys = tuple(loss_keys)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train FrustumConvNet on TPU")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args(argv)

    merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg()

    # multi-host bootstrap (env-gated no-op on single host); must precede
    # the first backend-instantiating jax call below
    maybe_initialize_distributed()
    chief = is_chief()

    output_dir = cfg.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)
    # filesystem writes belong to process 0; other hosts log to console only
    logger = get_logger(os.path.join(output_dir, "train.log") if chief else None)
    logger.info(f"config: {args.cfg_file} overrides: {args.opts}")

    seed = cfg.TRAIN.SEED
    np.random.seed(seed)

    mesh = make_mesh(mesh_shape=tuple(cfg.TPU.MESH_SHAPE), axis_names=tuple(cfg.TPU.MESH_AXES))
    logger.info(f"mesh: {mesh}")

    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=True),
                           trunk_dtype=get_trunk_dtype(cfg),
                           fast_bn=cfg.TPU.FAST_BN,
                           fast_bn_first=cfg.TPU.FAST_BN_FIRST,
                           remat_pointnet=cfg.TPU.REMAT_POINTNET,
                           bn_group=cfg.TPU.BN_GROUP_SIZE)

    provider_cls = get_provider_class(cfg)
    train_ds = provider_cls(cfg, cfg.TRAIN.DATASET, random_flip=True,
                            random_shift=True, one_hot=True,
                            extend_from_det=cfg.DATA.EXTEND_FROM_DET)
    # the reference passes extend_from_det to the val dataset too
    # (`train_net_det.py:270-277`)
    val_ds = provider_cls(cfg, cfg.TEST.DATASET, one_hot=True,
                          extend_from_det=cfg.DATA.EXTEND_FROM_DET)
    pc, pi = jax.process_count(), jax.process_index()
    train_loader = BatchLoader(train_ds, cfg.TRAIN.BATCH_SIZE, spec.num_scales,
                               shuffle=True, drop_last=True, seed=seed,
                               process_index=pi, process_count=pc,
                               prefetch=cfg.TPU.PREFETCH,
                               num_workers=cfg.NUM_WORKERS)
    # drop_last=False: best-model selection sees the whole val set (ref
    # `train_net_det.py:279-286`); the loader replicates the short global
    # tail on every host so multi-host metrics stay consistent
    val_loader = BatchLoader(val_ds, cfg.TEST.BATCH_SIZE, spec.num_scales,
                             shuffle=False, drop_last=False,
                             process_index=pi, process_count=pc)
    logger.info(f"train {len(train_ds)} frustums / {len(train_loader)} batches; "
                f"val {len(val_ds)} frustums")

    step_cfg = TrainStepConfig(
        base_lr=cfg.TRAIN.BASE_LR, min_lr=cfg.TRAIN.MIN_LR,
        gamma=cfg.TRAIN.GAMMA, lr_steps=list(cfg.TRAIN.LR_STEPS),
        warmup_epochs=cfg.TRAIN.WARMUP_EPOCHS,
        steps_per_epoch=max(len(train_loader), 1),
        weight_decay=cfg.TRAIN.WEIGHT_DECAY, optimizer=cfg.TRAIN.OPTIMIZER,
        momentum=cfg.TRAIN.MOMENTUM,
        loss_weights={"box": cfg.LOSS.BOX_LOSS_WEIGHT,
                      "corner": cfg.LOSS.CORNER_LOSS_WEIGHT,
                      "head_res": cfg.LOSS.HEAD_REG_WEIGHT,
                      "size_res": cfg.LOSS.SIZE_REG_WEIGHT},
        iou_thresh=cfg.IOU_THRESH,
    )
    tx = make_optimizer(step_cfg)

    # a tiny batch suffices for parameter init (shapes only depend on
    # channel dims); collating mesh-size items directly avoids spinning up
    # the loader's prefetch threads for one abandoned iterator, which would
    # leave NUM_WORKERS daemon threads parked on full prefetched batches
    from frustum_convnet_tpu.data.provider import collate_batch
    ex_rng = np.random.default_rng(0)
    # local example count: the host's shard of a mesh-size global batch
    n_ex = max(int(mesh.size) // pc if mesh is not None else 1, 1)
    example = collate_batch(
        [train_ds.__getitem__(i % len(train_ds), ex_rng) for i in range(n_ex)],
        spec.num_scales)
    example_dev = device_batch(example, mesh)
    state = init_state(model, tx, example_dev, seed=seed)

    start_epoch, best_prec, best_epoch = cfg.TRAIN.START_EPOCH, 0.0, 0
    paths = ckpt.checkpoint_paths(output_dir)
    if cfg.RESUME or cfg.TRAIN.WEIGHTS:
        path = cfg.TRAIN.WEIGHTS or paths["final"]
        payload = ckpt.load_checkpoint(path, state)
        state = TrainState(params=payload["params"],
                           batch_stats=payload["batch_stats"],
                           opt_state=payload["opt_state"],
                           step=jnp.asarray(payload["step"], jnp.int32))
        start_epoch, best_prec = payload["epoch"], payload["best_prec"]
        best_epoch = payload["best_epoch"]
        if start_epoch == cfg.TRAIN.MAX_EPOCH:  # fine-tune-from quirk
            start_epoch, best_prec, best_epoch = 0, 0.0, 0
            # the reference restarts its epoch-indexed LR scheduler at base
            # LR for the fine-tune run (`train_net_det.py:99` steps by the
            # loop epoch) while keeping adam moments; reset only the
            # schedule count, not the optimizer moments
            state = TrainState(params=state.params,
                               batch_stats=state.batch_stats,
                               opt_state=_reset_schedule(state.opt_state),
                               step=jnp.zeros((), jnp.int32))
        logger.info(f"resumed from {path} at epoch {start_epoch}")

    train_fn = build_train_step_accum(model, spec, tx, step_cfg, mesh=mesh,
                                      donate=cfg.TPU.DONATE)
    # metric cadence: -1 -> sample the monitoring metrics at cfg.disp
    # intervals (default); 1 -> reference every-step parity; N -> every N.
    # The metric-free twin step skips the ~23%-of-step IoU block entirely.
    metric_interval = cfg.TPU.METRIC_INTERVAL
    if metric_interval < 0:
        metric_interval = cfg.disp
    fast_fn = None
    if metric_interval > 1:
        import dataclasses as _dc
        fast_fn = build_train_step_accum(
            model, spec, tx, _dc.replace(step_cfg, compute_metrics=False),
            mesh=mesh, donate=cfg.TPU.DONATE)
    eval_fn = build_eval_step(model, spec, step_cfg, mesh=mesh)
    eval_fn_tail = build_eval_step(model, spec, step_cfg, mesh=None)

    # cfg.TPU.F32_FINETUNE_EPOCHS: final N epochs switch to float32 step
    # graphs (same TrainState — params/BN/optimizer are dtype-independent;
    # the LR schedule rides state.step and is continuous). The f32 graphs
    # compile lazily on first use at the switch epoch.
    ft_start = None
    if (cfg.TPU.F32_FINETUNE_EPOCHS > 0
            and cfg.TPU.COMPUTE_DTYPE != "float32"):
        ft_start = max(cfg.TRAIN.MAX_EPOCH - cfg.TPU.F32_FINETUNE_EPOCHS, 0)
        ft_model = FrustumConvNet(spec, dtype=jnp.float32,
                                  fast_bn=cfg.TPU.FAST_BN,
                                  fast_bn_first=cfg.TPU.FAST_BN_FIRST,
                                  remat_pointnet=cfg.TPU.REMAT_POINTNET,
                                  bn_group=cfg.TPU.BN_GROUP_SIZE)
        ft_train_fn = build_train_step_accum(ft_model, spec, tx, step_cfg,
                                             mesh=mesh, donate=cfg.TPU.DONATE)
        ft_fast_fn = None
        if metric_interval > 1:
            import dataclasses as _dc
            ft_fast_fn = build_train_step_accum(
                ft_model, spec, tx, _dc.replace(step_cfg,
                                                compute_metrics=False),
                mesh=mesh, donate=cfg.TPU.DONATE)
        ft_eval_fn = build_eval_step(ft_model, spec, step_cfg, mesh=mesh)
        ft_eval_fn_tail = build_eval_step(ft_model, spec, step_cfg, mesh=None)
    iou_key = f"IoU_{cfg.IOU_THRESH}"
    accum_keys = det.LOSS_KEYS + det.metric_keys(cfg.IOU_THRESH)

    writer = ScalarWriter(output_dir, "train") if (cfg.USE_TFBOARD and chief) else None

    # snapshot the resolved config next to the logs for reproducibility —
    # the registry equivalent of the reference's source-file copy
    # (`utils/utils.py:12-25`)
    if chief:
        save_cfg_snapshot(os.path.join(output_dir, "config_snapshot.yaml"), spec)

    if cfg.EVAL_MODE:
        run_epoch_eval(eval_fn, eval_fn_tail, mesh, state, val_loader, 0,
                       logger, writer, iou_key)
        return

    step = _Step(train_fn, mesh, fast_fn=fast_fn, loss_keys=det.LOSS_KEYS)
    ft_step = (_Step(ft_train_fn, mesh, fast_fn=ft_fast_fn,
                     loss_keys=det.LOSS_KEYS)
               if ft_start is not None else None)
    for epoch in range(start_epoch, cfg.TRAIN.MAX_EPOCH):
        t0 = time.time()
        finetune = ft_start is not None and epoch >= ft_start
        if finetune and epoch == ft_start:
            logger.info(f"epoch {epoch}: switching to float32 fine-tune "
                        f"steps (TPU.F32_FINETUNE_EPOCHS="
                        f"{cfg.TPU.F32_FINETUNE_EPOCHS})")
        accum = jax.device_put(init_accum(accum_keys),
                               jax.sharding.NamedSharding(
                                   mesh, jax.sharding.PartitionSpec()))
        state, _ = run_epoch_train(ft_step if finetune else step, state,
                                   accum, train_loader, epoch,
                                   logger, writer, cfg.disp,
                                   metric_interval=metric_interval)
        prec = run_epoch_eval(ft_eval_fn if finetune else eval_fn,
                              ft_eval_fn_tail if finetune else eval_fn_tail,
                              mesh, state, val_loader,
                              epoch, logger, writer, iou_key)
        is_best = prec > best_prec
        if is_best:
            best_prec, best_epoch = prec, epoch + 1
        logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s "
                    f"{iou_key}={prec:.4f} best={best_prec:.4f}@{best_epoch}")
        if chief:  # one writer — on a shared FS all hosts would race
            ckpt.maybe_save_epoch(output_dir, state, epoch, cfg.TRAIN.MAX_EPOCH,
                                  best_prec, best_epoch, is_best)
    logger.info(f"training done; best {iou_key}={best_prec:.4f} at epoch {best_epoch}")


if __name__ == "__main__":
    main()
