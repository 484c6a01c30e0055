"""Training-step timing of the flagship KITTI model on one TPU chip.

Attributes the train-step budget (BENCH_NOTES.md "Training step" table):
eval-mode forward, train-mode forward (BatchNorm batch statistics), full
step (loss + grads + adam + sync-BN update) with and without the per-step
rotated-IoU metric the reference also computes every step
(`/root/reference/models/det_base.py:478-503`).

Usage: python tools/profile_train.py [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20
TRIALS = 3


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:46s} {best * 1e3:8.3f} ms/step", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="float32",
                    help="train compute dtype (cfg.TPU.COMPUTE_DTYPE)")
    ap.add_argument("--trunk_dtype", default="",
                    help="separate conv-trunk/heads dtype "
                         "(cfg.TPU.TRUNK_DTYPE; '' = follow --dtype)")
    ap.add_argument("--metrics", default="1", choices=("0", "1"),
                    help="compute the per-step IoU metric in the scan step")
    ap.add_argument("--fast_bn", action="store_true",
                    help="analytic BN batch statistics (cfg.TPU.FAST_BN)")
    ap.add_argument("--fast_bn_first", action="store_true",
                    help="analytic BN stats on each scale's first MLP layer "
                         "only (cfg.TPU.FAST_BN_FIRST)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the PointNet MLP stacks in backward "
                         "(cfg.TPU.REMAT_POINTNET)")
    ap.add_argument("--bn_group", type=int, default=0,
                    help="ghost-BN group size (cfg.TPU.BN_GROUP_SIZE; "
                         "0 = global sync-BN)")
    args = ap.parse_args()

    from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.parallel.train_step import (
        TrainStepConfig, build_eval_step, build_train_step, init_state,
        make_optimizer)

    from frustum_convnet_tpu.models.registry import get_compute_dtype

    cfg = get_default_cfg()
    merge_cfg_from_list(["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT",
                         "False", "TRAIN.BATCH_SIZE", str(args.batch),
                         "TPU.COMPUTE_DTYPE", args.dtype,
                         "TPU.TRUNK_DTYPE", args.trunk_dtype], cfg)
    spec = get_model_spec(cfg)
    from frustum_convnet_tpu.models.registry import get_trunk_dtype
    model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=True),
                           trunk_dtype=get_trunk_dtype(cfg),
                           fast_bn=args.fast_bn,
                           fast_bn_first=args.fast_bn_first,
                           remat_pointnet=args.remat,
                           bn_group=args.bn_group)
    tcfg = TrainStepConfig(compute_metrics=args.metrics == "1")
    tx = make_optimizer(tcfg)

    batch_np = make_batch(spec, batch=args.batch, seed=0, with_labels=True)
    batch = {k: (tuple(jnp.asarray(x) for x in v) if isinstance(v, (list, tuple))
                 else jnp.asarray(v)) for k, v in batch_np.items()}

    state = init_state(model, tx, batch, seed=3)
    jax.block_until_ready(state.params)

    # eval-mode forward (inference graph, no BN stats)
    eval_step = build_eval_step(model, spec, tcfg)
    bench("eval forward + losses/metrics", eval_step, state, batch)

    # train-mode forward + loss, no grad (BN batch statistics, metrics on)
    @jax.jit
    def fwd_train(state, batch):
        from frustum_convnet_tpu.models.det import compute_losses
        (cls_logits, reg), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["point_cloud"], batch["one_hot"], list(batch["refs"]),
            train=True, mutable=["batch_stats"])
        labels = {k: batch[k] for k in ("cls_label", "box3d_center",
                                        "box3d_heading", "box3d_size",
                                        "size_class")}
        losses, metrics = compute_losses(
            spec, cls_logits, reg, batch["refs"][1], labels,
            tcfg.loss_weights, tcfg.iou_thresh)
        return losses["total_loss"]

    bench("train-mode fwd + loss + metrics (no grad)", fwd_train, state, batch)

    # full step without the per-step IoU metric
    import dataclasses as _dc
    train_step_nm = build_train_step(
        model, spec, tx, _dc.replace(tcfg, compute_metrics=False),
        donate=False)
    st_nm, lo_nm, _ = train_step_nm(state, batch)
    jax.block_until_ready(lo_nm)
    best_nm = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        cur = st_nm
        for _ in range(ITERS):
            cur, lo, _ = train_step_nm(cur, batch)
        jax.block_until_ready(lo)
        best_nm = min(best_nm, (time.perf_counter() - t0) / ITERS)
    print(f"{'full train step (metrics OFF)':46s} {best_nm * 1e3:8.3f} ms/step")

    # full train step (donation off so the same state can be reused)
    train_step = build_train_step(model, spec, tx, tcfg, donate=False)
    st2, losses, metrics = train_step(state, batch)
    jax.block_until_ready(losses)
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        cur = st2
        for _ in range(ITERS):
            cur, lo, me = train_step(cur, batch)
        jax.block_until_ready(lo)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{'full train step (grads+adam+BN+metrics)':46s} {best * 1e3:8.3f} ms/step")
    print(f"train throughput: {args.batch / best:.0f} frustums/s/chip "
          f"(batch {args.batch})")

    # scan-chained measurements: the batch loop runs ON DEVICE with a real
    # state dependency between iterations, so per-dispatch relay latency and
    # queueing artifacts cannot skew the per-step time (same methodology as
    # bench.py; the per-dispatch numbers above can read low when the relay
    # pipelines identical dispatches)
    from jax import lax
    from frustum_convnet_tpu.models.det import compute_losses
    from frustum_convnet_tpu.parallel.train_step import _train_core

    def fwd_loss(params, stats, pts):
        (cl, rg), _ = model.apply(
            {"params": params, "batch_stats": stats},
            pts, batch["one_hot"], list(batch["refs"]),
            train=True, mutable=["batch_stats"])
        labels = {k: batch[k] for k in ("cls_label", "box3d_center",
                                        "box3d_heading", "box3d_size",
                                        "size_class")}
        losses, _ = compute_losses(
            spec, cl, rg, batch["refs"][1], labels, tcfg.loss_weights,
            tcfg.iou_thresh, compute_metrics=False)
        return losses["total_loss"]

    @jax.jit
    def fwd_scan(state):
        def body(c, _):
            return fwd_loss(state.params, state.batch_stats,
                            batch["point_cloud"] + c * 1e-20), ()
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    core = _train_core(model, spec, tx, tcfg)

    @jax.jit
    def step_scan(state):
        def body(s, _):
            s2, losses, _ = core(s, batch)
            return s2, losses["total_loss"]
        _, ls = lax.scan(body, state, None, length=ITERS)
        return ls[-1]

    def bench_scan(name, fn, arg):
        jax.block_until_ready(fn(arg))
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(arg))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{name:46s} {best * 1e3:8.3f} ms/step")
        return best

    bench_scan("scan: train-mode fwd + loss (no grad)", fwd_scan, state)
    best = bench_scan("scan: full train step", step_scan, state)
    print(f"scan train throughput: {args.batch / best:.0f} frustums/s/chip "
          f"(batch {args.batch})")


if __name__ == "__main__":
    main()
