"""Benchmark: end-to-end inference throughput (frustums/sec/chip) on TPU.

Measures the full test-time hot path of the flagship 4-scale KITTI model at
reference shapes (1024 points, 280/140/70/35 sections): grouping +
multi-scale PointNet + 1D FCN + heads + box decode. Runs at the reference
batch (32) and at a serving batch (256) that amortizes per-op latency on the
small conv trunk; the headline value is the best, both are reported.

Methodology: the per-call dispatch latency through the remote TPU relay is
large and noisy, so the batch loop runs ON DEVICE — ``lax.scan`` over ITERS
iterations inside one jit dispatch, with a data dependency chaining
successive iterations so none can be elided or overlapped. Reported value is
the best of TRIALS dispatches (min wall / ITERS).

The reference publishes no throughput table (SURVEY.md §6); its test driver
logs per-batch forward time on a single ~2018 GPU
(`/root/reference/train/test_net_det.py:229-238`). REF_GPU_FRUSTUMS_PER_SEC
is an estimated reference figure (batch 32 at ~50 ms/batch = 640 frustums/s)
used to make ``vs_baseline`` meaningful; the BASELINE.json target is >=10x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; the extra
"train_throughput" key reports the full train step (fwd + grads + adam +
sync-BN + per-step metrics) measured with the same on-device scan
methodology, state carried between iterations, at the reference batch (32)
and scaled batches.

Set ``BENCH_TRACE_DIR=/tmp/trace`` to additionally capture a ``jax.profiler``
trace of one timed dispatch per batch size (inspect with xprof/tensorboard);
the JSON contract is unchanged. ``tools/profile_stages.py`` gives the
per-stage attribution without a trace viewer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import lax

REF_GPU_FRUSTUMS_PER_SEC = 640.0  # estimated reference GPU throughput (see above)
# Estimated reference training throughput: the reference trains batch 32 on a
# single GPU; train step ~3x its forward (~150 ms/batch) => ~213 frustums/s.
REF_GPU_TRAIN_FRUSTUMS_PER_SEC = 213.0
BATCHES = (32, 256, 1024)  # reference batch + serving batches (1024 ~ +2% over 256)
TRAIN_BATCHES = (32, 128, 256)  # reference train batch + scaled batches
ITERS = 50
TRIALS = 3


def scan_bench_infer(model, spec, bsz: int, iters: int = ITERS,
                     trials: int = TRIALS, trace_tag: str | None = None) -> float:
    """Frustums/sec of one jitted forward+decode at batch ``bsz``.

    Shared measurement harness (also used by tools/bench_models.py): the
    batch loop runs on device via ``lax.scan`` with a carry*1e-20 data
    dependency chaining iterations so none can be elided or overlapped;
    returns best-of-``trials`` dispatches. Set ``BENCH_TRACE_DIR`` (with a
    ``trace_tag``) to capture a jax.profiler trace of one timed dispatch.
    """
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.models.det import decode_outputs

    batch = make_batch(spec, batch=bsz, seed=0, with_labels=False)
    pts = jnp.asarray(batch["point_cloud"])
    one_hot = jnp.asarray(batch["one_hot"])
    refs = tuple(jnp.asarray(r) for r in batch["refs"])

    variables = jax.jit(
        lambda p, o, r: model.init(jax.random.PRNGKey(3), p, o, list(r), train=False)
    )(pts[:2], one_hot[:2], tuple(r[:2] for r in refs))

    def one(pts_in):
        cls_logits, reg = model.apply(variables, pts_in, one_hot, list(refs), train=False)
        out = decode_outputs(spec, cls_logits, reg, refs[1])
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())

    @jax.jit
    def bench_loop(pts):
        def body(carry, _):
            # carry*1e-20 chains iterations without changing the math
            return one(pts + carry * 1e-20), ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    jax.block_until_ready(bench_loop(pts))  # compile
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir and trace_tag:  # jax.profiler trace of one timed dispatch
        with jax.profiler.trace(os.path.join(trace_dir, trace_tag)):
            jax.block_until_ready(bench_loop(pts))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = bench_loop(pts)
        float(s)  # host fetch fences the dispatch
        best = min(best, (time.perf_counter() - t0) / iters)
    return bsz / best


def scan_bench_train(model, spec, bsz: int, iters: int = ITERS,
                     trials: int = TRIALS) -> float:
    """Frustums/sec of the full jitted train step at batch ``bsz``.

    Full production step: train-mode forward (BN batch stats) + losses +
    grads + adam + BN update, per-step metrics at the production default.
    The step loop runs on device via ``lax.scan`` carrying the real train
    state between iterations, so successive steps have a true dependency.
    """
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.parallel.train_step import (
        TrainStepConfig, _train_core, init_state, make_optimizer)

    tcfg = TrainStepConfig()
    tx = make_optimizer(tcfg)
    batch_np = make_batch(spec, batch=bsz, seed=0, with_labels=True)
    batch = {k: (tuple(jnp.asarray(x) for x in v) if isinstance(v, (list, tuple))
                 else jnp.asarray(v)) for k, v in batch_np.items()}
    state = init_state(model, tx, batch, seed=3)
    core = _train_core(model, spec, tx, tcfg)

    @jax.jit
    def step_loop(state):
        def body(s, _):
            s2, losses, _ = core(s, batch)
            return s2, losses["total_loss"]
        _, ls = lax.scan(body, state, None, length=iters)
        return ls[-1]

    jax.block_until_ready(step_loop(state))  # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(step_loop(state))  # host fetch fences the dispatch
        best = min(best, (time.perf_counter() - t0) / iters)
    return bsz / best


def main():
    from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import get_model_spec

    cfg = get_default_cfg()
    merge_cfg_from_list(["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT", "False"], cfg)
    from frustum_convnet_tpu.models.registry import get_compute_dtype

    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=False))

    per_batch = {}
    for bsz in BATCHES:
        per_batch[bsz] = scan_bench_infer(model, spec, bsz, trace_tag=f"b{bsz}")

    train_model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=True))
    train_per_batch = {}
    for bsz in TRAIN_BATCHES:
        train_per_batch[bsz] = scan_bench_train(train_model, spec, bsz)

    best_bsz = max(per_batch, key=per_batch.get)
    frustums_per_sec = per_batch[best_bsz]
    print(json.dumps({
        "metric": "inference_throughput_kitti_det_base",
        "value": round(frustums_per_sec, 1),
        "unit": "frustums/sec/chip",
        "vs_baseline": round(frustums_per_sec / REF_GPU_FRUSTUMS_PER_SEC, 2),
        "batch": best_bsz,
        "per_batch": {str(k): round(v, 1) for k, v in per_batch.items()},
        "train_throughput": {
            "value": round(max(train_per_batch.values()), 1),
            "unit": "frustums/sec/chip",
            "vs_baseline": round(max(train_per_batch.values())
                                 / REF_GPU_TRAIN_FRUSTUMS_PER_SEC, 2),
            "per_batch": {str(k): round(v, 1)
                          for k, v in train_per_batch.items()},
        },
    }))


if __name__ == "__main__":
    main()
