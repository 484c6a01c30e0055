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
methodology, state carried between iterations. Its headline value is
selected ONLY from SUPPORTED_TRAIN_RECIPES — recipes whose 50-epoch
protocol AP landed inside the reference's ±0.5 band (BENCH_NOTES.md) —
and carries the recipe + its notes section as provenance.

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

# --- Reference-GPU baseline estimates and their derivation -----------------
# The reference publishes no throughput (SURVEY.md §6), so the denominators
# are estimates. Derivation (reproducible, also in BENCH_NOTES "Baseline
# estimate derivation"):
#   * forward model FLOPs: 2.977 GF/frustum (flops_per_frustum below — the
#     architecture is identical, so this measures the reference too);
#   * era hardware (CUDA 9 / PyTorch 1.0, README.md:27): a GTX 1080 Ti-class
#     GPU at ~11.3 f32 TFLOP/s peak;
#   * eager per-layer PyTorch on sub-GB models typically realizes 5-30% of
#     peak; at the midpoint (~17%) a 32-frustum forward costs ~50 ms =>
#     640 frustums/s. The train step (fwd + ~2x bwd, plus its per-step
#     CPU rotated-IoU metric round-trip, det_base.py:495) at the same
#     ~17% => ~213 frustums/s.
# Error bar: the 5-30% utilization range maps to ~190-1150 f/s inference
# (vs_baseline 28x could honestly be 16-94x) and ~65-380 f/s train. The
# MFU numbers reported next to vs_baseline are measured against the v5e
# peak and carry no such assumption — treat them as the grounded figures.
REF_GPU_FRUSTUMS_PER_SEC = 640.0
REF_GPU_TRAIN_FRUSTUMS_PER_SEC = 213.0
BASELINE_ESTIMATE = {
    "ref_fwd_gflops_per_frustum": 2.977,
    "assumed_gpu": "GTX 1080 Ti-class (2018, CUDA 9 / torch 1.0)",
    "assumed_peak_f32_tflops": 11.3,
    "assumed_utilization_pct": [5, 30],
    "infer_fps_range": [190, 1150],
    "train_fps_range": [65, 380],
}
BATCHES = (32, 256, 1024)  # reference batch + serving batches (1024 ~ +2% over 256)
TRAIN_BATCHES = (32, 128, 256)  # reference train batch + scaled batches
ITERS = 50
TRIALS = 3

# Supported fast-training recipes. INVARIANT: every row here is backed by a
# full 50-epoch protocol AP run recorded in a BENCH_NOTES.md table, landing
# inside the reference's own +-0.5 reproducibility band vs the f32/batch-32
# baseline (Car 3D AP 90.64 on the synthetic protocol). The train headline
# below is selected ONLY from this table. Recipes measured OUT of band are
# deliberately absent — e.g. bf16/b128/lr4e-3 reached 3608 f/s but lost
# 1.0 AP ("bf16 scaled-batch AP campaign" in BENCH_NOTES) and must not be
# headlined. Fields:
# (batch, compute_dtype, trunk_dtype, bn_group, f32_ft, lr, notes_section);
# bn_group > 0 = ghost-BN per-group statistics (TPU.BN_GROUP_SIZE — the
# reference's own multi-GPU DataParallel BN semantics); f32_ft > 0 = the
# final N of the protocol's PROTOCOL_EPOCHS run float32 step graphs
# (TPU.F32_FINETUNE_EPOCHS — precision schedule); its throughput is the
# amortized rate over the 50-epoch reference protocol, computed from the
# measured half-precision and f32 step rates.
SUPPORTED_TRAIN_RECIPES = (
    (32, "float32", "", 0, 0, 1e-3,
     "Full 50-epoch reference protocol on chip (round 3)"),
    (32, "bfloat16", "", 0, 0, 1e-3, "bf16 training validation (round 4)"),
    (128, "float32", "", 0, 0, 4e-3,
     "LR-scaled large-batch recipes (round 5)"),
    # precision schedule: f16 for the first 10 high-LR epochs, f32 from
    # epoch 10 on — protocol AP 90.15/90.31/90.31, in band (BENCH_NOTES
    # "float16 compute", run 3). Amortized 10.2x.
    (128, "float16", "", 0, 40, 4e-3,
     "float16 compute (round 4): bf16's bandwidth win without its mantissa"),
)

# Epoch count of the reference training protocol (README.md:133-136 /
# cfgs/det_sample.yaml) — the basis for amortizing precision-schedule
# recipes (f32_ft above).
PROTOCOL_EPOCHS = 50

# 50-epoch protocol Car 3D AP (easy) per training seed, keyed by
# (batch, dtype): the measured noise floor behind the ±0.5 acceptance
# band (BENCH_NOTES "Seed-variance campaign"). "prior" rows ran on
# round-3/4 code (before the pool-tie/Bessel semantics adoption); the
# cross-code deltas bound round-to-round drift.
SEED_APS = {
    (32, "float32"): {"3 (prior)": 90.64, "4": 90.71},
    (32, "bfloat16"): {"3 (prior)": 90.45, "4": 90.54},
    (128, "float32"): {"3 (prior)": 90.38, "3 (prior, regenerated data)": 90.49},
    (128, "float16"): {"3 (prior)": 90.15},
}

# Secondary inference configs reported in the per_config block: the
# refinement stage (the config behind the north-star AP target), the
# people ladder (2.5x the flagship's sections) and SUN-RGBD (5 scales,
# 2048 points), each at the batch-256 serving point.
PER_CONFIG_YAMLS = ("refine_car", "det_sample_people", "det_sample_sunrgbd")

# v5e MXU peak (bf16 systolic-array rate). Used for BOTH compute dtypes:
# jax's default matmul precision on TPU lowers float32-stored matmuls to
# single-pass bf16 MXU ops, so the hardware ceiling is the same — an f32
# "compute dtype" here means f32 storage/accumulation, not 6-pass f32 MXU.
V5E_PEAK_FLOPS = 197e12
# Train-step analytic FLOPs multiplier over the forward: backward re-runs
# every matmul twice (dX and dW) => fwd + 2x fwd. BN stat reductions,
# optimizer elementwise and the grouping kernel's scan matmul are excluded
# (see BENCH_NOTES.md "Analytic FLOPs accounting").
TRAIN_FLOPS_MULT = 3.0


def flops_per_frustum(spec) -> float:
    """Analytic forward model FLOPs per frustum (matmul/conv MACs x 2).

    Counts the useful dense math only — per-scale PointNet MLPs over the
    (M_i, K_i) grouped points, the 1D conv encoder/decoder, and the heads.
    Excluded (documented in BENCH_NOTES.md): the grouping kernel's int8 scan
    matmul (bookkeeping, not model math), BN statistics/normalize, ReLU,
    max-pool, and the box decode — all bandwidth-bound elementwise work.
    Stage map: SURVEY.md §2.2 det_base rows / `models/net.py`.
    """
    cin0 = 3 + (spec.extra_feat_dim if spec.use_extra_feature else 0)
    f = 0.0
    for i in range(spec.num_scales):  # shared MLPs (PointNetScale)
        chs = (cin0,) + tuple(spec.mlps[i])
        macs = sum(a * b for a, b in zip(chs[:-1], chs[1:]))
        f += 2.0 * spec.num_refs[i] * spec.nsamples[i] * macs
    # conv trunk (FrustumConvNet blocks; stride-2 lengths == next scale's
    # section count by ladder construction)
    ch, L = spec.block_channels, spec.num_refs
    feat_ch = [spec.mlps[i][-1] + spec.num_vec for i in range(spec.num_scales)]
    f += 2.0 * L[0] * 3 * feat_ch[0] * ch[0]  # block1_conv1 (3-tap)
    for b in range(1, len(ch)):
        f += 2.0 * L[b] * 3 * ch[b - 1] * ch[b]  # stride-2 3-tap
        f += 2.0 * L[b] * 3 * ch[b] * ch[b]  # 3-tap
        f += 2.0 * L[b] * (ch[b] + feat_ch[b]) * ch[b]  # merge 1x1
        # deconv back to the stride-2 length: k-tap transpose, k = 2^(b-1)
        f += 2.0 * L[b] * (2 ** (b - 1)) * ch[b] * spec.deconv_channels
    f += 2.0 * spec.num_out * spec.head_channels * (spec.num_classes
                                                    + spec.reg_size)
    return f


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
                     trials: int = TRIALS,
                     metric_interval: int = 50) -> float:
    """Frustums/sec of the full jitted train step at batch ``bsz``.

    Full production step: train-mode forward (BN batch stats) + losses +
    grads + adam + BN update. The step loop runs on device via ``lax.scan``
    carrying the real train state between iterations, so successive steps
    have a true dependency.

    The engine's shipped default (``cfg.TPU.METRIC_INTERVAL`` = -1 ->
    ``cfg.disp`` = 50) runs the rotated-IoU monitoring metrics through a
    metric-carrying compiled step every 50th step and a metric-free twin
    otherwise (parameter trajectory bit-identical; BENCH_NOTES "Metric
    cadence"). The bench times BOTH steps and reports the amortized
    production mix; ``metric_interval=1`` reproduces the reference's
    every-step-metrics cadence.
    """
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.parallel.train_step import (
        TrainStepConfig, _train_core, init_state, make_optimizer)

    batch_np = make_batch(spec, batch=bsz, seed=0, with_labels=True)
    batch = {k: (tuple(jnp.asarray(x) for x in v) if isinstance(v, (list, tuple))
                 else jnp.asarray(v)) for k, v in batch_np.items()}

    def time_step(compute_metrics: bool) -> float:
        tcfg = TrainStepConfig(compute_metrics=compute_metrics)
        tx = make_optimizer(tcfg)
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
        return best

    if metric_interval <= 1:
        return bsz / time_step(True)
    t = ((metric_interval - 1) * time_step(False)
         + time_step(True)) / metric_interval
    return bsz / t


def scan_bench_serving(model, spec, group: int, bsz: int, method: str = "nms",
                       iters: int = ITERS, trials: int = TRIALS) -> float:
    """Frustums/sec of the production serving dispatch at user batch ``bsz``.

    Times `engine.test.build_infer_group_fn` — the flattened (G*B) grouped
    dispatch with device-side ladder rebuild (the 6-floats/frustum
    ``ref_basis`` upload path) and on-device fg compaction — with the same
    scan-chained methodology as the other benches, so the user-facing batch
    stays ``bsz`` while the trunk runs at G*bsz. This is the driver's actual
    per-dispatch device work at the reference serving batch.
    """
    import numpy as np

    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.engine.test import build_infer_group_fn

    z_grids = [(np.arange(m, dtype=np.float32) + 0.5) * s
               for m, s in zip(spec.num_refs, spec.strides)]
    cap = min(64, spec.num_out)
    infer_group = build_infer_group_fn(model, spec, method, cap,
                                       z_grids=z_grids)

    batch = make_batch(spec, batch=bsz, seed=0, with_labels=False)
    tile = lambda x: np.broadcast_to(x, (group,) + x.shape).copy()
    pts_g = jnp.asarray(tile(batch["point_cloud"]))
    oh_g = jnp.asarray(tile(batch["one_hot"]))
    rng = np.random.default_rng(0)
    rdir = jnp.asarray(np.concatenate(
        [rng.uniform(-0.05, 0.05, (group, bsz, 2)),
         np.ones((group, bsz, 1))], axis=-1).astype(np.float32))
    roff = jnp.zeros((group, bsz, 3), jnp.float32)

    variables = jax.jit(
        lambda p, o, r: model.init(jax.random.PRNGKey(3), p, o, list(r),
                                   train=False)
    )(pts_g[0, :2], oh_g[0, :2],
      tuple((roff[0, :2, None, :] + rdir[0, :2, None, :]
             * jnp.asarray(z)[None, :, None]) for z in z_grids))
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    @jax.jit
    def bench_loop(pts_g, oh_g, rdir, roff):
        def body(carry, _):
            packed, cnt = infer_group(params, stats, pts_g + carry * 1e-20,
                                      oh_g, (rdir, roff))
            return jnp.sum(packed.astype(jnp.float32)), ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    jax.block_until_ready(bench_loop(pts_g, oh_g, rdir, roff))  # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(bench_loop(pts_g, oh_g, rdir, roff))  # host fetch fences
        best = min(best, (time.perf_counter() - t0) / iters)
    return group * bsz / best


def bench_secondary_config(name: str, bsz: int, iters: int = 30,
                           train: bool = False, dtype=None) -> float:
    """Frustums/sec of one non-flagship config (its own yaml shapes)."""
    from frustum_convnet_tpu.configs import config as config_mod
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import (get_compute_dtype,
                                                     get_model_spec)

    cfg = config_mod.get_default_cfg()
    config_mod.merge_cfg_from_file(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "cfgs", name + ".yaml"), cfg)
    spec = get_model_spec(cfg)
    model = FrustumConvNet(
        spec, dtype=dtype or get_compute_dtype(cfg, train=train))
    fn = scan_bench_train if train else scan_bench_infer
    return fn(model, spec, bsz, iters=iters)


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

    serving = scan_bench_serving(model, spec, group=8, bsz=32)

    # f32 train sweep across batches (the reference recipe + LR-scaled ones)
    train_model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=True))
    train_per_batch = {}
    for bsz in TRAIN_BATCHES:
        train_per_batch[bsz] = scan_bench_train(train_model, spec, bsz)

    # Train headline: best throughput among SUPPORTED_TRAIN_RECIPES only
    # (each row has a protocol-band AP table in BENCH_NOTES behind it).
    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
          "float16": jnp.float16}
    best_train, best_recipe = -1.0, None
    for batch, dtype, trunk_dtype, bn_group, f32_ft, lr, section in \
            SUPPORTED_TRAIN_RECIPES:
        if (dtype == "float32" and not trunk_dtype and not bn_group
                and batch in train_per_batch):
            fps = train_per_batch[batch]  # already measured in the f32 sweep
        else:
            m = FrustumConvNet(spec, dtype=dt[dtype],
                               trunk_dtype=dt[trunk_dtype] if trunk_dtype
                               else None,
                               bn_group=bn_group)
            fps = scan_bench_train(m, spec, batch)
        if f32_ft > 0:
            # precision schedule: amortize the half-precision rate and the
            # f32 fine-tune-tail rate over the 50-epoch reference protocol
            f32_fps = train_per_batch.get(batch)
            if f32_fps is None:
                f32_fps = scan_bench_train(train_model, spec, batch)
            fps = PROTOCOL_EPOCHS / ((PROTOCOL_EPOCHS - f32_ft) / fps
                                     + f32_ft / f32_fps)
        if fps > best_train:
            best_train, best_recipe = fps, {
                "batch": batch, "dtype": dtype, "trunk_dtype": trunk_dtype,
                "bn_group": bn_group, "f32_finetune_epochs": f32_ft,
                "lr": lr, "ap_validated": True, "ap_notes": section,
                "seed_ap_easy": SEED_APS.get((batch, dtype))}

    # secondary configs at their own reference shapes (regression guard for
    # the non-flagship paths; full sweep in tools/bench_models.py)
    per_config = {name: round(bench_secondary_config(name, 256), 1)
                  for name in PER_CONFIG_YAMLS}

    # refinement-stage train throughput (the config behind the north-star
    # AP target, `cfgs/refine_car.yaml` / ref README.md:124) at its
    # reference batch; AP provenance for the listed recipes lives in
    # BENCH_NOTES "Refine-stage recipe validation (round 5)"
    refine_train = {
        "float32_b32": round(
            bench_secondary_config("refine_car", 32, train=True), 1),
        "bfloat16_b32": round(
            bench_secondary_config("refine_car", 32, train=True,
                                   dtype=jnp.bfloat16), 1),
    }

    fpf = flops_per_frustum(spec)  # analytic forward FLOPs per frustum

    def hw(fps: float, mult: float = 1.0) -> dict:
        tf = fps * fpf * mult / 1e12
        return {"tflops_per_sec": round(tf, 1),
                "mfu_pct": round(100.0 * tf * 1e12 / V5E_PEAK_FLOPS, 1)}

    best_bsz = max(per_batch, key=per_batch.get)
    frustums_per_sec = per_batch[best_bsz]
    print(json.dumps({
        "metric": "inference_throughput_kitti_det_base",
        "value": round(frustums_per_sec, 1),
        "unit": "frustums/sec/chip",
        "vs_baseline": round(frustums_per_sec / REF_GPU_FRUSTUMS_PER_SEC, 2),
        "batch": best_bsz,
        "per_batch": {str(k): round(v, 1) for k, v in per_batch.items()},
        # hardware-grounded numbers next to the estimated-baseline ratio:
        # analytic fwd FLOPs/frustum (see flops_per_frustum) over the v5e
        # MXU peak; train multiplies by TRAIN_FLOPS_MULT (fwd + 2x bwd)
        "flops_per_frustum": round(fpf / 1e9, 3),  # GFLOPs, forward
        **hw(frustums_per_sec),
        "serving_batch32": {
            "value": round(serving, 1),
            "unit": "frustums/sec/chip",
            "group": 8,
            **hw(serving),
        },
        # batch-256 frustums/sec of the non-flagship configs (own shapes)
        "per_config_batch256": per_config,
        # reproducible derivation behind the estimated vs_baseline
        # denominators (REF_GPU_* above); MFU is the grounded figure
        "baseline_estimate": BASELINE_ESTIMATE,
        # refinement-stage train step at its reference shapes/batch
        "train_throughput_refine": refine_train,
        "train_throughput": {
            "value": round(best_train, 1),
            "unit": "frustums/sec/chip",
            "vs_baseline": round(best_train / REF_GPU_TRAIN_FRUSTUMS_PER_SEC,
                                 2),
            # amortized over the engine's shipped metric cadence (monitoring
            # metrics every disp=50 steps; parameter trajectory identical)
            "metric_cadence": 50,
            # provenance: the headline recipe and its BENCH_NOTES AP section
            # (SUPPORTED_TRAIN_RECIPES invariant — in-band recipes only)
            "recipe": best_recipe,
            "per_batch": {str(k): round(v, 1)
                          for k, v in train_per_batch.items()},
            **hw(best_train, TRAIN_FLOPS_MULT),
        },
    }))


if __name__ == "__main__":
    main()
