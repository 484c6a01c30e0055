"""Throughput of every supported experiment config on one chip.

bench.py reports the flagship (det_sample). This sweeps all five reference
configs (`cfgs/*.yaml` — KITTI car/people stage 1, car/people refinement,
SUN-RGBD) at their own reference shapes (NUM_SAMPLES, strides, MAX_DEPTH)
and prints a frustums/sec/chip table using the same on-device ``lax.scan``
methodology as bench.py. ``--train`` benches the full training step
(fwd + grads + adam + sync-BN, carried state) instead of inference.

Usage: python tools/bench_models.py [--iters 30] [--batches 32,256] [--train]
       [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

CFGS = tuple(os.path.join(_ROOT, "cfgs", name) for name in (
    "det_sample.yaml",
    "det_sample_people.yaml",
    "refine_car.yaml",
    "refine_people.yaml",
    "det_sample_sunrgbd.yaml",
))


def bench_cfg(cfg_file: str, batches, iters: int, train: bool = False,
              dtype: str = ""):
    from bench import scan_bench_infer, scan_bench_train
    from frustum_convnet_tpu.configs import config as config_mod
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import (get_compute_dtype,
                                                     get_model_spec)

    cfg = config_mod.get_default_cfg()
    config_mod.merge_cfg_from_file(cfg_file, cfg)
    if dtype:  # override the cfg's compute dtype (e.g. the bf16 train recipe)
        key = "COMPUTE_DTYPE" if train else "INFER_DTYPE"
        config_mod.merge_cfg_from_list(["TPU." + key, dtype], cfg)
    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=train))

    fn = scan_bench_train if train else scan_bench_infer
    rates = {bsz: fn(model, spec, bsz, iters=iters) for bsz in batches}
    return spec, rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batches", default="32,256")
    ap.add_argument("--train", action="store_true",
                    help="bench the full training step instead of inference")
    ap.add_argument("--dtype", default="",
                    help="compute dtype override (e.g. bfloat16 — the "
                         "supported scaled-batch train recipe)")
    ap.add_argument("--only", default="",
                    help="comma-separated config-name substrings to bench "
                         "(e.g. refine,people); empty = all five")
    args = ap.parse_args()
    batches = tuple(int(x) for x in args.batches.split(","))
    cfgs = CFGS
    if args.only:
        pats = [p.strip() for p in args.only.split(",") if p.strip()]
        cfgs = tuple(c for c in CFGS
                     if any(p in os.path.basename(c) for p in pats))

    rows = []
    for cfg_file in cfgs:
        spec, rates = bench_cfg(cfg_file, batches, args.iters,
                                train=args.train, dtype=args.dtype)
        name = os.path.splitext(os.path.basename(cfg_file))[0]
        shape = (f"N={spec.num_points} scales={spec.num_scales} "
                 f"sections={sum(spec.num_refs)}")
        rows.append((name, shape, rates))
        rate_s = "  ".join(f"b{b}: {r:8.0f} f/s" for b, r in rates.items())
        print(f"{name:24s} {shape:34s} {rate_s}", flush=True)

    print("\n| config | shapes | " +
          " | ".join(f"batch {b}" for b in batches) + " |")
    print("|---|---|" + "---|" * len(batches))
    for name, shape, rates in rows:
        print(f"| {name} | {shape} | " +
              " | ".join(f"{rates[b]:.0f}" for b in batches) + " |")


if __name__ == "__main__":
    main()
