"""Full reference training protocol on synthetic KITTI, end to end.

One command reproduces the round-3 on-chip validation chain
(BENCH_NOTES.md "Full 50-epoch reference protocol on chip"): synthetic
KITTI generation -> stage-1 prep CLI (perturbed x5 train / val /
rgb-detection pickles) -> `engine.train` with `cfgs/det_sample.yaml`
verbatim (+ overrides) -> `engine.test` rgb-detection eval -> the
official-protocol Car AP. Used for the round-2 bf16-training validation
(VERDICT r1 item 3): run once with --dtype float32 and once with
--dtype bfloat16 and compare the final 3D AP (acceptance band +-0.5).

The synthetic protocol ceiling is 90.91 (41-point AP with perfect recall);
the round-3 f32 reference run reached Car 3D AP 90.64/90.69/90.69.

Usage:
  python tools/run_synth_protocol.py --dtype bfloat16 [--frames 2000]
      [--epochs 50] [--cache /tmp/fcn_tpu_protocol] [--tag r2bf16]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def build_dataset(frames: int, cars: int, cache_root: str, workers: int,
                  difficulty_mix: bool = False):
    """Synthetic raw KITTI + stage-1 pickles, cached by generation key."""
    from frustum_convnet_tpu.data.kitti import prepare
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti

    gen = "proto-v2-mix" if difficulty_mix else "proto-v1"
    key = hashlib.md5(f"{gen}-{frames}-{cars}".encode()).hexdigest()[:10]
    root = os.path.join(cache_root, f"synth_{key}")
    kitti_root = os.path.join(root, "kitti_raw")
    pickle_dir = os.path.join(root, "pickles")
    done = os.path.join(pickle_dir, ".done")
    if not os.path.exists(done):
        t0 = time.time()
        make_synthetic_kitti(kitti_root, num_frames=frames,
                             cars_per_frame=cars, seed=1,
                             difficulty_mix=difficulty_mix)
        prepare.main([
            "--gen_train", "--gen_val", "--gen_val_rgb_detection",
            "--car_only", "--data_root", kitti_root,
            "--save_dir", pickle_dir,
            "--rgb_det_dir", os.path.join(kitti_root, "rgb_detections"),
            "--workers", str(workers),
        ])
        open(done, "w").write("ok\n")
        print(f"prepared synthetic protocol data in {time.time() - t0:.1f}s "
              f"-> {root}", flush=True)
    return kitti_root, pickle_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--cars", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16", "float16"))
    ap.add_argument("--tag", default=None, help="output dir suffix")
    ap.add_argument("--cache", default="/tmp/fcn_tpu_protocol")
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--difficulty_mix", action="store_true",
                    help="generate easy/moderate/hard GT populations "
                         "(occlusion slices, truncation, sparse far objects) "
                         "so the three KITTI difficulty gates separate; "
                         "APs are NOT comparable to the v1 protocol band")
    ap.add_argument("--override", nargs=2, action="append", default=[],
                    metavar=("KEY", "VALUE"),
                    help="extra cfg override pairs, e.g. "
                         "--override TRAIN.BATCH_SIZE 128 "
                         "--override TRAIN.BASE_LR 0.004 (linear-scaling rule)")
    args = ap.parse_args()

    kitti_root, pickle_dir = build_dataset(args.frames, args.cars, args.cache,
                                           args.workers,
                                           difficulty_mix=args.difficulty_mix)

    tag = args.tag or (f"{args.dtype}_{args.epochs}ep"
                       + ("_mix" if args.difficulty_mix else ""))
    out_dir = os.path.join(args.cache, f"run_{tag}")
    overrides = [
        "DATA.DATA_ROOT", pickle_dir,
        "OUTPUT_DIR", out_dir,
        "TRAIN.MAX_EPOCH", str(args.epochs),
        "TPU.COMPUTE_DTYPE", args.dtype,
        "USE_TFBOARD", "True",
    ]
    for k, v in args.override:
        overrides += [k, v]
    cfg_path = os.path.join(_ROOT, "cfgs", "det_sample.yaml")

    t0 = time.time()
    from frustum_convnet_tpu.engine import train as train_cli
    train_cli.main(["--cfg", cfg_path] + overrides)
    train_s = time.time() - t0
    print(f"training done in {train_s:.0f}s", flush=True)

    # fresh config state for the test CLI (cfg is module-global)
    from frustum_convnet_tpu.configs import reset_cfg
    reset_cfg()
    from frustum_convnet_tpu.engine import test as test_cli
    best = os.path.join(out_dir, "checkpoints", "model_best.msgpack")
    results = test_cli.main([
        "--cfg", cfg_path,
        "--gt_dir", os.path.join(kitti_root, "training", "label_2"),
        "--idx_path", os.path.join(kitti_root, "image_sets", "val.txt"),
    ] + overrides + ["TEST.WEIGHTS", best])

    summary = {
        "dtype": args.dtype,
        "epochs": args.epochs,
        "frames": args.frames,
        "difficulty_mix": args.difficulty_mix,
        "overrides": args.override,
        "train_seconds": round(train_s, 1),
        "ap": {k: [round(x, 2) for x in v["detection_3d"]]
               for k, v in (results or {}).items()},
        "ap_bev": {k: [round(x, 2) for x in v["detection_ground"]]
                   for k, v in (results or {}).items()},
    }
    print("PROTOCOL_RESULT " + json.dumps(summary), flush=True)
    with open(os.path.join(out_dir, "protocol_result.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
