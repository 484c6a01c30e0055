"""End-to-end test-driver throughput on synthetic KITTI at reference shapes.

Measures what bench.py cannot: the full streaming driver
(`engine/test.run_test`) including host batching, h2d upload, grouped device
dispatch, d2h fetch of compacted selections, and vectorized numpy decode —
the rebuild of the reference hot path `train/test_net_det.py:204-293`.

Generates (and caches) a synthetic KITTI val split, preps frustum pickles at
the flagship config's shapes (1024 points, MAX_DEPTH 70, strides
.25/.5/1/2), random-inits the model, and streams the whole set. Reports
cumulative and steady-state (post-compile) frustums/s for each
(group, inflight) combination.

Usage: python tools/bench_driver.py [--frames 2000] [--cars 2]
       [--sweep "8:2,8:4,16:2"] [--method top|nms]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def build_dataset(frames: int, cars: int, cache_root: str):
    from frustum_convnet_tpu.data.kitti.prepare import extract_frustum_data
    from frustum_convnet_tpu.data.kitti.synthetic import make_synthetic_kitti

    key = hashlib.md5(f"v1-{frames}-{cars}".encode()).hexdigest()[:10]
    root = os.path.join(cache_root, f"bench_driver_{key}")
    pickle_path = os.path.join(root, "pickles", "frustum_caronly_val.pickle")
    if not os.path.exists(pickle_path):
        kitti_root = os.path.join(root, "kitti_raw")
        t0 = time.time()
        make_synthetic_kitti(kitti_root, num_frames=frames,
                             cars_per_frame=cars, seed=1)
        os.makedirs(os.path.dirname(pickle_path), exist_ok=True)
        extract_frustum_data(
            os.path.join(kitti_root, "image_sets", "val.txt"), "training",
            pickle_path, kitti_root, perturb_box2d=False, augmentX=1,
            type_whitelist=("Car",))
        print(f"prepared synthetic val in {time.time() - t0:.1f}s -> {root}")
    return os.path.join(root, "pickles")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--cars", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--method", default="top", choices=("top", "nms"))
    ap.add_argument("--sweep", default="8:2",
                    help="comma-separated group:inflight pairs")
    ap.add_argument("--dtypes", default="float16",
                    help="comma-separated point upload dtypes to sweep "
                         "(relay bandwidth varies day-to-day, so the "
                         "f32-vs-f16 ratio is only meaningful same-process)")
    ap.add_argument("--cache", default="/tmp/fcn_tpu_bench")
    args = ap.parse_args()

    from frustum_convnet_tpu.configs import (assert_and_infer_cfg, cfg,
                                             merge_cfg_from_file,
                                             merge_cfg_from_list)
    from frustum_convnet_tpu.data.registry import get_provider_class
    from frustum_convnet_tpu.engine.test import load_state_for_test, run_test
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import (get_compute_dtype,
                                                     get_model_spec)
    import logging

    # resolve the config before the (expensive) dataset build, and anchor
    # the cfg path at the repo root so the script runs from any cwd
    merge_cfg_from_file(os.path.join(_ROOT, "cfgs", "det_sample.yaml"))
    pickle_dir = build_dataset(args.frames, args.cars, args.cache)
    merge_cfg_from_list(["DATA.DATA_ROOT", pickle_dir,
                         "TEST.BATCH_SIZE", str(args.batch),
                         "TEST.METHOD", args.method])
    assert_and_infer_cfg()

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    logger = logging.getLogger("bench_driver")

    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec, dtype=get_compute_dtype(cfg, train=False))
    provider_cls = get_provider_class(cfg)
    dataset = provider_cls(cfg, "val", one_hot=True)
    logger.info(f"val frustums: {len(dataset)}")

    state = load_state_for_test(model, spec, cfg, dataset, logger)

    for dtype in args.dtypes.split(","):
        for pair in args.sweep.split(","):
            g, infl = (int(x) for x in pair.split(":"))
            logger.info(f"--- points_dtype={dtype} group={g} inflight={infl} ---")
            t0 = time.time()
            run_test(model, spec, state, dataset, args.batch, args.method,
                     logger, group=g, inflight=infl, points_dtype=dtype)
            logger.info(f"total wall {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
