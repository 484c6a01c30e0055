"""Child process for the multi-host INFERENCE integration test.

Runs the REAL KITTI test-driver CLI (`engine.test.main`) under an env-gated
``jax.distributed`` bootstrap: each process streams its ``batch_shard`` of
the val split through its local-mesh grouped dispatch, the compacted
detection dicts merge with one all-gather, and only the chief writes the
result dir. Run single-process (no FRUSTUM_* env) it produces the reference
result files the multi-process pair must reproduce.

Usage: python tests/multihost_infer_child.py <pickle_dir> <idx_path> <out_dir>
"""

import sys


def main():
    pickle_dir, idx_path, out_dir = sys.argv[1:4]

    from frustum_convnet_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    from frustum_convnet_tpu.engine import test as test_mod

    # tiny ladder (test_end_to_end.TINY_OVERRIDES) so the CPU mesh compiles
    # in seconds; batch 2 yields 10+ batches for the 2-process shard split
    test_mod.main([
        "--cfg", "cfgs/det_sample.yaml", "--no_eval", "--idx_path", idx_path,
        "DATA.DATA_ROOT", pickle_dir,
        "OUTPUT_DIR", out_dir,
        "DATA.MAX_DEPTH", "48",
        "DATA.NUM_SAMPLES", "128",
        "DATA.STRIDE", "(1.0, 2.0, 4.0, 8.0)",
        "DATA.HEIGHT_HALF", "(1.0, 2.0, 4.0, 8.0)",
        "TEST.BATCH_SIZE", "2",
        "TEST.METHOD", "nms",
        "TPU.INFER_GROUP", "2",
        "FROM_RGB_DET", "False",
    ])


if __name__ == "__main__":
    main()
