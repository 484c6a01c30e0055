"""Per-stage TPU timing of the flagship KITTI inference path.

Times each pipeline stage in isolation with the same on-device
``lax.scan``-chained loop methodology as ``bench.py`` (per-dispatch relay
latency is large, so the loop must live on device). Used to attribute the
ms/batch budget; results are summarized in ``BENCH_NOTES.md``.

Usage: python tools/profile_stages.py [--trace /tmp/trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

BATCH = 32  # overridden by --batch
ITERS = 30
TRIALS = 3


def timeit(name, fn, *args):
    @jax.jit
    def loop(a0, rest):
        def body(carry, _):
            out = fn(a0 + carry * 1e-20, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return s, ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    jax.block_until_ready(loop(args[0], args[1:]))
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(loop(args[0], args[1:]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:42s} {best * 1e3:8.3f} ms/batch   {BATCH / best:10.1f} frustums/s")
    return best


def main():
    global BATCH
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "float16"])
    ap.add_argument("--cfg", default=None,
                    help="experiment yaml whose shapes to profile "
                         "(default: flagship det_sample geometry)")
    args_cli = ap.parse_args()
    BATCH = args_cli.batch

    from frustum_convnet_tpu.configs import (get_default_cfg,
                                             merge_cfg_from_file,
                                             merge_cfg_from_list)
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.models.det import decode_outputs
    from frustum_convnet_tpu.models.net import FrustumConvNet, PointNetScale
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.ops.select_pallas import (group_depth_point_multi,
                                                       query_depth_point_pallas)

    cfg = get_default_cfg()
    if args_cli.cfg:
        merge_cfg_from_file(args_cli.cfg, cfg)
        merge_cfg_from_list(["DATA.WITH_EXTRA_FEAT", "False"], cfg)
    else:
        merge_cfg_from_list(
            ["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT", "False"], cfg)
    spec = get_model_spec(cfg)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "float16": jnp.float16}[args_cli.dtype]
    model = FrustumConvNet(spec, dtype=dtype)

    batch = make_batch(spec, batch=BATCH, seed=0, with_labels=False)
    pts = jnp.asarray(batch["point_cloud"])
    one_hot = jnp.asarray(batch["one_hot"])
    refs = tuple(jnp.asarray(r) for r in batch["refs"])

    variables = jax.jit(
        lambda p, o, r: model.init(jax.random.PRNGKey(3), p, o, list(r), train=False)
    )(pts, one_hot, refs)
    jax.block_until_ready(variables)

    # ---- full forward + decode (the bench number)
    def full(p):
        cls_logits, reg = model.apply(variables, p, one_hot, list(refs), train=False)
        return decode_outputs(spec, cls_logits, reg, refs[1])

    total = timeit("full forward+decode", full, pts)

    # ---- forward only
    def fwd(p):
        return model.apply(variables, p, one_hot, list(refs), train=False)

    timeit("forward only", fwd, pts)

    # ---- the production grouping: ONE multi-scale fused launch
    hh, ks = list(spec.height_half), list(spec.nsamples)

    def g_multi(p):
        return group_depth_point_multi(p[..., :3], list(refs), hh, ks)

    timeit("multi-scale fused grouping (1 launch)", g_multi, pts)

    # ---- per-scale variants, for attribution (retired from the model path)
    for i in range(spec.num_scales):
        d, k = spec.height_half[i], spec.nsamples[i]

        def qpallas(p, i=i, d=d, k=k):
            return query_depth_point_pallas(p[..., 2], refs[i][..., 2], d, k)

        timeit(f"query pallas scale{i + 1} (M={spec.num_refs[i]},K={k})", qpallas, pts)

    # ---- pointnet MLP stage on precomputed groups (per-scale MLP + pool)
    groups = jax.block_until_ready(jax.jit(g_multi)(pts))

    def mlp_stage(g0):
        outs = []
        for i in range(spec.num_scales):
            sub = PointNetScale(mlp=spec.mlps[i], dist=spec.height_half[i],
                                nsample=spec.nsamples[i], use_feature=False,
                                dtype=dtype, name=f"pointnet{i + 1}")
            sub_vars = {"params": variables["params"][f"pointnet{i + 1}"],
                        "batch_stats": variables["batch_stats"][f"pointnet{i + 1}"]}
            grouped = (g0, groups[0][1]) if i == 0 else groups[i]
            outs.append(sub.apply(sub_vars, pts, refs[i], False,
                                  grouped=grouped))
        return outs

    timeit("pointnet MLP stage (grouping precomputed)", mlp_stage, groups[0][0])

    def decode_only(cls_logits, reg):
        return decode_outputs(spec, cls_logits, reg, refs[1])

    cls_logits, reg = jax.jit(fwd)(pts)
    jax.block_until_ready((cls_logits, reg))
    timeit("decode only", decode_only, cls_logits, reg)

    if args_cli.trace:
        with jax.profiler.trace(args_cli.trace):
            jax.block_until_ready(jax.jit(full)(pts))
        print("trace written to", args_cli.trace)

    print(f"\nbench-equivalent total: {total * 1e3:.2f} ms/batch = "
          f"{BATCH / total:.0f} frustums/s")


if __name__ == "__main__":
    main()
