"""Import a reference PyTorch checkpoint (.pth) into this framework.

The reference ships pretrained `.pth` files (`train/train_net_det.py:384-398`
saves `{'state_dict': ...}` dicts; bare state dicts are also accepted, and
`module.`-prefixed keys from DataParallel are unwrapped, mirroring
`train/test_net_det.py:389-399`). This tool maps every tensor to the
equivalent leaf of this repo's Flax `FrustumConvNet` and writes a msgpack
checkpoint loadable by `engine/test.py TEST.WEIGHTS ...` — so a user of the
reference can carry trained weights straight over.

Layout mapping (torch -> flax):

* PointNet 1x1 Conv2d `feat_net.pointnetN.convJ.0.weight` (O, I, 1, 1)
  -> `pointnetN/DenseBNReLU_{J-1}/Dense_0/kernel` (I, O)
* trunk Conv1d `conv_net.<block>.0.weight` (O, I, K) -> `Conv_0/kernel`
  (K, I, O)
* trunk ConvTranspose1d `conv_net.<block>_deconv.0.weight` (I, O, K) ->
  `ConvTranspose_0/kernel` (K, I, O) (stride == kernel, no padding, so the
  fractionally-strided forms coincide position-for-position)
* BatchNorm `.1.weight/.1.bias` -> `BatchNorm_0/scale|bias`;
  `.1.running_mean/var` -> batch_stats `mean|var`
* heads `cls_out|reg_out.weight` (O, 768, 1) -> `kernel` (768, O), bias as-is

Usage:
  python tools/import_reference_checkpoint.py ref.pth out.msgpack \
      [--cfg cfgs/det_sample.yaml] [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):  # DataParallel wrap
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue  # no equivalent; flax BN uses a momentum EMA
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def map_state_dict(sd: Dict[str, np.ndarray], num_scales: int):
    """Torch state dict -> (params, batch_stats) nested dicts."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, dotted, arr):
        node = tree
        parts = dotted.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def take(key):
        if key not in sd:
            raise KeyError(f"reference checkpoint missing tensor: {key}")
        return sd.pop(key)

    def import_bn(src_prefix, dst_prefix):
        put(params, f"{dst_prefix}/BatchNorm_0/scale", take(f"{src_prefix}.1.weight"))
        put(params, f"{dst_prefix}/BatchNorm_0/bias", take(f"{src_prefix}.1.bias"))
        put(stats, f"{dst_prefix}/BatchNorm_0/mean", take(f"{src_prefix}.1.running_mean"))
        put(stats, f"{dst_prefix}/BatchNorm_0/var", take(f"{src_prefix}.1.running_var"))

    # PointNet scales: 1x1 Conv2d triplets -> DenseBNReLU kernels
    for n in range(1, num_scales + 1):
        for j in (1, 2, 3):
            src = f"feat_net.pointnet{n}.conv{j}"
            dst = f"pointnet{n}/DenseBNReLU_{j - 1}"
            w = take(f"{src}.0.weight")  # (O, I, 1, 1)
            put(params, f"{dst}/Dense_0/kernel", w[:, :, 0, 0].T.copy())
            import_bn(src, dst)

    # trunk conv blocks (whatever blocks exist in the source)
    trunk = sorted({k.split(".")[1] for k in sd if k.startswith("conv_net.")})
    for block in trunk:
        src = f"conv_net.{block}"
        w = take(f"{src}.0.weight")
        if block.endswith("_deconv"):
            # ConvTranspose1d (I, O, K) -> (K, I, O), spatially flipped:
            # flax's ConvTranspose applies the kernel mirrored relative to
            # torch's conv_transpose1d (verified in test_import_reference)
            put(params, f"{block}/ConvTranspose_0/kernel",
                np.transpose(w, (2, 0, 1))[::-1].copy())
        else:
            # Conv1d (O, I, K) -> (K, I, O)
            put(params, f"{block}/Conv_0/kernel",
                np.transpose(w, (2, 1, 0)).copy())
        import_bn(src, block)

    # heads: Conv1d k=1 with bias -> Dense
    for head in ("cls_out", "reg_out"):
        w = take(f"{head}.weight")  # (O, C, 1)
        put(params, f"{head}/kernel", w[:, :, 0].T.copy())
        put(params, f"{head}/bias", take(f"{head}.bias"))

    if sd:
        raise ValueError(f"unmapped reference tensors: {sorted(sd)[:8]}...")
    return params, stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="reference .pth checkpoint")
    ap.add_argument("dst", help="output .msgpack checkpoint")
    ap.add_argument("--cfg", default=os.path.join(_ROOT, "cfgs", "det_sample.yaml"))
    ap.add_argument("opts", nargs="*", default=[],
                    help="KEY VALUE config override pairs")
    args = ap.parse_args(argv)

    from frustum_convnet_tpu.configs import (get_default_cfg,
                                             merge_cfg_from_file,
                                             merge_cfg_from_list)
    from frustum_convnet_tpu.models.registry import get_model_spec

    cfg = get_default_cfg()
    merge_cfg_from_file(args.cfg, cfg)
    if args.opts:
        merge_cfg_from_list(args.opts, cfg)
    spec = get_model_spec(cfg)

    sd = load_torch_state_dict(args.src)
    params, stats = map_state_dict(sd, spec.num_scales)

    # validate against a freshly initialized model: same tree, same shapes
    import jax
    import jax.numpy as jnp
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.models.net import FrustumConvNet

    model = FrustumConvNet(spec)
    b = make_batch(spec, batch=2, seed=0, with_labels=False)
    ref_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(b["point_cloud"]),
                          jnp.asarray(b["one_hot"]),
                          [jnp.asarray(r) for r in b["refs"]], train=False)

    def check(imported, template, path=""):
        assert set(imported) == set(template), (
            path, sorted(set(template) ^ set(imported)))
        for k in template:
            if isinstance(template[k], dict):
                check(imported[k], template[k], f"{path}/{k}")
            else:
                assert imported[k].shape == template[k].shape, (
                    f"{path}/{k}", imported[k].shape, template[k].shape)

    check(params, ref_vars["params"])
    check(stats, ref_vars["batch_stats"])

    from frustum_convnet_tpu.engine.checkpoints import save_checkpoint
    from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                         TrainState,
                                                         init_state,
                                                         make_optimizer)

    tx = make_optimizer(TrainStepConfig())
    state = init_state(model, tx, {
        "point_cloud": jnp.asarray(b["point_cloud"]),
        "one_hot": jnp.asarray(b["one_hot"]),
        "refs": tuple(jnp.asarray(r) for r in b["refs"]),
    }, seed=0)
    state = TrainState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
        opt_state=state.opt_state, step=state.step)
    save_checkpoint(args.dst, state, epoch=0)
    print(f"imported {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
