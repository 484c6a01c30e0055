"""Export one of this framework's checkpoints to a reference-format .pth.

Inverse of `tools/import_reference_checkpoint.py`: maps every Flax
param/batch-stat leaf back to the reference PyTorch state-dict layout
(`/root/reference/models/det_base.py` naming, `train/train_net_det.py:384-390`
wrapped format), so a model trained here can be evaluated or fine-tuned with
the reference code — checkpoints are interchangeable in both directions.

Usage:
  python tools/export_reference_checkpoint.py in.msgpack out.pth \
      [--cfg cfgs/det_sample.yaml] [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def map_to_torch(params, batch_stats, num_scales: int):
    """(params, batch_stats) pytrees -> reference torch state dict (numpy)."""
    import torch

    p = flatten(params)
    s = flatten(batch_stats)
    sd = {}

    def bn(src_prefix, dst_prefix):
        sd[f"{dst_prefix}.1.weight"] = p.pop(f"{src_prefix}/BatchNorm_0/scale")
        sd[f"{dst_prefix}.1.bias"] = p.pop(f"{src_prefix}/BatchNorm_0/bias")
        sd[f"{dst_prefix}.1.running_mean"] = s.pop(f"{src_prefix}/BatchNorm_0/mean")
        sd[f"{dst_prefix}.1.running_var"] = s.pop(f"{src_prefix}/BatchNorm_0/var")
        sd[f"{dst_prefix}.1.num_batches_tracked"] = np.asarray(0)

    for n in range(1, num_scales + 1):
        for j in (1, 2, 3):
            src = f"pointnet{n}/DenseBNReLU_{j - 1}"
            dst = f"feat_net.pointnet{n}.conv{j}"
            w = p.pop(f"{src}/Dense_0/kernel")  # (I, O)
            sd[f"{dst}.0.weight"] = w.T[:, :, None, None].copy()
            bn(src, dst)

    blocks = sorted({k.split("/")[0] for k in p if k.startswith("block")})
    for block in blocks:
        dst = f"conv_net.{block}"
        if block.endswith("_deconv"):
            w = p.pop(f"{block}/ConvTranspose_0/kernel")  # (K, I, O) flipped
            sd[f"{dst}.0.weight"] = np.transpose(w[::-1], (1, 2, 0)).copy()
        else:
            w = p.pop(f"{block}/Conv_0/kernel")  # (K, I, O)
            sd[f"{dst}.0.weight"] = np.transpose(w, (2, 1, 0)).copy()
        bn(block, dst)

    for head in ("cls_out", "reg_out"):
        w = p.pop(f"{head}/kernel")  # (C, O)
        sd[f"{head}.weight"] = w.T[:, :, None].copy()
        sd[f"{head}.bias"] = p.pop(f"{head}/bias")

    if p or s:
        raise ValueError(f"unexported leaves: {sorted(p)[:4]} {sorted(s)[:4]}")
    return {k: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
            if v.ndim else torch.tensor(int(v)) for k, v in sd.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="input .msgpack checkpoint")
    ap.add_argument("dst", help="output reference-format .pth")
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

    import jax.numpy as jnp
    import torch

    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.engine.checkpoints import load_checkpoint
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                         init_state,
                                                         make_optimizer)

    model = FrustumConvNet(spec)
    b = make_batch(spec, batch=2, seed=0, with_labels=False)
    state = init_state(model, make_optimizer(TrainStepConfig()), {
        "point_cloud": jnp.asarray(b["point_cloud"]),
        "one_hot": jnp.asarray(b["one_hot"]),
        "refs": tuple(jnp.asarray(r) for r in b["refs"]),
    }, seed=0)
    payload = load_checkpoint(args.src, state)
    sd = map_to_torch(payload["params"], payload["batch_stats"],
                      spec.num_scales)
    torch.save({"state_dict": sd, "epoch": int(payload.get("epoch", 0))},
               args.dst)
    print(f"exported {args.src} -> {args.dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
