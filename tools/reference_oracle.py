"""Run the reference PyTorch Frustum ConvNet on CPU as a numerical oracle.

The reference model (`/root/reference/models/det_base.py:228-525`,
`det_base_sunrgbd.py`) depends on two compiled extensions that cannot build
in this image (CUDA `ops/query_depth_point/query_depth_point_cuda`, boost
`ops/pybind11/box_ops_cc`). This module installs pure-CPU stand-ins with the
pinned semantics, imports the reference packages straight from the read-only
mount, and exposes helpers to run its forward pass — so tests can compose a
*full-model* numerical-parity check: reference forward vs this repo's
forward on the same weights (via the checkpoint interchange tools) and the
same batch.

No reference code is copied into this repo; the oracle imports and runs the
reference itself.
"""

from __future__ import annotations

import copy
import os
import sys
import types

import numpy as np

REF_ROOT = os.environ.get("FRUSTUM_REFERENCE_ROOT", "/root/reference")

_CFG_SNAPSHOT = None


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REF_ROOT, "models", "det_base.py"))


def _cpu_query_depth_point_cls():
    import torch
    from torch import nn

    class QueryDepthPoint(nn.Module):
        """CPU port of the CUDA depth-window query, semantics pinned to
        `ops/query_depth_point/query_depth_point_cuda_kernel.cu:42-64`:
        scan input points in order, select the first ``nsample`` with
        |z - z_center| < dis_z; on the first hit prefill every slot with
        that index; count = min(hits, nsample); all-zero row when no hit
        (the kernel's zero-initialized output buffer).
        """

        def __init__(self, dis_z, nsample):
            super().__init__()
            self.dis_z = float(dis_z)
            self.nsample = int(nsample)

        def forward(self, xyz1, xyz2):
            # xyz1 (b, 3, n) input points; xyz2 (b, 3, m) section centers
            import torch

            ns = self.nsample
            z1, z2 = xyz1[:, 2, :], xyz2[:, 2, :]
            mask = (z2.unsqueeze(2) - z1.unsqueeze(1)).abs() < self.dis_z
            b, m, n = mask.shape
            cum = torch.cumsum(mask.to(torch.int64), dim=2)
            cnt = cum[:, :, -1].clamp(max=ns).to(torch.int32)
            # first hit index; argmax of an all-False row is 0, which matches
            # the kernel's untouched zero-initialized buffer
            first = torch.argmax(mask.to(torch.uint8), dim=2)
            idx = first.unsqueeze(2).expand(b, m, ns + 1).contiguous()
            # slot for each hit = rank among hits; non-hits and overflow hits
            # land in a discarded extra slot
            pos = torch.where(mask, cum - 1, torch.full_like(cum, ns)).clamp(max=ns)
            src = torch.arange(n, dtype=torch.long).expand(b, m, n).contiguous()
            idx.scatter_(2, pos, src)
            return idx[:, :, :ns].contiguous(), cnt

    return QueryDepthPoint


def _box_ops_stub():
    """`ops.pybind11.box_ops_cc` stand-in backed by this repo's numpy IoU
    oracle (only `rbbox_iou_3d_pair` is used on the model path,
    `det_base.py:495`)."""
    from frustum_convnet_tpu.core.iou_np import rotated_iou_3d_np

    mod = types.ModuleType("ops.pybind11.box_ops_cc")

    def rbbox_iou_3d_pair(c1, c2):
        c1 = np.asarray(c1, np.float64)
        c2 = np.asarray(c2, np.float64)
        return np.asarray(
            [rotated_iou_3d_np(a, b) for a, b in zip(c1, c2)], np.float32
        )

    mod.rbbox_iou_3d_pair = rbbox_iou_3d_pair
    return mod


def _install():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "ops.query_depth_point.query_depth_point" not in sys.modules:
        qmod = types.ModuleType("ops.query_depth_point.query_depth_point")
        qmod.QueryDepthPoint = _cpu_query_depth_point_cls()
        sys.modules["ops.query_depth_point.query_depth_point"] = qmod
        sys.modules["ops.pybind11.box_ops_cc"] = _box_ops_stub()


def load_reference_model(cfg_file: str, overrides=(), seed: int = 0):
    """Merge a reference yaml into the reference's global cfg and build its
    ``PointNetDet`` exactly as `train/train_net_det.py:292-304` does.

    ``cfg_file`` is resolved against the reference's ``cfgs/`` dir unless
    absolute. Returns ``(torch_model, ref_cfg)`` with the model in eval mode.
    """
    global _CFG_SNAPSHOT
    _install()
    import importlib

    import torch

    import configs.config as ref_config

    cfg = ref_config.cfg
    if _CFG_SNAPSHOT is None:
        _CFG_SNAPSHOT = copy.deepcopy(cfg)
    else:
        # the reference cfg is a process-global singleton; restore defaults so
        # back-to-back loads of different experiments don't leak keys
        cfg.immutable(False)
        cfg.clear()
        cfg.update(copy.deepcopy(_CFG_SNAPSHOT))

    if not os.path.isabs(cfg_file):
        cfg_file = os.path.join(REF_ROOT, "cfgs", cfg_file)
    # the reference targets PyYAML<6 (`yaml.load` without a Loader,
    # configs/config.py:228); shim the old signature for the merge call only
    import yaml as _yaml

    orig_load = _yaml.load
    _yaml.load = lambda s, *a, **k: orig_load(
        s, *a, **({"Loader": _yaml.SafeLoader} if not a and "Loader" not in k else k))
    try:
        ref_config.merge_cfg_from_file(cfg_file)
    finally:
        _yaml.load = orig_load
    if overrides:
        ref_config.merge_cfg_from_list(list(overrides))

    from datasets.dataset_info import DATASET_INFO as REF_INFO

    info = REF_INFO[cfg.DATA.DATASET_NAME]
    input_channels = 3 if not cfg.DATA.WITH_EXTRA_FEAT else cfg.DATA.EXTRA_FEAT_DIM
    model_name = os.path.splitext(os.path.basename(cfg.MODEL.FILE))[0]
    mod = importlib.import_module(f"models.{model_name}")

    torch.manual_seed(seed)
    model = mod.PointNetDet(
        input_channels, num_vec=len(info.CLASSES), num_classes=cfg.MODEL.NUM_CLASSES
    )
    model.eval()
    return model, cfg


def num_scales_of(model) -> int:
    return 5 if hasattr(model.feat_net, "pointnet5") else 4


def torch_data_dicts(batch: dict, with_labels: bool):
    """Convert a fixture batch (channels-last numpy, `data/fixtures.py`) to
    the reference's channel-first torch ``data_dicts`` layout
    (`det_base.py:334-347`, provider collate shapes)."""
    import torch

    d = {
        "point_cloud": torch.from_numpy(
            np.ascontiguousarray(np.transpose(batch["point_cloud"], (0, 2, 1)))
        ),
        "one_hot": torch.from_numpy(batch["one_hot"].copy()),
    }
    for i, r in enumerate(batch["refs"], start=1):
        d[f"center_ref{i}"] = torch.from_numpy(
            np.ascontiguousarray(np.transpose(r, (0, 2, 1)))
        )
    if with_labels:
        d["cls_label"] = torch.from_numpy(batch["cls_label"])
        d["size_class"] = torch.from_numpy(batch["size_class"][:, None])
        d["box3d_center"] = torch.from_numpy(batch["box3d_center"])
        d["box3d_heading"] = torch.from_numpy(batch["box3d_heading"][:, None])
        d["box3d_size"] = torch.from_numpy(batch["box3d_size"])
    return d


def reference_eval_outputs(model, data_dicts):
    """Inference forward (`det_base.py:380-412`): returns numpy
    (cls_probs, centers, headings, sizes, heading_probs, size_probs)."""
    import torch

    model.eval()
    with torch.no_grad():
        out = model(data_dicts)
    return tuple(np.asarray(t.numpy()) for t in out)


def reference_logits(model, data_dicts, train: bool):
    """Raw head outputs (B, L, C) via the forward glue of
    `det_base.py:334-368`, usable in both BN modes (the reference's training
    branch only returns losses, so the heads are driven directly here)."""
    import torch

    model.train(train)
    with torch.no_grad():
        pc = data_dicts["point_cloud"]
        xyz = pc[:, :3, :].contiguous()
        feat = pc[:, [3], :].contiguous() if pc.shape[1] > 3 else None
        refs = [data_dicts[f"center_ref{i}"] for i in range(1, num_scales_of(model) + 1)]
        feats = model.feat_net(xyz, refs, feat, data_dicts["one_hot"])
        x = model.conv_net(*feats)
        cls = model.cls_out(x).permute(0, 2, 1)
        reg = model.reg_out(x).permute(0, 2, 1)
    model.eval()
    return np.asarray(cls.numpy()), np.asarray(reg.numpy())


def reference_train_losses(model, data_dicts):
    """Training forward (`det_base.py:414-525`): numpy (losses, metrics)."""
    import torch

    model.train()
    with torch.no_grad():
        losses, metrics = model(data_dicts)
    model.eval()
    to_np = lambda d: {k: float(np.asarray(v.detach().numpy())) for k, v in d.items()}
    return to_np(losses), to_np(metrics)


def export_state_dict(model, path: str):
    import torch

    torch.save(model.state_dict(), path)
    return path


def reference_grads(model, data_dicts):
    """Training backward (`train/train_net_det.py:121-128`): run the
    reference train branch, backprop ``total_loss``, and return
    ``(losses, grad_state_dict)``.

    The grad dict carries every parameter's ``.grad`` under its state-dict
    key, plus the BN running buffers verbatim, so it can be routed through
    the exact same layout mapping as weights
    (`tools/import_reference_checkpoint.map_state_dict`) — gradients
    transform identically to the parameters they correspond to.

    NOTE: the train-mode forward updates BN running buffers in place;
    snapshot the state dict for weight interchange *before* calling this.
    """
    import torch

    model.train()
    model.zero_grad()
    losses, _metrics = model(data_dicts)
    losses["total_loss"].mean().backward()
    sd = {}
    for name, p in model.named_parameters():
        g = p.grad
        sd[name] = (np.zeros(tuple(p.shape), np.float32) if g is None
                    else np.asarray(g.detach().numpy()))
    for name, b in model.named_buffers():
        if not name.endswith("num_batches_tracked"):
            sd[name] = np.asarray(b.detach().numpy())
    model.eval()
    to_np = {k: float(np.asarray(v.detach().numpy())) for k, v in losses.items()}
    return to_np, sd


def reference_adam_steps(model, batches, lr, weight_decay=0.0):
    """The reference optimization loop (`train_net_det.py:115-128,322-323`)
    over a fixed batch sequence: Adam(lr, betas=(0.9, 0.999), coupled L2
    weight decay) on ``total_loss``. Returns the per-step loss values; the
    model is left holding the stepped weights (read them back with
    ``model.state_dict()``)."""
    import torch

    opt = torch.optim.Adam(model.parameters(), lr=lr, betas=(0.9, 0.999),
                           weight_decay=weight_decay)
    model.train()
    seq = []
    for dd in batches:
        opt.zero_grad()
        losses, _ = model(dd)
        loss = losses["total_loss"].mean()
        loss.backward()
        opt.step()
        seq.append(float(loss.detach()))
    model.eval()
    return seq
