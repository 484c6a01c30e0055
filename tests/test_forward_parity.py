"""Full-model numerical parity against the reference PyTorch network.

Composes the pieces that were previously verified only op-by-op: load the
*actual reference model* (`/root/reference/models/det_base.py`,
`det_base_sunrgbd.py`) on CPU with its compiled ops replaced by pinned-
semantics stand-ins (`tools/reference_oracle.py`), move its weights over
through the checkpoint-interchange mapping
(`tools/import_reference_checkpoint.py`), and assert this repo's forward
produces the same logits, decoded boxes, and training losses on the same
batch — for all five shipped experiment configs, in both BatchNorm modes.

This is the strongest real-data-parity proxy available in an image without
KITTI/SUN-RGBD data: if the forwards agree numerically, AP equality reduces
to data-pipeline parity, which is tested separately.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from tools import reference_oracle as oracle  # noqa: E402

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="/root/reference not mounted"
)

# the 5-scale SUN-RGBD variant costs ~35 s/test to trace+compile; its
# parity coverage runs in the full (CI) tier, the quick tier keeps the
# 4-scale KITTI configs
_SUNRGBD_SLOW = pytest.param("det_sample_sunrgbd.yaml",
                             marks=pytest.mark.slow)
CONFIGS = [
    "det_sample.yaml",
    "det_sample_people.yaml",
    "refine_car.yaml",
    "refine_people.yaml",
    _SUNRGBD_SLOW,
]

# f32 forward through ~13 conv/BN layers: torch and XLA accumulate in
# different orders; measured max-abs logit divergence is ~1e-5, asserted
# with an order of magnitude of headroom.
TOL = dict(rtol=1e-4, atol=2e-4)


def _our_setup(cfg_name):
    from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_file
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import get_model_spec

    cfg = get_default_cfg()
    merge_cfg_from_file(os.path.join(_ROOT, "cfgs", cfg_name), cfg)
    spec = get_model_spec(cfg)
    return cfg, spec, FrustumConvNet(spec)


def _interchanged_vars(ref_model, spec, tmp_path):
    """reference state_dict -> our flax variables via the importer mapping."""
    import jax
    import jax.numpy as jnp

    from tools.import_reference_checkpoint import (load_torch_state_dict,
                                                   map_state_dict)

    pth = str(tmp_path / "ref_init.pth")
    oracle.export_state_dict(ref_model, pth)
    params, stats = map_state_dict(load_torch_state_dict(pth), spec.num_scales)
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return {"params": as_jnp(params), "batch_stats": as_jnp(stats)}


def _batch_inputs(batch):
    import jax.numpy as jnp

    return (
        jnp.asarray(batch["point_cloud"]),
        jnp.asarray(batch["one_hot"]),
        [jnp.asarray(r) for r in batch["refs"]],
    )


@pytest.mark.parametrize("cfg_name", CONFIGS)
def test_eval_forward_parity(cfg_name, tmp_path):
    """Eval-mode logits and the full decoded-box tuple match the reference
    inference branch (`det_base.py:380-412`) on interchanged weights."""
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.models.det import decode_outputs

    ref_model, _ = oracle.load_reference_model(cfg_name, seed=7)
    _, spec, model = _our_setup(cfg_name)
    variables = _interchanged_vars(ref_model, spec, tmp_path)

    batch = make_batch(spec, batch=3, seed=11, with_labels=False)
    dd = oracle.torch_data_dicts(batch, with_labels=False)

    # raw head outputs
    ref_cls, ref_reg = oracle.reference_logits(ref_model, dd, train=False)
    pts, one_hot, refs = _batch_inputs(batch)
    cls_logits, reg = model.apply(variables, pts, one_hot, refs, train=False)
    np.testing.assert_allclose(np.asarray(cls_logits), ref_cls, **TOL)
    np.testing.assert_allclose(np.asarray(reg), ref_reg, **TOL)

    # decoded boxes through both decode paths
    names = ("cls_probs", "centers", "headings", "sizes",
             "heading_probs", "size_probs")
    ref_out = dict(zip(names, oracle.reference_eval_outputs(ref_model, dd)))
    dec = decode_outputs(spec, cls_logits, reg, refs[1])
    for k in names:
        np.testing.assert_allclose(
            np.asarray(dec[k]), ref_out[k], err_msg=f"{cfg_name}:{k}", **TOL)


@pytest.mark.parametrize("cfg_name", ["det_sample.yaml", _SUNRGBD_SLOW])
def test_train_bn_logits_parity(cfg_name, tmp_path):
    """Train-mode BatchNorm (batch statistics, not running averages) produces
    the same logits — checks the BN axes/momentum conventions match torch."""
    from frustum_convnet_tpu.data.fixtures import make_batch

    ref_model, _ = oracle.load_reference_model(cfg_name, seed=5)
    _, spec, model = _our_setup(cfg_name)
    variables = _interchanged_vars(ref_model, spec, tmp_path)

    batch = make_batch(spec, batch=4, seed=2, with_labels=False)
    dd = oracle.torch_data_dicts(batch, with_labels=False)

    ref_cls, ref_reg = oracle.reference_logits(ref_model, dd, train=True)
    pts, one_hot, refs = _batch_inputs(batch)
    (cls_logits, reg), _ = model.apply(
        variables, pts, one_hot, refs, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(cls_logits), ref_cls, **TOL)
    np.testing.assert_allclose(np.asarray(reg), ref_reg, **TOL)


@pytest.mark.parametrize("cfg_name", ["det_sample.yaml", _SUNRGBD_SLOW])
def test_training_losses_parity(cfg_name, tmp_path):
    """The dense-masked loss reformulation (`models/det.py:59-160`) equals
    the reference's dynamic fg-gather branch (`det_base.py:414-503`) — every
    loss term and monitoring metric, on the same weights and labels."""
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.models.det import compute_losses

    ref_model, ref_cfg = oracle.load_reference_model(cfg_name, seed=9)
    cfg, spec, model = _our_setup(cfg_name)
    variables = _interchanged_vars(ref_model, spec, tmp_path)

    batch = make_batch(spec, batch=4, seed=6, with_labels=True)
    assert (batch["cls_label"] == 1).any(), "fixture must contain fg sections"
    dd = oracle.torch_data_dicts(batch, with_labels=True)
    ref_losses, ref_metrics = oracle.reference_train_losses(ref_model, dd)

    import jax.numpy as jnp

    pts, one_hot, refs = _batch_inputs(batch)
    (cls_logits, reg), _ = model.apply(
        variables, pts, one_hot, refs, train=True, mutable=["batch_stats"])
    labels = {
        "cls_label": jnp.asarray(batch["cls_label"]),
        "box3d_center": jnp.asarray(batch["box3d_center"]),
        "box3d_heading": jnp.asarray(batch["box3d_heading"]),
        "box3d_size": jnp.asarray(batch["box3d_size"]),
        "size_class": jnp.asarray(batch["size_class"]),
    }
    weights = {
        "box": float(cfg.LOSS.BOX_LOSS_WEIGHT),
        "corner": float(cfg.LOSS.CORNER_LOSS_WEIGHT),
        "head_res": float(cfg.LOSS.HEAD_REG_WEIGHT),
        "size_res": float(cfg.LOSS.SIZE_REG_WEIGHT),
    }
    losses, metrics = compute_losses(
        spec, cls_logits, reg, refs[1], labels, weights,
        iou_thresh=float(cfg.IOU_THRESH))

    for k, ref_v in ref_losses.items():
        ours_v = float(np.asarray(losses[k]))
        np.testing.assert_allclose(ours_v, ref_v, rtol=2e-4, atol=2e-4,
                                   err_msg=f"loss {k}")
    # metrics involve argmax decisions and polygon clipping; compare at a
    # slightly looser tolerance
    key_map = {f"IoU_{ref_cfg.IOU_THRESH}": f"IoU_{float(cfg.IOU_THRESH)}"}
    for k, ref_v in ref_metrics.items():
        ours_v = float(np.asarray(metrics[key_map.get(k, k)]))
        np.testing.assert_allclose(ours_v, ref_v, rtol=1e-3, atol=1e-3,
                                   err_msg=f"metric {k}")
