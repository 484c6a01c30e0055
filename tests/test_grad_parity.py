"""Gradient-level and short-horizon training-trajectory parity against the
reference PyTorch network.

`test_forward_parity.py` pins forward logits, decoded boxes, and loss
*values* against the actual torch model; this module closes the remaining
parity tier: the dense-masked loss reformulation (`models/det.py:59-160`)
must also match the reference's dynamic fg-gather branch
(`/root/reference/models/det_base.py:414-476`) in **gradient**, and the
full optax chain (`parallel/train_step.py:89-104`) must reproduce the
reference's `loss.backward(); Adam.step()` loop
(`/root/reference/train/train_net_det.py:115-128,322-323`) over a
multi-step trajectory.

Mechanics: reference weights move over through the checkpoint-interchange
layout map; reference parameter *gradients* transform identically to the
parameters they belong to, so the same `map_state_dict` routes
`p.grad` tensors into this repo's param-tree layout for per-leaf
comparison against `jax.grad`.

Edge cases covered (the places a masked-vs-gathered formulation can agree
in value and diverge in gradient): an all-ignore batch item, an all-
background batch item (both leave the fg normalizer to the other items),
and the corner-loss flip `min` at ties (torch and jax both split the
cotangent 50/50 at exact ties — asserted directly).
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

# reduced section ladders for the quick tier (same math, smaller graphs);
# the slow tier re-runs det_sample at full flagship geometry
SMALL_OVERRIDES = {
    "det_sample.yaml": ["DATA.NUM_SAMPLES", "128", "DATA.MAX_DEPTH", "8"],
    "det_sample_people.yaml": ["DATA.NUM_SAMPLES", "128", "DATA.MAX_DEPTH", "8"],
    "refine_car.yaml": ["DATA.NUM_SAMPLES", "128", "DATA.REFINE_MAX_SPAN", "6.4"],
}


def _our_setup(cfg_name, overrides, dtype=None):
    from frustum_convnet_tpu.configs import (get_default_cfg,
                                             merge_cfg_from_file,
                                             merge_cfg_from_list)
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import get_model_spec

    cfg = get_default_cfg()
    merge_cfg_from_file(os.path.join(_ROOT, "cfgs", cfg_name), cfg)
    if overrides:
        merge_cfg_from_list(list(overrides), cfg)
    spec = get_model_spec(cfg)
    kw = {"dtype": dtype} if dtype is not None else {}
    return cfg, spec, FrustumConvNet(spec, **kw)


def _interchanged_vars(ref_model, spec, tmp_path):
    import jax
    import jax.numpy as jnp

    from tools.import_reference_checkpoint import (load_torch_state_dict,
                                                   map_state_dict)

    pth = str(tmp_path / "ref_init.pth")
    oracle.export_state_dict(ref_model, pth)
    params, stats = map_state_dict(load_torch_state_dict(pth), spec.num_scales)
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return {"params": as_jnp(params), "batch_stats": as_jnp(stats)}


def _edge_case_batch(spec, batch=4, seed=6):
    """Fixture batch with fg-normalizer edge cases: item 0 all-ignore,
    item 1 all-background; items 2+ keep their fg sections (the reference
    train branch asserts batch-level fg exists, `det_base.py:414-416`)."""
    from frustum_convnet_tpu.data.fixtures import make_batch

    b = make_batch(spec, batch=batch, seed=seed, with_labels=True)
    b["cls_label"] = b["cls_label"].copy()
    b["cls_label"][0, :] = -1
    b["cls_label"][1, :] = 0
    assert (b["cls_label"][2:] == 1).any(), "fixture lost every fg section"
    return b


def _labels_and_weights(cfg, batch):
    import jax.numpy as jnp

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
    return labels, weights


def _jax_grads(model, spec, cfg, variables, batch, f64=False):
    import jax
    import jax.numpy as jnp

    from frustum_convnet_tpu.models.det import compute_losses

    fdt = jnp.float64 if f64 else jnp.float32
    cast = lambda a: jnp.asarray(
        a, fdt if np.issubdtype(np.asarray(a).dtype, np.floating) else None)
    pts = cast(batch["point_cloud"])
    one_hot = cast(batch["one_hot"])
    refs = [cast(r) for r in batch["refs"]]
    labels, weights = _labels_and_weights(cfg, batch)
    labels = {k: cast(v) for k, v in labels.items()}
    params = jax.tree_util.tree_map(cast, variables["params"])
    stats = jax.tree_util.tree_map(cast, variables["batch_stats"])

    def loss_fn(params):
        (cls_logits, reg), _ = model.apply(
            {"params": params, "batch_stats": stats},
            pts, one_hot, refs, train=True, mutable=["batch_stats"])
        losses, _ = compute_losses(spec, cls_logits, reg, refs[1], labels,
                                   weights, compute_metrics=False)
        return losses["total_loss"], losses

    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    grads, losses = grad_fn(params)
    return jax.device_get(grads), {k: float(v) for k, v in losses.items()}


def _run_grad_check(cfg_name, overrides, batch, tmp_path, label,
                    rtol=1e-5, atol_frac=1e-7):
    """f64 on both sides: semantic gradient divergence (wrong normalizer,
    mask edge, flip selection) shows at ~1e-3+; accumulation-order round-off
    sits at ~1e-12, so the 1e-6 tolerance separates them cleanly. (In f32
    the BN-backward's centered-sum cancellation amplifies round-off into
    the ~0.3% range, which would mask real semantic drift.)"""
    import jax
    import jax.numpy as jnp

    from tools.import_reference_checkpoint import map_state_dict

    ref_model, _ = oracle.load_reference_model(cfg_name, seed=13)
    with jax.enable_x64():
        cfg, spec, model = _our_setup(cfg_name, overrides, dtype=jnp.float64)
        variables = _interchanged_vars(ref_model, spec, tmp_path)

        dd = oracle.torch_data_dicts(batch, with_labels=True)
        dd = {k: (v.double() if v.is_floating_point() else v)
              for k, v in dd.items()}
        ref_model.double()
        ref_losses, ref_grad_sd = oracle.reference_grads(ref_model, dd)
        ref_grads, _ = map_state_dict(ref_grad_sd, spec.num_scales)

        our_grads, our_losses = _jax_grads(model, spec, cfg, variables,
                                           batch, f64=True)

        # the reference is not itself fully f64: `box_transform.py:62,35`
        # round the heading bin id through `.float()` (f32) even in a double
        # model, perturbing the heading-residual target and the decoded
        # corner heading by ~1e-8. Our codecs carry full precision. The
        # tolerances sit ~100x above that floor and ~100x below any
        # semantic divergence (wrong normalizer / mask edge / flip choice),
        # which manifests at >=1e-3.
        assert np.isclose(our_losses["total_loss"], ref_losses["total_loss"],
                          rtol=1e-6, atol=1e-8), (
            our_losses["total_loss"], ref_losses["total_loss"])
        for k in ("cls_loss", "center_loss", "size_cls_loss", "head_cls_loss"):
            # terms untouched by the reference's f32 angle quirk: tight
            assert np.isclose(our_losses[k], ref_losses[k],
                              rtol=1e-10, atol=1e-12), (k, our_losses[k],
                                                        ref_losses[k])
        _assert_tree_close(our_grads, ref_grads, rtol=rtol,
                           atol_frac=atol_frac, label=label)


def _assert_tree_close(ours, ref, rtol, atol_frac, label):
    """Per-leaf closeness with a per-leaf absolute floor scaled to the
    reference leaf's own magnitude (gradient scales span ~6 orders of
    magnitude across layers; one global atol would be meaningless)."""
    import jax
    from flax.core import unfreeze

    o_leaves = jax.tree_util.tree_flatten_with_path(unfreeze(ours))[0]
    r_flat = dict(jax.tree_util.tree_flatten_with_path(unfreeze(ref))[0])
    assert len(o_leaves) == len(r_flat)
    for path, o in o_leaves:
        r = np.asarray(r_flat[path])
        o = np.asarray(o)
        name = jax.tree_util.keystr(path)
        atol = atol_frac * max(np.abs(r).max(), 1e-8)
        np.testing.assert_allclose(o, r, rtol=rtol, atol=atol,
                                   err_msg=f"{label}:{name}")


@pytest.mark.parametrize("cfg_name", ["det_sample.yaml", "refine_car.yaml"])
def test_grad_parity(cfg_name, tmp_path):
    """jax.grad of the dense masked total loss == torch autograd of the
    reference's gathered formulation, per parameter leaf, on a batch with
    ignore/background edge items."""
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.configs import (get_default_cfg,
                                             merge_cfg_from_file,
                                             merge_cfg_from_list)

    cfg = get_default_cfg()
    merge_cfg_from_file(os.path.join(_ROOT, "cfgs", cfg_name), cfg)
    merge_cfg_from_list(list(SMALL_OVERRIDES[cfg_name]), cfg)
    batch = _edge_case_batch(get_model_spec(cfg), batch=4, seed=6)
    _run_grad_check(cfg_name, SMALL_OVERRIDES[cfg_name], batch, tmp_path,
                    cfg_name)


@pytest.mark.slow
def test_grad_parity_full_shapes(tmp_path):
    """Same gradient assertion at the flagship's full reference geometry
    (1024 points, 280-section ladder)."""
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.configs import (get_default_cfg,
                                             merge_cfg_from_file)

    cfg = get_default_cfg()
    merge_cfg_from_file(os.path.join(_ROOT, "cfgs", "det_sample.yaml"), cfg)
    batch = _edge_case_batch(get_model_spec(cfg), batch=3, seed=9)
    # 280-section ladders give the reference's f32 angle-target rounding
    # ~10x more rows to act on; the observed floor is ~3e-5 relative on a
    # few near-zero grad entries, still 100x under semantic-error scale
    _run_grad_check("det_sample.yaml", (), batch, tmp_path, "det_sample_full",
                    rtol=1e-4, atol_frac=1e-6)


def test_corner_flip_min_tie_convention():
    """At an exact corner-distance tie the reference's `torch.min`
    (`det_base.py:326-328`) splits the cotangent 50/50 between the straight
    and flipped GT branches; `jnp.minimum` (`models/det.py:125-128`) uses
    the same convention. Pinned here so a jax/torch behavior change
    surfaces as a test failure, not silent training drift."""
    import jax
    import jax.numpy as jnp

    a = torch.tensor([1.0, 2.0], requires_grad=True)
    b = torch.tensor([1.0, 3.0], requires_grad=True)
    torch.min(a, b).sum().backward()
    ga_t, gb_t = a.grad.numpy(), b.grad.numpy()

    ga_j, gb_j = jax.grad(
        lambda x, y: jnp.minimum(x, y).sum(), argnums=(0, 1)
    )(jnp.array([1.0, 2.0]), jnp.array([1.0, 3.0]))
    np.testing.assert_array_equal(ga_t, np.asarray(ga_j))
    np.testing.assert_array_equal(gb_t, np.asarray(gb_j))
    np.testing.assert_array_equal(ga_t, [0.5, 1.0])


def test_training_trajectory_parity(tmp_path):
    """15 optimization steps from identical weights over identical batches:
    torch Adam (reference loop, `train_net_det.py:115-128,322-323`) vs this
    repo's jitted train step + optax chain
    (`parallel/train_step.py:89-104,151-187`). Asserts the per-step loss
    sequence, the final parameters, and the final BN running statistics
    agree leaf-by-leaf.

    Run in f64 on both sides, like the gradient tier: Adam's first steps
    are near sign-descent (update ~ lr*sign(g) while v_hat ~ g^2), so in
    f32 the BN-backward round-off flips near-zero gradient signs and the
    trajectories drift ~0.1% per step for reasons that have nothing to do
    with semantics. In f64 any surviving divergence would be a real
    optimizer/BN-EMA mismatch (eps placement, bias correction, coupled
    weight decay, momentum direction).
    """
    import jax
    import jax.numpy as jnp

    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.parallel.train_step import (TrainState,
                                                         TrainStepConfig,
                                                         build_train_step,
                                                         make_optimizer)
    from tools.import_reference_checkpoint import map_state_dict

    cfg_name = "det_sample.yaml"
    n_steps, lr, wd = 15, 1e-3, 1e-4

    ref_model, _ = oracle.load_reference_model(cfg_name, seed=21)
    with jax.enable_x64():
        cfg, spec, model = _our_setup(cfg_name, SMALL_OVERRIDES[cfg_name],
                                      dtype=jnp.float64)
        variables = _interchanged_vars(ref_model, spec, tmp_path)
        ref_model.double()

        # a repeating 3-batch cycle, every batch with fg sections
        base = [make_batch(spec, batch=4, seed=100 + i, with_labels=True)
                for i in range(3)]
        for b in base:
            assert (b["cls_label"] == 1).any()
        batches = [base[i % 3] for i in range(n_steps)]

        def dd64(b):
            dd = oracle.torch_data_dicts(b, with_labels=True)
            return {k: (v.double() if v.is_floating_point() else v)
                    for k, v in dd.items()}

        ref_losses = oracle.reference_adam_steps(
            ref_model, [dd64(b) for b in batches], lr=lr, weight_decay=wd)
        ref_params, ref_stats = map_state_dict(
            {k: np.asarray(v.detach().numpy())
             for k, v in ref_model.state_dict().items()
             if not k.endswith("num_batches_tracked")},
            spec.num_scales)

        # constant-LR window of the reference schedule (decay far away)
        step_cfg = TrainStepConfig(
            base_lr=lr, min_lr=1e-5, gamma=0.1, lr_steps=[1000],
            warmup_epochs=0.0, steps_per_epoch=1000, weight_decay=wd,
            optimizer="adam", momentum=0.9,
            loss_weights={"box": float(cfg.LOSS.BOX_LOSS_WEIGHT),
                          "corner": float(cfg.LOSS.CORNER_LOSS_WEIGHT),
                          "head_res": float(cfg.LOSS.HEAD_REG_WEIGHT),
                          "size_res": float(cfg.LOSS.SIZE_REG_WEIGHT)},
            iou_thresh=float(cfg.IOU_THRESH), compute_metrics=False)
        tx = make_optimizer(step_cfg)
        step = build_train_step(model, spec, tx, step_cfg, mesh=None,
                                donate=False)

        cast64 = lambda a: jnp.asarray(
            a, jnp.float64
            if np.issubdtype(np.asarray(a).dtype, np.floating) else None)
        params64 = jax.tree_util.tree_map(cast64, variables["params"])
        stats64 = jax.tree_util.tree_map(cast64, variables["batch_stats"])
        state = TrainState(params=params64, batch_stats=stats64,
                           opt_state=tx.init(params64),
                           step=jnp.zeros((), jnp.int32))
        our_losses = []
        for b in batches:
            dev = {k: (tuple(cast64(r) for r in v) if k == "refs"
                       else cast64(v))
                   for k, v in b.items()}
            state, losses, _ = step(state, dev)
            our_losses.append(float(losses["total_loss"]))

        # per-step losses track; budget grows with step count, floored by
        # the reference's own f32 angle-target rounding (see _run_grad_check)
        for k, (o, r) in enumerate(zip(our_losses, ref_losses)):
            assert abs(o - r) <= (1e-7 + 1e-6 * abs(r)) * (k + 1), (
                f"step {k}: ours {o} vs reference {r}")

        # final parameters leaf-by-leaf: within a tiny fraction of lr
        from flax.core import unfreeze
        flat_o = jax.tree_util.tree_flatten_with_path(
            unfreeze(jax.device_get(state.params)))[0]
        flat_r = dict(jax.tree_util.tree_flatten_with_path(
            unfreeze(ref_params))[0])
        # bound: 2% of one lr-sized step. The reference's f32 angle-target
        # rounding (~1e-8) passes through Adam's g/|g| normalization, which
        # amplifies it on near-zero-gradient leaves to a few 1e-6 over 15
        # steps; a semantic mismatch would show at ~lr*n_steps (1000x this).
        for path, o in flat_o:
            diff = np.abs(np.asarray(o) - np.asarray(flat_r[path])).max()
            assert diff <= 0.02 * lr, (jax.tree_util.keystr(path), diff)

        # BN running statistics: same EMA momentum/order semantics (floor:
        # the param drift from the reference's f32 angle rounding feeds the
        # late-step batch statistics at a few 1e-6 relative)
        _assert_tree_close(jax.device_get(state.batch_stats), ref_stats,
                           rtol=1e-5, atol_frac=1e-7, label="batch-stats")
