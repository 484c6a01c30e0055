import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.models.registry import MODEL_REGISTRY
from frustum_convnet_tpu.models.net import FrustumConvNet
from frustum_convnet_tpu.models.det import compute_losses, decode_outputs


def make_cfg(sunrgbd=False):
    cfg = get_default_cfg()
    if sunrgbd:
        merge_cfg_from_list(
            ["DATA.DATASET_NAME", "SUNRGBD", "DATA.MAX_DEPTH", "8",
             "DATA.STRIDE", "(0.1, 0.2, 0.4, 0.8, 1.6)",
             "DATA.HEIGHT_HALF", "(0.1, 0.2, 0.4, 0.8, 1.6)",
             "DATA.NUM_SAMPLES", "256", "MODEL.FILE", "det_base_sunrgbd",
             "DATA.WITH_EXTRA_FEAT", "False"],
            cfg,
        )
    else:
        merge_cfg_from_list(
            ["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT", "False",
             "DATA.NUM_SAMPLES", "128",
             "DATA.MAX_DEPTH", "8"],  # small ladder for test speed
            cfg,
        )
    return cfg


def make_batch(spec, batch=2, rng=None):
    rng = rng or np.random.default_rng(0)
    pts = rng.uniform([-3, -2, 0], [3, 2, spec.max_depth], (batch, spec.num_points, 3)).astype(np.float32)
    one_hot = np.zeros((batch, spec.num_vec), np.float32)
    one_hot[:, 0] = 1
    refs = []
    for m, s in zip(spec.num_refs, spec.strides):
        z = (np.arange(m) * s + s / 2).astype(np.float32)
        r = np.zeros((batch, m, 3), np.float32)
        r[:, :, 2] = z
        refs.append(jnp.asarray(r))
    return jnp.asarray(pts), jnp.asarray(one_hot), refs


@pytest.mark.parametrize("sunrgbd", [False, True])
def test_forward_shapes(sunrgbd):
    cfg = make_cfg(sunrgbd)
    spec = MODEL_REGISTRY[cfg.MODEL.FILE](cfg)
    model = FrustumConvNet(spec)
    pts, one_hot, refs = make_batch(spec)

    variables = jax.jit(
        lambda p, o, r: model.init(jax.random.PRNGKey(0), p, o, r, train=False)
    )(pts, one_hot, refs)
    cls_logits, reg = jax.jit(
        lambda v, p, o, r: model.apply(v, p, o, r, train=False)
    )(variables, pts, one_hot, refs)

    L = spec.num_out
    assert cls_logits.shape == (2, L, 2)
    assert reg.shape == (2, L, spec.reg_size)
    assert np.isfinite(np.asarray(cls_logits)).all()
    assert np.isfinite(np.asarray(reg)).all()


def test_loss_and_grads_finite():
    cfg = make_cfg(False)
    spec = MODEL_REGISTRY[cfg.MODEL.FILE](cfg)
    model = FrustumConvNet(spec)
    pts, one_hot, refs = make_batch(spec)
    B, L = 2, spec.num_out

    rng = np.random.default_rng(1)
    labels = {
        "cls_label": jnp.asarray(rng.choice([-1, 0, 1], (B, L), p=[0.1, 0.8, 0.1])),
        "box3d_center": jnp.asarray(rng.uniform([-2, -1, 2], [2, 1, 12], (B, 3)).astype(np.float32)),
        "box3d_heading": jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32)),
        "box3d_size": jnp.asarray(rng.uniform(1, 4, (B, 3)).astype(np.float32)),
        "size_class": jnp.asarray(rng.integers(0, spec.num_sizes, B)),
    }
    weights = {"box": 1.0, "corner": 10.0, "head_res": 20.0, "size_res": 20.0}

    variables = jax.jit(
        lambda p, o, r: model.init(jax.random.PRNGKey(0), p, o, r, train=True)
    )(pts, one_hot, refs)
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    def loss_fn(params):
        (cls_logits, reg), new_vars = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pts, one_hot, refs, train=True, mutable=["batch_stats"],
        )
        losses, metrics = compute_losses(
            spec, cls_logits, reg, refs[1], labels, weights
        )
        return losses["total_loss"], (losses, metrics)

    (total, (losses, metrics)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)

    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least some gradient signal everywhere
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_decode_shapes():
    cfg = make_cfg(False)
    spec = MODEL_REGISTRY[cfg.MODEL.FILE](cfg)
    B, L = 2, spec.num_out
    rng = np.random.default_rng(2)
    cls_logits = jnp.asarray(rng.normal(size=(B, L, 2)).astype(np.float32))
    reg = jnp.asarray(rng.normal(size=(B, L, spec.reg_size)).astype(np.float32))
    ref2 = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    out = jax.jit(lambda c, r, f: decode_outputs(spec, c, r, f))(cls_logits, reg, ref2)
    assert out["centers"].shape == (B, L, 3)
    assert out["headings"].shape == (B, L)
    assert out["sizes"].shape == (B, L, 3)
    assert out["cls_probs"].shape == (B, L, 2)
    # decoded headings wrapped to (-pi, pi]
    h = np.asarray(out["headings"])
    assert (h <= np.pi + 1e-5).all() and (h > -np.pi - 0.6).all()


def test_remat_pointnet_is_exact():
    """cfg.TPU.REMAT_POINTNET recomputes the per-scale MLP activations in
    the backward pass instead of saving them (the train step's HBM floor,
    BENCH_NOTES "Train-step attribution"). Scheduling-only: identical
    variable tree, bitwise loss, ulp-scale BN batch-stats; gradients to f32
    round-off — the train pool routes ties by argmax (torch convention,
    `models/net.py` slot_max_pool), and since the rematerialized forward
    is reassociated by XLA, a near-tie argmax can flip to an almost-equal
    slot (observed: ~1 element in 4k at ~1% relative), on top of ulp-scale
    reassociation noise everywhere."""
    from frustum_convnet_tpu.data.fixtures import make_batch as fixture_batch

    cfg = make_cfg(False)
    spec = MODEL_REGISTRY[cfg.MODEL.FILE](cfg)
    b = fixture_batch(spec, batch=4, seed=0, with_labels=True)
    args = (jnp.asarray(b["point_cloud"]), jnp.asarray(b["one_hot"]),
            [jnp.asarray(r) for r in b["refs"]])
    labels = {k: jnp.asarray(b[k]) for k in
              ("cls_label", "box3d_center", "box3d_heading", "box3d_size",
               "size_class")}
    weights = {"box": 1.0, "corner": 10.0, "head_res": 20.0, "size_res": 20.0}

    def run(remat):
        m = FrustumConvNet(spec, remat_pointnet=remat)
        v = m.init(jax.random.PRNGKey(3), *args, train=False)

        def loss_fn(p):
            (cl, rg), nv = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                *args, train=True, mutable=["batch_stats"])
            losses, _ = compute_losses(spec, cl, rg, args[2][1], labels,
                                       weights, compute_metrics=False)
            return losses["total_loss"], nv["batch_stats"]

        (l, bs), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
            v["params"])
        return float(l), g, bs, v["params"]

    l0, g0, bs0, p0 = run(False)
    l1, g1, bs1, p1 = run(True)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert l0 == l1
    for a, b2 in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=2e-2, atol=2e-4)
    for a, b2 in zip(jax.tree_util.tree_leaves(bs0),
                     jax.tree_util.tree_leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # non-default knob (no supported recipe uses it)
def test_trunk_dtype_mixed_precision():
    """cfg.TPU.TRUNK_DTYPE: bf16 PointNet stage + f32 conv trunk/heads.
    The variable tree must be identical to the uniform-dtype model (params
    stay float32 -> checkpoints interchange), outputs stay float32, and
    with trunk_dtype equal to the model dtype the outputs are bitwise the
    plain model's."""
    cfg = make_cfg(False)
    spec = MODEL_REGISTRY[cfg.MODEL.FILE](cfg)
    pts, one_hot, refs = make_batch(spec)

    plain = FrustumConvNet(spec, dtype=jnp.bfloat16)
    mixed = FrustumConvNet(spec, dtype=jnp.bfloat16, trunk_dtype=jnp.float32)
    v = jax.jit(
        lambda p, o, r: plain.init(jax.random.PRNGKey(0), p, o, r, train=False)
    )(pts, one_hot, refs)
    vm = jax.jit(
        lambda p, o, r: mixed.init(jax.random.PRNGKey(0), p, o, r, train=False)
    )(pts, one_hot, refs)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(vm["params"]))
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(vm["params"]))

    cl, rg = jax.jit(
        lambda vv, p, o, r: mixed.apply(vv, p, o, r, train=False)
    )(v, pts, one_hot, refs)
    assert cl.dtype == jnp.float32 and rg.dtype == jnp.float32
    assert np.isfinite(np.asarray(cl)).all()
    assert np.isfinite(np.asarray(rg)).all()

    # trunk_dtype == dtype reproduces the plain model bitwise
    same = FrustumConvNet(spec, dtype=jnp.bfloat16, trunk_dtype=jnp.bfloat16)
    cl0, rg0 = jax.jit(
        lambda vv, p, o, r: plain.apply(vv, p, o, r, train=False)
    )(v, pts, one_hot, refs)
    cl1, rg1 = jax.jit(
        lambda vv, p, o, r: same.apply(vv, p, o, r, train=False)
    )(v, pts, one_hot, refs)
    np.testing.assert_array_equal(np.asarray(cl0), np.asarray(cl1))
    np.testing.assert_array_equal(np.asarray(rg0), np.asarray(rg1))


def test_train_step_flagship_ladder_quick():
    """Quick-tier compile + one train step at the flagship's FULL section
    ladder (MAX_DEPTH 70 -> 280/140/70/35 sections) so the fast edit loop
    keeps compiling the production geometry (points reduced to 128 to stay
    in the quick-tier time budget; the full 1024-point graph runs in the
    slow tier via test_grad_parity_full_shapes and on chip)."""
    from frustum_convnet_tpu.data.fixtures import make_batch as fixture_batch
    from frustum_convnet_tpu.parallel.train_step import (
        TrainStepConfig, build_train_step, init_state, make_optimizer)

    cfg = get_default_cfg()
    merge_cfg_from_list(
        ["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT", "False",
         "DATA.NUM_SAMPLES", "128"], cfg)  # MAX_DEPTH stays 70
    spec = MODEL_REGISTRY[cfg.MODEL.FILE](cfg)
    assert spec.num_refs[0] == 280  # production ladder, not the test one
    model = FrustumConvNet(spec)
    b = fixture_batch(spec, batch=2, seed=0, with_labels=True)
    batch = {k: (tuple(jnp.asarray(r) for r in v) if k == "refs"
                 else jnp.asarray(v)) for k, v in b.items()}
    tcfg = TrainStepConfig(steps_per_epoch=10)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, batch, seed=3)
    step = build_train_step(model, spec, tx, tcfg, mesh=None, donate=False)
    state, losses, metrics = step(state, batch)
    assert np.isfinite(float(losses["total_loss"]))
    assert int(state.step) == 1
