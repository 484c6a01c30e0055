"""Ghost-BN (cfg.TPU.BN_GROUP_SIZE) — per-group train-mode batch statistics.

Reproduces the reference's multi-GPU DataParallel BN semantics
(`/root/reference/train/train_net_det.py:308-309`): each replica normalizes
over its per-GPU sub-batch, so a batch-128 reference run on 4 GPUs computes
BN over 32 rows, never 128. These tests pin: the group == B limit equals
stock flax BatchNorm, per-group statistics match a numpy construction,
variable-tree/checkpoint identity, gradient flow, and the SPMD step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.data.fixtures import make_batch
from frustum_convnet_tpu.models.net import FrustumConvNet, GhostBN
from frustum_convnet_tpu.models.registry import get_model_spec

_CACHE = {}


def _setup():
    if "spec" not in _CACHE:
        cfg = get_default_cfg()
        merge_cfg_from_list(["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT",
                             "False", "DATA.NUM_SAMPLES", "128",
                             "DATA.MAX_DEPTH", "8"], cfg)
        spec = get_model_spec(cfg)
        batch = make_batch(spec, batch=8, seed=0, with_labels=False)
        _CACHE.update(spec=spec,
                      pts=jnp.asarray(batch["point_cloud"]),
                      one_hot=jnp.asarray(batch["one_hot"]),
                      refs=[jnp.asarray(r) for r in batch["refs"]])
    return _CACHE["spec"], _CACHE["pts"], _CACHE["one_hot"], _CACHE["refs"]


def test_ghost_bn_group_equals_batch_matches_stock_bn():
    """group == B is sync-BN: same normalize and same running-stat update as
    the stock train-mode module (``TorchBN`` — nn.BatchNorm plus torch's
    Bessel-corrected running variance) within reduction-order tolerance."""
    from frustum_convnet_tpu.models.net import TorchBN

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(8, 6, 16)).astype(np.float32)) * 3 + 1
    ghost = GhostBN(group=8)
    stock = TorchBN(use_running_average=False, momentum=0.9,
                    epsilon=1e-5)
    v_g = ghost.init(jax.random.PRNGKey(0), y)
    v_s = stock.init(jax.random.PRNGKey(0), y)
    assert (jax.tree_util.tree_structure(v_g)
            == jax.tree_util.tree_structure(v_s))
    out_g, mut_g = ghost.apply(v_s, y, mutable=["batch_stats"])
    out_s, mut_s = stock.apply(v_s, y, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_s),
                    jax.tree_util.tree_leaves(mut_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_ghost_bn_per_group_stats_match_numpy():
    """Each group of ``group`` rows is normalized with its own mean/var, and
    the running averages update with the mean of the group statistics."""
    rng = np.random.default_rng(1)
    group = 4
    y_np = rng.normal(size=(8, 5, 3)).astype(np.float32) * 2 + 0.5
    # make the two groups obviously different so a global-stat bug shows
    y_np[4:] += 10.0
    mod = GhostBN(group=group, momentum=0.9, epsilon=1e-5)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(y_np))
    out, mut = mod.apply(v, jnp.asarray(y_np), mutable=["batch_stats"])
    out = np.asarray(out)

    means, vars_ = [], []
    for g0 in range(0, 8, group):
        grp = y_np[g0:g0 + group]
        m = grp.mean(axis=(0, 1))
        va = (grp ** 2).mean(axis=(0, 1)) - m ** 2
        means.append(m)
        vars_.append(va)
        want = (grp - m) / np.sqrt(va + 1e-5)
        np.testing.assert_allclose(out[g0:g0 + group], want,
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        0.1 * np.mean(means, axis=0), rtol=1e-5, atol=1e-6)
    # running var uses the Bessel-corrected (unbiased) group variance,
    # torch's BatchNorm convention; n = group * spatial rows per group
    n_group = group * y_np.shape[1]
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        0.9 * 1.0 + 0.1 * np.mean(vars_, axis=0) * n_group / (n_group - 1),
        rtol=1e-5, atol=1e-5)


def test_ghost_bn_model_variable_tree_and_eval_path_shared():
    """bn_group changes train-mode statistics only: identical variable tree
    and bitwise-shared eval path, so checkpoints interchange."""
    spec, pts, one_hot, refs = _setup()
    ref_model = FrustumConvNet(spec)
    ghost_model = FrustumConvNet(spec, bn_group=4)

    v_ref = ref_model.init(jax.random.PRNGKey(3), pts, one_hot, refs,
                           train=True)
    v_g = ghost_model.init(jax.random.PRNGKey(3), pts, one_hot, refs,
                           train=True)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_g))
    for a, b in zip(jax.tree_util.tree_leaves(v_ref),
                    jax.tree_util.tree_leaves(v_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cls_r, _ = ref_model.apply(v_ref, pts, one_hot, refs, train=False)
    cls_g, _ = ghost_model.apply(v_ref, pts, one_hot, refs, train=False)
    np.testing.assert_array_equal(np.asarray(cls_r), np.asarray(cls_g))


@pytest.mark.slow  # non-default knob; tree/eval-path identity stays quick
def test_ghost_bn_train_forward_differs_and_grads_flow():
    """With distinct groups the train forward must differ from sync-BN (the
    stats really are per-group), losses stay finite, and gradients flow to
    every parameter."""
    spec, pts, one_hot, refs = _setup()
    ref_model = FrustumConvNet(spec)
    ghost_model = FrustumConvNet(spec, bn_group=4)
    v = ref_model.init(jax.random.PRNGKey(0), pts, one_hot, refs, train=True)

    def fwd(model):
        (cls, reg), _ = model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            pts, one_hot, refs, train=True, mutable=["batch_stats"])
        return cls, reg

    cls_r, _ = fwd(ref_model)
    cls_g, _ = fwd(ghost_model)
    assert float(jnp.max(jnp.abs(cls_g - cls_r))) > 1e-6

    def loss(params):
        (cls, reg), _ = ghost_model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            pts, one_hot, refs, train=True, mutable=["batch_stats"])
        return jnp.mean(cls ** 2) + jnp.mean(reg ** 2)

    g = jax.grad(loss)(v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree_util.tree_leaves(g)]
    assert sum(1 for n in norms if n > 0) >= len(norms) - 2  # grads flow


@pytest.mark.slow  # full sharded-step compile
def test_ghost_bn_spmd_step_matches_single_device():
    """Ghost groups under a sharded batch axis: the SPMD step must equal the
    single-device step (the group reshape spans shard boundaries)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from frustum_convnet_tpu.parallel.mesh import make_mesh, shard_batch
    from frustum_convnet_tpu.parallel.train_step import (
        TrainStepConfig, build_train_step, init_state, make_optimizer)

    spec, _, _, _ = _setup()
    batch = make_batch(spec, batch=8, seed=0, with_labels=True)
    batch = {k: (tuple(jnp.asarray(x) for x in v)
                 if isinstance(v, (list, tuple)) else jnp.asarray(v))
             for k, v in batch.items()}
    model = FrustumConvNet(spec, bn_group=4)  # group spans 4 of 8 shards
    tcfg = TrainStepConfig()
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, batch, seed=3)

    step_1 = build_train_step(model, spec, tx, tcfg, mesh=None, donate=False)
    s1, losses1, _ = step_1(state, batch)

    mesh = make_mesh()
    step_n = build_train_step(model, spec, tx, tcfg, mesh=mesh, donate=False)
    sn, lossesn, _ = step_n(state, shard_batch(batch, mesh))
    # same bounds as tests/test_parallel.py: reduction order differs across
    # the mesh, and adam's first step moves 2*lr where a near-zero gradient's
    # sign flips under psum ordering
    for k in losses1:
        assert abs(float(lossesn[k]) - float(losses1[k])) < 2e-3, k
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sn.params)):
        assert float(np.max(np.abs(np.asarray(b) - np.asarray(a)))) < 2.5e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(sn.batch_stats)):
        assert float(np.max(np.abs(np.asarray(b) - np.asarray(a)))) < 2e-3
