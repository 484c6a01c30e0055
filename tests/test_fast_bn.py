"""Analytic-BN (cfg.TPU.FAST_BN) equivalence vs stock flax BatchNorm.

The fast path computes each MLP layer's BN batch statistics from the layer
input's second moment (E[y] = E[x]W, E[y^2] = diag(W^T E[xx^T] W)) instead
of reducing over the (B, M, K, C) pre-activation. Mathematically identical
to flax's mean2 - mean^2 formulation; only summation order differs. These
tests pin: identical variable trees, matching forward outputs, matching
running-stat updates, and matching gradients, so the option can be toggled
per run against shared checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.data.fixtures import make_batch
from frustum_convnet_tpu.models.net import FrustumConvNet
from frustum_convnet_tpu.models.registry import get_model_spec


_CACHE = {}


def _setup():
    if "spec" not in _CACHE:
        cfg = get_default_cfg()
        merge_cfg_from_list(["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT",
                             "False", "DATA.NUM_SAMPLES", "128",
                             "DATA.MAX_DEPTH", "16"], cfg)
        spec = get_model_spec(cfg)
        batch = make_batch(spec, batch=4, seed=0, with_labels=False)
        _CACHE.update(spec=spec,
                      pts=jnp.asarray(batch["point_cloud"]),
                      one_hot=jnp.asarray(batch["one_hot"]),
                      refs=[jnp.asarray(r) for r in batch["refs"]])
    return _CACHE["spec"], _CACHE["pts"], _CACHE["one_hot"], _CACHE["refs"]


def _init_vars(model, seed):
    """model.init re-traces the whole network (~10 s on this host); the
    fast/first/stock variants produce identical variable trees by design
    (asserted in the tree tests), so one init per seed serves every test."""
    key = ("vars", seed)
    if key not in _CACHE:
        spec, pts, one_hot, refs = _setup()
        _CACHE[key] = model.init(jax.random.PRNGKey(seed), pts, one_hot,
                                 refs, train=True)
    return _CACHE[key]


def test_fast_bn_variable_tree_and_forward_match():
    spec, pts, one_hot, refs = _setup()
    ref_model = FrustumConvNet(spec)
    fast_model = FrustumConvNet(spec, fast_bn=True)

    v_ref = _init_vars(ref_model, 3)
    v_fast = fast_model.init(jax.random.PRNGKey(3), pts, one_hot, refs,
                             train=True)

    # identical variable trees (paths AND values: same rng, same inits)
    paths_ref = jax.tree_util.tree_structure(v_ref)
    paths_fast = jax.tree_util.tree_structure(v_fast)
    assert paths_ref == paths_fast
    for a, b in zip(jax.tree_util.tree_leaves(v_ref),
                    jax.tree_util.tree_leaves(v_fast)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # train-mode forward matches within fp tolerance (summation order only)
    (cls_r, reg_r), mut_r = ref_model.apply(
        v_ref, pts, one_hot, refs, train=True, mutable=["batch_stats"])
    (cls_f, reg_f), mut_f = fast_model.apply(
        v_ref, pts, one_hot, refs, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(cls_f), np.asarray(cls_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_f), np.asarray(reg_r),
                               rtol=1e-4, atol=1e-4)

    # running-stat updates match
    for a, b in zip(jax.tree_util.tree_leaves(mut_r),
                    jax.tree_util.tree_leaves(mut_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

    # eval-mode path is literally shared code: outputs equal bitwise
    cls_er, _ = ref_model.apply(v_ref, pts, one_hot, refs, train=False)
    cls_ef, _ = fast_model.apply(v_ref, pts, one_hot, refs, train=False)
    np.testing.assert_array_equal(np.asarray(cls_er), np.asarray(cls_ef))


def test_fast_bn_exact_in_float64():
    """The two stat formulations are the same *function*: in f64 a single
    layer's forward and grads agree to ~1e-12 (subprocess: x64 flag is
    process-global)."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp, numpy as np
from frustum_convnet_tpu.models.net import DenseBNReLU
x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6, 8, 16)), jnp.float64)
ref = DenseBNReLU(32, dtype=jnp.float64)
fast = DenseBNReLU(32, dtype=jnp.float64, fast_stats=True)
v = ref.init(jax.random.PRNGKey(0), x, True)
v = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), v)
def loss(p, m):
    y, _ = m.apply({'params': p, 'batch_stats': v['batch_stats']}, x, True,
                   mutable=['batch_stats'])
    return jnp.sum(y ** 3)
gr = jax.grad(loss)(v['params'], ref)
gf = jax.grad(loss)(v['params'], fast)
d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), gr, gf)
worst = max(jax.tree_util.tree_leaves(d))
yr, _ = ref.apply(v, x, True, mutable=['batch_stats'])
yf, _ = fast.apply(v, x, True, mutable=['batch_stats'])
fwd = float(jnp.max(jnp.abs(yr - yf)))
assert fwd < 1e-10, fwd
assert worst < 1e-9, worst
print('OK', fwd, worst)
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.startswith("OK")


@pytest.mark.slow  # ~1 min: two full sharded-step compiles
def test_fast_bn_spmd_train_step():
    """FAST_BN inside the full sharded train step: the analytic stats reduce
    over the global batch (sync-BN semantics) and the step matches the
    stock-BN step within reduction-order tolerance."""

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from frustum_convnet_tpu.parallel.mesh import make_mesh, shard_batch
    from frustum_convnet_tpu.parallel.train_step import (
        TrainStepConfig, build_train_step, init_state, make_optimizer)

    spec, pts, one_hot, refs = _setup()
    batch = make_batch(spec, batch=8, seed=0, with_labels=True)
    batch = {k: (tuple(jnp.asarray(x) for x in v)
                 if isinstance(v, (list, tuple)) else jnp.asarray(v))
             for k, v in batch.items()}
    tcfg = TrainStepConfig()
    tx = make_optimizer(tcfg)
    mesh = make_mesh()

    ref_model = FrustumConvNet(spec)
    fast_model = FrustumConvNet(spec, fast_bn=True)
    state = init_state(ref_model, tx, batch, seed=3)

    step_ref = build_train_step(ref_model, spec, tx, tcfg, mesh=mesh,
                                donate=False)
    step_fast = build_train_step(fast_model, spec, tx, tcfg, mesh=mesh,
                                 donate=False)
    b = shard_batch(batch, mesh)
    s_r, losses_r, _ = step_ref(state, b)
    s_f, losses_f, _ = step_fast(state, b)
    for k in losses_r:
        np.testing.assert_allclose(float(losses_f[k]), float(losses_r[k]),
                                   rtol=1e-3, atol=1e-3, err_msg=k)
    # batch_stats updated from the same global-batch statistics
    for a, bb in zip(jax.tree_util.tree_leaves(s_r.batch_stats),
                     jax.tree_util.tree_leaves(s_f.batch_stats)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_fast_bn_first_variable_tree_forward_and_stats_match():
    """FAST_BN_FIRST (analytic stats on each scale's first MLP layer only):
    identical variable tree, train-mode forward and running-stat updates
    within reduction-order tolerance, eval path bitwise-shared."""
    spec, pts, one_hot, refs = _setup()
    ref_model = FrustumConvNet(spec)
    first_model = FrustumConvNet(spec, fast_bn_first=True)

    v_ref = _init_vars(ref_model, 3)
    v_first = first_model.init(jax.random.PRNGKey(3), pts, one_hot, refs,
                               train=True)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_first))
    for a, b in zip(jax.tree_util.tree_leaves(v_ref),
                    jax.tree_util.tree_leaves(v_first)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    (cls_r, reg_r), mut_r = ref_model.apply(
        v_ref, pts, one_hot, refs, train=True, mutable=["batch_stats"])
    (cls_f, reg_f), mut_f = first_model.apply(
        v_ref, pts, one_hot, refs, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(cls_f), np.asarray(cls_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_f), np.asarray(reg_r),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(mut_r),
                    jax.tree_util.tree_leaves(mut_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

    cls_er, _ = ref_model.apply(v_ref, pts, one_hot, refs, train=False)
    cls_ef, _ = first_model.apply(v_ref, pts, one_hot, refs, train=False)
    np.testing.assert_array_equal(np.asarray(cls_er), np.asarray(cls_ef))


@pytest.mark.slow  # non-default knob; the full-FAST_BN grad parity stays quick
def test_fast_bn_first_gradients_match():
    spec, pts, one_hot, refs = _setup()
    ref_model = FrustumConvNet(spec)
    first_model = FrustumConvNet(spec, fast_bn_first=True)
    v = _init_vars(ref_model, 0)

    def loss(params, model):
        (cls, reg), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            pts, one_hot, refs, train=True, mutable=["batch_stats"])
        return jnp.mean(cls ** 2) + jnp.mean(reg ** 2)

    g_ref = jax.grad(loss)(v["params"], ref_model)
    g_first = jax.grad(loss)(v["params"], first_model)
    # same noise-aware criterion as test_fast_bn_gradients_match: f32
    # summation-order perturbations get amplified at relu boundaries
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_first)):
        assert pa == pb
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel_l2 = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
        assert rel_l2 < 5e-2, (jax.tree_util.keystr(pa), rel_l2)
        cos = np.dot(a.ravel(), b.ravel()) / (
            np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.995, (jax.tree_util.keystr(pa), cos)


def test_fast_bn_gradients_match():
    spec, pts, one_hot, refs = _setup()
    ref_model = FrustumConvNet(spec)
    fast_model = FrustumConvNet(spec, fast_bn=True)
    v = _init_vars(ref_model, 0)

    def loss(params, model):
        (cls, reg), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            pts, one_hot, refs, train=True, mutable=["batch_stats"])
        return jnp.mean(cls ** 2) + jnp.mean(reg ** 2)

    g_ref = jax.grad(loss)(v["params"], ref_model)
    g_fast = jax.grad(loss)(v["params"], fast_model)
    # In float64 the two paths agree to ~1e-13 (the math is identical; see
    # the f64 check in the module docstring history). In float32 the changed
    # summation order perturbs activations by ~1e-4, which relu boundary
    # flips amplify into localized gradient differences — so compare with a
    # noise-aware per-leaf L2 criterion rather than elementwise tightness.
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_fast)):
        assert pa == pb
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel_l2 = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
        assert rel_l2 < 5e-2, (jax.tree_util.keystr(pa), rel_l2)
        cos = np.dot(a.ravel(), b.ravel()) / (
            np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.995, (jax.tree_util.keystr(pa), cos)
