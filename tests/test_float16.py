"""float16 training compute (cfg.TPU.COMPUTE_DTYPE float16).

f16 halves the (B, M, K, C) activation bandwidth like bfloat16 but keeps
8x the mantissa resolution — the candidate recipe after the entire bf16
scaled-batch family measured out of the AP band (BENCH_NOTES "bf16
scaled-batch AP campaign"). Its one hazard is the 65504 exponent ceiling:
the weight-gradient dot reduces over every batch row and overflows f16
even when all stored values are tame. models/net._f16_dense_dot guards
exactly that (f32-output dW, f16 everything else); these tests pin the
guard and the end-to-end stability it buys.
"""

import numpy as np
import jax
import jax.numpy as jnp

from frustum_convnet_tpu.models.net import FrustumConvNet, _f16_dense_dot
from frustum_convnet_tpu.models.registry import MODEL_REGISTRY

from tests.test_model import make_batch, make_cfg


def test_f16_dense_dot_values_and_grads():
    """y/dx match the plain f16 dot bitwise; dW matches the f32 reference
    at f16-input resolution and comes out in float32."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 32)), jnp.float16)
    w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(64, 16)), jnp.float16)

    y = _f16_dense_dot(x, w)
    assert y.dtype == jnp.float16
    y_ref = x @ w.astype(jnp.float16)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))

    dx, dw = jax.vjp(_f16_dense_dot, x, w)[1](g)
    assert dx.dtype == jnp.float16 and dw.dtype == jnp.float32
    xf, wf, gf = (np.asarray(t, np.float32) for t in (x, w, g))
    # dx is an f16 dot over 16 terms: a few f16 ulp (~4e-3 at |8|) of slack
    np.testing.assert_allclose(np.asarray(dx), gf @ wf.T, rtol=5e-3,
                               atol=2e-2)
    # dw accumulates in f32 from exactly-representable f16 inputs: tight
    np.testing.assert_allclose(np.asarray(dw), xf.T @ gf, rtol=1e-5,
                               atol=1e-5)


def test_f16_dense_dot_dw_does_not_overflow():
    """The exact failure the guard exists for: same-sign products whose sum
    exceeds f16's 65504 ceiling. A plain f16 dW dot clamps to inf; the
    guarded dot returns the true value in f32."""
    rows = 1 << 16
    x = jnp.full((rows, 8), 2.0, jnp.float16)
    w = jnp.zeros((8, 4), jnp.float32)
    g = jnp.full((rows, 4), 1.0, jnp.float16)

    _, dw = jax.vjp(_f16_dense_dot, x, w)[1](g)
    assert dw.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(dw), 2.0 * rows, rtol=0)
    assert float(2.0 * rows) > 65504  # the sum really is out of f16 range


def test_f16_model_tree_and_grad_parity():
    """f16 model: identical variable tree (f32 params -> checkpoints
    interchange), f32 head outputs, and gradients tracking the f32 model's
    direction (cosine) — the same bar the bf16 validation used."""
    cfg = make_cfg(False)
    spec = MODEL_REGISTRY[cfg.MODEL.FILE](cfg)
    pts, one_hot, refs = make_batch(spec, batch=4)

    f32 = FrustumConvNet(spec, dtype=jnp.float32)
    f16 = FrustumConvNet(spec, dtype=jnp.float16)
    v = jax.jit(
        lambda p, o, r: f32.init(jax.random.PRNGKey(0), p, o, r, train=False)
    )(pts, one_hot, refs)
    v16 = jax.jit(
        lambda p, o, r: f16.init(jax.random.PRNGKey(0), p, o, r, train=False)
    )(pts, one_hot, refs)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v16["params"]))
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(v16["params"]))

    def grads(model):
        def loss_fn(p):
            (cl, rg), _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                pts, one_hot, refs, train=True, mutable=["batch_stats"])
            assert cl.dtype == jnp.float32 and rg.dtype == jnp.float32
            return jnp.sum(cl * cl) * 1e-3 + jnp.sum(jnp.abs(rg)) * 1e-3
        return jax.jit(jax.grad(loss_fn))(v["params"])

    g32, g16 = grads(f32), grads(f16)
    worst = 1.0
    for a, b in zip(jax.tree_util.tree_leaves(g32),
                    jax.tree_util.tree_leaves(g16)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        assert np.isfinite(b).all()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 1e-6 and nb > 1e-6:
            worst = min(worst, float(a @ b / (na * nb)))
    # bf16's worst per-leaf cosine at init measured 0.80-0.87 (BENCH_NOTES
    # "Mixed-stage precision" diagnostics); f16's finer mantissa must do
    # strictly better
    assert worst > 0.95, worst


def test_f16_train_steps_stay_finite():
    """Regression for the observed failure: pre-guard, the widest pointnet
    kernel went inf on the very first optimizer step."""
    from frustum_convnet_tpu.data.fixtures import make_batch as fixture_batch
    from frustum_convnet_tpu.parallel.train_step import (
        TrainStepConfig, build_train_step, init_state, make_optimizer)

    cfg = make_cfg(False)
    spec = MODEL_REGISTRY[cfg.MODEL.FILE](cfg)
    model = FrustumConvNet(spec, dtype=jnp.float16)
    tcfg = TrainStepConfig(compute_metrics=False)
    tx = make_optimizer(tcfg)
    b = fixture_batch(spec, batch=4, seed=0, with_labels=True)
    b = {k: (tuple(jnp.asarray(x) for x in val) if isinstance(val, (list, tuple))
             else jnp.asarray(val)) for k, val in b.items()}
    state = init_state(model, tx, b, seed=3)
    step = build_train_step(model, spec, tx, tcfg)
    for _ in range(4):
        state, losses, _ = step(state, b)
    assert np.isfinite(float(losses["total_loss"]))
    assert all(bool(jnp.isfinite(p).all())
               for p in jax.tree_util.tree_leaves(state.params))
    assert all(bool(jnp.isfinite(s).all())
               for s in jax.tree_util.tree_leaves(state.batch_stats))


def test_f16_head_grads_route_through_f32():
    """The cls/reg heads under float16 use the same guarded dot as the MLPs:
    a synthetic overflow-scale cotangent must produce finite f32
    kernel/bias gradients where a stock-f16 dense would emit inf."""
    import numpy as np
    from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.data.fixtures import make_batch

    cfg = get_default_cfg()
    merge_cfg_from_list(
        ["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT", "False",
         "DATA.NUM_SAMPLES", "128", "DATA.MAX_DEPTH", "8"], cfg)
    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec, dtype=jnp.float16)
    b = make_batch(spec, batch=4, seed=0, with_labels=False)
    args = (jnp.asarray(b["point_cloud"]), jnp.asarray(b["one_hot"]),
            [jnp.asarray(r) for r in b["refs"]])
    v = model.init(jax.random.PRNGKey(0), *args, train=False)

    def loss(p):
        (cl, rg), _ = model.apply({"params": p, "batch_stats": v["batch_stats"]},
                                  *args, train=True, mutable=["batch_stats"])
        # overflow-scale upstream: a plain f16 batch-row reduction of this
        # cotangent would exceed f16 max (65504) and emit inf
        return (cl.astype(jnp.float32) * 1e4).sum() + (rg.astype(jnp.float32) * 1e4).sum()

    g = jax.jit(jax.grad(loss))(v["params"])
    for head in ("cls_out", "reg_out"):
        for leaf in ("kernel", "bias"):
            arr = np.asarray(g[head][leaf])
            assert np.isfinite(arr).all(), (head, leaf)
