"""Metric-cadence train loop (cfg.TPU.METRIC_INTERVAL).

The reference computes its monitoring metrics (rotated IoU, accuracies)
every step with a CPU round-trip (`/root/reference/models/det_base.py:478-503`);
the rebuild samples them every N steps through a metric-carrying compiled
step and runs a metric-free twin otherwise. The parameter trajectory and
the epoch loss averages must be bit-identical to the every-step path —
the cadence may only change which steps contribute to the *metric*
averages.
"""

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.data.fixtures import make_batch
from frustum_convnet_tpu.engine.train import run_epoch_train
from frustum_convnet_tpu.models import det
from frustum_convnet_tpu.models.net import FrustumConvNet
from frustum_convnet_tpu.models.registry import get_model_spec
from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                     build_train_step_accum,
                                                     init_accum, init_state,
                                                     make_optimizer)


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def epoch(self, epoch):
        return iter(self.batches)


class _PlainStep:
    """run_epoch_train step bundle without a mesh (host batches pass through)."""

    def __init__(self, fn, fast_fn=None, loss_keys=()):
        self.fn = fn
        self.fast_fn = fast_fn
        self.loss_keys = tuple(loss_keys)


# model/optimizer/compiled-step singletons shared by every test in this
# module (both tests use identical shapes, so rebuilding the jitted steps
# per test only repeats ~20 s XLA compiles; the batches differ per test)
_SHARED = {}


def _shared_model():
    if not _SHARED:
        cfg = get_default_cfg()
        merge_cfg_from_list(["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT",
                             "False", "DATA.NUM_SAMPLES", "128",
                             "DATA.MAX_DEPTH", "8"], cfg)
        spec = get_model_spec(cfg)
        model = FrustumConvNet(spec)
        tcfg = TrainStepConfig()
        tx = make_optimizer(tcfg)
        _SHARED.update(cfg=cfg, spec=spec, model=model, tcfg=tcfg, tx=tx,
                       steps={})
    return (_SHARED["cfg"], _SHARED["spec"], _SHARED["model"],
            _SHARED["tcfg"], _SHARED["tx"])


def _shared_step(compute_metrics: bool):
    cfg, spec, model, tcfg, tx = _shared_model()
    steps = _SHARED["steps"]
    if compute_metrics not in steps:
        c = (tcfg if compute_metrics
             else dataclasses.replace(tcfg, compute_metrics=False))
        steps[compute_metrics] = build_train_step_accum(
            model, spec, tx, c, mesh=None, donate=False)
    return steps[compute_metrics]


def _setup(n_batches=5, batch=4):
    cfg, spec, model, tcfg, tx = _shared_model()
    batches = []
    for s in range(n_batches):
        b = make_batch(spec, batch=batch, seed=s, with_labels=True)
        batches.append({k: (tuple(jnp.asarray(x) for x in v)
                            if isinstance(v, (list, tuple)) else jnp.asarray(v))
                        for k, v in b.items()})
    state = init_state(model, tx, batches[0], seed=3)
    return cfg, spec, model, tcfg, tx, batches, state


def _run(cfg, spec, model, tcfg, tx, batches, state, metric_interval):
    fn = _shared_step(True)
    fast = _shared_step(False) if metric_interval > 1 else None
    step = _PlainStep(fn, fast_fn=fast, loss_keys=det.LOSS_KEYS)
    accum = init_accum(det.LOSS_KEYS + det.metric_keys(cfg.IOU_THRESH))
    logger = logging.getLogger("test_metric_interval")
    return run_epoch_train(step, state, accum, _ListLoader(batches), 0,
                           logger, None, disp=100,
                           metric_interval=metric_interval)


def test_metric_interval_matches_every_step_params_and_losses():
    cfg, spec, model, tcfg, tx, batches, state = _setup()

    s_ref, avg_ref = _run(cfg, spec, model, tcfg, tx, batches, state,
                          metric_interval=1)
    s_fast, avg_fast = _run(cfg, spec, model, tcfg, tx, batches, state,
                            metric_interval=3)

    # parameter trajectory bit-identical: metrics are lax.stop_gradient
    # monitoring only, so skipping them must not perturb the update
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        s_ref.params, s_fast.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0

    # loss averages cover every step in both modes
    for k in det.LOSS_KEYS:
        np.testing.assert_allclose(avg_ref[k], avg_fast[k], rtol=0, atol=0)

    # metric averages exist in both; fast mode sampled steps 1 and 3 (i=0
    # and (i+1)%3==0) of the 5 — values stay finite and plausible
    for k in det.metric_keys(cfg.IOU_THRESH):
        assert np.isfinite(avg_fast[k]), k
        assert avg_fast[k] >= 0.0


def test_metric_interval_metric_average_covers_sampled_steps_only():
    cfg, spec, model, tcfg, tx, batches, state = _setup(n_batches=4)

    # interval > len(loader): only step i=0 samples metrics
    _, avg = _run(cfg, spec, model, tcfg, tx, batches, state,
                  metric_interval=100)

    fn = _shared_step(True)
    accum = init_accum(det.LOSS_KEYS + det.metric_keys(cfg.IOU_THRESH))
    _, _, _, metrics0 = fn(state, accum, batches[0])
    for k in det.metric_keys(cfg.IOU_THRESH):
        np.testing.assert_allclose(avg[k], float(metrics0[k]),
                                   rtol=1e-6, atol=1e-6)
