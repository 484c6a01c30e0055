"""Data-parallel correctness: the 8-device SPMD step must match the
single-device step exactly (same global batch, sync-BN global statistics,
same gradients). This is the multichip analogue of the reference's implicit
DataParallel contract (`/root/reference/train/train_net_det.py:308-309`):
replication must not change the math.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
from frustum_convnet_tpu.data.fixtures import make_batch
from frustum_convnet_tpu.models.net import FrustumConvNet
from frustum_convnet_tpu.models.registry import get_model_spec
from frustum_convnet_tpu.parallel.mesh import make_mesh, shard_batch
from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                     build_infer_step,
                                                     build_train_step,
                                                     init_state,
                                                     make_optimizer)


def _tiny_setup(batch=8):
    cfg = get_default_cfg()
    merge_cfg_from_list(["MODEL.FILE", "det_base", "DATA.WITH_EXTRA_FEAT",
                         "False", "DATA.NUM_SAMPLES", "128",
                         "DATA.MAX_DEPTH", "8"], cfg)
    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec)
    tcfg = TrainStepConfig()
    tx = make_optimizer(tcfg)
    batch_np = make_batch(spec, batch=batch, seed=0, with_labels=True)
    batch_j = {k: (tuple(jnp.asarray(x) for x in v)
                   if isinstance(v, (list, tuple)) else jnp.asarray(v))
               for k, v in batch_np.items()}
    state = init_state(model, tx, batch_j, seed=3)
    return spec, model, tcfg, tx, batch_j, state


def _tree_max_diff(a, b):
    leaves = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                           - y.astype(jnp.float32)))), a, b)
    return max(jax.tree_util.tree_leaves(leaves) or [0.0])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_spmd_matches_single_device():
    spec, model, tcfg, tx, batch, state = _tiny_setup(batch=8)
    mesh = make_mesh()

    step_1 = build_train_step(model, spec, tx, tcfg, mesh=None, donate=False)
    step_n = build_train_step(model, spec, tx, tcfg, mesh=mesh, donate=False)

    s1, losses1, metrics1 = step_1(state, batch)
    sn, lossesn, metricsn = step_n(state, shard_batch(batch, mesh))

    # tolerances absorb float reduction-order differences (psum over the
    # mesh vs single-device row-major sums); the math is otherwise identical
    assert _tree_max_diff(losses1, lossesn) < 2e-3, (losses1, lossesn)
    assert _tree_max_diff(metrics1, metricsn) < 2e-3
    # updated parameters agree (gradients reduced over the mesh == full-batch).
    # adam's first step is ~±lr(1e-3) per param by gradient sign; a near-zero
    # gradient whose sign flips under psum reduction order moves 2*lr, so the
    # bound must sit just above 2e-3.
    assert _tree_max_diff(s1.params, sn.params) < 2.5e-3
    # sync-BN: batch statistics are global-batch on both paths
    assert _tree_max_diff(s1.batch_stats, sn.batch_stats) < 2e-3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_infer_step_spmd_matches_single_device():
    spec, model, tcfg, tx, batch, state = _tiny_setup(batch=8)
    mesh = make_mesh()
    infer_1 = build_infer_step(model, spec, mesh=None)
    infer_n = build_infer_step(model, spec, mesh=mesh)
    out1 = infer_1(state, batch)
    outn = infer_n(state, shard_batch(batch, mesh))
    assert _tree_max_diff(out1, outn) < 2e-3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("method", ["nms", "top"])
def test_infer_group_dispatch_spmd_matches_single_device(method):
    """The test driver's grouped (G*B-flattened, fg-compacted) dispatch must
    return the same packed detections when the group axis is sharded over
    the mesh — the SPMD counterpart of the reference test driver's
    DataParallel wrap (`test_net_det.py:404-405`). Inference is per-frustum
    data-parallel (no cross-example reductions) so selection counts must be
    identical; packed values get a tight tolerance — the partitioned
    executable fuses differently, shifting float rounding ~1e-6 relative."""
    from frustum_convnet_tpu.engine.test import build_infer_group_fn
    from frustum_convnet_tpu.parallel.mesh import shard_full_batch

    spec, model, tcfg, tx, batch, state = _tiny_setup(batch=16)
    mesh = make_mesh()
    g, b = 8, 2
    regroup = lambda x: np.asarray(x).reshape((g, b) + x.shape[1:])
    pts_g = regroup(batch["point_cloud"])
    oh_g = regroup(batch["one_hot"])
    refs_g = tuple(regroup(r) for r in batch["refs"])
    cap = min(16, spec.num_out)

    fn_1 = build_infer_group_fn(model, spec, method, cap, mesh=None)
    fn_n = build_infer_group_fn(model, spec, method, cap, mesh=mesh)
    packed1, cnt1 = fn_1(state.params, state.batch_stats,
                         jnp.asarray(pts_g), jnp.asarray(oh_g),
                         tuple(jnp.asarray(r) for r in refs_g))
    sh_pts, sh_oh, sh_refs = shard_full_batch((pts_g, oh_g, refs_g), mesh)
    packedn, cntn = fn_n(
        jax.device_put(state.params, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())),
        jax.device_put(state.batch_stats, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())),
        sh_pts, sh_oh, sh_refs)
    np.testing.assert_array_equal(np.asarray(cnt1), np.asarray(cntn))
    np.testing.assert_allclose(np.asarray(packed1), np.asarray(packedn),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # second-step variant of the SPMD equivalence above
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_spmd_steps_stay_in_sync():
    """Two successive sharded steps: state remains replicated-consistent and
    losses stay finite (exercises donation-free state round-trip)."""
    spec, model, tcfg, tx, batch, state = _tiny_setup(batch=8)
    mesh = make_mesh()
    step_n = build_train_step(model, spec, tx, tcfg, mesh=mesh, donate=False)
    b = shard_batch(batch, mesh)
    s, losses, _ = step_n(state, b)
    s, losses2, _ = step_n(s, b)
    # one adam step from random init need not reduce the loss, so assert the
    # state round-trip itself: everything stays finite and the step advanced.
    assert np.isfinite(float(losses["total_loss"]))
    assert np.isfinite(float(losses2["total_loss"]))
    for leaf in jax.tree_util.tree_leaves(s.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert int(s.step) == 2


@pytest.mark.slow  # ~2 min: subprocess re-spawn with a 32-device platform
@pytest.mark.parametrize("n", [32])
def test_dryrun_multichip_scales_beyond_eight(n):
    """The SPMD train step compiles + executes on wider data-parallel meshes
    (pod-slice shapes). The child inherits this suite's 8-device CPU env, so
    ``dryrun_multichip(32)`` exercises its own self-provision branch
    (`__graft_entry__.py`: re-spawn with a 32-device virtual platform) —
    guarding both the bootstrap and any 8-device-only sharding assumptions."""
    import subprocess
    import sys

    import frustum_convnet_tpu
    root = os.path.dirname(os.path.dirname(
        os.path.abspath(frustum_convnet_tpu.__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "__graft_entry__.py"),
         "multichip", str(n)],
        cwd=root, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert f"dryrun_multichip({n})" in proc.stdout
    assert "total_loss=" in proc.stdout


def test_lr_schedule_matches_reference_semantics():
    """len(LR_STEPS)==1 -> periodic StepLR decay (the reference's scheduler
    choice at `train_net_det.py:333-339`, used by ALL shipped configs);
    multiple milestones -> MultiStepLR; MIN_LR floors both."""
    from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                         multistep_lr)
    spe = 10
    sched = multistep_lr(TrainStepConfig(lr_steps=(20,), steps_per_epoch=spe))
    for epoch, want in ((0, 1e-3), (19, 1e-3), (20, 1e-4), (39, 1e-4),
                        (40, 1e-5), (49, 1e-5), (80, 1e-5)):
        got = float(sched(jnp.asarray(epoch * spe, jnp.float32)))
        assert abs(got - want) < 1e-9, (epoch, got, want)
    sched_m = multistep_lr(TrainStepConfig(lr_steps=(20, 30),
                                           steps_per_epoch=spe))
    for epoch, want in ((19, 1e-3), (20, 1e-4), (29, 1e-4), (30, 1e-5),
                        (50, 1e-5)):
        got = float(sched_m(jnp.asarray(epoch * spe, jnp.float32)))
        assert abs(got - want) < 1e-9, (epoch, got, want)


def test_lr_warmup_ramps_then_matches_reference_schedule():
    """TRAIN.WARMUP_EPOCHS (rebuild-only, for LR-scaled large-batch
    recipes): linear ramp to BASE_LR over the warmup window, then exactly
    the reference schedule; 0 reproduces the reference graph."""
    from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                         multistep_lr)
    spe = 10
    base = TrainStepConfig(lr_steps=(20,), steps_per_epoch=spe,
                           base_lr=4e-3)
    warm = TrainStepConfig(lr_steps=(20,), steps_per_epoch=spe,
                           base_lr=4e-3, warmup_epochs=5)
    s0, sw = multistep_lr(base), multistep_lr(warm)
    wsteps = 5 * spe
    # ramp: (step+1)/wsteps of base_lr, monotone increasing
    for step in (0, 10, wsteps - 1):
        got = float(sw(jnp.asarray(step, jnp.float32)))
        want = 4e-3 * (step + 1) / wsteps
        assert abs(got - want) < 1e-6 * want, (step, got)
    # at and after the warmup boundary: identical to the reference schedule
    for step in (wsteps, 25 * spe, 40 * spe, 60 * spe):
        a = float(sw(jnp.asarray(step, jnp.float32)))
        b = float(s0(jnp.asarray(step, jnp.float32)))
        assert a == b, (step, a, b)


def test_focal_loss_zero_foreground_is_bounded():
    """A batch with zero foreground sections must produce a bounded cls
    loss (dense-masked analogue of the reference's fg assertion,
    `det_base.py:414-416`), not a ~1e14 blowup."""
    from frustum_convnet_tpu.models.losses import softmax_focal_loss_masked

    probs = jnp.full((64, 2), 0.5, jnp.float32)
    labels = jnp.concatenate([jnp.zeros(48, jnp.int32),
                              jnp.full((16,), -1, jnp.int32)])
    loss = float(softmax_focal_loss_masked(probs, labels))
    assert np.isfinite(loss) and loss < 100.0, loss


def test_reset_schedule_count_keeps_moments():
    """Fine-tune-from: the LR schedule restarts at base LR (reference
    scheduler restarts, `train_net_det.py:99,345-361`) while adam moments
    and bias-correction count survive."""
    import optax
    from frustum_convnet_tpu.parallel.train_step import (
        TrainStepConfig, make_optimizer, reset_schedule_count)

    tx = make_optimizer(TrainStepConfig())
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    for _ in range(5):
        updates, state = tx.update({"w": jnp.ones((3,))}, state, params)
        params = optax.apply_updates(params, updates)

    def find(state, typ):
        return [s for s in jax.tree_util.tree_leaves(
            state, is_leaf=lambda x: isinstance(x, typ))
            if isinstance(s, typ)]

    sched_before = find(state, optax.ScaleByScheduleState)
    adam_before = find(state, optax.ScaleByAdamState)
    assert sched_before and int(sched_before[0].count) == 5

    reset = reset_schedule_count(state)
    sched_after = find(reset, optax.ScaleByScheduleState)
    adam_after = find(reset, optax.ScaleByAdamState)
    assert int(sched_after[0].count) == 0
    assert int(adam_after[0].count) == 5  # bias correction untouched
    np.testing.assert_array_equal(adam_after[0].mu["w"], adam_before[0].mu["w"])
    np.testing.assert_array_equal(adam_after[0].nu["w"], adam_before[0].nu["w"])
