"""Child process for tests/test_multihost.py.

A miniature but *real* multi-host training run built from the actual driver
primitives: env-gated ``jax.distributed`` bootstrap, per-process sharded
``BatchLoader``, global-batch assembly via ``shard_batch``
(``make_array_from_process_local_data``), SPMD train steps, a validation
pass through ``run_epoch_eval`` (including the host-replicated global tail),
and a chief-gated checkpoint write. Run single-process (no FRUSTUM_* env) it
produces the reference result the multi-process pair must reproduce.

Usage: python tests/multihost_child.py <out.json> <params.npy> <ckpt_dir>
"""

import json
import logging
import sys


def main():
    out_json, params_npy, ckpt_dir = sys.argv[1:4]

    from frustum_convnet_tpu.parallel.mesh import (is_chief, make_mesh,
                                                   maybe_initialize_distributed)

    maybe_initialize_distributed()

    import jax
    import numpy as np

    from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.engine import checkpoints as ckpt
    from frustum_convnet_tpu.engine.loader import BatchLoader
    from frustum_convnet_tpu.engine.train import device_batch, run_epoch_eval
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                         build_eval_step,
                                                         build_train_step,
                                                         init_state,
                                                         make_optimizer)

    cfg = get_default_cfg()
    merge_cfg_from_list(["MODEL.FILE", "det_base", "DATA.NUM_SAMPLES", "128",
                         "DATA.MAX_DEPTH", "16"], cfg)
    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec)
    tcfg = TrainStepConfig(compute_metrics=True)
    tx = make_optimizer(tcfg)

    # fixed dataset: 20 items -> global batch 8 gives 2 full batches + a
    # short global tail of 4 (exercises the replicated-tail path)
    full = make_batch(spec, batch=20, seed=42, with_labels=True)

    class FixtureDataset:
        def __len__(self):
            return 20

        def __getitem__(self, i, rng=None):
            return {
                k: ([r[i] for r in full["refs"]] if k == "refs" else full[k][i])
                for k in full
            }

    ds = FixtureDataset()
    pc, pi = jax.process_count(), jax.process_index()
    mesh = make_mesh()
    loader = BatchLoader(ds, 8, spec.num_scales, shuffle=False,
                         drop_last=False, process_index=pi, process_count=pc)

    from frustum_convnet_tpu.data.provider import collate_batch

    ex = collate_batch([ds.__getitem__(i) for i in range(mesh.size // pc)],
                       spec.num_scales)
    state = init_state(model, tx, device_batch(ex, mesh), seed=3)

    train_fn = build_train_step(model, spec, tx, tcfg, mesh=mesh, donate=False)
    eval_fn = build_eval_step(model, spec, tcfg, mesh=mesh)
    eval_tail = build_eval_step(model, spec, tcfg, mesh=None)

    last_loss = None
    for batch_np in loader.epoch(0):
        if batch_np.pop("_global_tail", False):
            continue  # train on full batches only (driver uses drop_last)
        state, losses, _ = train_fn(state, device_batch(batch_np, mesh))
        last_loss = float(losses["total_loss"])

    logger = logging.getLogger("multihost_child")
    logger.addHandler(logging.NullHandler())
    prec = run_epoch_eval(eval_fn, eval_tail, mesh, state, loader, 0, logger,
                          None, "IoU_0.7")

    params = jax.device_get(state.params)
    flat = np.concatenate([np.asarray(x, np.float32).ravel()
                           for x in jax.tree_util.tree_leaves(params)])
    np.save(params_npy, flat)

    if is_chief():  # the driver's write gating, exercised for real
        ckpt.save_checkpoint(ckpt.checkpoint_paths(ckpt_dir)["final"], state,
                             epoch=1, best_prec=prec, best_epoch=1)

    with open(out_json, "w") as f:
        json.dump({
            "process": pi,
            "process_count": pc,
            "chief": bool(is_chief()),
            "device_count": jax.device_count(),
            "local_device_count": jax.local_device_count(),
            "last_loss": last_loss,
            "val_prec": float(prec),
        }, f)


if __name__ == "__main__":
    main()
