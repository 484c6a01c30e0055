"""Model registry: maps config names (or reference file-path aliases) to
model-spec factories.

Replaces the reference's dynamic-import-by-file-path mechanism
(`/root/reference/utils/utils.py:12-25`, used at
`train/train_net_det.py:292-294`) with an explicit registry; the reference's
yaml values still work via `configs.config.MODEL_FILE_ALIASES`.
"""

from __future__ import annotations

from frustum_convnet_tpu.models.spec import kitti_spec, sunrgbd_spec

MODEL_REGISTRY = {
    "det_base": kitti_spec,
    "det_base_sunrgbd": sunrgbd_spec,
}


def get_model_spec(cfg):
    name = cfg.MODEL.FILE
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown model '{name}'. Known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](cfg)


def _dtypes():
    import jax.numpy as jnp

    # float16: same halved activation bandwidth as bfloat16 with 8x the
    # mantissa resolution (10 vs 7 bits) — the candidate when bf16's
    # rounding noise costs accuracy (BENCH_NOTES "bf16 scaled-batch AP
    # campaign"). Params/BN stats/optimizer state stay float32 either way.
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}


def get_compute_dtype(cfg, train: bool):
    """Resolve the model computation dtype from cfg.TPU.{COMPUTE,INFER}_DTYPE
    (params always stay float32; see models/net.FrustumConvNet)."""
    name = cfg.TPU.COMPUTE_DTYPE if train else cfg.TPU.INFER_DTYPE
    return _dtypes()[name]


def get_trunk_dtype(cfg):
    """Resolve cfg.TPU.TRUNK_DTYPE — the optional separate computation dtype
    for the conv trunk + heads ("" = None = follow the model dtype)."""
    name = cfg.TPU.TRUNK_DTYPE
    if not name:
        return None
    return _dtypes()[name]
