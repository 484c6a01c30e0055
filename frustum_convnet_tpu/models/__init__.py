from frustum_convnet_tpu.models.registry import get_model_spec, MODEL_REGISTRY

__all__ = ["get_model_spec", "MODEL_REGISTRY"]
