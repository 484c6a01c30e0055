from frustum_convnet_tpu.configs.config import (
    cfg,
    get_default_cfg,
    merge_cfg_from_file,
    merge_cfg_from_list,
    assert_and_infer_cfg,
    reset_cfg,
)

__all__ = [
    "cfg",
    "get_default_cfg",
    "merge_cfg_from_file",
    "merge_cfg_from_list",
    "assert_and_infer_cfg",
    "reset_cfg",
]
