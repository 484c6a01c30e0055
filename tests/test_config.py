"""Config system: yaml merge, overrides, freeze, reset.

The key schema replicates the reference Detectron-style system
(`/root/reference/configs/config.py:63-192,231-353`); these tests pin the
merge/override/freeze semantics plus the TPU-only `reset_cfg` used by tools
that chain several engine CLIs in one process.
"""

import pytest

from frustum_convnet_tpu.configs import (assert_and_infer_cfg, cfg,
                                         get_default_cfg, merge_cfg_from_list,
                                         reset_cfg)


def test_override_type_coercion_and_unknown_key():
    c = get_default_cfg()
    merge_cfg_from_list(["TRAIN.BATCH_SIZE", "64", "TRAIN.BASE_LR", "0.01",
                         "DATA.CAR_ONLY", "False"], c)
    assert c.TRAIN.BATCH_SIZE == 64 and isinstance(c.TRAIN.BATCH_SIZE, int)
    assert c.TRAIN.BASE_LR == pytest.approx(0.01)
    assert c.DATA.CAR_ONLY is False
    with pytest.raises(AssertionError):
        merge_cfg_from_list(["TRAIN.NO_SUCH_KEY", "1"], c)


def test_file_alias_resolution_and_freeze():
    c = get_default_cfg()
    merge_cfg_from_list(["MODEL.FILE", "models/det_base.py",
                         "DATA.FILE", "datasets/provider_sample.py"], c)
    assert_and_infer_cfg(c)
    assert c.MODEL.FILE == "det_base"
    assert c.DATA.FILE == "provider_sample"
    with pytest.raises(AttributeError):
        c.TRAIN.BATCH_SIZE = 1  # frozen


def test_reset_cfg_restores_global_defaults():
    default_batch = get_default_cfg().TRAIN.BATCH_SIZE
    merge_cfg_from_list(["TRAIN.BATCH_SIZE", "999"], cfg)
    assert_and_infer_cfg(cfg)  # freezes the global, like the engine CLIs
    assert cfg.TRAIN.BATCH_SIZE == 999

    out = reset_cfg()
    assert out is cfg
    assert cfg.TRAIN.BATCH_SIZE == default_batch
    # mutable again: a second CLI stage can merge + freeze afresh
    merge_cfg_from_list(["TRAIN.BATCH_SIZE", "16"], cfg)
    assert cfg.TRAIN.BATCH_SIZE == 16
    reset_cfg()
