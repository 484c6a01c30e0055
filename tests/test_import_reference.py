"""Reference-checkpoint import: layout mapping is numerically exact.

The importer (`tools/import_reference_checkpoint.py`) claims a user can carry
reference `.pth` weights over. These tests (a) build a full reference-shaped
torch state dict, import it, and check the complete tree maps with correct
shapes (incl. DataParallel 'module.' unwrap + {'state_dict': ...} wrapping);
(b) verify every op-layout conversion numerically against torch: 1x1 Conv2d
-> Dense, Conv1d(k=3, s=1|2, p=1) -> flax Conv, ConvTranspose1d(k=s) -> flax
ConvTranspose, and the BN parameter/statistic mapping in eval mode.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.import_reference_checkpoint import map_state_dict  # noqa: E402


def _ref_shapes(num_scales=4, num_vec=3, extra=0):  # det_sample: WITH_EXTRA_FEAT False
    """(name -> shape) of the reference det_base state dict
    (`/root/reference/models/det_base.py:35-258`, common.py factories)."""
    mlps = [[64, 64, 128], [64, 64, 128], [128, 128, 256], [256, 256, 512]]
    shapes = {}

    def bn(prefix, c):
        shapes[f"{prefix}.1.weight"] = (c,)
        shapes[f"{prefix}.1.bias"] = (c,)
        shapes[f"{prefix}.1.running_mean"] = (c,)
        shapes[f"{prefix}.1.running_var"] = (c,)
        shapes[f"{prefix}.1.num_batches_tracked"] = ()

    for n in range(1, num_scales + 1):
        cin = 3 + extra
        for j, cout in enumerate(mlps[n - 1], start=1):
            p = f"feat_net.pointnet{n}.conv{j}"
            shapes[f"{p}.0.weight"] = (cout, cin, 1, 1)
            bn(p, cout)
            cin = cout

    blocks = {
        "block1_conv1": (128 + num_vec, 128, 3),
        "block2_conv1": (128, 128, 3), "block2_conv2": (128, 128, 3),
        "block2_merge": (128 + 128 + num_vec, 128, 1),
        "block3_conv1": (128, 256, 3), "block3_conv2": (256, 256, 3),
        "block3_merge": (256 + 256 + num_vec, 256, 1),
        "block4_conv1": (256, 512, 3), "block4_conv2": (512, 512, 3),
        "block4_merge": (512 + 512 + num_vec, 512, 1),
    }
    for b, (ci, co, k) in blocks.items():
        shapes[f"conv_net.{b}.0.weight"] = (co, ci, k)
        bn(f"conv_net.{b}", co)
    deconvs = {"block2_deconv": (128, 256, 1), "block3_deconv": (256, 256, 2),
               "block4_deconv": (512, 256, 4)}
    for b, (ci, co, k) in deconvs.items():
        shapes[f"conv_net.{b}.0.weight"] = (ci, co, k)  # ConvTranspose layout
        bn(f"conv_net.{b}", co)

    shapes["cls_out.weight"] = (2, 768, 1)
    shapes["cls_out.bias"] = (2,)
    shapes["reg_out.weight"] = (39, 768, 1)
    shapes["reg_out.bias"] = (39,)
    return shapes


def _random_ref_state_dict(seed=0, module_prefix=False):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for name, shape in _ref_shapes().items():
        if name.endswith("num_batches_tracked"):
            sd[name] = torch.tensor(7)
        elif name.endswith("running_var"):
            sd[name] = torch.rand(shape, generator=g) + 0.5
        else:
            sd[name] = torch.randn(shape, generator=g)
    if module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def test_full_import_roundtrip(tmp_path):
    """Whole reference state dict -> msgpack checkpoint -> our test driver's
    loader, exercising the wrapped-dict + DataParallel forms."""
    from tools import import_reference_checkpoint as imp

    src = str(tmp_path / "ref.pth")
    torch.save({"state_dict": _random_ref_state_dict(module_prefix=True),
                "epoch": 50}, src)
    dst = str(tmp_path / "imported.msgpack")
    imp.main([src, dst, "--cfg", "cfgs/det_sample.yaml"])
    assert os.path.getsize(dst) > 1_000_000  # ~4M params

    # loads through the standard checkpoint path
    import jax.numpy as jnp
    from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.engine import checkpoints as ckpt
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                         init_state,
                                                         make_optimizer)

    cfg = get_default_cfg()
    merge_cfg_from_list(["MODEL.FILE", "det_base"], cfg)
    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec)
    b = make_batch(spec, batch=2, seed=0, with_labels=False)
    state = init_state(model, make_optimizer(TrainStepConfig()), {
        "point_cloud": jnp.asarray(b["point_cloud"]),
        "one_hot": jnp.asarray(b["one_hot"]),
        "refs": tuple(jnp.asarray(r) for r in b["refs"]),
    }, seed=0)
    payload = ckpt.load_checkpoint(dst, state)
    # spot-check an exactly-mapped tensor
    w = np.asarray(payload["params"]["cls_out"]["kernel"])
    sd = _random_ref_state_dict(module_prefix=False)
    np.testing.assert_allclose(w, sd["cls_out.weight"].numpy()[:, :, 0].T)


def test_unmapped_and_missing_tensors_error():
    sd = {k: np.zeros(v if v else (1,))
          for k, v in _ref_shapes().items() if "num_batches" not in k}
    sd["feat_net.bogus.weight"] = np.zeros((1,))
    with pytest.raises(ValueError, match="unmapped"):
        map_state_dict(dict(sd), num_scales=4)
    del sd["feat_net.bogus.weight"]
    del sd["cls_out.bias"]
    with pytest.raises(KeyError, match="cls_out.bias"):
        map_state_dict(dict(sd), num_scales=4)


def _bn_eval(x, scale, bias, mean, var, eps=1e-5):
    return (x - mean) / np.sqrt(var + eps) * scale + bias


@pytest.mark.parametrize("k,s,ci,co", [(3, 1, 5, 7), (3, 2, 6, 8), (1, 1, 9, 4)])
def test_conv1d_mapping_matches_torch(k, s, ci, co):
    """conv_net Conv1d blocks: torch (O, I, K) -> flax (K, I, O) produces the
    same outputs (padding 1 for k=3, 0 for k=1, as the reference factories)."""
    import jax.numpy as jnp
    from jax import lax

    g = torch.Generator().manual_seed(1)
    w = torch.randn(co, ci, k, generator=g)
    x = torch.randn(2, ci, 16, generator=g)
    p = 1 if k == 3 else 0
    ref = torch.nn.functional.conv1d(x, w, stride=s, padding=p).numpy()

    kernel = np.transpose(w.numpy(), (2, 1, 0))  # (K, I, O)
    out = lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(kernel),
        window_strides=(s,), padding=[(p, p)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 1)), ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,ci,co", [(1, 128, 256), (2, 12, 10), (4, 8, 6)])
def test_convtranspose_mapping_matches_torch(k, ci, co):
    """deconv blocks (stride == kernel, no padding): torch (I, O, K) ->
    flax ConvTranspose (K, I, O)."""
    import flax.linen as nn
    import jax.numpy as jnp

    g = torch.Generator().manual_seed(2)
    w = torch.randn(ci, co, k, generator=g)
    x = torch.randn(2, ci, 9, generator=g)
    ref = torch.nn.functional.conv_transpose1d(x, w, stride=k).numpy()

    mod = nn.ConvTranspose(features=co, kernel_size=(k,), strides=(k,),
                           padding="VALID", use_bias=False)
    # (K, I, O) + spatial flip (flax mirrors the kernel vs torch)
    kernel = jnp.asarray(np.transpose(w.numpy(), (2, 0, 1))[::-1].copy())
    out = mod.apply({"params": {"kernel": kernel}},
                    jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 1)), ref,
                               rtol=1e-5, atol=1e-5)


def test_dense_and_bn_mapping_matches_torch():
    """PointNet 1x1 Conv2d + BatchNorm2d (eval mode) == Dense + our BN
    statistics mapping."""
    g = torch.Generator().manual_seed(3)
    ci, co = 4, 64
    w = torch.randn(co, ci, 1, 1, generator=g)
    scale = torch.randn(co, generator=g)
    bias = torch.randn(co, generator=g)
    mean = torch.randn(co, generator=g)
    var = torch.rand(co, generator=g) + 0.5
    x = torch.randn(2, ci, 6, 5, generator=g)

    bn = torch.nn.BatchNorm2d(co)
    bn.weight.data, bn.bias.data = scale, bias
    bn.running_mean.data, bn.running_var.data = mean, var
    bn.eval()
    with torch.no_grad():
        ref = bn(torch.nn.functional.conv2d(x, w)).numpy()

    dense_kernel = w.numpy()[:, :, 0, 0].T  # (I, O)
    xc = x.numpy().transpose(0, 2, 3, 1)  # channels-last
    y = xc @ dense_kernel
    y = _bn_eval(y, scale.numpy(), bias.numpy(), mean.numpy(), var.numpy())
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cfg_file", [
    "cfgs/det_sample.yaml",
    # 5-scale variant ~35 s to trace+compile: full-tier only
    pytest.param("cfgs/det_sample_sunrgbd.yaml", marks=pytest.mark.slow),
])
def test_export_import_roundtrip_is_bit_exact(tmp_path, cfg_file):
    """ours -> reference .pth -> ours reproduces every param and batch stat
    exactly (checkpoints interchangeable in both directions), for both the
    4-scale KITTI and 5-scale SUN-RGBD variants."""
    import jax
    import jax.numpy as jnp
    from frustum_convnet_tpu.configs import get_default_cfg, merge_cfg_from_list
    from frustum_convnet_tpu.data.fixtures import make_batch
    from frustum_convnet_tpu.engine import checkpoints as ckpt
    from frustum_convnet_tpu.models.net import FrustumConvNet
    from frustum_convnet_tpu.models.registry import get_model_spec
    from frustum_convnet_tpu.parallel.train_step import (TrainStepConfig,
                                                         init_state,
                                                         make_optimizer)
    from frustum_convnet_tpu.configs import merge_cfg_from_file
    from tools import export_reference_checkpoint as exp
    from tools import import_reference_checkpoint as imp

    cfg = get_default_cfg()
    merge_cfg_from_file(cfg_file, cfg)
    spec = get_model_spec(cfg)
    model = FrustumConvNet(spec)
    b = make_batch(spec, batch=2, seed=1, with_labels=False)
    state = init_state(model, make_optimizer(TrainStepConfig()), {
        "point_cloud": jnp.asarray(b["point_cloud"]),
        "one_hot": jnp.asarray(b["one_hot"]),
        "refs": tuple(jnp.asarray(r) for r in b["refs"]),
    }, seed=11)

    ours = str(tmp_path / "ours.msgpack")
    ckpt.save_checkpoint(ours, state, epoch=3)
    pth = str(tmp_path / "exported.pth")
    exp.main([ours, pth, "--cfg", cfg_file])
    back = str(tmp_path / "back.msgpack")
    imp.main([pth, back, "--cfg", cfg_file])

    payload = ckpt.load_checkpoint(back, state)
    for a, b_ in zip(jax.tree_util.tree_leaves(payload["params"]),
                     jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    for a, b_ in zip(jax.tree_util.tree_leaves(payload["batch_stats"]),
                     jax.tree_util.tree_leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
