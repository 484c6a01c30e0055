"""FrustumConvNet in Flax: multi-scale PointNet + 1D FCN + detection heads.

Architecture reproduces the reference computation graph
(`/root/reference/models/det_base.py:35-258`, `det_base_sunrgbd.py:35-280`)
but is TPU-native:

* channels-last layouts everywhere: points (B, N, C), sections (B, L, C) —
  every 1x1 conv becomes a Dense matmul that tiles straight onto the MXU;
* grouping is the XLA `query_depth_point` top_k formulation (no CUDA scan);
* one generic module parameterized by :class:`DetModelSpec` covers both the
  4-scale KITTI and 5-scale SUN-RGBD variants;
* BatchNorm statistics are computed over the *global* (mesh-wide) batch when
  the batch axis is sharded under jit — the SPMD upgrade of the reference's
  per-replica DataParallel BN.

Initializers mirror the reference: kaiming-normal(fan_in) conv weights,
unit-gamma/zero-beta BN (`models/common.py:18-35`, `det_base.py:185-194`),
kaiming-uniform(fan_in) heads (`det_base.py:254-258`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from frustum_convnet_tpu.models.spec import DetModelSpec
from frustum_convnet_tpu.ops.select_pallas import (group_depth_point_auto,
                                                    group_depth_point_multi_auto)

_kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
_kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


# ---- float16-safe dense matmul -------------------------------------------
#
# float16 halves the (B, M, K, C) activation bandwidth that floors the
# scaled-batch train step — with 8x the mantissa resolution of bfloat16,
# whose rounding noise measured out of the AP band at batch 128 (BENCH_NOTES
# "bf16 scaled-batch AP campaign"). But f16 shares float32's problem-free
# exponent range only up to 65504: the weight-gradient dot dW = x^T @ g
# reduces over every batch row (B*M*K ~ 4.6M at batch 128), and its SUMMED
# values overflow f16's range even though every stored activation is tame —
# measured as an immediate inf on the widest pointnet kernel at batch 4.
# bfloat16 never hits this because it keeps f32's 8 exponent bits.
#
# The fix is surgical: only the dW dot's *output* needs float32 — a
# weight-shaped (Cin, Cout) tensor, so the extra precision costs zero
# activation bandwidth. The custom vjp below keeps x, y, g, and dx in
# float16 (the bandwidth-carrying tensors) and emits dW in float32; the
# kernel cast f32 -> f16 happens *inside* the op so the weight cotangent
# never transits f16. Used by DenseBNReLU via flax's promote_dtype /
# dot_general hooks, leaving the variable tree (and checkpoints) unchanged.

@jax.custom_vjp
def _f16_dense_dot(x, w):
    """y = x @ w with x float16, w float32; y float16, dW float32."""
    return lax.dot_general(x, w.astype(x.dtype),
                           (((x.ndim - 1,), (0,)), ((), ())))


def _f16_dense_dot_fwd(x, w):
    return _f16_dense_dot(x, w), (x, w)


def _f16_dense_dot_bwd(res, g):
    x, w = res
    # dx contracts only the Cout axis (<= 1024 terms of O(1) values): safe
    # in f16, and keeping it f16 preserves the halved backward bandwidth.
    dx = lax.dot_general(g, w.astype(g.dtype),
                         (((g.ndim - 1,), (1,)), ((), ())))
    # dW reduces over every batch row: accumulate AND store in f32.
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = lax.dot_general(x2, g2, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    return dx, dw


_f16_dense_dot.defvjp(_f16_dense_dot_fwd, _f16_dense_dot_bwd)


def _f16_promote(inputs, kernel, bias, dtype=None):
    """Dense promote_dtype hook: inputs to f16, kernel kept f32 (the cast
    happens inside _f16_dense_dot so dW never transits f16)."""
    assert bias is None  # DenseBNReLU uses use_bias=False
    return jnp.asarray(inputs, dtype), kernel, bias


def _f16_promote_bias(inputs, kernel, bias, dtype=None):
    """Head variant of ``_f16_promote``: the bias stays float32, so the
    bias-add promotes the head output to f32 and the bias cotangent (a
    batch-row sum, the same overflow class as dW) accumulates in f32. The
    heads cast to >=f32 on return anyway, so forward numerics are
    unchanged."""
    return (jnp.asarray(inputs, dtype), kernel,
            None if bias is None else jnp.asarray(bias, jnp.float32))


def _f16_dot_general(x, w, dimension_numbers, precision=None, **_):
    del precision  # f16 MXU path; precision knob is a no-op here
    assert dimension_numbers == (((x.ndim - 1,), (0,)), ((), ()))
    return _f16_dense_dot(x, w)


def slot_max_pool(x, train: bool):
    """Section max-pool over the slot axis, (B, M, K, C) -> (B, M, C), with
    the reference's tie subgradient in train mode: the cotangent goes to the
    FIRST slot attaining the max (torch ``Tensor.max(dim)`` routing,
    `det_base.py:134-143`), not split evenly across ties.

    The distinction is not academic: the depth-window query prefills unfilled
    slots with the first hit (`query_depth_point_cuda_kernel.cu:56-59`), so
    sparse sections carry many value-tied duplicate slots, and ``jnp.max``'s
    even split measurably changes every upstream parameter gradient at
    reference geometry (sections with cnt < nsample). Verified against torch
    autograd in `tests/test_grad_parity.py`: first-slot routing restores
    per-leaf gradient parity; the even split diverges at O(1).

    Plain primitives (``take_along_axis`` of ``argmax`` — whose VJP scatters
    to exactly that slot) rather than a custom_vjp so ``jax.checkpoint``
    remat stays a pure scheduling choice; the eval path keeps the cheaper
    single-pass ``reduce_max`` (identical values, no backward).
    """
    if train:
        first = jnp.argmax(x, axis=2)
        return jnp.take_along_axis(x, first[:, :, None, :], axis=2)[:, :, 0, :]
    return jnp.max(x, axis=2)


def _make_dense(features, dtype, name):
    """nn.Dense(use_bias=False) with the f16-safe dot when dtype is f16."""
    if dtype == jnp.float16:
        return nn.Dense(features, use_bias=False,
                        kernel_init=_kaiming_normal, dtype=dtype,
                        promote_dtype=_f16_promote,
                        dot_general=_f16_dot_general, name=name)
    return nn.Dense(features, use_bias=False, kernel_init=_kaiming_normal,
                    dtype=dtype, name=name)


def _bessel(n: int) -> float:
    """torch BatchNorm updates its running variance with the *unbiased*
    batch variance (x N/(N-1), `torch.nn.BatchNorm*`) while normalizing
    with the biased one; flax uses the biased variance for both. The
    running stats feed every eval-mode forward, so checkpoint interchange
    and eval parity require torch's convention (pinned by
    `tests/test_grad_parity.py::test_training_trajectory_parity`)."""
    return float(n) / max(n - 1, 1)


class TorchBN(nn.Module):
    """``nn.BatchNorm`` twin with torch's running-variance convention.

    Identical variable layout, normalization math (mean2 - mean^2 batch
    statistics in promoted >=f32, biased variance), EMA ordering, and
    output dtype as ``nn.BatchNorm(momentum=0.9)`` — the one difference is
    the Bessel-corrected running-variance update (see ``_bessel``).
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y):
        c = y.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        stat_dtype = jnp.promote_types(jnp.float32, y.dtype)
        yt = y.astype(stat_dtype)
        if self.use_running_average:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            red = tuple(range(y.ndim - 1))
            mean = jnp.mean(yt, axis=red)
            mean2 = jnp.mean(jnp.square(yt), axis=red)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                n = y.size // c
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * (var * _bessel(n)))
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon)) * scale
        return ((yt - mean) * inv + bias).astype(self.dtype)


class _StatsBN(nn.Module):
    """BatchNorm normalization with *externally supplied* batch statistics.

    Variable layout (params ``scale``/``bias``, batch_stats ``mean``/``var``)
    and running-average update match ``TorchBN`` exactly (``n`` is the
    reduction count behind the supplied statistics, for the Bessel-corrected
    running-variance update), so a model can switch between this and the
    stock module per call with a shared variable tree (checkpoints
    interchange either way).
    """

    n: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y, mean, var):
        c = y.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = (m * ra_var.value
                            + (1.0 - m) * (var * _bessel(self.n)))
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon)) * scale
        yt = y.astype(jnp.promote_types(jnp.float32, y.dtype))
        return ((yt - mean) * inv + bias).astype(self.dtype)


class GhostBN(nn.Module):
    """BatchNorm with *ghost* (per-group) batch statistics, train mode only.

    Splits the batch into ``B // group`` groups of ``group`` rows and
    normalizes each group with its own statistics — the semantics the
    reference actually trains with under multi-GPU ``nn.DataParallel``
    (`/root/reference/train/train_net_det.py:308-309`): each replica
    computes BN over its per-GPU sub-batch, so a batch-128 run on 4 GPUs
    normalizes over 32, never over 128. ``group = TRAIN.BATCH_SIZE /
    NUM_GPUS`` reproduces that exactly; sync-BN (the global-batch default)
    is the ``group == B`` limit.

    Variable layout (params ``scale``/``bias``, batch_stats ``mean``/``var``)
    matches ``nn.BatchNorm(momentum=0.9)``, so checkpoints interchange.
    Running averages update with the *mean of the group statistics* — the
    per-``group``-sized biased statistics a DataParallel replica would
    produce (torch keeps replica 0's; averaging the groups is the
    lower-variance equivalent with the same expectation).
    """

    group: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y):
        c = y.shape[-1]
        b = y.shape[0]
        assert b % self.group == 0, (
            f"batch {b} not divisible by BN group {self.group}")
        g = b // self.group
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        stat_dtype = jnp.promote_types(jnp.float32, y.dtype)
        yt = y.astype(stat_dtype).reshape((g, self.group) + y.shape[1:])
        axes = tuple(range(1, yt.ndim - 1))
        # flax's mean2 - mean^2 formulation, per group
        mean = jnp.mean(yt, axis=axes)  # (g, c)
        mean2 = jnp.mean(jnp.square(yt), axis=axes)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        if not self.is_initializing():
            m = self.momentum
            n_group = y.size // (c * g)  # reduction count per ghost group
            ra_mean.value = m * ra_mean.value + (1.0 - m) * jnp.mean(mean, 0)
            ra_var.value = (m * ra_var.value
                            + (1.0 - m) * (jnp.mean(var, 0)
                                           * _bessel(n_group)))
        shape = (g,) + (1,) * (yt.ndim - 2) + (c,)
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon)) * scale
        out = (yt - mean.reshape(shape)) * inv.reshape(shape) + bias
        return out.reshape(y.shape).astype(self.dtype)


def _apply_bn(y, train: bool, dtype, bn_group: int):
    """Stock flax BatchNorm, or GhostBN when ``bn_group`` > 0 in train mode.

    Same module name ("BatchNorm_0" under the caller's @nn.compact scope)
    and variable layout either way, so the variable tree is independent of
    the choice and checkpoints interchange.
    """
    if train and bn_group > 0:
        return GhostBN(group=bn_group, momentum=0.9, epsilon=1e-5,
                       dtype=dtype, name="BatchNorm_0")(y)
    return TorchBN(use_running_average=not train, momentum=0.9,
                   epsilon=1e-5, dtype=dtype, name="BatchNorm_0")(y)


class DenseBNReLU(nn.Module):
    """1x1 conv + BN + ReLU as a Dense matmul (channels-last).

    ``fast_stats`` (train mode only) computes the BN batch statistics
    analytically from the layer *input* instead of reducing over the big
    (B, M, K, C) pre-activation: for y = xW, E[y] = E[x]W and
    E[y^2]_c = (W^T E[xx^T] W)_cc, where E[xx^T] is a (Cin, Cin) second
    moment — one MXU matmul over the already-materialized input. The
    normalize affine then folds into the producing matmul's epilogue, so
    the pre-activation is never re-read for statistics. Same
    mean2 - mean^2 formulation as flax's ``_compute_stats`` — identical
    math, different summation order (validated within fp tolerance;
    ``tests/test_fast_bn.py``).
    """

    features: int
    dtype: Any = jnp.float32
    fast_stats: bool = False
    bn_group: int = 0  # ghost-BN group size (0 = global batch statistics)

    @nn.compact
    def __call__(self, x, train: bool):
        if not (train and self.fast_stats and self.bn_group == 0):
            x = _make_dense(self.features, self.dtype, "Dense_0")(x)
            x = _apply_bn(x, train, self.dtype, self.bn_group)
            return nn.relu(x)

        dense = _make_dense(self.features, self.dtype, "Dense_0")
        y = dense(x)
        kernel = dense.variables["params"]["kernel"]
        # stats in at-least-f32 (mirrors flax _compute_stats' promotion)
        stat_dtype = jnp.promote_types(jnp.float32, x.dtype)
        w = jnp.asarray(kernel, stat_dtype)
        xf = x.astype(stat_dtype).reshape(-1, x.shape[-1])
        r = xf.shape[0]
        mu_x = jnp.mean(xf, axis=0)
        mean = mu_x @ w
        # Var[y] per channel via the *centered* input covariance (sync-BN
        # note: under a sharded batch axis these reductions span the global
        # batch, same as the stock module's). Centering the (Cin, Cin)
        # moment before the quadratic form keeps the E[y^2] - E[y]^2
        # cancellation at covariance-entry scale instead of after the
        # projection mixes it.
        cov = (xf.T @ xf) / r - jnp.outer(mu_x, mu_x)
        var = jnp.sum((cov @ w) * w, axis=0)
        y = _StatsBN(n=r, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     name="BatchNorm_0")(y, mean, var)
        return nn.relu(y)


class ConvBNReLU(nn.Module):
    """k-tap 1D conv + BN + ReLU over (B, L, C)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Any = jnp.float32
    bn_group: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding=((self.pad, self.pad),),
            use_bias=False,
            kernel_init=_kaiming_normal,
            dtype=self.dtype,
        )(x)
        x = _apply_bn(x, train, self.dtype, self.bn_group)
        return nn.relu(x)


class DeConvBNReLU(nn.Module):
    """Transposed 1D conv (exact x`stride` upsampler) + BN + ReLU."""

    features: int
    kernel: int
    stride: int
    dtype: Any = jnp.float32
    bn_group: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(
            self.features,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=False,
            kernel_init=_kaiming_normal,
            dtype=self.dtype,
        )(x)
        x = _apply_bn(x, train, self.dtype, self.bn_group)
        return nn.relu(x)


class PointNetScale(nn.Module):
    """One grouping scale: depth-window query -> shared MLP -> section max-pool.

    Reference: PointNetModule (`models/det_base.py:35-103`). The empty-section
    zero-mask is applied after the MLP (before max-pool), exactly as there —
    gathered index-0 duplicates still flow through BN statistics.
    """

    mlp: Sequence[int]
    dist: float
    nsample: int
    use_feature: bool
    dtype: Any = jnp.float32
    fast_bn: bool = False
    fast_bn_first: bool = False
    bn_group: int = 0

    @nn.compact
    def __call__(self, points, ref, train: bool = False, grouped=None):
        # points (B, N, C>=3); ref (B, M, 3) in any order (the Pallas select
        # kernel has no sorted-ladder assumption, so padded refine ladders
        # with duplicated tail sections are handled exactly).
        # ``grouped`` short-circuits the query: FrustumConvNet batches all
        # scales' grouping into one kernel launch and passes (g, cnt) in.
        if grouped is None:
            feats = points if self.use_feature else points[..., :3]
            g, cnt = group_depth_point_auto(feats, ref, self.dist, self.nsample)
        else:
            g, cnt = grouped
        for li, width in enumerate(self.mlp):
            g = DenseBNReLU(width, dtype=self.dtype,
                            fast_stats=self.fast_bn
                            or (li == 0 and self.fast_bn_first),
                            bn_group=self.bn_group)(g, train)
        valid = (cnt > 0)[..., None, None]
        g = jnp.where(valid, g, 0.0)
        return slot_max_pool(g, train)  # (B, M, mlp[-1])


class FrustumConvNet(nn.Module):
    """The full detector. Returns (cls_logits (B, L, 2), reg (B, L, R)).

    ``dtype`` is the computation dtype (params stay float32): pass
    ``jnp.bfloat16`` for MXU-rate matmuls + halved activation bandwidth —
    the default for the inference drivers (cfg.TPU.INFER_DTYPE); training
    keeps float32 unless cfg.TPU.COMPUTE_DTYPE says otherwise. Head outputs
    are always cast back to float32.
    """

    spec: DetModelSpec
    dtype: Any = jnp.float32
    fast_bn: bool = False  # cfg.TPU.FAST_BN: analytic BN stats in the MLPs
    # cfg.TPU.FAST_BN_FIRST: analytic BN stats on each scale's FIRST MLP
    # layer only. Layer 1 is the one place the trade is asymmetric: its
    # input is the (B, M, K, 3) grouped points, so the stat moment is a
    # trivial (3, 3) matmul and the backward's extra reads are of the
    # 3-channel input — while the skipped reduction (and the skipped
    # residual save) is over the (B, M, K, 64..256) layer-1 pre-activation,
    # the widest per-layer tensor of each scale. The full FAST_BN loses this
    # asymmetry at the 64/128/256-channel inner layers (measured +41% step
    # time; BENCH_NOTES "Analytic BN on chip").
    fast_bn_first: bool = False
    # cfg.TPU.TRUNK_DTYPE: optional separate computation dtype for the 1D
    # conv encoder-decoder + heads (None = follow ``dtype``). The train
    # step's bandwidth floor is the (B, M, K, C) PointNet activations, so
    # ``dtype=bfloat16, trunk_dtype=float32`` keeps most of the bf16 step
    # speedup while the trunk/heads — where scaled-batch training loses its
    # AP margin to bf16 rounding (BENCH_NOTES "bf16 scaled-batch AP
    # campaign") — run in float32. Params stay float32 in every mode and
    # the variable tree is dtype-independent, so checkpoints interchange.
    trunk_dtype: Any = None
    # cfg.TPU.REMAT_POINTNET: rematerialize the per-scale MLP stacks in the
    # backward pass instead of saving their (B, M, K, C) activations — the
    # train step's HBM floor is exactly those tensors (BENCH_NOTES "Train-
    # step attribution"); the recompute re-runs cheap MXU-pad-floored
    # matmuls from the 3-channel grouped input, trading FLOPs for the
    # save/load traffic. Parameter gradients are mathematically identical.
    remat_pointnet: bool = False
    # cfg.TPU.BN_GROUP_SIZE: ghost-BN group size for train-mode batch
    # statistics (0 = global-batch sync-BN). ``group = per-GPU batch`` (e.g.
    # 32) reproduces the reference's multi-GPU DataParallel BN semantics,
    # where each replica normalizes over its own sub-batch
    # (`train/train_net_det.py:308-309`) — the reference never normalizes
    # over more than 32 rows regardless of the global batch.
    bn_group: int = 0

    @nn.compact
    def __call__(self, points, one_hot, refs, train: bool = False):
        """
        Args:
          points: (B, N, 3 + extra) frustum points, channels-last.
          one_hot: (B, num_vec) category one-hot.
          refs: list of (B, M_i, 3) section centers, one per scale.
        """
        s = self.spec
        assert len(refs) == s.num_scales

        # --- multi-scale pointnet features (ref PointNetFeat, det_base.py:107-159)
        # every scale's depth-window grouping runs in ONE fused kernel launch
        feats = points if s.use_extra_feature else points[..., :3]
        groups = group_depth_point_multi_auto(
            feats, list(refs), list(s.height_half), list(s.nsamples))
        # lifted remat keeps the scope/variable tree identical, so params and
        # checkpoints interchange with the non-remat model; `train` must be
        # static (it selects the BN mode at trace time)
        scale_cls = (nn.checkpoint(PointNetScale, static_argnums=(3,))
                     if self.remat_pointnet and train else PointNetScale)
        scale_feats = []
        for i in range(s.num_scales):
            f = scale_cls(
                mlp=s.mlps[i],
                dist=s.height_half[i],
                nsample=s.nsamples[i],
                use_feature=s.use_extra_feature,
                dtype=self.dtype,
                fast_bn=self.fast_bn,
                fast_bn_first=self.fast_bn_first,
                bn_group=self.bn_group,
                name=f"pointnet{i + 1}",
            )(points, refs[i], train, groups[i])
            # append one-hot class vector at every section; cast to the
            # compute dtype first or the concat promotes the whole feature
            # map back to float32 under a bfloat16 trunk
            oh = jnp.broadcast_to(one_hot.astype(f.dtype)[:, None, :],
                                  (f.shape[0], f.shape[1], one_hot.shape[-1]))
            scale_feats.append(jnp.concatenate([f, oh], axis=-1))

        # --- 1D conv encoder-decoder (ref ConvFeatNet, det_base.py:163-224)
        td = self.dtype if self.trunk_dtype is None else self.trunk_dtype
        ch = s.block_channels
        x = ConvBNReLU(ch[0], 3, 1, 1, dtype=td, bn_group=self.bn_group,
                       name="block1_conv1")(scale_feats[0].astype(td), train)
        laterals = []
        for b in range(1, len(ch)):
            x = ConvBNReLU(ch[b], 3, 2, 1, dtype=td, bn_group=self.bn_group,
                           name=f"block{b + 1}_conv1")(x, train)
            x = ConvBNReLU(ch[b], 3, 1, 1, dtype=td, bn_group=self.bn_group,
                           name=f"block{b + 1}_conv2")(x, train)
            x = jnp.concatenate([x, scale_feats[b].astype(td)], axis=-1)
            x = ConvBNReLU(ch[b], 1, 1, 0, dtype=td, bn_group=self.bn_group,
                           name=f"block{b + 1}_merge")(x, train)
            laterals.append(x)

        ups = []
        out_len = laterals[0].shape[1]
        for b, lat in enumerate(laterals):
            k = 2 ** b
            u = DeConvBNReLU(s.deconv_channels, k, k, dtype=td,
                             bn_group=self.bn_group,
                             name=f"block{b + 2}_deconv")(lat, train)
            ups.append(u[:, :out_len])
        x = jnp.concatenate(ups, axis=-1)  # (B, L, head_channels)

        # --- heads (ref det_base.py:250-258); under f16 the kernel/bias
        # cotangents route through f32 (same guard as the MLP dense dots)
        head_kw = ({"promote_dtype": _f16_promote_bias,
                    "dot_general": _f16_dot_general}
                   if td == jnp.float16 else {})
        cls_logits = nn.Dense(s.num_classes, kernel_init=_kaiming_uniform,
                              dtype=td, name="cls_out", **head_kw)(x)
        reg = nn.Dense(s.reg_size, kernel_init=_kaiming_uniform,
                       dtype=td, name="reg_out", **head_kw)(x)
        # head outputs never below float32 (half-precision compute still
        # yields f32 logits for the losses); an f64 run stays f64 so the
        # torch-gradient-parity tier can separate semantics from round-off
        out_dt = jnp.promote_types(jnp.float32, cls_logits.dtype)
        return cls_logits.astype(out_dt), reg.astype(out_dt)


def slice_reg_output(reg: jnp.ndarray, spec: DetModelSpec):
    """Split the regression head output into its box-codec parts.

    reg (..., 3 + 2*num_bins + 4*num_sizes) ->
      center (..., 3), heading_scores (..., B), heading_res (..., B),
      size_scores (..., S), size_res (..., S, 3).
    Reference: `models/det_base.py:260-278`.
    """
    nb, ns = spec.num_bins, spec.num_sizes
    center = reg[..., 0:3]
    heading_scores = reg[..., 3:3 + nb]
    heading_res = reg[..., 3 + nb:3 + 2 * nb]
    size_scores = reg[..., 3 + 2 * nb:3 + 2 * nb + ns]
    size_res = reg[..., 3 + 2 * nb + ns:].reshape(*reg.shape[:-1], ns, 3)
    return center, heading_scores, heading_res, size_scores, size_res
