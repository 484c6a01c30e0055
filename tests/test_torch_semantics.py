"""Focused unit pins for the two torch semantics adopted in round 5.

`tests/test_grad_parity.py` proves them end-to-end through the full model;
these tests pin each mechanism in isolation against torch itself, so a
refactor of `models/net.py` that silently regresses either one fails a
5-second test instead of a 40-second full-model comparison.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from frustum_convnet_tpu.models.net import TorchBN, slot_max_pool  # noqa: E402


def test_slot_max_pool_first_slot_tie_routing():
    """Duplicate-slot ties (the prefilled-slot pattern the depth-window
    query produces) route the pool cotangent to the FIRST attaining slot,
    exactly like ``torch.Tensor.max(dim)`` (`det_base.py:134-143`)."""
    rng = np.random.default_rng(0)
    B, M, K, C = 2, 5, 8, 6
    x = rng.normal(size=(B, M, K, C)).astype(np.float32)
    # prefill pattern: slots [cnt:] duplicate slot 0 per section
    for b in range(B):
        for m in range(M):
            cnt = rng.integers(1, K)
            x[b, m, cnt:] = x[b, m, 0]
    g = rng.normal(size=(B, M, C)).astype(np.float32)

    xt = torch.tensor(x, requires_grad=True)
    vt, _ = xt.max(dim=2)
    vt.backward(torch.tensor(g))

    val, vjp = jax.vjp(lambda a: slot_max_pool(a, train=True), jnp.asarray(x))
    (gx,) = vjp(jnp.asarray(g))

    np.testing.assert_array_equal(np.asarray(val), vt.detach().numpy())
    np.testing.assert_array_equal(np.asarray(gx), xt.grad.numpy())
    # eval path: same values, single-pass reduce_max
    np.testing.assert_array_equal(
        np.asarray(slot_max_pool(jnp.asarray(x), train=False)),
        vt.detach().numpy())


def test_torchbn_matches_torch_batchnorm_over_steps():
    """TorchBN == torch.nn.BatchNorm1d over several train steps: normalized
    outputs, running mean, and the Bessel-corrected running variance."""
    rng = np.random.default_rng(1)
    C, steps = 7, 4
    ref = torch.nn.BatchNorm1d(C, momentum=0.1, eps=1e-5)
    ref.train()
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(rng.normal(1.0, 0.2, C), dtype=torch.float32))
        ref.bias.copy_(torch.tensor(rng.normal(0.0, 0.1, C), dtype=torch.float32))

    mod = TorchBN(use_running_average=False, momentum=0.9, epsilon=1e-5)
    xs = [rng.normal(0.5, 2.0, (16, 10, C)).astype(np.float32)
          for _ in range(steps)]
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]))
    v = {"params": {"scale": jnp.asarray(ref.weight.detach().numpy()),
                    "bias": jnp.asarray(ref.bias.detach().numpy())},
         "batch_stats": v["batch_stats"]}

    for x in xs:
        with torch.no_grad():
            # torch BN1d wants (N, C, L)
            yt = ref(torch.tensor(np.transpose(x, (0, 2, 1))))
        yo, mut = mod.apply(v, jnp.asarray(x), mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": mut["batch_stats"]}
        np.testing.assert_allclose(
            np.asarray(yo), np.transpose(yt.numpy(), (0, 2, 1)),
            rtol=1e-5, atol=1e-5)

    np.testing.assert_allclose(np.asarray(v["batch_stats"]["mean"]),
                               ref.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v["batch_stats"]["var"]),
                               ref.running_var.numpy(), rtol=1e-5, atol=1e-6)
    # the correction is material: the biased update would sit N/(N-1) off
    n = 16 * 10
    assert abs(1.0 - n / (n - 1)) > 5e-3


def test_torchbn_eval_uses_running_stats():
    """Eval mode normalizes with the running statistics, like
    nn.BatchNorm(use_running_average=True)."""
    rng = np.random.default_rng(2)
    C = 4
    x = rng.normal(size=(3, 5, C)).astype(np.float32)
    mean = rng.normal(0, 1, C).astype(np.float32)
    var = rng.uniform(0.5, 2.0, C).astype(np.float32)
    mod = TorchBN(use_running_average=True, momentum=0.9, epsilon=1e-5)
    v = {"params": {"scale": jnp.ones(C), "bias": jnp.zeros(C)},
         "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}}
    y = mod.apply(v, jnp.asarray(x))
    want = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-6)
