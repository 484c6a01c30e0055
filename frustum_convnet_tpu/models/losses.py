"""Loss primitives: huber, masked softmax focal loss, masked cross-entropy.

Numerics match the reference (`/root/reference/models/model_util.py:9-19`,
`models/common.py:217-232`) but use dense masking instead of dynamic fg-row
gathering — identical values/gradients with static shapes (required under
jit; see SURVEY.md "Dynamic -> static shapes").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber(error: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Elementwise huber; caller handles reduction (ref huber_loss pre-mean)."""
    abs_e = jnp.abs(error)
    quad = jnp.minimum(abs_e, delta)
    return 0.5 * quad ** 2 + delta * (abs_e - quad)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, denom=None) -> jnp.ndarray:
    """sum(values * mask) / denom; denom defaults to clamp(sum(mask), 1)."""
    mask = mask.astype(values.dtype)
    if denom is None:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(values * mask) / denom


def softmax_focal_loss_masked(probs: jnp.ndarray, labels: jnp.ndarray,
                              alpha: float = 0.25, gamma: float = 2.0,
                              ignore_value: int = -1) -> jnp.ndarray:
    """Focal loss over {0, 1} labels with -1 = ignore, normalized by #fg.

    probs (R, C) softmax probabilities; labels (R,) in {-1, 0, 1}.
    Matches `softmax_focal_loss_ignore` (`models/common.py:217-232`): rows
    with ignore label contribute nothing; the sum is divided by the number of
    positive labels (+eps), *not* the number of kept rows.
    """
    keep = labels != ignore_value
    # clamp to >=1 like every other fg-normalized loss (det.py): a batch
    # with zero foreground sections must not blow the loss up to ~1e14
    # (the reference instead asserts fg exists, `det_base.py:414-416`;
    # dense-masked training keeps going with the background focal terms)
    num_fg = jnp.maximum(jnp.sum(labels > 0).astype(probs.dtype), 1.0)
    safe_labels = jnp.clip(labels, 0, probs.shape[-1] - 1)
    p_t = jnp.take_along_axis(probs, safe_labels[:, None], axis=-1)[:, 0]
    alpha_t = jnp.where(safe_labels >= 1, alpha, 1.0 - alpha)
    loss = -alpha_t * (1.0 - p_t) ** gamma * jnp.log(p_t + 1e-14)
    return jnp.sum(jnp.where(keep, loss, 0.0)) / num_fg


def cross_entropy_masked(logits: jnp.ndarray, labels: jnp.ndarray,
                         mask: jnp.ndarray, denom=None) -> jnp.ndarray:
    """Mean CE over masked rows (== F.cross_entropy on gathered fg rows).

    logits (R, C), labels (R,) int, mask (R,) bool.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    return masked_mean(nll, mask, denom)
