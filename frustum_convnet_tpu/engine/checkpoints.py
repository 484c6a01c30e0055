"""Checkpoint save/restore with the reference's triple cadence.

Reference behavior (`/root/reference/train/train_net_det.py:384-398`): save
``model_%04d`` every 5 epochs, plus ``model_best`` (highest in-loop IoU
metric) and ``model_final``; checkpoints carry epoch, model state, optimizer
state, and the best-metric bookkeeping; the test driver accepts both wrapped
and bare states (`train/test_net_det.py:389-399`).

Serialization is flax msgpack (single file per checkpoint, host-independent).
Restores go through ``flax.serialization.from_bytes`` against a template
pytree, so dtype/sharding are re-established by the caller's state.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, state, epoch: int, best_prec: float = 0.0,
                    best_epoch: int = 0) -> None:
    payload: Dict[str, Any] = {
        "epoch": epoch,
        "best_prec": best_prec,
        "best_epoch": best_epoch,
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(jax.device_get(state.step)),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template) -> Dict[str, Any]:
    """Restore into the template's structure; returns the full payload dict."""
    template = {
        "epoch": 0,
        "best_prec": 0.0,
        "best_epoch": 0,
        "params": jax.device_get(state_template.params),
        "batch_stats": jax.device_get(state_template.batch_stats),
        "opt_state": jax.device_get(state_template.opt_state),
        "step": 0,
    }
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def checkpoint_paths(output_dir: str):
    d = os.path.join(output_dir, "checkpoints")
    return {
        "periodic": lambda epoch: os.path.join(d, f"model_{epoch:04d}.msgpack"),
        "best": os.path.join(d, "model_best.msgpack"),
        "final": os.path.join(d, "model_final.msgpack"),
    }


def maybe_save_epoch(output_dir: str, state, epoch: int, max_epoch: int,
                     best_prec: float, best_epoch: int, is_best: bool,
                     period: int = 5) -> Optional[str]:
    """Apply the reference cadence; returns the periodic path if written."""
    paths = checkpoint_paths(output_dir)
    written = None
    if (epoch + 1) % period == 0:
        written = paths["periodic"](epoch + 1)
        save_checkpoint(written, state, epoch + 1, best_prec, best_epoch)
    if is_best:
        save_checkpoint(paths["best"], state, epoch + 1, best_prec, best_epoch)
    if epoch + 1 == max_epoch:
        save_checkpoint(paths["final"], state, epoch + 1, best_prec, best_epoch)
    return written
