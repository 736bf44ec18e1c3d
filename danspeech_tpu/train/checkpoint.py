"""Training checkpoint / resume (SURVEY §5 "Checkpoint / resume").

The reference has no training loop in-repo (its finetuning lives in an
external project, docs_source/train.rst:11-13) and its only checkpoint
artifact is the inference .pth package (model.py:599-650). Here training is
first-class, so train state (params + optimizer state + step counter)
persists with orbax — the standard JAX/TPU checkpointer: async-friendly,
sharding-aware (a pjit-sharded state restores onto the same mesh layout),
and atomic on multi-host filesystems.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .step import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(ckpt_dir: str, state: TrainState, step: int) -> str:
    """Write ``state`` under ``ckpt_dir/step_<N>``; returns the path."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    _checkpointer().save(path, state._asdict())
    return path


def latest_step(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str, like: TrainState, step=None) -> tuple:
    """Restore (state, step) from the newest (or given) checkpoint.

    ``like`` provides the target pytree structure/shardings — restoring
    onto a sharded template puts each leaf back on its mesh devices.
    """
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    restored = _checkpointer().restore(path, item=like._asdict())
    return TrainState(**restored), step
