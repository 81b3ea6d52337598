"""Checkpoint save/restore via Orbax.

Upgrades the reference's checkpointing (eight_mile ``save_checkpoint`` /
``find_latest_checkpoint``; step parsed from the filename, optimizer state
NOT saved — /root/reference/audio8/train.py:238-256, SURVEY.md §5): here
params + optimizer state + step are stored together, and the directory
naming convention ``checkpoint-{tick_type}-{step}`` is preserved so restart
flows look the same.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_name(base: str, step: int, tick_type: str = "step") -> str:
    return f"{base}-{tick_type}-{step}"


def save_checkpoint(state: Any, base: str, step: int, tick_type: str = "step") -> str:
    """Save a pytree (TrainState or params) to ``{base}-{tick_type}-{step}``.

    COLLECTIVE under multi-host: orbax synchronizes processes inside
    ``save``, so every process must call this (orbax writes from the
    primary host only)."""
    path = os.path.abspath(_ckpt_name(base, step, tick_type))
    ckptr = ocp.StandardCheckpointer()
    # host-gather before save keeps this single-controller simple; to_host
    # (not plain device_get) because ZeRO-1 moments may be sharded across
    # hosts — non-fully-addressable arrays need the collective all-gather
    from audio8_tpu.parallel.sharding import to_host

    state = jax.tree_util.tree_map(to_host, state)
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` (a matching abstract/concrete pytree)
    restores with correct structure and dtypes."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def parse_checkpoint_step(path: str) -> int:
    """Step number from the checkpoint name (train.py:238-244 semantics)."""
    m = re.search(r"-step-(\d+)/?$", path.rstrip("/"))
    return int(m.group(1)) if m else 0


def find_latest_checkpoint(ckpt_dir: str, base: str = "checkpoint") -> Tuple[str, int]:
    """Latest ``{base}-step-N`` under ``ckpt_dir`` -> (path, step)."""
    best, best_step = None, -1
    pat = re.compile(re.escape(base) + r"-step-(\d+)$")
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    if best is None:
        raise FileNotFoundError(f"No checkpoints under {ckpt_dir}")
    return best, best_step
