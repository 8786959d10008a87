"""Checkpoint / resume via orbax (async-capable), replacing tf.train.Saver.

Reference behavior preserved (SURVEY.md §5): checkpoints carry ALL state —
params, EMA shadow params (generation restores these, generate.py:88-90),
optimizer state, model state (BN stats / VQ EMA stats) and global_step, with
global_step-suffixed directory names (train.py:123).  Unlike the reference's
only failure handling (catching OutOfRangeError), periodic checkpoints here
make TPU preemption resumable.
"""
from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(save_dir: str, ts, *, keep: int = 5):
    """Write <save_dir>/weights-<step>/ from a TrainState pytree."""
    step = int(np.asarray(jax.device_get(ts["step"])))
    path = os.path.abspath(os.path.join(save_dir, f"weights-{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        # force: the final save may land on the same step as a periodic one
        ckptr.save(path, jax.device_get(ts), force=True)
    _prune_old(save_dir, keep)
    return path


def _prune_old(save_dir: str, keep: int):
    entries = []
    for name in os.listdir(save_dir):
        m = re.fullmatch(r"weights-(\d+)", name)
        if m and os.path.isdir(os.path.join(save_dir, name)):
            entries.append((int(m.group(1)), name))
    entries.sort()
    for _, name in entries[:-keep] if keep else []:
        import shutil
        shutil.rmtree(os.path.join(save_dir, name), ignore_errors=True)


def latest_checkpoint(save_dir: str) -> Optional[str]:
    if not os.path.isdir(save_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(save_dir):
        m = re.fullmatch(r"weights-(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(save_dir, name), int(m.group(1))
    return best


def restore_checkpoint(path: str, ts_template):
    """Restore into the template's structure/shardings.  ``path`` may be a
    weights-<step> dir or a parent save dir (latest is used)."""
    path = os.path.abspath(path)
    if not os.path.basename(path).startswith("weights-"):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no weights-<step> checkpoints in {path}")
        path = latest
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, ts_template)
