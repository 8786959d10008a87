"""Checkpoint / resume via orbax (ASYNC saves), replacing tf.train.Saver.

Reference behavior preserved (SURVEY.md §5): checkpoints carry ALL state —
params, EMA shadow params (generation restores these, generate.py:88-90),
optimizer state, model state (BN stats / VQ EMA stats) and global_step, with
global_step-suffixed directory names (train.py:123).  Unlike the reference's
only failure handling (catching OutOfRangeError), periodic checkpoints here
make TPU preemption resumable.

Saves run through one long-lived orbax AsyncCheckpointer: the train loop
keeps stepping while the serialization thread writes to disk; pass
``wait=True`` (the final save) to block until the write is durable.
"""
from __future__ import annotations

import atexit
import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(_ASYNC_CKPTR.wait_until_finished)
    return _ASYNC_CKPTR


def save_checkpoint(save_dir: str, ts, *, keep: int = 5, wait: bool = False):
    """Write <save_dir>/weights-<step>/ from a TrainState pytree.

    Returns the checkpoint path immediately; the write continues in the
    background unless wait=True."""
    step = int(np.asarray(jax.device_get(ts["step"])))
    path = os.path.abspath(os.path.join(save_dir, f"weights-{step}"))
    ckptr = _async_checkpointer()
    # previous async save must finish before its successor starts (orbax
    # enforces this; waiting here keeps the error at the save site)
    ckptr.wait_until_finished()
    _prune_old(save_dir, keep, exclude=step)
    # force: the final save may land on the same step as a periodic one
    ckptr.save(path, args=ocp.args.StandardSave(jax.device_get(ts)),
               force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def _prune_old(save_dir: str, keep: int, exclude: Optional[int] = None):
    entries = []
    for name in os.listdir(save_dir):
        m = re.fullmatch(r"weights-(\d+)", name)
        if (m and os.path.isdir(os.path.join(save_dir, name))
                and int(m.group(1)) != exclude):
            entries.append((int(m.group(1)), name))
    entries.sort()
    for _, name in entries[:-keep] if keep else []:
        import shutil
        shutil.rmtree(os.path.join(save_dir, name), ignore_errors=True)


def latest_checkpoint(save_dir: str) -> Optional[str]:
    if _ASYNC_CKPTR is not None:       # a save may still be in flight
        _ASYNC_CKPTR.wait_until_finished()
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
    if _ASYNC_CKPTR is not None:       # a save may still be in flight
        _ASYNC_CKPTR.wait_until_finished()
    path = os.path.abspath(path)
    if not os.path.basename(path).startswith("weights-"):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no weights-<step> checkpoints in {path}")
        path = latest
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, ts_template)
