"""Optimizer stack: piecewise-constant LR + Adam + EMA shadow params.

Reference semantics:
  * piecewise LR via chained tf.cond over the JSON schedule
    (model.py:110-114).  The reference relies on dict insertion order being
    ascending; this implementation sorts boundaries, which is identical for
    valid schedules and correct for any order (a documented conscious fix,
    SURVEY.md §7).
  * Adam (model.py:116-124); the standalone WaveNet trainer's hardcoded
    schedule lives in wavenet.py:180-188 and is exposed as
    ``WAVENET_STANDALONE_SCHEDULE``.
  * EMA(0.999) over all trainables applied after each step (model.py:33,
    126-128); generation restores the EMA shadows (generate.py:88-90), so
    the train state carries a dual params/ema_params tree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

WAVENET_STANDALONE_SCHEDULE = {
    0: 4e-4, 40000: 2e-4, 80000: 1e-4,
    120000: 8e-5, 160000: 4e-5, 200000: 2e-5,
}


def piecewise_constant_schedule(schedule: dict):
    """{step: lr} -> callable(count) -> lr.  lr = value at the largest
    boundary <= count."""
    boundaries = np.asarray(sorted(schedule), dtype=np.int32)
    values = np.asarray([schedule[int(b)] for b in boundaries],
                        dtype=np.float32)

    def fn(count):
        idx = jnp.searchsorted(jnp.asarray(boundaries), count, side="right") - 1
        idx = jnp.clip(idx, 0, len(values) - 1)
        return jnp.asarray(values)[idx]

    return fn


def make_optimizer(schedule: dict):
    return optax.adam(learning_rate=piecewise_constant_schedule(schedule))


def ema_update(ema_params, params, decay: float = 0.999):
    """shadow <- decay*shadow + (1-decay)*param (tf.train.EMA semantics)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
