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


def fused_adam_ema_step(params, ema_params, opt_state, grads, schedule_fn,
                        *, b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8, ema_decay: float = 0.999):
    """Adam + parameter update + EMA shadow in ONE pass over the trees.

    ``optax.adam -> apply_updates -> ema_update`` walks the f32 master
    params, m, v and EMA shadows in three separate jitted tree passes —
    ~350 MB of HBM traffic re-streamed per pass on the shipped config
    (measured 2.84 ms, PERF.md #29).  Evaluating the same algebra in one
    tree_map lets XLA fuse each leaf into a single read-modify-write
    stream: 1.84 ms measured.

    The optimizer state keeps optax's exact pytree layout
    ``(ScaleByAdamState, ScaleByScheduleState)`` so checkpoints are
    interchangeable with the unfused path, and the update form matches
    optax.adam's to float round-off:
        lr   = schedule(count)                  # pre-increment count
        m'   = b1*m + (1-b1)*g;  v' = b2*v + (1-b2)*g^2
        p'   = p - lr * (m'/(1-b1^(t+1))) / (sqrt(v'/(1-b2^(t+1))) + eps)
        ema' = ema_decay*ema + (1-ema_decay)*p'
    Reference semantics: Adam model.py:116-124, EMA model.py:126-128.

    Returns (params, ema_params, opt_state).
    """
    adam_state = opt_state[0]
    count = adam_state.count                       # pre-increment
    count_inc = optax.safe_int32_increment(count)
    cf = count_inc.astype(jnp.float32)
    c1 = 1.0 - jnp.asarray(b1, jnp.float32) ** cf
    c2 = 1.0 - jnp.asarray(b2, jnp.float32) ** cf
    # optax.adam(learning_rate=schedule) evaluates the schedule at the
    # scale_by_schedule state's PRE-increment count, which equals the
    # adam count (both start at 0 and step together)
    lr = schedule_fn(count)

    def leaf(p, e, m, v, g):
        g = g.astype(m.dtype)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        upd = (lr * (m / c1) / (jnp.sqrt(v / c2) + eps)).astype(p.dtype)
        p = p - upd
        e = ema_decay * e + (1.0 - ema_decay) * p
        return (p, e, m, v)

    packed = jax.tree_util.tree_map(leaf, params, ema_params,
                                    adam_state.mu, adam_state.nu, grads)
    is_pack = lambda x: isinstance(x, tuple)  # noqa: E731
    pick = lambda i: jax.tree_util.tree_map(   # noqa: E731
        lambda t: t[i], packed, is_leaf=is_pack)
    new_params, new_ema, new_mu, new_nu = (pick(0), pick(1), pick(2),
                                           pick(3))
    new_adam = adam_state._replace(count=count_inc, mu=new_mu, nu=new_nu)
    rest = tuple(
        s._replace(count=optax.safe_int32_increment(s.count))
        if hasattr(s, "count") else s
        for s in opt_state[1:])
    return new_params, new_ema, (new_adam,) + rest
