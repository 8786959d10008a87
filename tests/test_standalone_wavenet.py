"""Standalone WaveNet trainer (reference wavenet.py:175-198 path) and the
Magenta-variant fast-generation parity."""
import jax
import jax.numpy as jnp
import numpy as np

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import (
    init_wavenet_params, wavenet_forward, make_standalone_trainer)
from vqvae_wavenet_tpu.generation.fast import teacher_forced_stepper
from vqvae_wavenet_tpu.training.optimizer import WAVENET_STANDALONE_SCHEDULE


def tiny_cfg(**kw):
    base = dict(
        quantization_channels=32, num_cycles=1, num_cycle_layers=3,
        dilation_rates=[1, 2, 4], kernel_size=2, dilation_filters=8,
        skip_filters=8, residual_filters=8, preprocess_kernel_size=2,
        preprocess_filters=8)
    base.update(kw)
    return WavenetConfig(**base)


def test_standalone_trainer_losses_decrease(key):
    cfg = tiny_cfg()
    init_fn, step_fn = make_standalone_trainer(cfg, schedule={0: 3e-3})
    state = init_fn(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 1),
                           minval=-0.5, maxval=0.5)
    losses = []
    for _ in range(80):
        state, m = step_fn(state, x)
        losses.append(float(m["loss"]))
    assert int(state["step"]) == 80
    assert losses[-1] < losses[0] * 0.8, losses[::20]
    assert abs(float(m["lr"]) - 3e-3) < 1e-9


def test_standalone_default_schedule():
    assert WAVENET_STANDALONE_SCHEDULE[0] == 4e-4  # wavenet.py:181-188
    assert WAVENET_STANDALONE_SCHEDULE[200000] == 2e-5


def test_magenta_gate_order_fastgen_parity(key):
    """Fast generation must match teacher forcing for the Magenta variant
    too (sigmoid-first gating + biased per-layer gc folded into lc here)."""
    cfg = tiny_cfg(kernel_size=2, preprocess_kernel_size=2)
    B, T, S, C = 1, 24, 3, 4
    params = init_wavenet_params(key, cfg, lc_channels=C)
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(4), (B, S, C))
    ref_logits, _ = wavenet_forward(params, cfg, x, lc,
                                    gate_order="sigmoid_first")
    fast = teacher_forced_stepper(params, cfg, x, lc,
                                  gate_order="sigmoid_first")
    np.testing.assert_allclose(np.asarray(ref_logits).reshape(B, T, -1),
                               np.asarray(fast), rtol=1e-4, atol=1e-4)
    # and it genuinely differs from tanh-first
    tanh_logits, _ = wavenet_forward(params, cfg, x, lc)
    assert not np.allclose(np.asarray(ref_logits), np.asarray(tanh_logits))
