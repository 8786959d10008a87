"""WaveNet forward: shapes, receptive field, teacher-forcing causality,
conditioning plumbing, loss sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import (
    init_wavenet_params, wavenet_forward, wavenet_loss)


def tiny_cfg(**kw):
    base = dict(
        quantization_channels=64,
        num_cycles=2, num_cycle_layers=3,
        dilation_rates=[1, 2, 4, 1, 2, 4],
        kernel_size=3,
        dilation_filters=8, skip_filters=12, residual_filters=10,
        preprocess_kernel_size=4, preprocess_filters=10,
    )
    base.update(kw)
    return WavenetConfig(**base)


def test_receptive_field_formula():
    cfg = WavenetConfig()  # shipped config
    assert cfg.receptive_field == 6170  # wavenet.py:16-17 for shipped JSON
    assert tiny_cfg().receptive_field == 14 * 2 + 1 + 3


def test_forward_shapes(key):
    cfg = tiny_cfg()
    B, T = 2, 32
    params = init_wavenet_params(key, cfg, lc_channels=5)
    x = jax.random.uniform(key, (B, T, 1), minval=-1, maxval=1)
    lc = jax.random.normal(key, (B, 4, 5))
    logits, labels = wavenet_forward(params, cfg, x, lc)
    assert logits.shape == (B * T, 64)
    assert labels.shape == (B * T,)
    assert labels.dtype == jnp.int32
    loss = wavenet_loss(logits, labels)
    assert np.isfinite(float(loss))
    # random init: loss near log(Q)
    assert abs(float(loss) - np.log(64)) < 1.0


def test_teacher_forcing_causality(key):
    """logits at time t may depend only on inputs[< t] (inputs are
    shift-righted internally) and any condition."""
    cfg = tiny_cfg()
    B, T = 1, 32
    params = init_wavenet_params(key, cfg, lc_channels=None)
    x = jax.random.uniform(key, (B, T, 1), minval=-1, maxval=1)
    logits, _ = wavenet_forward(params, cfg, x)
    logits = np.asarray(logits).reshape(B, T, -1)
    t = 13
    x2 = x.at[:, t:, :].set(0.5)
    logits2, _ = wavenet_forward(params, cfg, x2)
    logits2 = np.asarray(logits2).reshape(B, T, -1)
    np.testing.assert_allclose(logits[:, :t + 1], logits2[:, :t + 1],
                               rtol=1e-4, atol=1e-4)
    # and t+1 onwards DOES change (x[t] feeds logits[t+1])
    assert not np.allclose(logits[:, t + 1], logits2[:, t + 1])


def test_local_condition_affects_block(key):
    cfg = tiny_cfg()
    B, T, S, C = 1, 32, 4, 6
    params = init_wavenet_params(key, cfg, lc_channels=C)
    x = jax.random.uniform(key, (B, T, 1), minval=-1, maxval=1)
    lc = jnp.zeros((B, S, C))
    logits, _ = wavenet_forward(params, cfg, x, lc)
    lc2 = lc.at[:, 2, :].set(1.0)  # frame 2 conditions samples [16, 24)
    logits2, _ = wavenet_forward(params, cfg, x, lc2)
    d = np.abs(np.asarray(logits - logits2)).reshape(T, -1).max(-1)
    assert (d[:16] < 1e-5).all()      # causal: before frame 2's block
    assert d[16:24].max() > 1e-4      # inside the block


def test_global_condition_param_plumbing(key):
    cfg = tiny_cfg()
    params = init_wavenet_params(key, cfg, lc_channels=4, gc_channels=3)
    assert "gc_kernel" in params["layers"]
    assert params["layers"]["gc_kernel"].shape == (6, 3, 2 * 8)
    x = jnp.zeros((2, 32, 1))
    lc = jnp.zeros((2, 4, 4))
    gc = jnp.ones((2, 1, 3))
    logits, _ = wavenet_forward(params, cfg, x, lc, gc)
    logits0, _ = wavenet_forward(params, cfg, x, lc, jnp.zeros((2, 1, 3)))
    assert not np.allclose(np.asarray(logits), np.asarray(logits0))


def test_grads_flow_everywhere(key):
    cfg = tiny_cfg()
    B, T = 2, 32
    params = init_wavenet_params(key, cfg, lc_channels=5)
    x = jax.random.uniform(key, (B, T, 1), minval=-1, maxval=1)
    lc = jax.random.normal(key, (B, 4, 5))

    def loss_fn(p):
        logits, labels = wavenet_forward(p, cfg, x, lc)
        return wavenet_loss(logits, labels)

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    for g in flat:
        assert np.isfinite(np.asarray(g)).all()
    # every kernel receives some gradient
    assert float(jnp.abs(grads["preprocess"]["kernel"]).max()) > 0
    assert float(jnp.abs(grads["layers"]["kernel"]).max()) > 0
    assert float(jnp.abs(grads["layers"]["lc_kernel"]).max()) > 0
    assert float(jnp.abs(grads["postprocess2"]["kernel"]).max()) > 0


def test_nonperiodic_dilations_fallback(key):
    """A dilation list that is NOT cycle-periodic must use the traced-
    dilation tap path and still match the generation stepper."""
    from vqvae_wavenet_tpu.models.wavenet import _cycle_pattern
    from vqvae_wavenet_tpu.generation.fast import teacher_forced_stepper
    cfg = tiny_cfg(dilation_rates=[1, 2, 4, 4, 2, 1])  # palindrome: aperiodic
    assert _cycle_pattern(cfg) is None
    B, T, C = 1, 32, 4
    params = init_wavenet_params(key, cfg, lc_channels=C)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, 4, C))
    ref, _ = wavenet_forward(params, cfg, x, lc)
    fast = teacher_forced_stepper(params, cfg, x, lc)
    np.testing.assert_allclose(np.asarray(ref).reshape(B, T, -1),
                               np.asarray(fast), rtol=1e-4, atol=1e-4)
