"""THE key equivalence guarantee (SURVEY.md §4): fast-generation logits must
match the teacher-forced training graph numerically.  The reference only
guarantees this via shared variable scopes; here both paths consume the same
params pytree and we assert it."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params, wavenet_forward
from vqvae_wavenet_tpu.generation.fast import (
    init_gen_state, gen_step, generate, teacher_forced_stepper)


def tiny_cfg(**kw):
    base = dict(
        quantization_channels=32,
        num_cycles=2, num_cycle_layers=3, dilation_rates=[1, 2, 4, 1, 2, 4],
        kernel_size=3, dilation_filters=8, skip_filters=12,
        residual_filters=10, preprocess_kernel_size=4, preprocess_filters=10)
    base.update(kw)
    return WavenetConfig(**base)


def test_fastgen_matches_teacher_forcing(key):
    cfg = tiny_cfg()
    B, T, S, C = 2, 32, 4, 5
    params = init_wavenet_params(key, cfg, lc_channels=C)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, S, C))

    ref_logits, _ = wavenet_forward(params, cfg, x, lc)
    ref_logits = np.asarray(ref_logits).reshape(B, T, -1)
    fast_logits = np.asarray(teacher_forced_stepper(params, cfg, x, lc))

    np.testing.assert_allclose(ref_logits, fast_logits, rtol=1e-4, atol=1e-4)


def test_fastgen_matches_with_kernel_size_2(key):
    cfg = tiny_cfg(kernel_size=2, preprocess_kernel_size=2)
    B, T, S, C = 1, 24, 3, 4
    params = init_wavenet_params(key, cfg, lc_channels=C)
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(4), (B, S, C))
    ref_logits, _ = wavenet_forward(params, cfg, x, lc)
    np.testing.assert_allclose(
        np.asarray(ref_logits).reshape(B, T, -1),
        np.asarray(teacher_forced_stepper(params, cfg, x, lc)),
        rtol=1e-4, atol=1e-4)


def test_gen_state_footprint():
    cfg = WavenetConfig()  # shipped config
    state = init_gen_state(cfg, batch_size=1)
    # one uniform ring buffer [L, (K-1)*max_d, B, R] covers the reference's
    # 6,169 FIFO slots of history (SURVEY.md §2a)
    assert state["bufs"].shape == (30, 2 * 512, 1, 256)
    assert state["pre_buf"].shape == (32, 1, 1)
    assert (cfg.kernel_size - 1) * max(cfg.dilation_rates) >= max(
        (cfg.kernel_size - 1) * d for d in cfg.dilation_rates)


def test_generate_shapes_and_determinism(key):
    cfg = tiny_cfg()
    B, S, C = 2, 4, 5
    params = init_wavenet_params(key, cfg, lc_channels=C)
    lc = jax.random.normal(jax.random.PRNGKey(5), (B, S, C))
    wav = generate(params, cfg, lc, length=32, key=jax.random.PRNGKey(6))
    assert wav.shape == (B, 32)
    w = np.asarray(wav)
    assert np.isfinite(w).all() and np.abs(w).max() <= 1.0
    # greedy is deterministic
    g1 = np.asarray(generate(params, cfg, lc, length=32, mode="greedy"))
    g2 = np.asarray(generate(params, cfg, lc, length=32, mode="greedy"))
    np.testing.assert_array_equal(g1, g2)
    # sampling with different keys differs
    w2 = np.asarray(generate(params, cfg, lc, length=32,
                             key=jax.random.PRNGKey(7)))
    assert not np.array_equal(w, w2)


def test_generate_rejects_bad_args(key):
    cfg = tiny_cfg()
    params = init_wavenet_params(key, cfg, lc_channels=3)
    lc = jnp.zeros((1, 4, 3))
    with pytest.raises(NotImplementedError):
        generate(params, cfg, lc, length=32, mode="banana")
    with pytest.raises(AssertionError):
        generate(params, cfg, lc, length=33)
