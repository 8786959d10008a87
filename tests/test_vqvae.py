"""VQVAE assembly: losses, modes, speaker conditioning, overfit-one-batch."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqvae_wavenet_tpu.config import ModelConfig, WavenetConfig
from vqvae_wavenet_tpu.models.vqvae import (
    init_vqvae, vqvae_forward, vqvae_encode, speaker_vector, time_jitter,
    lc_channels)


def tiny_model_cfg(**kw):
    wn = WavenetConfig(
        quantization_channels=32,
        num_cycles=1, num_cycle_layers=4, dilation_rates=[1, 2, 4, 8],
        kernel_size=2, dilation_filters=8, skip_filters=8,
        residual_filters=8, preprocess_kernel_size=2, preprocess_filters=8)
    base = dict(encoder="64", use_vq=True, speaker_embedding=6, k=16,
                latent_dim=4, beta=0.25, wavenet=wn,
                learning_rate_schedule={0: 1e-3})
    base.update(kw)
    return ModelConfig(**base)


def make_batch(key, B=2, T=128, S=3):
    x = jax.random.uniform(key, (B, T, 1), minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.arange(B) % S, S)[:, None, :]
    return x, y


def test_forward_losses(key):
    cfg = tiny_model_cfg()
    params, state = init_vqvae(key, cfg, num_speakers=3)
    x, y = make_batch(key)
    loss, aux = vqvae_forward(params, state, cfg, x, y, train=True)
    assert np.isfinite(float(loss))
    assert float(aux["vq_loss"]) >= 0
    assert float(aux["commitment_loss"]) >= 0
    assert abs(float(loss) - float(aux["reconstruction_loss"])
               - float(aux["vq_loss"]) - float(aux["commitment_loss"])) < 1e-5
    assert aux["z_e"].shape == (2, 2, 4)
    assert aux["q_z_x"].shape == (2, 2)
    assert 1.0 <= float(aux["perplexity"]) <= 16.0


def test_ae_mode(key):
    cfg = tiny_model_cfg(use_vq=False)
    params, state = init_vqvae(key, cfg, num_speakers=3)
    assert "vq" not in params
    x, y = make_batch(key)
    loss, aux = vqvae_forward(params, state, cfg, x, y, train=True)
    assert "vq_loss" not in aux
    np.testing.assert_array_equal(np.asarray(aux["z_q"]),
                                  np.asarray(aux["z_e"]))


def test_speaker_onehot_mode(key):
    """speaker_embedding = 0 -> raw one-hot is the speaker vector."""
    cfg = tiny_model_cfg(speaker_embedding=0)
    params, state = init_vqvae(key, cfg, num_speakers=3)
    assert "speaker_embedding" not in params
    assert lc_channels(cfg, 3) == 4 + 3
    x, y = make_batch(key)
    loss, _ = vqvae_forward(params, state, cfg, x, y, train=True)
    assert np.isfinite(float(loss))


def test_speaker_argmax_zero_quirk(key):
    """All-zero one-hot selects embedding row 0 (generate.py 'None' path)."""
    cfg = tiny_model_cfg()
    params, _ = init_vqvae(key, cfg, num_speakers=3)
    y_none = jnp.zeros((1, 1, 3))
    y_zero = jax.nn.one_hot(jnp.zeros((1, 1), jnp.int32), 3)
    np.testing.assert_array_equal(
        np.asarray(speaker_vector(params, cfg, y_none)),
        np.asarray(speaker_vector(params, cfg, y_zero)))


def test_time_jitter(key):
    lc = jnp.arange(2 * 32 * 3, dtype=jnp.float32).reshape(2, 32, 3)
    out = time_jitter(lc, key)
    assert out.shape == lc.shape
    # each output frame is one of {left, self, right}
    lcn, on = np.asarray(lc), np.asarray(out)
    for b in range(2):
        for t in range(32):
            cands = [lcn[b, max(t - 1, 0)], lcn[b, t],
                     lcn[b, min(t + 1, 31)], lcn[b, min(t + 2, 31)],
                     lcn[b, max(t - 2, 0)]]
            assert any(np.allclose(on[b, t], c) for c in cands)


def test_vqvae_encode(key):
    cfg = tiny_model_cfg()
    params, state = init_vqvae(key, cfg, num_speakers=3)
    x, y = make_batch(key)
    lc, codes = vqvae_encode(params, state, cfg, x, y)
    assert lc.shape == (2, 2, 4 + 6)
    assert codes.shape == (2, 2)


def test_overfit_one_batch(key):
    """End-to-end: loss must drop substantially when overfitting one batch
    (SURVEY.md §4 integration test)."""
    cfg = tiny_model_cfg()
    params, state = init_vqvae(key, cfg, num_speakers=3)
    x, y = make_batch(jax.random.PRNGKey(7), B=2, T=64)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, state, opt_state):
        (loss, aux), grads = jax.value_and_grad(
            vqvae_forward, has_aux=True)(params, state, cfg, x, y, train=True)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, aux["state"], opt_state, loss

    losses = []
    for _ in range(100):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[::20]


def test_2019_encoder_joint_vq_assembly(key):
    """BASELINE config #4: 2019 encoder + joint codebook training."""
    cfg = tiny_model_cfg(encoder="2019", vq_mode="joint")
    params, state = init_vqvae(key, cfg, num_speakers=3)
    B, T = 1, 640  # 640 -> 4 mfcc frames -> 2 latent frames; 640/2=320/frame
    x = jax.random.uniform(key, (B, T, 1), minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 3)[:, None, :]
    (loss, aux), grads = jax.value_and_grad(
        vqvae_forward, has_aux=True)(params, state, cfg, x, y, train=True)
    assert np.isfinite(float(loss))
    assert aux["z_e"].shape == (1, 2, 4)
    # joint mode: the codebook receives reconstruction gradients
    assert float(jnp.abs(grads["vq"]["embedding"]).max()) > 0


def test_magenta_encoder_vqvae_assembly(key):
    """BASELINE config #3: Magenta/nsynth ENCODER variant in the main
    VQ-VAE (separate z_e / e_k training, default ST mode)."""
    cfg = tiny_model_cfg(encoder="Magenta")
    params, state = init_vqvae(key, cfg, num_speakers=3)
    x, y = make_batch(key, T=128)
    loss, aux = vqvae_forward(params, state, cfg, x, y, train=True)
    assert np.isfinite(float(loss))
    assert aux["z_e"].shape == (2, 2, 4)  # 128 / 64
