"""Encoder families: shapes, downsample rates, Magenta causality,
BatchNorm train/eval behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.models.encoders import (
    init_encoder, encoder_forward, encoder_downsample_rate,
    init_batch_norm, batch_norm)


def test_encoder_64_shapes(key):
    params, state = init_encoder(key, "64", latent_dim=8)
    x = jax.random.uniform(key, (2, 256, 1), minval=-1, maxval=1)
    z, new_state = encoder_forward("64", params, state, x, train=True)
    assert z.shape == (2, 4, 8)  # 256 / 2^6
    assert encoder_downsample_rate("64") == 64
    # BN state updated in train mode
    assert not np.allclose(np.asarray(new_state["bn"][0]["mean"]),
                           np.asarray(state["bn"][0]["mean"]))
    # eval mode leaves state alone
    z2, eval_state = encoder_forward("64", params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(eval_state["bn"][0]["mean"]),
                                  np.asarray(state["bn"][0]["mean"]))


def test_encoder_64_group_norm(key):
    params, state = init_encoder(key, "64", latent_dim=8)
    x = jax.random.uniform(key, (2, 256, 1), minval=-1, maxval=1)
    z, _ = encoder_forward("64", params, state, x, train=True, norm="group")
    assert z.shape == (2, 4, 8)
    assert np.isfinite(np.asarray(z)).all()


def test_encoder_magenta_shapes_and_causality(key):
    params, state = init_encoder(key, "Magenta", latent_dim=8)
    x = jax.random.uniform(key, (1, 256, 1), minval=-1, maxval=1)
    z, _ = encoder_forward("Magenta", params, state, x, train=True)
    assert z.shape == (1, 4, 8)
    # causal + shift_right: latent frame s depends only on x[< s*64 + 1]?
    # More conservative: changing the tail of x must not change early frames.
    x2 = x.at[:, 192:, :].set(0.9)
    z2, _ = encoder_forward("Magenta", params, state, x2, train=True)
    np.testing.assert_allclose(np.asarray(z)[:, :2], np.asarray(z2)[:, :2],
                               atol=1e-5)


def test_encoder_2019_shapes(key):
    params, state = init_encoder(key, "2019", latent_dim=8)
    # T = 6400 -> 40 mfcc frames -> 20 latent frames (320x)
    x = jax.random.uniform(key, (1, 6400, 1), minval=-1, maxval=1)
    z, _ = encoder_forward("2019", params, state, x, train=True)
    assert z.shape == (1, 20, 8)
    assert encoder_downsample_rate("2019") == 320
    assert np.isfinite(np.asarray(z)).all()


def test_batch_norm_normalizes(key):
    params, state = init_batch_norm(4)
    x = 3.0 + 2.0 * jax.random.normal(key, (8, 100, 4))
    y, new_state = batch_norm(params, state, x, train=True)
    y = np.asarray(y)
    assert abs(y.mean()) < 1e-2
    assert abs(y.std() - 1.0) < 0.05
    # running stats move toward batch stats
    assert np.all(np.asarray(new_state["mean"]) > 0)


def test_unknown_encoder_raises(key):
    with pytest.raises(NotImplementedError):
        init_encoder(key, "nope", 8)
