"""MFCC front end vs TensorFlow golden (tf.signal is the semantics the
reference's encoder_ops.py:14-43 relies on), plus pool1d."""
import numpy as np
import jax.numpy as jnp
import pytest

from vqvae_wavenet_tpu.ops.signal import (
    linear_to_mel_weight_matrix, stft_magnitude, mfcc, pool1d)

tf = pytest.importorskip("tensorflow")


def test_mel_matrix_matches_tf():
    mine = linear_to_mel_weight_matrix()
    theirs = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=80, num_spectrogram_bins=201, sample_rate=16000,
        lower_edge_hertz=20.0, upper_edge_hertz=8000.0).numpy()
    np.testing.assert_allclose(mine, theirs, atol=2e-5)


def test_stft_matches_tf():
    rng = np.random.default_rng(0)
    wav = rng.uniform(-1, 1, size=(2, 4000)).astype(np.float32)
    mine = np.asarray(stft_magnitude(jnp.asarray(wav)))
    theirs = tf.abs(tf.signal.stft(
        wav, frame_length=400, frame_step=160, fft_length=400,
        window_fn=tf.signal.hann_window, pad_end=True)).numpy()
    assert mine.shape == theirs.shape
    np.testing.assert_allclose(mine, theirs, atol=2e-3)


def test_mfcc_matches_tf():
    rng = np.random.default_rng(1)
    wav = rng.uniform(-1, 1, size=(2, 3200)).astype(np.float32)
    mine = np.asarray(mfcc(jnp.asarray(wav)))

    stft = tf.abs(tf.signal.stft(wav, frame_length=400, frame_step=160,
                                 fft_length=400,
                                 window_fn=tf.signal.hann_window,
                                 pad_end=True))
    mel_m = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=80, num_spectrogram_bins=201, sample_rate=16000,
        lower_edge_hertz=20.0, upper_edge_hertz=8000.0)
    feat = tf.tensordot(stft, mel_m, 1)
    feat = tf.math.log(feat + 1e-6)
    theirs = tf.signal.mfccs_from_log_mel_spectrograms(feat)[..., :13].numpy()

    assert mine.shape == theirs.shape == (2, 20, 13)
    np.testing.assert_allclose(mine, theirs, atol=5e-3)


def test_pool1d_avg():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
    y = np.asarray(pool1d(x, 2))[0, :, 0]
    np.testing.assert_allclose(y, [0.5, 2.5, 4.5, 6.5])
