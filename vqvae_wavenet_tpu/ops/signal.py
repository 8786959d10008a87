"""Signal-processing front end: STFT -> log-mel -> MFCC, and pool1d.

Reproduces tf.contrib.signal semantics used by Encoder_2019
(/root/reference/Encoder/encoder_ops.py:14-43):
  * 25 ms (400-sample) frames every 10 ms (160 samples), pad_end, periodic
    Hann window, fft_length = frame_length -> 201 magnitude bins;
  * HTK-mel filterbank, 80 bins, 20..8000 Hz, DC row zeroed
    (tf.signal.linear_to_mel_weight_matrix algorithm);
  * log(mel + 1e-6);
  * MFCC = unnormalized DCT-II * rsqrt(2 * num_mel_bins)
    (tf.signal.mfccs_from_log_mel_spectrograms), first 13 coefficients.

Everything is static-shape: the mel and DCT matrices are precomputed numpy
constants, the STFT is an rfft over a framed view — all jit/pjit-safe.

pool1d mirrors Encoder/encoder_ops.py:5-11 (avg-pool with SAME padding).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def linear_to_mel_weight_matrix(num_mel_bins=80, num_spectrogram_bins=201,
                                sample_rate=16000, lower_edge_hertz=20.0,
                                upper_edge_hertz=8000.0):
    """HTK-mel triangular filterbank, matching tf.signal semantics
    (DC spectrogram bin is excluded then re-added as a zero row)."""
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[1:]
    spec_mels = _hz_to_mel(linear_freqs)[:, None]
    band_edges = np.linspace(_hz_to_mel(lower_edge_hertz),
                             _hz_to_mel(upper_edge_hertz),
                             num_mel_bins + 2)
    lower, center, upper = (band_edges[None, :-2], band_edges[None, 1:-1],
                            band_edges[None, 2:])
    lower_slopes = (spec_mels - lower) / (center - lower)
    upper_slopes = (upper - spec_mels) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    return np.pad(weights, [[1, 0], [0, 0]]).astype(np.float32)


def _dct2_matrix(n: int):
    """Unnormalized DCT-II as a matrix: X_k = 2 sum_n x_n cos(pi k (2n+1)/(2N))."""
    k = np.arange(n)[None, :]
    m = np.arange(n)[:, None]
    return (2.0 * np.cos(np.pi * k * (2 * m + 1) / (2.0 * n))).astype(np.float32)


def stft_magnitude(wav, frame_length=400, frame_step=160, pad_end=True):
    """|STFT| with periodic Hann window.  wav: [B, T] -> [B, F, bins]."""
    b, t = wav.shape
    if pad_end:
        num_frames = -(-t // frame_step)  # ceil
        pad = (num_frames - 1) * frame_step + frame_length - t
        wav = jnp.pad(wav, ((0, 0), (0, max(pad, 0))))
    else:
        num_frames = 1 + (t - frame_length) // frame_step
    idx = (np.arange(num_frames)[:, None] * frame_step
           + np.arange(frame_length)[None, :])
    frames = wav[:, idx]  # [B, F, frame_length]
    n = np.arange(frame_length)
    window = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / frame_length)).astype(np.float32)
    return jnp.abs(jnp.fft.rfft(frames * window, axis=-1))


def mfcc(wav, sample_rate=16000, num_mfccs=13, num_mel_bins=80,
         pad_end=True):
    """MFCC features for Encoder_2019 (encoder_ops.py:14-43).

    wav: [B, T] float in [-1, 1] -> [B, ceil(T/160), 13].

    pad_end=False computes 1 + (T - 400)//160 frames with no end padding —
    the SP path (parallel/timeshard.py::time_sharded_encoder_2019) frames a
    halo-extended shard where the global pad_end zeros arrive as the last
    shard's ppermute right halo instead.
    """
    frame_length = int(25 / 1000 * sample_rate)
    frame_step = int(10 / 1000 * sample_rate)
    mag = stft_magnitude(wav, frame_length, frame_step, pad_end=pad_end)
    mel_matrix = jnp.asarray(linear_to_mel_weight_matrix(
        num_mel_bins=num_mel_bins,
        num_spectrogram_bins=frame_length // 2 + 1,
        sample_rate=sample_rate))
    mel = jnp.einsum("bfs,sm->bfm", mag, mel_matrix,
                     preferred_element_type=jnp.float32)
    log_mel = jnp.log(mel + 1e-6)
    dct_m = jnp.asarray(_dct2_matrix(num_mel_bins))
    mfccs = jnp.einsum("bfm,mk->bfk", log_mel, dct_m,
                       preferred_element_type=jnp.float32)
    mfccs = mfccs * (1.0 / np.sqrt(2.0 * num_mel_bins))
    return mfccs[..., :num_mfccs]


def pool1d(x, hop_length: int, mode: str = "avg"):
    """Strided pooling with SAME padding over the time axis.  x: [B, T, C]."""
    if mode == "avg":
        return lax.reduce_window(
            x, 0.0, lax.add,
            window_dimensions=(1, hop_length, 1),
            window_strides=(1, hop_length, 1),
            padding="SAME") / float(hop_length)
    if mode == "max":
        return lax.reduce_window(
            x, -jnp.inf, lax.max,
            window_dimensions=(1, hop_length, 1),
            window_strides=(1, hop_length, 1),
            padding="SAME")
    raise ValueError(mode)
