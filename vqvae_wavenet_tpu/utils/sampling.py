"""Host-side sampling twins of the reference's utils.py:13-46.

The production path samples ON DEVICE inside the generation scan
(generation/fast.py); these numpy versions exist for API parity and for
testing that the on-device categorical matches the reference's
cumsum/searchsorted sampling distribution.
"""
from __future__ import annotations

import numpy as np

from vqvae_wavenet_tpu.ops.mu_law import mu_law_decode_np


def sample(pdf, quantization_channels: int = 256, rng=None):
    """Sample from per-row pdfs [b, Q] -> mu-law-decoded floats [b]
    (utils.py:13-27)."""
    rng = rng or np.random.default_rng()
    cdf = np.cumsum(pdf, axis=1)
    batch_size = cdf.shape[0]
    sample_prob = rng.random(batch_size)
    pred = np.zeros(batch_size, dtype=np.float32)
    for i, prob in enumerate(sample_prob):
        pred[i] = cdf[i].searchsorted(prob)
    return mu_law_decode_np(pred, quantization_channels)


def decode(predictions, mode: str = "sample", quantization_channels: int = 256,
           rng=None):
    """'sample' or 'greedy' decode of prediction pdfs (utils.py:30-46)."""
    if mode == "sample":
        return sample(predictions, quantization_channels, rng)
    if mode == "greedy":
        pred = np.argmax(predictions, axis=-1)
        return mu_law_decode_np(pred, quantization_channels)
    raise NotImplementedError(f"decode mode {mode} not implemented")
