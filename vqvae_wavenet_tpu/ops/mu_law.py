"""Mu-law companding codec.

Matches the numerics of the reference implementation
(/root/reference/mu_law_ops.py:5-31) exactly, including the `+0.5`
flooring-to-rounding trick when quantizing to integer bins
(mu_law_ops.py:11) — this is what makes reconstruction NLL comparable.

All functions are pure jnp and safe under jit/vmap/pjit; numpy twins are
provided for host-side decode paths (file writing), mirroring
mu_law_decode_np (mu_law_ops.py:26-31).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mu_law_encode(x, quantization_channels: int = 256, to_int: bool = False,
                  one_hot: bool = False):
    """Compand float waveform in [-1, 1] to mu-law.

    Returns float in [-1, 1] by default; int bins in [0, mu] when
    ``to_int``; one-hot of depth ``quantization_channels`` when ``one_hot``
    (squeezing the second-to-last singleton axis like the reference does for
    [..., 1] channel inputs).
    """
    mu = float(quantization_channels - 1)
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    if to_int or one_hot:
        # [-1, 1] float -> [0, mu] int; +0.5 because the cast floors.
        y = ((y + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)
        if one_hot:
            import jax
            y = jax.nn.one_hot(y, quantization_channels, dtype=jnp.float32)
            y = jnp.squeeze(y, axis=-2)
    return y


def mu_law_decode(y, quantization_channels: int = 256):
    """Expand mu-law int bins [0, mu] (or float) back to waveform [-1, 1]."""
    mu = float(quantization_channels - 1)
    y = (2.0 * y.astype(jnp.float32) / mu) - 1.0
    x = jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu
    # f32 pow overshoots the extremes by ~1e-6; keep outputs in [-1, 1]
    return jnp.clip(x, -1.0, 1.0)


def mu_law_encode_np(x, quantization_channels: int = 256, to_int: bool = False):
    mu = np.float32(quantization_channels - 1)
    x = np.clip(np.asarray(x, dtype=np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    if to_int:
        y = ((y + 1.0) / 2.0 * mu + 0.5).astype(np.int32)
    return y


def mu_law_decode_np(y, quantization_channels: int = 256):
    mu = np.float32(quantization_channels - 1)
    y = (2.0 * np.asarray(y, dtype=np.float32) / mu) - 1.0
    return np.sign(y) * ((1.0 + mu) ** np.abs(y) - 1.0) / mu
