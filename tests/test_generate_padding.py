"""Compile-bucket padding must not change the kept samples (VERDICT r4 #4).

The reference truncates the conditioning wav to //512*512 and generates
exactly that many samples (generate.py:36-44).  This repo additionally pads
generation length up to a compile bucket; round 5 moved the padding from
the WAV (whose zero tail leaked into the last latent frames through the
non-causal encoders) to the LOCAL CONDITION: the encoder sees only the
exact wav and the lc is zero-padded, so sample t < length reads frame
t // ratio from the unpadded encode and the kept region is bit-identical
to an exact-length run.  These tests pin that identity for both engines.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params
from vqvae_wavenet_tpu.generation.fast import generate


def tiny_cfg():
    return WavenetConfig(
        quantization_channels=32,
        num_cycles=2, num_cycle_layers=3, dilation_rates=[1, 2, 4, 1, 2, 4],
        kernel_size=2, dilation_filters=8, skip_filters=16,
        residual_filters=8, preprocess_kernel_size=4, preprocess_filters=8)


@pytest.mark.parametrize("mode", ["greedy", "sample"])
def test_padded_bucket_matches_exact_length(mode):
    """generate() at a padded length with zero-padded lc frames returns the
    exact-length waveform bit-for-bit on the kept prefix (XLA engine)."""
    cfg = tiny_cfg()
    B, length, ratio, C = 2, 128, 64, 6
    padded = 256
    params = init_wavenet_params(jax.random.PRNGKey(0), cfg, lc_channels=C)
    lc = jax.random.normal(jax.random.PRNGKey(1), (B, length // ratio, C))

    key = jax.random.PRNGKey(7)
    exact = np.asarray(generate(params, cfg, lc, length=length, key=key,
                                mode=mode, engine="xla"))
    lc_pad = jnp.pad(lc, ((0, 0), (0, (padded - length) // ratio), (0, 0)))
    bucketed = np.asarray(generate(params, cfg, lc_pad, length=padded,
                                   key=key, mode=mode, engine="xla"))
    np.testing.assert_array_equal(exact, bucketed[:, :length])


def test_padded_bucket_matches_exact_length_pallas():
    """Same identity through the fused Pallas generation kernel
    (interpret mode off-TPU).  128-aligned channels for eligibility."""
    cfg = WavenetConfig(
        quantization_channels=256,
        num_cycles=1, num_cycle_layers=3, dilation_rates=[1, 2, 4],
        kernel_size=2, dilation_filters=128, skip_filters=128,
        residual_filters=128, preprocess_kernel_size=2,
        preprocess_filters=128)
    B, length, ratio, C = 1, 128, 64, 128
    padded = 192
    params = init_wavenet_params(jax.random.PRNGKey(0), cfg, lc_channels=C)
    lc = jax.random.normal(jax.random.PRNGKey(1), (B, length // ratio, C))
    key = jax.random.PRNGKey(7)
    exact = np.asarray(generate(params, cfg, lc, length=length, key=key,
                                mode="greedy", engine="pallas",
                                compute_dtype=jnp.bfloat16))
    lc_pad = jnp.pad(lc, ((0, 0), (0, (padded - length) // ratio), (0, 0)))
    bucketed = np.asarray(generate(params, cfg, lc_pad, length=padded,
                                   key=key, mode="greedy", engine="pallas",
                                   compute_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(exact, bucketed[:, :length])


@pytest.mark.slow
def test_magenta_generate_pads_latents_not_wav():
    """magenta_generate(length > wav length) must equal the exact-length
    call on the kept prefix — the encoder never sees padding."""
    from vqvae_wavenet_tpu.models.magenta import (
        init_magenta_params, magenta_generate)
    B, T = 1, 128
    params = init_magenta_params(jax.random.PRNGKey(0), num_speakers=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 4)[:, None, :]
    key = jax.random.PRNGKey(3)
    exact = np.asarray(magenta_generate(params, x, y, length=T, key=key,
                                        mode="greedy", engine="xla"))
    padded = np.asarray(magenta_generate(params, x, y, length=T + 64,
                                         key=key, mode="greedy",
                                         engine="xla"))
    np.testing.assert_array_equal(exact, padded[:, :T])
