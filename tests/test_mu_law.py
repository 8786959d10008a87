"""Mu-law codec numerics: round-trip, +0.5 rounding semantics, clipping.

Guards the exact bin semantics of the reference (mu_law_ops.py:5-31); the
+0.5-then-floor quantization is what makes recon NLL comparable.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.ops.mu_law import (
    mu_law_encode, mu_law_decode, mu_law_encode_np, mu_law_decode_np)


def test_roundtrip_float():
    """The float companding curve is invertible.  (mu_law_decode itself
    expects INT BINS, matching the reference — mu_law_ops.py:18-23 — so the
    inverse of the float encode is applied manually here.)"""
    x = jnp.linspace(-1, 1, 1001)
    y = np.asarray(mu_law_encode(x))
    mu = 255.0
    x2 = np.sign(y) * ((1 + mu) ** np.abs(y) - 1) / mu
    np.testing.assert_allclose(x2, np.asarray(x), atol=1e-5)


def test_int_roundtrip_exact_at_extremes():
    bins = mu_law_encode(jnp.asarray([-1.0, 0.0, 1.0]), to_int=True)
    x2 = np.asarray(mu_law_decode(bins))
    np.testing.assert_allclose(x2, [-1.0, 2 / 255 * (256 ** (1 / 255) - 1) / 1,
                                    1.0], atol=3e-2)
    np.testing.assert_allclose(x2[[0, 2]], [-1.0, 1.0], atol=1e-6)


def test_int_quantization_rounding():
    # x = 0 encodes to y = 0.0 -> bin floor((0+1)/2*255 + 0.5) = 128
    assert int(mu_law_encode(jnp.zeros(()), to_int=True)) == 128
    # extremes map to 0 and 255
    assert int(mu_law_encode(jnp.array(-1.0), to_int=True)) == 0
    assert int(mu_law_encode(jnp.array(1.0), to_int=True)) == 255
    # out-of-range input is clipped first
    assert int(mu_law_encode(jnp.array(3.0), to_int=True)) == 255
    assert int(mu_law_encode(jnp.array(-3.0), to_int=True)) == 0


def test_int_roundtrip_quantization_error_bounded():
    x = np.random.default_rng(0).uniform(-1, 1, size=4096).astype(np.float32)
    bins = mu_law_encode(jnp.asarray(x), to_int=True)
    x2 = np.asarray(mu_law_decode(bins))
    # mu-law quantization error: fine near 0, coarser near +-1
    assert np.max(np.abs(x - x2)) < 0.04
    assert np.mean(np.abs(x - x2)) < 0.006


def test_one_hot_shape_and_squeeze():
    x = jnp.zeros((2, 16, 1))
    oh = mu_law_encode(x, one_hot=True)
    # [B, T, 1] -> one_hot [B, T, 1, Q] -> squeeze axis -2 -> [B, T, Q]
    assert oh.shape == (2, 16, 256)
    assert float(oh.sum()) == 2 * 16


def test_monotone_bins():
    x = jnp.linspace(-1, 1, 513)
    bins = np.asarray(mu_law_encode(x, to_int=True))
    assert (np.diff(bins) >= 0).all()


def test_numpy_twins_match_jax():
    x = np.random.default_rng(1).uniform(-1.2, 1.2, size=512).astype(np.float32)
    np.testing.assert_allclose(
        mu_law_encode_np(x), np.asarray(mu_law_encode(jnp.asarray(x))),
        atol=1e-6)
    np.testing.assert_array_equal(
        mu_law_encode_np(x, to_int=True),
        np.asarray(mu_law_encode(jnp.asarray(x), to_int=True)))
    bins = mu_law_encode_np(x, to_int=True)
    np.testing.assert_allclose(
        mu_law_decode_np(bins), np.asarray(mu_law_decode(jnp.asarray(bins))),
        atol=1e-6)


@pytest.mark.parametrize("q", [64, 256])
def test_alt_quantization_channels(q):
    x = jnp.linspace(-1, 1, 257)
    bins = np.asarray(mu_law_encode(x, quantization_channels=q, to_int=True))
    assert bins.min() == 0 and bins.max() == q - 1
