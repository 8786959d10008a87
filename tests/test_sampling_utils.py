"""Host-side sampling twins (utils.py:13-46 semantics)."""
import numpy as np
import pytest

from vqvae_wavenet_tpu.utils.sampling import sample, decode


def test_greedy_decode():
    pdf = np.zeros((2, 256), np.float32)
    pdf[0, 128] = 1.0   # bin 128 = mu-law zero
    pdf[1, 255] = 1.0
    out = decode(pdf, mode="greedy")
    assert abs(out[0]) < 1e-3            # decode(128) ~ +8.6e-5 (near zero)
    assert abs(out[1] - 1.0) < 1e-6


def test_sample_follows_pdf():
    rng = np.random.default_rng(0)
    pdf = np.zeros((512, 256), np.float32)
    pdf[:, 10] = 0.5
    pdf[:, 200] = 0.5
    out = sample(pdf, rng=rng)
    # decoded values cluster at the two bins' decode values
    lo = (out < 0).mean()
    assert 0.35 < lo < 0.65
    assert np.isfinite(out).all()


def test_unknown_mode_raises():
    with pytest.raises(NotImplementedError):
        decode(np.ones((1, 256)) / 256, mode="banana")
