"""Native C++ data loader: wav parsing parity with scipy, batch production,
normalization semantics."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

from vqvae_wavenet_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.native_available(),
                                reason="g++ unavailable")


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    files, speakers = [], []
    for spk in range(2):
        for i in range(2):
            wav = (rng.uniform(-0.5, 0.5, 8000) * 32767).astype(np.int16)
            p = str(tmp_path / f"s{spk}_{i}.wav")
            wavfile.write(p, 16000, wav)
            files.append(p)
            speakers.append(spk)
    return files, speakers


def test_wav_parse_matches_scipy(corpus):
    files, _ = corpus
    native = nl.read_wav_native(files[0])
    _, raw = wavfile.read(files[0])
    expect = (raw.astype(np.float32) + 0.5) / 32767.5
    np.testing.assert_allclose(native, expect, atol=1e-7)


def test_batches(corpus):
    files, speakers = corpus
    loader = nl.NativeLoader(files, speakers, num_speakers=2, batch_size=4,
                             max_len=2048, num_threads=2, seed=7)
    try:
        for _ in range(3):
            b = loader.next()
            assert b["x"].shape == (4, 2048, 1)
            assert b["x"].dtype == np.float32
            assert np.abs(b["x"]).max() <= 1.0
            assert np.abs(b["x"]).max() > 0  # real audio, not zeros
            assert b["y"].shape == (4, 1, 2)
            np.testing.assert_allclose(b["y"].sum(-1), 1.0)
    finally:
        loader.stop()


def test_short_file_zero_padded(tmp_path):
    wav = (np.ones(100) * 1000).astype(np.int16)
    p = str(tmp_path / "short.wav")
    wavfile.write(p, 16000, wav)
    loader = nl.NativeLoader([p], [0], num_speakers=1, batch_size=1,
                             max_len=512, num_threads=1, seed=0)
    try:
        b = loader.next()
        x = b["x"][0, :, 0]
        assert np.abs(x[:100]).max() > 0
        np.testing.assert_array_equal(x[100:], 0.0)
    finally:
        loader.stop()


def test_non_wav_returns_none(tmp_path):
    p = str(tmp_path / "not_a_wav.wav")
    with open(p, "wb") as f:
        f.write(b"garbage data not riff")
    assert nl.read_wav_native(p) is None
