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


# ---- make_input_pipeline dispatch (train.py -loader {auto,python,native})


def _vctk_layout(tmp_path, sample_rate):
    from vqvae_wavenet_tpu.data.datasets import VCTK  # noqa: F401
    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    files = []
    for spk in ("p225", "p226"):
        d = root / "VCTK-Corpus" / "wav48" / spk
        d.mkdir(parents=True)
        wav = (rng.uniform(-0.5, 0.5, sample_rate) * 32767).astype(np.int16)
        wavfile.write(str(d / f"{spk}_000.wav"), sample_rate, wav)
        files.append(f"{spk}/{spk}_000.wav")
    info = root / "vctk_info"
    info.mkdir()
    (info / "vctk_train.txt").write_text("\n".join(files) + "\n")
    (info / "vctk_speakers.txt").write_text("p225, 0\np226, 1\n")
    return str(root) + "/"


def test_factory_auto_picks_native_on_16k(tmp_path):
    from vqvae_wavenet_tpu.data.datasets import make_input_pipeline
    root = _vctk_layout(tmp_path, 16000)
    pipe = make_input_pipeline("VCTK", batch_size=2, max_len=1024,
                               relative_path=root, loader="auto")
    try:
        assert isinstance(pipe, nl.NativeLoader)
        b = pipe.next()
        assert b["x"].shape == (2, 1024, 1)
        assert b["y"].shape == (2, 1, 2)
    finally:
        pipe.stop()


def test_factory_auto_falls_back_on_48k(tmp_path):
    """48 kHz corpora (real VCTK) need python-side resampling: auto must
    NOT route them through the native PCM16 reader (which would feed
    48 kHz samples as if they were 16 kHz)."""
    from vqvae_wavenet_tpu.data.datasets import (
        Dataset, make_input_pipeline)
    root = _vctk_layout(tmp_path, 48000)
    pipe = make_input_pipeline("VCTK", batch_size=1, max_len=1024,
                               relative_path=root, loader="auto")
    try:
        assert isinstance(pipe, Dataset)
    finally:
        pipe.stop()
    with pytest.raises(RuntimeError, match="not 16 kHz PCM16"):
        make_input_pipeline("VCTK", batch_size=1, max_len=1024,
                            relative_path=root, loader="native")


def test_factory_trim_silence_forces_python(tmp_path):
    from vqvae_wavenet_tpu.data.datasets import (
        Dataset, make_input_pipeline)
    root = _vctk_layout(tmp_path, 16000)
    pipe = make_input_pipeline("VCTK", batch_size=1, max_len=1024,
                               relative_path=root, loader="auto",
                               trim_silence=True)
    try:
        assert isinstance(pipe, Dataset) and pipe.trim
    finally:
        pipe.stop()
