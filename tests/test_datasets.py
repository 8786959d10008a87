"""Data pipeline with synthetic corpora: manifests, speaker maps, crops,
normalization, resampling, prefetch."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

from vqvae_wavenet_tpu.data.datasets import (
    Dataset, VCTK, get_speaker_to_int, write_speaker_to_int,
    get_speaker_info, read_wav_16k)


@pytest.fixture
def vctk_root(tmp_path):
    """Minimal synthetic VCTK layout."""
    root = tmp_path / "data"
    wav_dir = root / "VCTK-Corpus" / "wav48"
    files = []
    rng = np.random.default_rng(0)
    for spk in ("p225", "p226"):
        d = wav_dir / spk
        d.mkdir(parents=True)
        for i in range(2):
            wav = (rng.uniform(-0.2, 0.2, 48000 * 1) * 32767).astype(np.int16)
            wavfile.write(str(d / f"{spk}_{i:03d}.wav"), 48000, wav)
            files.append(f"{spk}/{spk}_{i:03d}.wav")
    (root / "vctk_train.txt").write_text("\n".join(files) + "\n")
    (root / "vctk_speakers.txt").write_text("p225, 0\np226, 1\n")
    (root / "vctk_speaker_info.txt").write_text(
        "ID AGE GENDER ACCENTS REGION\n"
        "225 23 F English Southern England\n"
        "226 22 M English Surrey\n")
    return str(root) + "/"


def test_speaker_map_roundtrip(tmp_path):
    manifest = tmp_path / "m.txt"
    manifest.write_text("p1/a.wav\np2/b.wav\np1/c.wav\n")
    out = tmp_path / "s.txt"
    m = write_speaker_to_int(str(manifest), str(out),
                             lambda s: s.split("/")[0])
    assert m == {"p1": 0, "p2": 1}
    assert get_speaker_to_int(str(out)) == m


def test_speaker_info_vctk_detection(vctk_root):
    table = get_speaker_to_int(vctk_root + "vctk_speakers.txt")
    info = get_speaker_info(table, vctk_root + "vctk_speaker_info.txt")
    assert info[0].startswith("23#F#English")
    assert info[1].startswith("22#M#English")


def test_read_wav_resamples_to_16k(vctk_root):
    wav = read_wav_16k(vctk_root + "VCTK-Corpus/wav48/p225/p225_000.wav")
    assert abs(len(wav) - 16000) < 10  # 1 s at 48k -> 16k
    assert np.abs(wav).max() <= 1.0


def test_vctk_batches(vctk_root):
    ds = VCTK(batch_size=3, max_len=2048, relative_path=vctk_root, seed=0)
    assert ds.num_speakers == 2
    batch = ds.batch()
    assert batch["x"].shape == (3, 2048, 1)
    assert batch["x"].dtype == np.float32
    assert batch["y"].shape == (3, 1, 2)
    np.testing.assert_allclose(batch["y"].sum(-1), 1.0)
    # speaker one-hot indexes match the map
    assert set(np.argmax(batch["y"][:, 0], -1)) <= {0, 1}


def test_short_file_padded(tmp_path):
    """Conscious fix of the reference crash on len(wav) <= max_len
    (dataset.py:42-43)."""
    root = tmp_path / "d"
    (root / "VCTK-Corpus" / "wav48" / "p1").mkdir(parents=True)
    wav = (np.zeros(500) * 32767).astype(np.int16)
    wavfile.write(str(root / "VCTK-Corpus" / "wav48" / "p1" / "p1_001.wav"),
                  16000, wav)
    (root / "vctk_train.txt").write_text("p1/p1_001.wav\n")
    (root / "vctk_speakers.txt").write_text("p1, 0\n")
    ds = VCTK(batch_size=1, max_len=2048, relative_path=str(root) + "/",
              seed=0)
    batch = ds.batch()
    assert batch["x"].shape == (1, 2048, 1)


def test_prefetch_thread(vctk_root):
    ds = VCTK(batch_size=2, max_len=1024, relative_path=vctk_root,
              seed=1).start()
    try:
        b1 = ds.next()
        b2 = ds.next()
        assert b1["x"].shape == b2["x"].shape == (2, 1024, 1)
    finally:
        ds.stop()


def test_missing_manifest_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        VCTK(relative_path=str(tmp_path) + "/")


def test_trim_silence():
    from vqvae_wavenet_tpu.data.datasets import trim_silence
    rng = np.random.default_rng(0)
    speech = rng.uniform(-0.5, 0.5, 4000)
    audio = np.concatenate([np.zeros(3000), speech, np.zeros(3000)])
    out = trim_silence(audio)
    # keeps the loud middle, drops most of the silence (frame-granular:
    # boundary frames overlapping speech extend up to one frame each side)
    assert 4000 <= len(out) <= 4000 + 2 * 2048
    assert np.abs(out).max() > 0.4
    # all-silent input -> empty (reference dataset.py:30-31 semantics)
    assert trim_silence(np.zeros(5000)).size == 0
