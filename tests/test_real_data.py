"""Real-corpus runbook path (README "Training on real VCTK").

Real VCTK is data-gated in CI, so the runbook is exercised two ways:
  * on a 2-file fixture shaped exactly like the real download (48 kHz
    int16 under VCTK-Corpus/wav48/<spk>/, shipped-style manifests) —
    always runs: corpus check -> python-loader resample path ->
    -trim_silence -> training steps -> checkpoint;
  * on the real corpus when REAL_VCTK_DIR points at it — the identical
    commands, skipped otherwise.
"""
import os
import sys

import numpy as np
import pytest
from scipy.io import wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def vctk48_fixture(tmp_path_factory):
    """A miniature of the real VCTK download: 48 kHz, leading/trailing
    silence, the reference's manifest layout."""
    root = tmp_path_factory.mktemp("real_vctk")
    rng = np.random.default_rng(0)
    files = []
    for spk, f0 in [("p225", 120.0), ("p226", 220.0)]:
        d = root / "VCTK-Corpus" / "wav48" / spk
        d.mkdir(parents=True)
        t = np.arange(48000) / 48000.0
        tone = 0.4 * np.sin(2 * np.pi * f0 * t)
        # real recordings start/end with silence — exercises -trim_silence
        wav = np.concatenate([np.zeros(12000), tone,
                              np.zeros(12000)])
        wav += 0.001 * rng.standard_normal(wav.size)
        wavfile.write(str(d / f"{spk}_001.wav"), 48000,
                      (wav * 32767).astype(np.int16))
        files.append(f"{spk}/{spk}_001.wav")
    info = root / "vctk_info"
    info.mkdir()
    (info / "vctk_train.txt").write_text("\n".join(files) + "\n")
    (info / "vctk_speakers.txt").write_text("p225, 0\np226, 1\n")
    (info / "vctk_too_short.txt").write_text("")
    return root


def _tiny_model_json(tmp_path):
    import json
    wn = {"verbose": False, "quantization_channels": 256, "num_cycles": 1,
          "num_cycle_layers": 4, "dilation_rates": [1, 2, 4, 8],
          "kernel_size": 2, "dilation_filters": 16, "skip_filters": 16,
          "residual_filters": 16,
          "preprocess": {"kernel_size": 4, "filters": 16}}
    (tmp_path / "wn.json").write_text(json.dumps(wn))
    mp = {"encoder": "64", "use_vq": True, "speaker_embedding": 8, "k": 16,
          "latent_dim": 8, "beta": 0.25, "verbose": False,
          "wavenet_parameters": str(tmp_path / "wn.json"),
          "learning_rate_schedule": {"0": 1e-3}}
    p = tmp_path / "model.json"
    p.write_text(json.dumps(mp))
    return str(p)


def test_corpus_check_on_48k_fixture(vctk48_fixture, capsys):
    import check_corpus
    rc = check_corpus.main(["-dataset", "VCTK",
                            "-data", str(vctk48_fixture) + "/"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "48000 Hz x2" in out
    assert "python loader resamples" in out
    assert "OK — trainable" in out


def test_corpus_check_flags_missing(vctk48_fixture, capsys):
    import check_corpus
    extra = vctk48_fixture / "vctk_info" / "vctk_train.txt"
    orig = extra.read_text()
    extra.write_text(orig + "p225/does_not_exist.wav\n")
    try:
        rc = check_corpus.main(["-dataset", "VCTK",
                                "-data", str(vctk48_fixture) + "/"])
        assert rc == 1
        assert "MISSING" in capsys.readouterr().out
    finally:
        extra.write_text(orig)


def test_train_on_48k_fixture_with_trim(vctk48_fixture, tmp_path):
    """The exact runbook commands on the fixture: auto loader falls back to
    python (48 kHz needs resampling), -trim_silence strips the silence
    padding, two steps run, a checkpoint lands."""
    import train as train_cli
    params = _tiny_model_json(tmp_path)
    save = tmp_path / "saved_model"
    train_cli.main([
        "-dataset", "VCTK", "-length", "1024", "-batch", "2", "-step", "2",
        "-interval", "5", "-save", str(save / "weights"), "-params", params,
        "-data", str(vctk48_fixture) + "/", "-ckpt_interval", "100",
        "-trim_silence"])
    assert (save / "weights-2").is_dir()


def test_trim_silence_applied_in_pipeline(vctk48_fixture):
    """With -trim_silence the sampler never yields an all-silence crop
    from the padded fixture; without it, silent crops occur."""
    from vqvae_wavenet_tpu.data.datasets import VCTK
    ds = VCTK(batch_size=4, max_len=8000,
              relative_path=str(vctk48_fixture) + "/", seed=0,
              trim_silence=True)
    for _ in range(5):
        b = ds.batch()
        # every crop overlaps the tone: RMS well above the noise floor
        rms = np.sqrt(np.mean(b["x"] ** 2, axis=(1, 2)))
        assert (rms > 0.01).all()


@pytest.mark.skipif("REAL_VCTK_DIR" not in os.environ,
                    reason="set REAL_VCTK_DIR to the directory holding "
                           "VCTK-Corpus/ to run the real-data smoke test")
def test_real_vctk_smoke(tmp_path):
    """Unmodified runbook on the actual download (109 speakers, 44k files):
    corpus check + 2 full-config training steps."""
    import check_corpus
    import train as train_cli
    data = os.environ["REAL_VCTK_DIR"].rstrip("/") + "/"
    assert check_corpus.main(["-dataset", "VCTK", "-data", data,
                              "-sample", "200"]) == 0
    save = tmp_path / "saved_model"
    train_cli.main([
        "-dataset", "VCTK", "-length", "6656", "-batch", "8", "-step", "2",
        "-interval", "5", "-save", str(save / "weights"),
        "-params", os.path.join(REPO, "model_parameters.json"),
        "-data", data, "-ckpt_interval", "100"])
    assert (save / "weights-2").is_dir()
