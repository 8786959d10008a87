"""CLI-level end-to-end tests: drive train.py / generate.py / visualise.py
main() on a synthetic corpus, for both model families.

These mirror the reference's user-facing flows (train.py:12-37,
generate.py:14-31, Magenta/train.py:79-106, Magenta/generate.py:73-84) —
round-1 gap: the Magenta family was Python-API-only, unreachable from any
CLI.
"""
import json
import os
import sys

import numpy as np
import pytest
from scipy.io import wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic VCTK layout + tiny model config."""
    root = tmp_path_factory.mktemp("cli_e2e")
    data = root / "data" / "VCTK-Corpus"
    rng = np.random.default_rng(0)
    files = []
    for spk, f0 in [("p225", 120.0), ("p226", 220.0)]:
        d = data / "wav48" / spk
        d.mkdir(parents=True)
        for i in range(2):
            t = np.arange(16000) / 16000.0
            wav = (0.4 * np.sin(2 * np.pi * f0 * (1 + 0.1 * i) * t)
                   + 0.05 * rng.standard_normal(16000))
            wavfile.write(str(d / f"{spk}_{i:03d}.wav"), 16000,
                          (wav * 32767).astype(np.int16))
            files.append(f"{spk}/{spk}_{i:03d}.wav")

    # a short clip for generation tests (keeps CPU scan length small)
    t = np.arange(2048) / 16000.0
    wavfile.write(str(data / "wav48" / "p226" / "p226_short.wav"), 16000,
                  (0.4 * np.sin(2 * np.pi * 220.0 * t) * 32767).astype(np.int16))

    info = root / "data" / "vctk_info"
    info.mkdir()
    (info / "vctk_train.txt").write_text("\n".join(files) + "\n")
    speakers = ["p225", "p226"] + [f"p{300 + i}" for i in range(107)]
    (info / "vctk_speakers.txt").write_text(
        "".join(f"{s}, {i}\n" for i, s in enumerate(speakers)))
    (info / "vctk_speaker_info.txt").write_text(
        "ID  AGE  GENDER  ACCENTS  REGION\n"
        + "".join(f"{s[1:]}  23  {'F' if i % 2 else 'M'}  English  Town\n"
                  for i, s in enumerate(speakers)))

    wn = {"verbose": False, "quantization_channels": 256, "num_cycles": 2,
          "num_cycle_layers": 3, "dilation_rates": [1, 2, 4, 8, 16, 32],
          "kernel_size": 2, "dilation_filters": 16, "skip_filters": 16,
          "residual_filters": 16,
          "preprocess": {"kernel_size": 4, "filters": 16}}
    (root / "tiny_wavenet.json").write_text(json.dumps(wn))
    mp = {"encoder": "64", "use_vq": True, "speaker_embedding": 8, "k": 16,
          "latent_dim": 8, "beta": 0.25, "verbose": False,
          "wavenet_parameters": str(root / "tiny_wavenet.json"),
          "learning_rate_schedule": {"0": 1e-3}}
    (root / "tiny_model.json").write_text(json.dumps(mp))
    return root


def test_train_generate_visualise_cli(corpus):
    import train as train_cli
    import generate as generate_cli
    import visualise as visualise_cli

    save = corpus / "saved_model"
    train_cli.main([
        "-dataset", "VCTK", "-length", "1024", "-batch", "2", "-step", "3",
        "-interval", "2", "-save", str(save / "weights"),
        "-params", str(corpus / "tiny_model.json"),
        "-data", str(corpus / "data") + "/", "-ckpt_interval", "100"])
    assert (save / "weights-3").is_dir()

    wav_in = str(corpus / "data" / "VCTK-Corpus" / "wav48" / "p225"
                 / "p225_000.wav")
    generate_cli.main([
        "-restore", str(save / "weights-3"), "-audio", wav_in,
        "-speakers", "p225", "None", "-mode", "sample",
        "-params", str(corpus / "tiny_model.json"),
        "-data", str(corpus / "data") + "/"])
    for name in ("3_p225.wav", "3_no_speaker.wav"):
        sr, out = wavfile.read(str(save / name))
        assert sr == 16000 and len(out) == 16000 // 512 * 512
        assert np.all(np.abs(out) <= 1.0)
    assert (save / "embedding_3.npy").exists()
    assert (save / "speaker_embedding_3.npy").exists()

    viz = corpus / "viz"
    visualise_cli.main([
        "-embedding", str(save / "embedding_3.npy"),
        "-speaker", str(save / "speaker_embedding_3.npy"),
        "-dataset", "VCTK", "-save", str(viz),
        "-data", str(corpus / "data") + "/"])
    meta = (viz / "speaker_embedding_3_meta.tsv").read_text().splitlines()
    assert len(meta) == 109          # one row per speaker, no header
    assert meta[0].count("#") >= 2   # gender/accent join (utils.py:103-116)


def test_time_shards_cli(corpus):
    """-time_shards 2: sequence-parallel training from the CLI (the time
    axis sharded over 2 virtual devices with halo exchange)."""
    import train as train_cli

    save = corpus / "sp_model"
    train_cli.main([
        "-dataset", "VCTK", "-length", "1024", "-batch", "2", "-step", "3",
        "-interval", "2", "-save", str(save / "weights"),
        "-params", str(corpus / "tiny_model.json"),
        "-data", str(corpus / "data") + "/", "-ckpt_interval", "100",
        "-time_shards", "2"])
    assert (save / "weights-3").is_dir()


def test_prior_cli_checkpoint_resume(corpus):
    """Prior trainer failure recovery: periodic/final checkpoints carry the
    full train state (params, EMA shadows, opt state, step); killing a run
    and restarting with -prior_restore resumes from the saved step instead
    of losing everything (round-2 weakness: the prior had one save at the
    end and no restore path)."""
    import train as train_cli
    import prior as prior_cli

    save = corpus / "prior_vqvae"
    train_cli.main([
        "-dataset", "VCTK", "-length", "1024", "-batch", "2", "-step", "2",
        "-interval", "5", "-save", str(save / "weights"),
        "-params", str(corpus / "tiny_model.json"),
        "-data", str(corpus / "data") + "/", "-ckpt_interval", "100"])

    prior_save = corpus / "prior_model"
    common = ["-restore", str(save / "weights-2"),
              "-params", str(corpus / "tiny_model.json"),
              "-data", str(corpus / "data") + "/",
              "-dataset", "VCTK", "-length", "1024", "-batch", "2",
              "-save", str(prior_save), "-interval", "1",
              "-ckpt_interval", "2"]
    # "die" after 3 steps: the periodic checkpoint at step 2 + final at 3
    prior_cli.main(common + ["-step", "3"])
    assert (prior_save / "weights-2").is_dir()
    assert (prior_save / "weights-3").is_dir()

    # resume from the step-2 checkpoint explicitly; 2 more steps -> 4.
    # -train_dtype bf16 on the resumed run also covers the round-4 prior
    # mixed-precision path (master params stay f32, so the f32 checkpoint
    # restores unchanged)
    prior_cli.main(common + ["-step", "2", "-train_dtype", "bf16",
                             "-prior_restore", str(prior_save / "weights-2")])
    assert (prior_save / "weights-4").is_dir()

    # sampling restores the NEW full-state format (prefers the EMA shadow)
    prior_cli.main([
        "-restore", str(save / "weights-2"),
        "-params", str(corpus / "tiny_model.json"),
        "-data", str(corpus / "data") + "/",
        "-prior", str(prior_save / "weights-4"),
        "-sample", "2", "-seconds", "0.064", "-speakers", "p225", "p226"])
    for name in ("prior_p225.wav", "prior_p226.wav"):
        sr, out = wavfile.read(str(prior_save / name))
        assert sr == 16000 and np.all(np.abs(out) <= 1.0)


def test_magenta_family_cli(corpus, monkeypatch):
    """model_family='magenta' routes train.py through magenta_forward /
    make_magenta_optimizer and generate.py through magenta_generate
    (reference Magenta/train.py:79-106, Magenta/generate.py:73-84).

    The module-level hyperparams are shrunk for CPU speed — the functions
    read them at call time, so the full CLI routing is exercised; the
    real 50-layer preset is validated end-to-end on TPU (PERF.md)."""
    import train as train_cli
    import generate as generate_cli
    from vqvae_wavenet_tpu.models import magenta as mg

    monkeypatch.setattr(mg, "NUM_LAYERS", 6)
    monkeypatch.setattr(mg, "NUM_STAGES", 3)
    monkeypatch.setattr(mg, "WIDTH", 16)
    monkeypatch.setattr(mg, "SKIP_WIDTH", 16)
    monkeypatch.setattr(mg, "AE_WIDTH", 16)
    monkeypatch.setattr(mg, "AE_BOTTLENECK_WIDTH", 8)
    monkeypatch.setattr(mg, "K_CODES", 16)

    save = corpus / "magenta_model"
    params = os.path.join(REPO, "magenta_parameters.json")
    train_cli.main([
        "-dataset", "VCTK", "-length", "1024", "-batch", "1", "-step", "2",
        "-interval", "1", "-save", str(save / "weights"),
        "-params", params, "-data", str(corpus / "data") + "/",
        "-ckpt_interval", "100"])
    assert (save / "weights-2").is_dir()

    wav_in = str(corpus / "data" / "VCTK-Corpus" / "wav48" / "p226"
                 / "p226_short.wav")
    generate_cli.main([
        "-restore", str(save / "weights-2"), "-audio", wav_in,
        "-speakers", "p226", "-mode", "greedy",
        "-params", params, "-data", str(corpus / "data") + "/"])
    sr, out = wavfile.read(str(save / "2_p226.wav"))
    assert sr == 16000 and len(out) == 2048
    assert np.all(np.abs(out) <= 1.0)


def test_generate_data_shards_cli(corpus):
    """-data_shards 2: the speaker batch sharded over two virtual devices
    (parallel/genshard.py).  Greedy decoding is deterministic, so the
    sharded CLI output must equal the single-device CLI output."""
    import train as train_cli
    import generate as generate_cli

    save = corpus / "shard_model"
    train_cli.main([
        "-dataset", "VCTK", "-length", "1024", "-batch", "2", "-step", "1",
        "-interval", "5", "-save", str(save / "weights"),
        "-params", str(corpus / "tiny_model.json"),
        "-data", str(corpus / "data") + "/", "-ckpt_interval", "100"])

    wav_in = str(corpus / "data" / "VCTK-Corpus" / "wav48" / "p225"
                 / "p225_000.wav")
    common = ["-restore", str(save / "weights-1"), "-audio", wav_in,
              "-speakers", "p225", "p226", "-mode", "greedy",
              "-params", str(corpus / "tiny_model.json"),
              "-data", str(corpus / "data") + "/"]
    generate_cli.main(common)
    single = {s: wavfile.read(str(save / f"1_{s}.wav"))[1]
              for s in ("p225", "p226")}
    generate_cli.main(common + ["-data_shards", "2"])
    for s in ("p225", "p226"):
        sharded = wavfile.read(str(save / f"1_{s}.wav"))[1]
        np.testing.assert_array_equal(sharded, single[s])
