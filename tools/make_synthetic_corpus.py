"""Build a synthetic VCTK-layout corpus for end-to-end drives.

Two modes (real VCTK is data-gated in this environment — these stand in
for it with spectrally verifiable structure):

* default: two "speakers" with distinct fundamentals (p225=220 Hz,
  p226=440 Hz), 3 one-second tones each — voice conversion is then
  verifiable by spectral peak.  Used by the fast verify drives.
* --rich: N pseudo-speech speakers for convergence runs.  Each utterance
  is a glottal-pulse source (sawtooth at a per-speaker f0 with vibrato,
  jitter, and a syllable-rate amplitude envelope) through per-speaker
  formant resonators, with fricative-like noise bursts between
  "syllables" — enough spectral/temporal structure that reconstruction
  NLL and speaker conversion mean something, while staying fully
  reproducible (seeded).

Manifests follow the reference's data/vctk_info grammar (reference
utils.py:49-116, dataset.py:24-60).  Usage:

    python tools/make_synthetic_corpus.py [BASE=/tmp/e2e/data] [--rich]
        [--scale N]

* --scale N: N cheap tone utterances spread over 20 speakers — an
  input-pipeline stress corpus at real-VCTK file counts (the reference
  trains from 44,253 files, data/vctk_info/vctk_train.txt) for loader
  benchmarking; spectral richness doesn't matter there, file count and
  byte volume do.
"""
import os
import sys

import numpy as np
from scipy.io import wavfile
from scipy.signal import lfilter

SR = 16000


def _formant(x, freq, bw):
    """Second-order resonator at `freq` Hz with bandwidth `bw` Hz."""
    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * freq / SR
    a = [1.0, -2 * r * np.cos(theta), r * r]
    return lfilter([1.0 - r], a, x)


def _utterance(rng, f0_base, formants, seconds):
    n = int(seconds * SR)
    t = np.arange(n) / SR
    # f0 contour: slow declination + vibrato + jitter
    f0 = (f0_base * (1.0 - 0.12 * t / t[-1])
          * (1.0 + 0.02 * np.sin(2 * np.pi * 5.3 * t))
          * (1.0 + 0.01 * rng.standard_normal(n).cumsum() / np.sqrt(n)))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    # sawtooth source (rich harmonics, like glottal pulses)
    src = 2 * ((phase / (2 * np.pi)) % 1.0) - 1.0
    voiced = sum(_formant(src, f, bw) for f, bw in formants)
    # syllable-rate envelope (~3.5 Hz) with randomized syllable strengths
    syl = 0.5 * (1 + np.sin(2 * np.pi * 3.5 * t + rng.uniform(0, 6.28)))
    env = syl ** 1.5
    out = voiced * env
    # fricative-like noise bursts in the envelope troughs
    noise = rng.standard_normal(n)
    noise = _formant(noise, 4500.0, 2000.0)
    out = out + 0.6 * noise * np.clip(0.35 - syl, 0, None)
    out = out / (np.abs(out).max() + 1e-9)
    return (out * 0.6).astype(np.float32)


def make_corpus(base: str, rich: bool = False, scale: int = 0) -> None:
    rng = np.random.default_rng(0)
    t = np.arange(SR) / SR
    os.makedirs(f"{base}/vctk_info", exist_ok=True)
    if scale:
        n_speakers = 20
        spk_names = [f"p{225 + i}" for i in range(n_speakers)]
        files = []
        # cheap per-file synthesis: one tone + harmonic, length 1-2 s,
        # phase/length varied per file so the bytes differ
        for j in range(scale):
            i = j % n_speakers
            spk = spk_names[i]
            if j < n_speakers:
                os.makedirs(f"{base}/VCTK-Corpus/wav48/{spk}",
                            exist_ok=True)
            n = int(SR * (1.0 + (j % 17) / 16.0))
            tt = np.arange(n) / SR
            f0 = 120.0 + 8.0 * i
            wav = (0.5 * np.sin(2 * np.pi * f0 * tt + j)
                   + 0.1 * np.sin(2 * np.pi * 2 * f0 * tt))
            rel = f"{spk}/{spk}_{j // n_speakers:04d}.wav"
            wavfile.write(f"{base}/VCTK-Corpus/wav48/{rel}", SR,
                          (wav * 20000).astype(np.int16))
            files.append(rel)
    elif rich:
        n_speakers, n_utts = 10, 20
        spk_names = [f"p{225 + i}" for i in range(n_speakers)]
        files = []
        for i, spk in enumerate(spk_names):
            os.makedirs(f"{base}/VCTK-Corpus/wav48/{spk}", exist_ok=True)
            f0 = 120.0 + 18.0 * i                 # 120..282 Hz
            formants = [(500 + 40 * i, 90), (1500 + 90 * i, 120),
                        (2500 + 60 * i, 160)]
            for j in range(n_utts):
                wav = _utterance(rng, f0 * (1 + 0.04 * (j % 3 - 1)),
                                 formants, seconds=rng.uniform(1.5, 3.0))
                rel = f"{spk}/{spk}_{j:03d}.wav"
                wavfile.write(f"{base}/VCTK-Corpus/wav48/{rel}", SR,
                              (wav * 24000).astype(np.int16))
                files.append(rel)
    else:
        spk_names = ["p225", "p226"]
        files = []
        for spk, f0 in (("p225", 220.0), ("p226", 440.0)):
            os.makedirs(f"{base}/VCTK-Corpus/wav48/{spk}", exist_ok=True)
            for i in range(3):
                wav = (0.5 * np.sin(2 * np.pi * f0 * t + i)
                       + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
                       ).astype(np.float32)
                rel = f"{spk}/{spk}_{i:03d}.wav"
                wavfile.write(f"{base}/VCTK-Corpus/wav48/{rel}", SR,
                              (wav * 20000).astype(np.int16))
                files.append(rel)
    with open(f"{base}/vctk_info/vctk_train.txt", "w") as f:
        f.write("\n".join(files) + "\n")
    # generate.py pins 109 speakers for VCTK checkpoint-shape parity;
    # grammar is 'name, index' (reference utils.py:93-100)
    speakers = spk_names + [f"p{300 + i}" for i in range(109 - len(spk_names))]
    with open(f"{base}/vctk_info/vctk_speakers.txt", "w") as f:
        f.write("\n".join(f"{s}, {i}" for i, s in enumerate(speakers)) + "\n")
    with open(f"{base}/vctk_info/vctk_speaker_info.txt", "w") as f:
        f.write("ID  AGE  GENDER  ACCENTS  REGION COMMENTS\n")
        for i, s in enumerate(speakers):
            f.write(f"{s[1:]}  2{i % 9}  {'F' if i % 2 else 'M'}"
                    f"  English  Universal\n")
    with open(f"{base}/vctk_info/vctk_too_short.txt", "w") as f:
        f.write("")
    print(f"synthetic corpus ready at {base} "
          f"({len(files)} wavs, {len(spk_names)} speakers)")


if __name__ == "__main__":
    scale = 0
    argv = sys.argv[1:]
    if "--scale" in argv:
        i = argv.index("--scale")
        scale = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    argv = [a for a in argv if a != "--rich"]
    make_corpus(argv[0] if argv else "/tmp/e2e/data",
                rich="--rich" in sys.argv, scale=scale)
