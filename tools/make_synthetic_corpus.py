"""Build a tiny synthetic VCTK-layout corpus for end-to-end drives.

Two "speakers" with distinct fundamentals (p225=220 Hz, p226=440 Hz) so
voice conversion is verifiable by spectral peak; manifests follow the
reference's data/vctk_info grammar (reference utils.py:49-116,
dataset.py:24-60).  Usage:

    python tools/make_synthetic_corpus.py [BASE=/tmp/e2e/data]
"""
import os
import sys

import numpy as np
from scipy.io import wavfile


def make_corpus(base: str) -> None:
    sr = 16000
    t = np.arange(sr) / sr
    os.makedirs(f"{base}/vctk_info", exist_ok=True)
    for spk, f0 in (("p225", 220.0), ("p226", 440.0)):
        os.makedirs(f"{base}/VCTK-Corpus/wav48/{spk}", exist_ok=True)
        for i in range(3):
            wav = (0.5 * np.sin(2 * np.pi * f0 * t + i)
                   + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float32)
            path = f"{base}/VCTK-Corpus/wav48/{spk}/{spk}_{i:03d}.wav"
            wavfile.write(path, sr, (wav * 20000).astype(np.int16))
    with open(f"{base}/vctk_info/vctk_train.txt", "w") as f:
        for spk in ("p225", "p226"):
            for i in range(3):
                f.write(f"wav48/{spk}/{spk}_{i:03d}.wav\n")
    # generate.py pins 109 speakers for VCTK checkpoint-shape parity
    speakers = ["p225", "p226"] + [f"p{300 + i}" for i in range(107)]
    with open(f"{base}/vctk_info/vctk_speakers.txt", "w") as f:
        f.write("\n".join(speakers) + "\n")
    with open(f"{base}/vctk_info/vctk_speaker_info.txt", "w") as f:
        f.write("ID  AGE  GENDER  ACCENTS  REGION COMMENTS\n")
        for i, s in enumerate(speakers):
            f.write(f"{s[1:]}  2{i % 9}  {'F' if i % 2 else 'M'}"
                    f"  English  Universal\n")
    with open(f"{base}/vctk_info/vctk_too_short.txt", "w") as f:
        f.write("")
    print(f"synthetic corpus ready at {base}")


if __name__ == "__main__":
    make_corpus(sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e/data")
