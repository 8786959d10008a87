#!/usr/bin/env python3
"""Visualisation CLI — flag-compatible with the reference visualise.py:6-19.

Dumps codebook / speaker-embedding .npy files as TSV vec+meta pairs for
projector.tensorflow.org; speaker metadata joins <corpus>_speaker_info.txt
(gender/accent), exactly the reference's output format.
"""
import argparse
import io
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-embedding", dest="embedding",
                        help="embedding space")
    parser.add_argument("-speaker", dest="speaker",
                        help="speaker embedding space")
    parser.add_argument("-dataset", default="VCTK", dest="dataset",
                        help="VCTK or LibriSpeech")
    parser.add_argument("-save", dest="save", help="save to folder")
    parser.add_argument("-data", default="data/", dest="data_path",
                        metavar="str", help="dataset root (speaker files)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from vqvae_wavenet_tpu.data.datasets import (
        get_speaker_to_int, get_speaker_info)

    os.makedirs(args.save, exist_ok=True)

    def find(name, sub):
        for cand in (os.path.join(args.data_path, name),
                     os.path.join(args.data_path, sub, name)):
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(f"{name} under {args.data_path}")

    total, meta = [], []
    if args.embedding:
        total.append(args.embedding)
        meta.append(lambda i: str(i + 1) + "\n")
    if args.speaker:
        total.append(args.speaker)
        if args.dataset == "VCTK":
            speaker_path = find("vctk_speakers.txt", "vctk_info")
            info_path = find("vctk_speaker_info.txt", "vctk_info")
        elif args.dataset == "LibriSpeech":
            speaker_path = find("librispeech_speakers.txt", "librispeech_info")
            info_path = find("librispeech_speaker_info.txt", "librispeech_info")
        else:
            raise NotImplementedError(f"dataset {args.dataset}")
        speaker_to_int = get_speaker_to_int(speaker_path)
        speaker_info = get_speaker_info(speaker_to_int, info_path)
        meta.append(lambda i: speaker_info[i] + "\n")

    for file, id_f in zip(total, meta):
        emb = np.load(file)
        name = os.path.basename(file)
        if name.endswith(".npy"):
            name = name[:-4]
        with io.open(f"{args.save}/{name}_vecs.tsv", "w",
                     encoding="utf-8") as out_v, \
                io.open(f"{args.save}/{name}_meta.tsv", "w",
                        encoding="utf-8") as out_m:
            for i, vec in enumerate(emb):
                out_m.write(id_f(i))
                out_v.write("\t".join(str(x) for x in vec) + "\n")
    print("upload to http://projector.tensorflow.org")


if __name__ == "__main__":
    main()
