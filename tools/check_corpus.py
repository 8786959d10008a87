#!/usr/bin/env python3
"""Verify a downloaded corpus against its shipped manifest before training.

  python tools/check_corpus.py -dataset VCTK -data /path/to/data/

Checks every manifest entry resolves to a readable RIFF/WAVE file, reports
the sample-rate mix (real VCTK is 48 kHz -> the python loader resamples;
16 kHz PCM16 corpora qualify for `train.py -loader native`), counts
speakers against the speaker map, and flags files the too-short exclusion
list removes.  Exit code 0 when the corpus is trainable.

This is the "verify manifests" step of the real-data runbook
(README.md "Training on real VCTK"); the reference has no equivalent —
its loader crashes mid-training on missing/short files
(reference dataset.py:40-44).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wav_header(path):
    """(sample_rate, bits, audio_format) or None if not RIFF/WAVE."""
    try:
        with open(path, "rb") as f:
            if f.read(4) != b"RIFF":
                return None
            f.read(4)
            if f.read(4) != b"WAVE":
                return None
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    return None
                cid = hdr[:4]
                size = int.from_bytes(hdr[4:8], "little")
                if cid == b"fmt ":
                    fmt = f.read(min(size, 16))
                    if len(fmt) < 16:
                        return None
                    return (int.from_bytes(fmt[4:8], "little"),
                            int.from_bytes(fmt[14:16], "little"),
                            int.from_bytes(fmt[0:2], "little"))
                f.seek((size + 1) & ~1, 1)
    except OSError:
        return None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-dataset", default="VCTK")
    parser.add_argument("-data", default="data/", dest="data_path")
    parser.add_argument("-sample", default=0, type=int,
                        help="only header-probe N random files (0 = all; "
                             "header probes are cheap, full VCTK takes "
                             "~a minute)")
    args = parser.parse_args(argv)

    from vqvae_wavenet_tpu.data.datasets import DATASETS
    if args.dataset not in DATASETS:
        raise NotImplementedError(f"dataset {args.dataset} not implemented")
    ds_cls = DATASETS[args.dataset]
    try:
        ds = ds_cls(batch_size=1, max_len=1024,
                    relative_path=args.data_path)
    except FileNotFoundError as e:
        print(f"MANIFEST MISSING: {e}")
        return 2

    import numpy as np
    files = list(ds.all_files)
    if args.sample and args.sample < len(files):
        files = list(np.random.default_rng(0).choice(
            files, args.sample, replace=False))

    missing, unreadable, rates = [], [], {}
    speakers = set()
    for rel in files:
        p = os.path.join(args.data_path, ds.data_dir, rel)
        if not os.path.exists(p):
            missing.append(rel)
            continue
        hdr = wav_header(p)
        if hdr is None:
            unreadable.append(rel)
            continue
        rates[hdr[0]] = rates.get(hdr[0], 0) + 1
        speakers.add(ds.split_func(rel))

    n = len(files)
    print(f"manifest entries probed : {n} "
          f"(of {len(ds.all_files)} total)")
    print(f"speaker map             : {ds.num_speakers} speakers; "
          f"{len(speakers)} seen in probed files")
    print(f"sample rates            : "
          + ", ".join(f"{r} Hz x{c}" for r, c in sorted(rates.items())))
    if missing:
        print(f"MISSING files           : {len(missing)} "
              f"(first: {missing[0]})")
    if unreadable:
        print(f"UNREADABLE files        : {len(unreadable)} "
              f"(first: {unreadable[0]})")
    native_ok = set(rates) == {16000}
    print(f"native loader eligible  : "
          f"{'yes (-loader native)' if native_ok else 'no (python loader resamples)'}")
    ok = not missing and not unreadable and n > 0
    print("corpus status           :", "OK — trainable" if ok else "BROKEN")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
