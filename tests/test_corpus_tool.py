"""tools/make_synthetic_corpus.py output must load through the real data
pipeline — guards the manifest grammar (paths relative to wav48/,
'name, index' speaker lines; reference utils.py:93-100, dataset.py:24-60)."""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_corpus import make_corpus  # noqa: E402

from vqvae_wavenet_tpu.data.datasets import (  # noqa: E402
    VCTK, get_speaker_info, get_speaker_to_int)


def test_default_corpus_loads(tmp_path):
    base = str(tmp_path / "data")
    make_corpus(base)
    ds = VCTK(batch_size=2, max_len=1024, relative_path=base + "/", seed=0)
    assert ds.num_speakers == 109
    b = ds.batch()
    assert b["x"].shape == (2, 1024, 1)
    assert b["y"].shape == (2, 1, 109)
    assert np.abs(b["x"]).max() <= 1.0
    s2i = get_speaker_to_int(base + "/vctk_info/vctk_speakers.txt")
    assert s2i["p225"] == 0 and s2i["p226"] == 1
    info = get_speaker_info(s2i, base + "/vctk_info/vctk_speaker_info.txt")
    assert info


def test_rich_corpus_loads_and_has_speaker_structure(tmp_path):
    base = str(tmp_path / "data")
    make_corpus(base, rich=True)
    ds = VCTK(batch_size=4, max_len=2048, relative_path=base + "/", seed=1)
    b = ds.batch()
    assert b["x"].shape == (4, 2048, 1)
    # 10 distinct speakers appear in the manifest
    with open(base + "/vctk_info/vctk_train.txt") as f:
        speakers = {line.split("/")[0] for line in f if line.strip()}
    assert len(speakers) == 10
    # utterances are non-degenerate audio
    assert 0.005 < float(np.abs(b["x"]).std()) < 1.0
