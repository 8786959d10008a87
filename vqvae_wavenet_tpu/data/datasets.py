"""Data pipeline: VCTK / LibriSpeech / Aishell manifest readers with an
infinite random-crop sampler feeding sharded device arrays.

Reference semantics (dataset.py:9-144):
  * manifest file lists wav paths; speaker file maps "speaker, int";
    speaker id is parsed from the path by a per-corpus split function
    (LibriSpeech dataset.py:114-122, VCTK :125-133, Aishell :136-144);
  * each element: uniformly sample a file, read wav, normalize int16 by
    (wav + 0.5)/32767.5 (:41), take a random max_len crop, yield
    (wav [max_len, 1], speaker one-hot [1, S]);
  * 48 kHz VCTK is resampled to 16 kHz (librosa in the reference; here
    scipy.signal.resample_poly — librosa is not available in this image).

Conscious fixes (documented per SURVEY.md §7):
  * files shorter than max_len are zero-padded instead of crashing
    (reference dataset.py:42-43 raises on len(wav) <= max_len and relies on
    vctk_too_short.txt to exclude 3 files);
  * a real background-thread prefetcher replaces the reference's unprefetched
    generator (its .prefetch(4) is commented out, dataset.py:80).

The TF1 reference expects manifests at data/<name>.txt; this repo's copy of
the upstream keeps them under data/<corpus>_info/ — both locations are
searched.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Optional

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def get_speaker_to_int(speaker_path: str) -> dict:
    """Parse 'speaker, int' lines (utils.py:93-100)."""
    speaker_to_int = {}
    with open(speaker_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            speaker, number = line.split(", ")
            speaker_to_int[speaker] = int(number)
    return speaker_to_int


def write_speaker_to_int(file_list: str, write_as: str,
                         split_func: Callable[[str], str]):
    """Generate a speakers.txt from a manifest (utils.py:70-90)."""
    speaker_to_int = {}
    with open(file_list) as f:
        files = f.readlines()
    with open(write_as, "w") as out:
        for filename in files:
            speaker = split_func(filename.strip())
            if speaker not in speaker_to_int:
                speaker_to_int[speaker] = len(speaker_to_int)
                out.write(f"{speaker}, {speaker_to_int[speaker]}\n")
    return speaker_to_int


def get_speaker_info(speaker_to_int: dict, info_path: str) -> dict:
    """Speaker gender/accent metadata for the projector (utils.py:103-116);
    VCTK is detected by the absence of '|' in the header line."""
    with open(info_path) as f:
        lines = f.readlines()
    speaker_info = {}
    is_vctk = "|" not in lines[0]
    for line in lines[1:]:
        parts = line.split(maxsplit=1)
        if len(parts) < 2:
            continue
        speaker, info = parts
        speaker = ("p" if is_vctk else "") + speaker
        if speaker in speaker_to_int:
            speaker_info[speaker_to_int[speaker]] = "#".join(info.split())
    for v in speaker_to_int.values():
        speaker_info.setdefault(v, "missing_info")
    return speaker_info


def trim_silence(audio: np.ndarray, threshold: float = 0.01,
                 frame_length: int = 2048) -> np.ndarray:
    """Remove leading/trailing silence by frame RMS energy — the reference's
    librosa-based Dataset.trim_silence (dataset.py:23-31), in numpy (librosa
    is unavailable in this image).  Returns empty audio if all silent."""
    audio = np.asarray(audio)
    if audio.size < frame_length:
        frame_length = max(int(audio.size), 1)
    hop = frame_length // 4 or 1
    n_frames = 1 + max(audio.size - frame_length, 0) // hop
    rms = np.asarray([
        np.sqrt(np.mean(audio[i * hop:i * hop + frame_length] ** 2))
        for i in range(n_frames)])
    frames = np.nonzero(rms > threshold)[0]
    if frames.size == 0:
        return audio[0:0]
    start = frames[0] * hop
    end = min(frames[-1] * hop + frame_length, audio.size)
    return audio[start:end]


def read_wav_16k(path: str) -> np.ndarray:
    """Read a wav as float32 @16 kHz with the reference's int16
    normalization (dataset.py:41)."""
    sr, wav = wavfile.read(path)
    wav = np.asarray(wav)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    if wav.dtype == np.int16:
        wav = (wav.astype(np.float32) + 0.5) / 32767.5
    elif wav.dtype == np.int32:
        wav = (wav.astype(np.float32) + 0.5) / 2147483647.5
    else:
        wav = wav.astype(np.float32)
    if sr != 16000:
        g = np.gcd(int(sr), 16000)
        wav = resample_poly(wav, 16000 // g, sr // g).astype(np.float32)
    return wav


class Dataset:
    """Infinite uniform-file random-crop sampler (dataset.py:33-63)."""

    filename: str
    speaker_file: str
    data_dir: str
    split_func: Callable[[str], str]
    info_locations: tuple = ()
    # optional manifest of corrupt/too-short files to exclude (the reference
    # ships vctk_too_short.txt and relies on it because its crop crashes on
    # short wavs, dataset.py:42-43; here short files pad, but the exclusion
    # is still honored so regenerated manifests behave like upstream).
    exclude_file: Optional[str] = None

    def __init__(self, batch_size: int = 1, max_len: int = 5120,
                 relative_path: str = "data/", seed: Optional[int] = None,
                 prefetch: int = 4, trim_silence: bool = False):
        self.batch_size = batch_size
        self.max_len = max_len
        self.relative_path = relative_path
        self._rng = np.random.default_rng(seed)
        self._prefetch = prefetch
        # opt-in leading/trailing silence removal before the crop — the
        # reference applies this in its (deprecated) in-memory load path
        # (dataset.py:23-31); surfaced here as a loader option so the
        # behavior is reachable rather than dead code
        self.trim = trim_silence

        manifest = self._find(self.filename)
        speaker_file = self._find(self.speaker_file)
        self.speaker_to_int = get_speaker_to_int(speaker_file)
        self.num_speakers = len(self.speaker_to_int)
        with open(manifest) as f:
            self.all_files = [l.strip() for l in f if l.strip()]
        if self.exclude_file is not None:
            try:
                with open(self._find(self.exclude_file)) as f:
                    excluded = {l.strip() for l in f if l.strip()}
                self.all_files = [p for p in self.all_files
                                  if p not in excluded]
            except FileNotFoundError:
                pass
        self._rng.shuffle(self.all_files)
        self._queue = None

    def _find(self, name: str) -> str:
        for sub in ("",) + self.info_locations:
            candidate = os.path.join(self.relative_path, sub, name)
            if os.path.exists(candidate):
                return candidate
        raise FileNotFoundError(
            f"{name} not found under {self.relative_path} "
            f"(searched {('.',) + self.info_locations})")

    def _element(self):
        i = self._rng.integers(len(self.all_files))
        filename = self.all_files[i]
        wav = read_wav_16k(os.path.join(self.relative_path, self.data_dir,
                                        filename))
        if self.trim:
            wav = trim_silence(wav)
        if len(wav) <= self.max_len:
            wav = np.pad(wav, (0, self.max_len + 1 - len(wav)))
        start = self._rng.integers(0, len(wav) - self.max_len)
        crop = wav[start:start + self.max_len].reshape(self.max_len, 1)
        speaker_id = self.speaker_to_int[self.split_func(filename)]
        return crop.astype(np.float32), speaker_id

    def batch(self):
        """One host batch: x [B, max_len, 1] float32, y one-hot [B, 1, S]."""
        xs, ys = [], []
        for _ in range(self.batch_size):
            x, s = self._element()
            xs.append(x)
            ys.append(s)
        y = np.zeros((self.batch_size, 1, self.num_speakers), np.float32)
        y[np.arange(self.batch_size), 0, ys] = 1.0
        return {"x": np.stack(xs), "y": y}

    # ---- background prefetch (replaces tf.data's generator thread) ----
    def start(self):
        if self._queue is not None:
            return self
        self._queue = queue.Queue(maxsize=self._prefetch)
        self._stop = threading.Event()
        self._worker_error = None

        def worker():
            while not self._stop.is_set():
                try:
                    item = self.batch()
                except Exception as e:      # surface in next(), don't hang
                    self._worker_error = e
                    return
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()
        return self

    def next(self):
        if self._queue is None:
            return self.batch()
        while True:
            try:
                return self._queue.get(timeout=1.0)
            except queue.Empty:
                # a dead worker (e.g. missing wav) must raise here, not
                # leave the train loop blocked on an empty queue forever
                if self._worker_error is not None:
                    raise RuntimeError(
                        "dataset prefetch worker failed"
                    ) from self._worker_error

    def stop(self):
        if self._queue is not None:
            self._stop.set()
            self._thread.join(timeout=2)
            self._queue = None


class LibriSpeech(Dataset):
    filename = "librispeech_train_clean_100.txt"
    speaker_file = "librispeech_speakers.txt"
    data_dir = ""
    split_func = staticmethod(lambda s: s.split("/")[-1].split("-", 1)[0])
    info_locations = ("librispeech_info",)


class VCTK(Dataset):
    filename = "vctk_train.txt"
    speaker_file = "vctk_speakers.txt"
    data_dir = "VCTK-Corpus/wav48/"
    split_func = staticmethod(lambda s: s.split("/")[0])
    info_locations = ("vctk_info",)
    exclude_file = "vctk_too_short.txt"


class Aishell(Dataset):
    """Aishell corpus (reference dataset.py:136-144).

    Note: ``aishell_train.txt`` is absent here AND in the reference — the
    upstream copy is a missing git-LFS blob (see the reference's
    data/aishell_info/.MISSING_LARGE_BLOBS), so constructing this class
    raises FileNotFoundError on both repos until a manifest is supplied
    (one wav path per line, ``.../train/<speaker>/<file>.wav``)."""
    filename = "aishell_train.txt"
    speaker_file = "aishell_speakers.txt"
    data_dir = ""
    split_func = staticmethod(lambda s: s.split("/train/")[1].split("/")[0])
    info_locations = ("aishell_info",)


DATASETS = {"VCTK": VCTK, "LibriSpeech": LibriSpeech, "Aishell": Aishell}


def _wav_is_pcm16_16k(path: str) -> bool:
    """Header-only probe: RIFF/WAVE, PCM (format 1), 16-bit, 16 kHz — the
    native C++ loader handles exactly this (cpp/dataloader.cpp parses PCM16
    and does NOT resample, so 48 kHz VCTK originals must stay on the
    python path)."""
    try:
        with open(path, "rb") as f:
            if f.read(4) != b"RIFF":
                return False
            f.read(4)
            if f.read(4) != b"WAVE":
                return False
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    return False
                cid = hdr[:4]
                size = int.from_bytes(hdr[4:8], "little")
                if cid == b"fmt ":
                    fmt = f.read(min(size, 16))
                    if len(fmt) < 16:
                        return False
                    audio_format = int.from_bytes(fmt[0:2], "little")
                    rate = int.from_bytes(fmt[4:8], "little")
                    bits = int.from_bytes(fmt[14:16], "little")
                    return (audio_format == 1 and bits == 16
                            and rate == 16000)
                f.seek((size + 1) & ~1, 1)
    except OSError:
        return False


def make_input_pipeline(name: str, *, batch_size: int, max_len: int,
                        relative_path: str = "data/", loader: str = "auto",
                        seed: Optional[int] = None,
                        trim_silence: bool = False):
    """Construct the training input pipeline: the python prefetch Dataset
    or the native C++ thread-pooled loader (cpp/dataloader.cpp).

    loader:
      'python' — the Dataset above (resampling, trim_silence support);
      'native' — the C++ loader (16 kHz PCM16 corpora only; raises with
                 the reason when ineligible);
      'auto'   — native when the corpus qualifies, else python (e.g. the
                 48 kHz VCTK originals need python-side resampling).

    Returns an object exposing .next() -> {'x','y'}, .stop(), and
    .num_speakers — both loaders share this contract."""
    if name not in DATASETS:
        raise NotImplementedError(f"dataset {name} not implemented")
    if loader not in ("auto", "python", "native"):
        raise ValueError(f"unknown loader '{loader}'")
    ds = DATASETS[name](batch_size=batch_size, max_len=max_len,
                        relative_path=relative_path, seed=seed,
                        trim_silence=trim_silence)
    if loader in ("auto", "native"):
        from vqvae_wavenet_tpu.data import native_loader as nl
        reason = None
        if trim_silence:
            reason = "trim_silence is python-only"
        elif not nl.native_available():
            reason = "native library failed to build"
        else:
            probe = os.path.join(relative_path, ds.data_dir,
                                 ds.all_files[0])
            if not _wav_is_pcm16_16k(probe):
                reason = f"corpus is not 16 kHz PCM16 ({probe})"
        if reason is None:
            files = [os.path.join(relative_path, ds.data_dir, f)
                     for f in ds.all_files]
            ids = [ds.speaker_to_int[ds.split_func(f)]
                   for f in ds.all_files]
            pipe = nl.NativeLoader(files, ids, ds.num_speakers,
                                   batch_size, max_len,
                                   seed=seed if seed is not None else 0)
            print(f"[data] native C++ loader: {len(files)} files, "
                  f"4 worker threads")
            return pipe
        if loader == "native":
            raise RuntimeError(f"-loader native unavailable: {reason}")
        print(f"[data] native loader ineligible ({reason}); "
              f"using the python pipeline")
    return ds.start()


if __name__ == "__main__":
    # regenerate speaker map files from manifests (reference utils.py main)
    import sys
    root = sys.argv[1] if len(sys.argv) > 1 else "data/"
    write_speaker_to_int(os.path.join(root, "vctk_train.txt"),
                         os.path.join(root, "vctk_speakers.txt"),
                         lambda s: s.split("/")[0])
    write_speaker_to_int(os.path.join(root, "librispeech_train_clean_100.txt"),
                         os.path.join(root, "librispeech_speakers.txt"),
                         lambda s: s.split("/")[-1].split("-", 1)[0])
