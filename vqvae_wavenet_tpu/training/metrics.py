"""TensorBoard-compatible metrics (tensorboardX) + console progress line.

Mirrors the reference's metric set (SURVEY.md §5): scalar reconstruction /
vq / commitment losses + lr (model.py:95-104); histograms of z_e (+ last-axis
moments), codebook (+ moments), distances, q(z|x) usage, e_k, speaker
embedding (+ moments) (model.py:28-69), per-layer conv kernels
(wavenet_ops.py:77-78), gradient histograms + global norm (the
optimize_loss summaries=['gradients'] set, model.py:119-124), PLUS codebook
perplexity (Magenta/sonnet.py:105-106 — the better usage metric), written
every ``interval`` steps; and train.py:116-119's `\\r` progress/ETA line.
"""
from __future__ import annotations

import numpy as np


class MetricWriter:
    def __init__(self, logdir: str):
        from tensorboardX import SummaryWriter
        self._w = SummaryWriter(logdir)

    def scalars(self, step: int, values: dict):
        for k, v in values.items():
            if k == "step":
                continue
            self._w.add_scalar(k, float(np.asarray(v)), step)

    def histograms(self, step: int, values: dict):
        for k, v in values.items():
            arr = np.asarray(v)
            if arr.size:
                self._w.add_histogram(k, arr, step)

    def flush(self):
        self._w.flush()

    def close(self):
        self._w.close()


def _moments(name: str, arr: np.ndarray, out: dict):
    """tf.nn.moments(x, [-1]) histograms: <name>_u (mean), <name>_v
    (variance) — model.py:29-30, 40-41, 50-52 naming."""
    out[name] = arr
    out[name + "_u"] = arr.mean(axis=-1)
    out[name + "_v"] = arr.var(axis=-1)


def summary_histograms(params, summaries: dict) -> dict:
    """Build the reference's full TensorBoard histogram dict from the
    post-step params and the train_step(with_summaries=True) tensors.

    Covers model.py:28-69 (z_e/embedding/speaker_embedding + moments,
    distances, q(z|x), e_k), wavenet_ops.py:77-78 (per-layer kernels) and
    model.py:119-124 (per-group gradient histograms)."""
    h = {}
    _moments("z_e", np.asarray(summaries["z_e"]), h)
    if "vq" in params:
        _moments("embedding", np.asarray(params["vq"]["embedding"]), h)
    spk = params.get("speaker_embedding", params.get("speaker_emb"))
    if spk is not None:
        _moments("speaker_embedding", np.asarray(spk), h)
    if "distances" in summaries:
        h["distances"] = np.asarray(summaries["distances"])
    if "q_z_x" in summaries:
        h["q(z|x)"] = np.asarray(summaries["q_z_x"])
    if "e_k" in summaries:
        h["e_k"] = np.asarray(summaries["e_k"])

    # per-layer conv kernel histograms (stacked [L, K, R, 2D] -> one per
    # layer, cycle_i/layer_j scope names per wavenet.py:63-74)
    dec = params.get("decoder", {})
    layers = dec.get("layers", {})
    if "kernel" in layers:
        kern = np.asarray(layers["kernel"])
        for i in range(kern.shape[0]):
            h[f"wavenet/layer_{i}/kernel"] = kern[i]
    for name in ("preprocess", "skip_start", "postprocess1", "postprocess2"):
        if name in dec and "kernel" in dec[name]:
            h[f"wavenet/{name}/kernel"] = np.asarray(dec[name]["kernel"])

    if "grads" in summaries:
        import jax
        flat = jax.tree_util.tree_flatten_with_path(summaries["grads"])[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            h[f"gradients/{name}"] = np.asarray(leaf)
    return h


def display_time(t: float, second: float) -> str:
    """Reference utils.py:49-67 progress formatting."""
    minute = hour = None
    if second > 60:
        minute = second // 60
        second %= 60
        if minute > 60:
            hour = minute // 60
            minute %= 60
    if hour is not None:
        return " [BATCH %.3fs / ETA %dh %dm %.3fs]     " % (t, hour, minute, second)
    if minute is not None:
        return " [BATCH %.3fs / ETA %dm %.3fs]     " % (t, minute, second)
    return " [BATCH %.3fs / ETA %.3fs]     " % (t, second)
