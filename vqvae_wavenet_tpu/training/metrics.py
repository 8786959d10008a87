"""TensorBoard-compatible metrics (tensorboardX) + console progress line.

Mirrors the reference's metric set (SURVEY.md §5): scalar reconstruction /
vq / commitment losses + lr (model.py:95-104), histograms of z_e, codebook,
q(z|x) usage and speaker embedding (model.py:28-69), PLUS codebook
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
