"""Config loaders preserving the reference's JSON schemas verbatim.

``model_parameters.json`` keys (reference model_parameters.json:1-28 and
train.py:54-78): encoder ("64" | "Magenta" | "2019"), use_vq, speaker_embedding
(dim, 0 disables the learned embedding), k (codebook size), latent_dim, beta,
wavenet_parameters (path), verbose, learning_rate_schedule ({step: lr}).

``wavenet_parameters.json`` keys (reference wavenet_parameters.json:1-28 and
Decoder/WaveNet/wavenet.py:10-21): verbose, quantization_channels, num_cycles,
num_cycle_layers, dilation_rates, kernel_size, dilation_filters, skip_filters,
residual_filters, preprocess {kernel_size, filters}.

New optional keys (all default to reference behavior when absent):
  model_parameters: "vq_mode" ("st" | "ema" | "joint"; default "st"),
  "ema_decay" (codebook EMA, default 0.99), "time_jitter" (bool, the dormant
  2019-paper conditioning ops, decoder_ops.py:5-28), "condition_upsample"
  (bool — conv_3_128 + UpSampling1D path, decoder.py:22-28), "encoder_norm"
  ("batch" | "group", Encoder_64 normalization under pjit), "codebook_init"
  ("uniform_scaling" | "normal", the README.md:28-30 experiment axis).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any


def _receptive_field(wavenet_args: dict) -> int:
    """sum(dilations)*(K-1) + 1 + (preprocess_K - 1) — wavenet.py:16-17."""
    k = wavenet_args["kernel_size"]
    rf = sum(wavenet_args["dilation_rates"]) * (k - 1) + 1
    rf += wavenet_args["preprocess"]["kernel_size"] - 1
    return rf


@dataclass(frozen=True)
class WavenetConfig:
    quantization_channels: int = 256
    num_cycles: int = 3
    num_cycle_layers: int = 10
    dilation_rates: list = field(default_factory=lambda: [
        1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
        1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
        1, 2, 4, 8, 16, 32, 64, 128, 256, 512])
    kernel_size: int = 3
    dilation_filters: int = 256
    skip_filters: int = 512
    residual_filters: int = 256
    preprocess_kernel_size: int = 32
    preprocess_filters: int = 256
    verbose: bool = False

    def __post_init__(self):
        # tuple-ify so the config is hashable (jit static argument)
        object.__setattr__(self, "dilation_rates",
                           tuple(self.dilation_rates))
        assert len(self.dilation_rates) == self.num_cycles * self.num_cycle_layers, (
            "dilation_rates length must equal num_cycles * num_cycle_layers "
            "(reference wavenet.py:13)")

    @property
    def num_layers(self) -> int:
        return len(self.dilation_rates)

    @property
    def max_dilation(self) -> int:
        return max(self.dilation_rates)

    @property
    def receptive_field(self) -> int:
        rf = sum(self.dilation_rates) * (self.kernel_size - 1) + 1
        return rf + self.preprocess_kernel_size - 1

    @classmethod
    def from_json(cls, path: str) -> "WavenetConfig":
        with open(path) as f:
            args = json.load(f)
        return cls.from_dict(args)

    @classmethod
    def from_dict(cls, args: dict) -> "WavenetConfig":
        return cls(
            quantization_channels=args["quantization_channels"],
            num_cycles=args["num_cycles"],
            num_cycle_layers=args["num_cycle_layers"],
            dilation_rates=list(args["dilation_rates"]),
            kernel_size=args["kernel_size"],
            dilation_filters=args["dilation_filters"],
            skip_filters=args["skip_filters"],
            residual_filters=args["residual_filters"],
            preprocess_kernel_size=args["preprocess"]["kernel_size"],
            preprocess_filters=args["preprocess"]["filters"],
            verbose=args.get("verbose", False),
        )

    def to_dict(self) -> dict:
        return {
            "verbose": self.verbose,
            "quantization_channels": self.quantization_channels,
            "num_cycles": self.num_cycles,
            "num_cycle_layers": self.num_cycle_layers,
            "dilation_rates": list(self.dilation_rates),
            "kernel_size": self.kernel_size,
            "dilation_filters": self.dilation_filters,
            "skip_filters": self.skip_filters,
            "residual_filters": self.residual_filters,
            "preprocess": {"kernel_size": self.preprocess_kernel_size,
                           "filters": self.preprocess_filters},
        }


@dataclass
class ModelConfig:
    encoder: str = "64"
    use_vq: bool = True
    speaker_embedding: int = 64
    k: int = 512
    latent_dim: int = 64
    beta: float = 0.25
    wavenet: WavenetConfig = field(default_factory=WavenetConfig)
    learning_rate_schedule: dict = field(default_factory=lambda: {0: 8e-5})
    verbose: bool = False
    # Extensions (default = reference behavior)
    vq_mode: str = "st"          # "st" | "ema" | "joint"
    ema_decay: float = 0.99      # codebook EMA decay (Magenta/sonnet.py:124-261)
    time_jitter: bool = False    # decoder_ops.py:5-28 (dormant in reference)
    condition_upsample: bool = False  # decoder.py:22-28 (dormant in reference)
    encoder_norm: str = "batch"  # Encoder_64 BatchNorm vs GroupNorm under pjit
    # codebook init: "uniform_scaling" (model.py:45-48) or "normal" — the
    # documented experiment axis of reference README.md:28-30.
    codebook_init: str = "uniform_scaling"
    # "vqvae" (the main implementation) | "magenta" (the vendored 50-layer
    # Magenta/nsynth variant, reference Magenta/config.py — hyperparams are
    # module-level constants there, so the JSON needs no further keys).
    model_family: str = "vqvae"
    # mixed-precision training: "bf16" runs the WaveNet decoder stack (the
    # FLOP-dominant part) in bfloat16 with f32 accumulation; params, labels,
    # losses, encoder, VQ and the optimizer stay f32.  Default = reference
    # behavior (f32 everywhere).
    train_dtype: str = "f32"
    # training decoder engine: "auto" uses the fused Pallas residual-stack
    # kernel (ops/train_pallas.py) on TPU when the config is eligible;
    # "xla" forces the unrolled XLA path; "pallas" forces the kernel
    # (interpreted off-TPU — for tests).
    train_engine: str = "auto"

    @classmethod
    def from_json(cls, path: str) -> "ModelConfig":
        with open(path) as f:
            p = json.load(f)
        if p.get("model_family") == "magenta":
            # hyperparams are hardcoded in the reference (Magenta/config.py:
            # 4-16, 145-152); only the LR schedule is overridable here
            from vqvae_wavenet_tpu.models.magenta import (
                magenta_wavenet_config, MAGENTA_LR_SCHEDULE)
            return cls(
                model_family="magenta", encoder="Magenta", k=512,
                latent_dim=64, speaker_embedding=64, beta=0.25, use_vq=True,
                wavenet=magenta_wavenet_config(),
                learning_rate_schedule={
                    int(s): float(v) for s, v in p.get(
                        "learning_rate_schedule",
                        {str(k): v for k, v in MAGENTA_LR_SCHEDULE.items()}
                    ).items()},
                verbose=p.get("verbose", False),
                # extension keys shared with the main schema: bf16 mixed
                # precision engages the fused Pallas training kernels
                # for the 50-layer preset too (PERF.md #24)
                train_dtype=p.get("train_dtype", "f32"),
                train_engine=p.get("train_engine", "auto"))
        wn_path = p["wavenet_parameters"]
        if not os.path.isabs(wn_path):
            candidate = os.path.join(os.path.dirname(os.path.abspath(path)), wn_path)
            wn_path = candidate if os.path.exists(candidate) else wn_path
        return cls(
            encoder=p["encoder"],
            use_vq=p["use_vq"],
            speaker_embedding=p["speaker_embedding"],
            k=p["k"],
            latent_dim=p["latent_dim"],
            beta=p["beta"],
            wavenet=WavenetConfig.from_json(wn_path),
            learning_rate_schedule={int(s): float(v)
                                    for s, v in p["learning_rate_schedule"].items()},
            verbose=p.get("verbose", False),
            vq_mode=p.get("vq_mode", "st"),
            ema_decay=p.get("ema_decay", 0.99),
            time_jitter=p.get("time_jitter", False),
            condition_upsample=p.get("condition_upsample", False),
            encoder_norm=p.get("encoder_norm", "batch"),
            codebook_init=p.get("codebook_init", "uniform_scaling"),
            train_dtype=p.get("train_dtype", "f32"),
            train_engine=p.get("train_engine", "auto"),
        )
