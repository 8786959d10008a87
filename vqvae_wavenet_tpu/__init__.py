"""vqvae_wavenet_tpu — a TPU-native (JAX / XLA / Pallas / pjit) VQ-VAE-WaveNet
framework with the full capabilities of the TF1 reference
StanislavParovoy/VQ-VAE-WaveNet, re-designed TPU-first.

Layer map (mirrors SURVEY.md §1, rebuilt idiomatically):
  ops/        — L0 numerics: mu-law codec, causal dilated convs, conditioning,
                signal front-ends (MFCC), Pallas kernels for VQ + generation.
  models/     — L2/L3: WaveNet decoder, three encoder families, vector
                quantizer (ST / EMA / joint / off), VQVAE assembly, the
                Magenta/nsynth variant, and the WaveNet prior over codes.
  data/       — L1: VCTK / LibriSpeech / Aishell manifest pipelines with
                host-side prefetch into sharded device arrays.
  training/   — L4/L5: train step (pjit over a Mesh), piecewise LR, Adam,
                EMA param tree, orbax checkpointing, TB metrics.
  generation/ — fast autoregressive sampling as an on-device lax.scan with
                static-shape ring buffers (replaces the reference's
                one-session-call-per-sample FIFOQueue graph).
  parallel/   — mesh construction + sharding rules (DP/TP hooks).
"""

__version__ = "0.1.0"
