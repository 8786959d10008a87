"""The vendored Magenta/nsynth architecture as a config preset + model
(reference Magenta/config.py, Magenta/masked.py) — reproduced as a second
model family on the shared WaveNet machinery, NOT a second codebase
(SURVEY.md §2b).

Differences from the main implementation, all reproduced:
  * decoder: 50 layers x 10 stages (dilations 2^(i%10)), width 256,
    skip 512, filter_length 2, NO k=32 preprocess (startconv k=2 doubles as
    it) — Magenta/config.py:4-16, 296-360;
  * gate halves swapped: sigmoid(first half) * tanh(second half)
    (config.py:345-348 vs wavenet_ops.py:112-113);
  * global condition added PER LAYER via a biased 1x1 ('add_gc',
    config.py:178-192) instead of concat-into-lc; bias init 1.0;
  * conv bias init 1.0 throughout (masked.py:72);
  * encoder: k=1 non-causal startconv -> 6 x [causal gated dilated conv
    (dilations 2^(i%5)) + 1x1 residual + avg-pool stride 2] -> 1x1
    bottleneck 64 (config.py:213-249);
  * loss adds the L2 regularization term the main impl registers but never
    uses: decay=1e-6 on all weights, decay*10 on the codebook
    (config.py:405-409);
  * Adam beta1 = 0.5 (config.py:415) and its own LR schedule
    (config.py:145-152).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode
from vqvae_wavenet_tpu.ops.conv import (
    conv1d, causal_conv1d, uniform_unit_scaling_init)
from vqvae_wavenet_tpu.ops.signal import pool1d
from vqvae_wavenet_tpu.models import vq as vq_mod
from vqvae_wavenet_tpu.models.wavenet import (
    init_wavenet_params, wavenet_logits, wavenet_loss)

MAGENTA_LR_SCHEDULE = {0: 1e-4, 60000: 8e-5, 80000: 6e-5, 100000: 4e-5,
                       120000: 2e-5, 140000: 1e-5}
MAGENTA_DECAY = 1e-6

# module-top hyperparams of Magenta/config.py:4-16
NUM_STAGES = 10
NUM_LAYERS = 50
FILTER_LENGTH = 2
WIDTH = 256
SKIP_WIDTH = 512
AE_NUM_STAGES = 5
AE_NUM_LAYERS = 6
AE_FILTER_LENGTH = 3
AE_WIDTH = 368
AE_BOTTLENECK_WIDTH = 64
K_CODES = 512


def magenta_wavenet_config() -> WavenetConfig:
    return WavenetConfig(
        quantization_channels=256,
        num_cycles=NUM_LAYERS // NUM_STAGES,
        num_cycle_layers=NUM_STAGES,
        dilation_rates=[2 ** (i % NUM_STAGES) for i in range(NUM_LAYERS)],
        kernel_size=FILTER_LENGTH,
        dilation_filters=WIDTH,
        skip_filters=SKIP_WIDTH,
        residual_filters=WIDTH,
        preprocess_kernel_size=FILTER_LENGTH,  # = 'startconv'
        preprocess_filters=WIDTH,
    )


def init_magenta_params(key, num_speakers: int = 109):
    keys = iter(jax.random.split(key, 64))

    def uus(shape):
        return uniform_unit_scaling_init(next(keys), shape, 1.0)

    def conv_p(ksize, cin, cout):
        # masked.py conv1d: uus(1.0) kernel, CONSTANT 1.0 bias (masked.py:72)
        return {"kernel": uus((ksize, cin, cout)),
                "bias": jnp.ones((cout,))}

    encoder = {
        "startconv": conv_p(1, 1, AE_WIDTH),
        "layers": [
            {"conv": conv_p(AE_FILTER_LENGTH, AE_WIDTH, AE_WIDTH),
             "gate": conv_p(AE_FILTER_LENGTH, AE_WIDTH, AE_WIDTH),
             "res": conv_p(1, AE_WIDTH, AE_WIDTH)}
            for _ in range(AE_NUM_LAYERS)],
        "bottleneck": conv_p(1, AE_WIDTH, AE_BOTTLENECK_WIDTH),
    }

    cfg = magenta_wavenet_config()
    decoder = init_wavenet_params(next(keys), cfg,
                                  lc_channels=AE_BOTTLENECK_WIDTH,
                                  gc_channels=AE_BOTTLENECK_WIDTH)
    # Magenta conv biases init 1.0; condition 1x1s keep no bias (linear,
    # config.py:165-176 via conv1d default... cond_map uses conv1d with bias)
    decoder["preprocess"]["bias"] = jnp.ones_like(decoder["preprocess"]["bias"])
    decoder["skip_start"]["bias"] = jnp.ones_like(decoder["skip_start"]["bias"])
    L = cfg.num_layers
    decoder["layers"]["bias"] = jnp.ones_like(decoder["layers"]["bias"])
    decoder["layers"]["skip_bias"] = jnp.ones_like(decoder["layers"]["skip_bias"])
    decoder["layers"]["res_bias"] = jnp.ones_like(decoder["layers"]["res_bias"])
    decoder["layers"]["gc_bias"] = jnp.ones((L, 2 * WIDTH))   # add_gc bias
    decoder["postprocess1"]["bias"] = jnp.ones_like(decoder["postprocess1"]["bias"])
    decoder["postprocess1"]["gc_bias"] = jnp.ones((SKIP_WIDTH,))
    decoder["postprocess2"]["bias"] = jnp.ones_like(decoder["postprocess2"]["bias"])

    params = {
        "encoder": encoder,
        "vq": {"embedding": uniform_unit_scaling_init(
            next(keys), (K_CODES, AE_BOTTLENECK_WIDTH), factor=1.0)},
        "speaker_emb": uus((num_speakers, AE_BOTTLENECK_WIDTH)),
        "decoder": decoder,
    }
    return params


def magenta_encode(params, x):
    """x [B, T, 1] -> z_e [B, T/64, 64] (config.py:200-249)."""
    x_scaled = mu_law_encode(x)
    en = conv1d(x_scaled, params["startconv"]["kernel"],
                params["startconv"]["bias"], padding="SAME")
    for i, layer in enumerate(params["layers"]):
        dilation = 2 ** (i % AE_NUM_STAGES)
        conv = causal_conv1d(en, layer["conv"]["kernel"],
                             layer["conv"]["bias"], dilation=dilation)
        gate = causal_conv1d(en, layer["gate"]["kernel"],
                             layer["gate"]["bias"], dilation=dilation)
        d = jnp.tanh(conv) * jax.nn.sigmoid(gate)
        en = en + conv1d(d, layer["res"]["kernel"], layer["res"]["bias"],
                         padding="SAME")
        en = pool1d(en, 2, mode="avg")
    return conv1d(en, params["bottleneck"]["kernel"],
                  params["bottleneck"]["bias"], padding="SAME")


def regularization_loss(params):
    """sum over leaves of decay * ||w||^2, with decay*10 on the codebook
    (config.py:405-409; the per-variable l2 regularizers)."""
    def leaf_loss(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        decay = MAGENTA_DECAY * (10.0 if "embedding" in path_str else 1.0)
        return decay * jnp.sum(jnp.square(leaf))

    losses = jax.tree_util.tree_map_with_path(leaf_loss, params)
    return sum(jax.tree_util.tree_leaves(losses))


def magenta_forward(params, x, gc_one_hot, train_dtype: str = "f32",
                    engine: str = "auto"):
    """Full training forward (config.py:194-409).

    Args:
      x: [B, T, 1] raw waveform; gc_one_hot: [B, 1, num_speakers].
      train_dtype: 'bf16' runs the 50-layer decoder stack in bf16 mixed
        precision (master params stay f32; labels and losses f32) — the
        same contract as the main family's ModelConfig.train_dtype —
        which also makes the fused Pallas training kernels eligible
        (PERF.md #24).
      engine: ModelConfig.train_engine ('auto' | 'xla' | 'pallas'),
        forwarded to wavenet_logits — '"train_engine": "xla"' in
        magenta_parameters.json disables the fused kernels here exactly
        as it does for the main family (vqvae.py).
    Returns: (loss, aux).
    """
    cfg = magenta_wavenet_config()
    z_e = magenta_encode(params["encoder"], x)
    q = vq_mod.quantize(params["vq"], z_e, mode="st")
    e_k, z_q = q["e_k"], q["z_q"]

    vq_loss = jnp.mean((jax.lax.stop_gradient(z_e) - e_k) ** 2)
    commitment_loss = 0.25 * jnp.mean(
        (z_e - jax.lax.stop_gradient(e_k)) ** 2)

    gc_idx = jnp.argmax(gc_one_hot, axis=-1)        # [B, 1]
    gc = jnp.take(params["speaker_emb"], gc_idx, axis=0)  # [B, 1, 64]

    Q = cfg.quantization_channels
    labels = mu_law_encode(x, Q, to_int=True).reshape(-1)  # f32 input
    dec = params["decoder"]
    x_dec, z_q_dec, gc_dec = x, z_q, gc
    if train_dtype == "bf16":
        dec = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16), dec)
        x_dec = x.astype(jnp.bfloat16)
        z_q_dec = z_q.astype(jnp.bfloat16)
        gc_dec = gc.astype(jnp.bfloat16)
    logits = wavenet_logits(dec, cfg, x_dec,
                            local_condition=z_q_dec,
                            global_condition=gc_dec,
                            gate_order="sigmoid_first",
                            engine=engine)
    recon = wavenet_loss(
        logits.astype(jnp.float32).reshape(-1, Q), labels)
    reg = regularization_loss(params)
    loss = recon + reg + vq_loss + commitment_loss
    return loss, {
        "reconstruction_loss": recon, "vq_loss": vq_loss,
        "commitment_loss": commitment_loss, "reg_loss": reg,
        "perplexity": q["perplexity"], "z_e": z_e, "encoding": e_k,
        "q_z_x": q["q_z_x"],
        # the live codebook-health cue the main family's progress line
        # shows ([dist ...], train.py) — same closed-form mean ||z_e-e||^2
        "distances_mean": q["distances_mean"],
    }


def make_magenta_optimizer(schedule: dict = None):
    """Adam(beta1=0.5) + the Magenta LR schedule (config.py:145-152, 415)."""
    from vqvae_wavenet_tpu.training.optimizer import piecewise_constant_schedule
    return optax.adam(piecewise_constant_schedule(schedule or MAGENTA_LR_SCHEDULE),
                      b1=0.5, b2=0.999)


def magenta_generate(params, x_cond, gc_one_hot, *, length: int = None,
                     key=None, mode: str = "sample",
                     compute_dtype=jnp.float32, engine: str = "auto",
                     verbose: bool = False, data_shards: int = 1):
    """End-to-end Magenta-variant generation (the reference's
    FastGenerationConfig + Magenta/generate.py flow): encode the
    conditioning wav once, then run the fast WaveNet with per-layer
    local (e_k) and global (speaker) conditioning.

    x_cond: [B, T, 1]; gc_one_hot: [B, 1, num_speakers].
    Returns float waveform [B, length].
    """
    from vqvae_wavenet_tpu.generation.fast import generate
    cfg = magenta_wavenet_config()
    length = length or x_cond.shape[1]
    z_e = magenta_encode(params["encoder"], x_cond)
    q = vq_mod.quantize(params["vq"], z_e, mode="st")
    encoding = q["e_k"]                 # config.py:278: decoder sees e_k
    if length > x_cond.shape[1]:
        # compile-bucket padding (generate.py): the encoder saw ONLY the
        # real wav; latent frames are zero-padded out to `length` — the
        # kept samples (t < x_cond length) never read the padded frames,
        # so the tail is bit-identical to an exact-length run
        ratio = x_cond.shape[1] // encoding.shape[1]
        assert length % ratio == 0
        encoding = jnp.pad(
            encoding,
            ((0, 0), (0, (length - x_cond.shape[1]) // ratio), (0, 0)))
    gc_idx = jnp.argmax(gc_one_hot, axis=-1)
    gc = jnp.take(params["speaker_emb"], gc_idx, axis=0)  # [B, 1, 64]
    if data_shards > 1:
        from vqvae_wavenet_tpu.parallel.genshard import generate_sharded
        return generate_sharded(
            params["decoder"], cfg, encoding, length=length, key=key,
            mode=mode, gate_order="sigmoid_first", global_condition=gc,
            compute_dtype=compute_dtype, engine=engine,
            num_shards=data_shards, verbose=verbose)
    return generate(params["decoder"], cfg, encoding, length=length,
                    key=key, mode=mode, gate_order="sigmoid_first",
                    global_condition=gc, compute_dtype=compute_dtype,
                    engine=engine, verbose=verbose)
