"""VQVAE assembly: encoder -> VQ -> speaker conditioning -> WaveNet decoder,
with the reference's loss (model.py:4-159) and the dormant-but-implemented
2019-paper conditioning options (decoder.py:22-28, decoder_ops.py:5-43)
as first-class config switches.

Conditioning layout (reference decoder.py:30-36 + decoder_ops.py:39-43):
the speaker vector h — a learned embedding looked up by argmax of the one-hot
(model.py:19-32) when speaker_embedding > 0, else the raw one-hot — is tiled
over latent time and CONCATENATED onto the local condition; the WaveNet
global-condition input stays None.

Reference quirk (preserved, see generate.py:46-61): an all-zero one-hot
("None" speaker) still argmax-selects index 0, so "no speaker" conditions on
speaker 0's embedding when speaker_embedding > 0.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vqvae_wavenet_tpu.config import ModelConfig
from vqvae_wavenet_tpu.models import encoders as enc
from vqvae_wavenet_tpu.models import vq as vq_mod
from vqvae_wavenet_tpu.models.wavenet import (
    init_wavenet_params, wavenet_forward, wavenet_loss)
from vqvae_wavenet_tpu.ops.conv import conv1d, uniform_unit_scaling_init


def _gc_channels(cfg: ModelConfig, num_speakers: int) -> int:
    if cfg.speaker_embedding > 0:
        return cfg.speaker_embedding
    return num_speakers


def lc_channels(cfg: ModelConfig, num_speakers: Optional[int]) -> int:
    base = 128 if cfg.condition_upsample else cfg.latent_dim
    if num_speakers is None:
        return base
    if cfg.condition_upsample:
        return base  # conv_3_128 consumes the concat -> fixed 128 channels
    return cfg.latent_dim + _gc_channels(cfg, num_speakers)


def init_vqvae(key, cfg: ModelConfig, num_speakers: Optional[int]):
    """Returns (params, state).  state holds encoder BN running stats and VQ
    EMA statistics; params everything the optimizer trains."""
    k_enc, k_vq, k_spk, k_dec, k_cond = jax.random.split(key, 5)
    enc_params, enc_state = enc.init_encoder(k_enc, cfg.encoder, cfg.latent_dim)
    params = {"encoder": enc_params, "decoder": None}
    state = {"encoder": enc_state}

    if cfg.use_vq:
        params["vq"] = vq_mod.init_vq_params(k_vq, cfg.k, cfg.latent_dim,
                                             init=cfg.codebook_init)
        if cfg.vq_mode == "ema":
            state["vq"] = vq_mod.init_vq_state(params["vq"])

    if num_speakers is not None and cfg.speaker_embedding > 0:
        # uniform_unit_scaling(2.0) init — model.py:26
        params["speaker_embedding"] = uniform_unit_scaling_init(
            k_spk, (num_speakers, cfg.speaker_embedding), factor=2.0)

    if cfg.condition_upsample:
        cin = cfg.latent_dim + (_gc_channels(cfg, num_speakers)
                                if num_speakers is not None else 0)
        params["cond_conv"] = {
            "kernel": enc.glorot_uniform_init(k_cond, (3, cin, 128)),
            "bias": jnp.zeros((128,))}

    params["decoder"] = init_wavenet_params(
        k_dec, cfg.wavenet, lc_channels(cfg, num_speakers), None)
    return params, state


def speaker_vector(params, cfg: ModelConfig, y):
    """y: one-hot [B, 1, num_speakers] -> h [B, 1, C_gc] (model.py:19-32)."""
    if y is None:
        return None
    if cfg.speaker_embedding > 0:
        idx = jnp.argmax(y, axis=-1)  # [B, 1]; all-zero one-hot -> index 0
        return jnp.take(params["speaker_embedding"], idx, axis=0)
    return y


def time_jitter(lc, rng, prob: float = 0.12):
    """2019-paper latent time-jitter (decoder_ops.py:5-28): each frame is
    replaced by its left/right neighbor with prob 0.06 each.  Unlike the
    reference — which jitters the flattened [B*T] axis and so leaks across
    batch boundaries — this is applied per sequence with edge reflection."""
    b, t, c = lc.shape
    move = jax.random.categorical(
        rng, jnp.log(jnp.asarray([prob / 2, 1 - prob, prob / 2])),
        shape=(b, t)) - 1
    idx = jnp.arange(t)[None, :] + move
    idx = idx + 2 * (idx < 0).astype(jnp.int32)
    idx = idx - 2 * (idx >= t).astype(jnp.int32)
    return jnp.take_along_axis(lc, idx[..., None], axis=1)


def build_local_condition(params, cfg: ModelConfig, z_q, y, *,
                          train: bool, rng=None, target_len: Optional[int] = None):
    """concat(z_q, tiled h) (+ optional jitter/conv/upsample).  Returns
    [B, T_cond, C_lc]."""
    h = speaker_vector(params, cfg, y)
    lc = z_q
    if h is not None:
        lc = jnp.concatenate(
            [lc, jnp.broadcast_to(h, (lc.shape[0], lc.shape[1], h.shape[-1]))],
            axis=-1)
    if cfg.time_jitter and train and rng is not None:
        lc = time_jitter(lc, rng)
    if cfg.condition_upsample:
        lc = conv1d(lc, params["cond_conv"]["kernel"],
                    params["cond_conv"]["bias"], padding="SAME")
        if target_len is not None and target_len != lc.shape[1]:
            lc = jnp.repeat(lc, target_len // lc.shape[1], axis=1)
    return lc


def vqvae_forward(params, state, cfg: ModelConfig, x, y, *, train: bool,
                  rng=None, axis_name: Optional[str] = None):
    """Full forward pass.

    Args:
      x: [B, T, 1] raw waveform; y: one-hot [B, 1, num_speakers] or None.
    Returns:
      (loss, aux) where aux carries the individual losses, metrics, new
      model state, and the tensors the reference exposes (z_e, z_q, q_z_x).
    """
    if cfg.train_dtype == "bf16" and cfg.encoder != "2019":
        # mixed precision covers the encoder too (round 3): convs in bf16
        # on the MXU, norm STATISTICS in f32 (encoders.py::batch_norm),
        # z_e back to f32 so the VQ argmin keeps full precision.  The
        # 2019 encoder stays f32 — its MFCC front end frames/FFTs the
        # waveform, which bf16 would degrade.
        enc16 = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16), params["encoder"])
        z_e, enc_state = enc.encoder_forward(
            cfg.encoder, enc16, state["encoder"], x.astype(jnp.bfloat16),
            train=train, norm=cfg.encoder_norm, axis_name=axis_name)
        z_e = z_e.astype(jnp.float32)
    else:
        z_e, enc_state = enc.encoder_forward(
            cfg.encoder, params["encoder"], state["encoder"], x,
            train=train, norm=cfg.encoder_norm, axis_name=axis_name)

    aux = {"z_e": z_e, "state": {"encoder": enc_state}}
    if cfg.use_vq:
        q = vq_mod.quantize(params["vq"], z_e, mode=cfg.vq_mode)
        z_q, e_k = q["z_q"], q["e_k"]
        aux.update(q_z_x=q["q_z_x"], perplexity=q["perplexity"], z_q=z_q,
                   e_k=e_k, distances_mean=q["distances_mean"])
        if "vq" in state:
            aux["state"]["vq"] = state["vq"]
    else:
        z_q = e_k = z_e
        aux["z_q"] = z_q

    lc = build_local_condition(params, cfg, z_q, y, train=train, rng=rng,
                               target_len=x.shape[1])
    if cfg.train_dtype == "bf16":
        # mixed precision: the decoder stack (the FLOP-dominant part) runs
        # in bf16 with f32 accumulation; labels come from the f32 waveform
        # (mu-law bin edges must not move), loss/softmax stay f32
        from vqvae_wavenet_tpu.models.wavenet import wavenet_logits
        from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode
        from vqvae_wavenet_tpu.ops import train_pallas as tp
        dec16 = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16), params["decoder"])
        Q = cfg.wavenet.quantization_channels
        labels2 = mu_law_encode(x, Q, to_int=True)[..., 0]   # [B, T]
        lc16 = lc.astype(jnp.bfloat16)
        on_tpu = jax.default_backend() == "tpu"
        use_fe = (cfg.train_engine != "xla" and tp._EPILOGUE == "auto"
                  and (on_tpu or cfg.train_engine == "pallas")
                  and "lc_kernel" in dec16["postprocess1"]
                  and tp.fused_epilogue_eligible(
                      cfg.wavenet.skip_filters, Q, x.shape[0], x.shape[1],
                      lc.shape[1]))
        if use_fe:
            # round 5: the postprocess heads + CE run as one fused
            # kernel pair over the stack's skip output instead of XLA's
            # per-op chain (~3.4 ms fwd+bwd standalone, exp_r5_epilogue)
            skip = wavenet_logits(dec16, cfg.wavenet,
                                  x.astype(jnp.bfloat16), lc16,
                                  engine=cfg.train_engine,
                                  return_skip=True)
            recon = tp.fused_epilogue(
                dec16["postprocess1"], dec16["postprocess2"], skip, lc16,
                None, labels2, interpret=not on_tpu)
        else:
            logits = wavenet_logits(dec16, cfg.wavenet,
                                    x.astype(jnp.bfloat16), lc16,
                                    engine=cfg.train_engine)
            recon = wavenet_loss(
                logits.astype(jnp.float32).reshape(-1, Q),
                labels2.reshape(-1))
    else:
        logits, labels = wavenet_forward(params["decoder"], cfg.wavenet,
                                         x, lc, engine=cfg.train_engine)
        recon = wavenet_loss(logits, labels)
    loss = recon
    aux["reconstruction_loss"] = recon

    if cfg.use_vq:
        vq_loss, commitment = vq_mod.vq_losses(z_e, e_k, cfg.beta,
                                               mode=cfg.vq_mode)
        loss = loss + vq_loss + commitment
        aux["vq_loss"] = vq_loss
        aux["commitment_loss"] = commitment

    aux["loss"] = loss
    return loss, aux


def vqvae_encode(params, state, cfg: ModelConfig, x, y):
    """Generation-time encoding pass (model.py:133-142 + decoder.py:40-50):
    run encoder + VQ once over the whole conditioning wav and return the
    decoder's local condition (z_q concat speaker), plus the code indices."""
    z_e, _ = enc.encoder_forward(cfg.encoder, params["encoder"],
                                 state["encoder"], x, train=False,
                                 norm=cfg.encoder_norm)
    if cfg.use_vq:
        q = vq_mod.quantize(params["vq"], z_e, mode=cfg.vq_mode)
        z_q, codes = q["z_q"], q["q_z_x"]
    else:
        z_q, codes = z_e, None
    lc = build_local_condition(params, cfg, z_q, y, train=False,
                               target_len=x.shape[1])
    return lc, codes
