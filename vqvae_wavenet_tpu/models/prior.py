"""WaveNet prior over VQ code indices — finishes the reference's unfinished
TODO (prior.py:3-33 is a non-runnable sketch; README.md:90-91 "Train a prior
based on vq").

A small autoregressive gated dilated-conv stack over the discrete code
sequence q(z|x) [B, T_lat] (k-way categorical per frame), optionally
globally conditioned on the speaker vector.  With a trained prior, novel
audio can be generated end-to-end: sample codes from the prior, look up
codebook vectors, run the fast WaveNet decoder.

Mirrors the sketch's structure (preprocess causal conv -> residual blocks
with dropout -> relu -> postprocess convs -> logits) in functional JAX; the
sketch's BatchNorm is replaced by a (batch-independent) layer scale since
the prior operates on short latent sequences where BN adds state for no
benefit — documented departure.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from vqvae_wavenet_tpu.ops.conv import (
    causal_conv1d, uniform_unit_scaling_init)

PRIOR_DILATIONS = [1, 2, 4, 8, 1, 2, 4, 8]


def init_prior_params(key, k: int, *, embed_dim: int = 64, filters: int = 128,
                      kernel_size: int = 3, gc_channels: Optional[int] = None):
    keys = iter(jax.random.split(key, 8 + 6 * len(PRIOR_DILATIONS)))

    def uus(shape):
        return uniform_unit_scaling_init(next(keys), shape, 1.0)

    layers = []
    for _ in PRIOR_DILATIONS:
        layer = {
            "kernel": uus((kernel_size, filters, 2 * filters)),
            "bias": jnp.zeros((2 * filters,)),
            "skip_kernel": uus((filters, filters)),
            "skip_bias": jnp.zeros((filters,)),
            "res_kernel": uus((filters, filters)),
            "res_bias": jnp.zeros((filters,)),
        }
        if gc_channels is not None:
            layer["gc_kernel"] = uus((gc_channels, 2 * filters))
        layers.append(layer)
    return {
        "embed": uus((k, embed_dim)),
        "preprocess": {"kernel": uus((kernel_size, embed_dim, filters)),
                       "bias": jnp.zeros((filters,))},
        "layers": layers,
        "post1": {"kernel": uus((filters, filters)),
                  "bias": jnp.zeros((filters,))},
        "post2": {"kernel": uus((filters, k)), "bias": jnp.zeros((k,))},
    }


def prior_logits(params, codes, gc=None, *, dropout_rng=None,
                 dropout_rate: float = 0.0):
    """Teacher-forced logits.  codes: int32 [B, T] -> [B, T, k].
    Position t sees codes[< t] only (shift-right embedding)."""
    emb = jnp.take(params["embed"], codes, axis=0)         # [B, T, E]
    emb = jnp.pad(emb, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]  # shift right
    net = causal_conv1d(emb, params["preprocess"]["kernel"],
                        params["preprocess"]["bias"])
    skip_sum = jnp.zeros(net.shape[:2] + (net.shape[2],))
    f = net.shape[-1]
    for layer, d in zip(params["layers"], PRIOR_DILATIONS):
        pre = causal_conv1d(net, layer["kernel"], layer["bias"], dilation=d)
        if gc is not None and "gc_kernel" in layer:
            pre = pre + jnp.einsum("bsc,cf->bsf", gc, layer["gc_kernel"])
        gated = jnp.tanh(pre[..., :f]) * jax.nn.sigmoid(pre[..., f:])
        if dropout_rng is not None and dropout_rate > 0:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1 - dropout_rate, gated.shape)
            gated = jnp.where(keep, gated / (1 - dropout_rate), 0.0)
        skip_sum = skip_sum + jnp.einsum("btc,cf->btf", gated,
                                         layer["skip_kernel"]) + layer["skip_bias"]
        net = net + jnp.einsum("btc,cf->btf", gated,
                               layer["res_kernel"]) + layer["res_bias"]
    net = jax.nn.relu(skip_sum)
    net = jnp.einsum("btc,cf->btf", net, params["post1"]["kernel"]) \
        + params["post1"]["bias"]
    net = jax.nn.relu(net)
    return jnp.einsum("btc,cf->btf", net, params["post2"]["kernel"]) \
        + params["post2"]["bias"]


def prior_loss(params, codes, gc=None, *, dropout_rng=None,
               dropout_rate: float = 0.0):
    logits = prior_logits(params, codes, gc, dropout_rng=dropout_rng,
                          dropout_rate=dropout_rate)
    # f32 softmax regardless of the compute dtype (bf16 mixed-precision
    # training casts the params; the NLL itself must stay exact)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def prior_sample(params, key, *, batch_size: int, length: int, gc=None,
                 temperature: float = 1.0):
    """Autoregressive code sampling.  Latent sequences are short
    (T = length/64 frames), so each step recomputes the prefix — O(T^2)
    total but trivially cheap at this scale; returns int32 [B, length]."""
    codes0 = jnp.zeros((batch_size, length), jnp.int32)

    def body(carry, t):
        codes, key = carry
        logits = prior_logits(params, codes, gc)          # [B, T, k]
        logits_t = lax.dynamic_index_in_dim(logits, t, axis=1,
                                            keepdims=False)
        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, logits_t / temperature, axis=-1)
        codes = lax.dynamic_update_index_in_dim(
            codes, nxt.astype(jnp.int32), t, axis=1)
        return (codes, key), None

    (codes, _), _ = lax.scan(body, (codes0, key),
                             jnp.arange(length, dtype=jnp.int32))
    return codes
