"""The three encoder families (reference Encoder/encoder.py).

  * Encoder_64  (encoder.py:8-26):  6 x [Conv1D f=768 k=5 s=2 'same' relu +
    BatchNorm] -> 1x1 conv to latent_dim -> BatchNorm.  64x downsample,
    non-causal, sees raw float waveform.
  * Encoder_Magenta (encoder.py:29-63): shift_right + mu-law float first,
    causal preprocess conv (f=128 k=5), then 6 blocks of
    [1x1 stride-2 conv -> parallel gate/filter causal convs at dilations
    [1,2,4,8,16,16] -> tanh*sigmoid -> 1x1 residual add], postprocess 1x1 to
    latent_dim.  (conv1d_v2 left-pads unconditionally, so ALL these convs are
    causal regardless of the 'VALID' padding arg — wavenet_ops.py:81.)
  * Encoder_2019 (encoder.py:66-98): MFCC front end (13 coeffs), 2x conv_3_768
    with residual, strided_conv_4_768 (s=2), 2 residual convs, 4 "relu layers"
    — reproduced faithfully as net = relu + relu, i.e. 2*conv(net), the
    reference's oddity at encoder.py:91-93 — then 1x1 to latent_dim.
    Downsample = 160 (hop) * 2 (stride) = 320 samples/frame.

TPU-first notes: all params are explicit pytrees; BatchNorm supports
cross-shard batch stats via psum over the data mesh axis (sync-BN) when
``axis_name`` is given — the correct generalization of the reference's
single-device keras BatchNorm under pjit — and a GroupNorm alternative is
available via ModelConfig.encoder_norm.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode
from vqvae_wavenet_tpu.ops.conv import (
    shift_right, conv1d, causal_conv1d, uniform_unit_scaling_init)
from vqvae_wavenet_tpu.ops.signal import mfcc


def glorot_uniform_init(key, shape, dtype=jnp.float32):
    """Keras Conv1D default kernel init: U(-l, l), l = sqrt(6/(fan_in+fan_out)).
    For [K, C_in, C_out]: fan_in = K*C_in, fan_out = K*C_out."""
    if len(shape) == 3:
        fan_in, fan_out = shape[0] * shape[1], shape[0] * shape[2]
    else:
        fan_in, fan_out = shape[0], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


# ---------------------------------------------------------------- BatchNorm

def init_batch_norm(channels: int):
    params = {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}
    state = {"mean": jnp.zeros((channels,)), "var": jnp.ones((channels,)),
             }
    return params, state


def batch_norm(params, state, x, *, train: bool, momentum: float = 0.99,
               eps: float = 1e-3, axis_name: Optional[str] = None):
    """Keras-default BatchNorm over (B, T).  Under pjit with the batch sharded
    on ``axis_name``, batch statistics are psum-synced across shards so the
    result is identical to the single-device computation.

    Statistics always accumulate in f32 (a no-op for f32 inputs; under the
    bf16 mixed-precision encoder, bf16 mean/variance accumulation would be
    unusable); the normalized output returns in x's dtype."""
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1))
        mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        new_state = {
            "mean": momentum * state["mean"] + (1 - momentum) * mean,
            "var": momentum * state["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"].astype(jnp.float32)
    out = (xf - mean) * inv + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype), new_state


def group_norm(params, x, *, num_groups: int = 8, eps: float = 1e-3):
    """Batch-independent alternative to BatchNorm (ModelConfig.encoder_norm
    = 'group'); no cross-shard sync or running stats needed.  Statistics
    in f32 (see batch_norm)."""
    b, t, c = x.shape
    g = num_groups if c % num_groups == 0 else 1
    xg = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = (xg.reshape(b, t, c) * params["scale"].astype(jnp.float32)
           + params["bias"].astype(jnp.float32))
    return out.astype(x.dtype)


# --------------------------------------------------------------- Encoder_64

def init_encoder_64(key, latent_dim: int, filters: int = 768,
                    kernel_size: int = 5, num_layers: int = 6):
    keys = jax.random.split(key, num_layers + 1)
    convs, bn_params, bn_state = [], [], []
    c_in = 1
    for i in range(num_layers):
        convs.append({"kernel": glorot_uniform_init(keys[i], (kernel_size, c_in, filters)),
                      "bias": jnp.zeros((filters,))})
        p, s = init_batch_norm(filters)
        bn_params.append(p)
        bn_state.append(s)
        c_in = filters
    out = {"kernel": glorot_uniform_init(keys[-1], (1, filters, latent_dim)),
           "bias": jnp.zeros((latent_dim,))}
    p, s = init_batch_norm(latent_dim)
    bn_params.append(p)
    bn_state.append(s)
    params = {"convs": convs, "out": out, "bn": bn_params}
    return params, {"bn": bn_state}


def encoder_64_forward(params, state, x, *, train: bool, norm: str = "batch",
                       axis_name: Optional[str] = None):
    """x: [B, T, 1] raw float wav -> z_e [B, T/64, latent_dim]."""
    net = x
    new_bn = []
    for i, conv in enumerate(params["convs"]):
        net = conv1d(net, conv["kernel"], conv["bias"], stride=2,
                     padding="SAME")
        net = jax.nn.relu(net)
        if norm == "batch":
            net, s = batch_norm(params["bn"][i], state["bn"][i], net,
                                train=train, axis_name=axis_name)
        else:
            net, s = group_norm(params["bn"][i], net), state["bn"][i]
        new_bn.append(s)
    net = conv1d(net, params["out"]["kernel"], params["out"]["bias"],
                 padding="VALID")
    i = len(params["convs"])
    if norm == "batch":
        net, s = batch_norm(params["bn"][i], state["bn"][i], net,
                            train=train, axis_name=axis_name)
    else:
        net, s = group_norm(params["bn"][i], net), state["bn"][i]
    new_bn.append(s)
    return net, {"bn": new_bn}


# ---------------------------------------------------------- Encoder_Magenta

MAGENTA_DILATIONS = [1, 2, 4, 8, 16, 16]


def init_encoder_magenta(key, latent_dim: int, filters: int = 128,
                         kernel_size: int = 5):
    n = len(MAGENTA_DILATIONS)
    keys = iter(jax.random.split(key, 4 * n + 2))

    def uus(shape):
        return uniform_unit_scaling_init(next(keys), shape, 1.0)

    layers = []
    for _ in MAGENTA_DILATIONS:
        layers.append({
            "down": {"kernel": uus((1, filters, filters)), "bias": jnp.zeros((filters,))},
            "gate": {"kernel": uus((kernel_size, filters, filters)), "bias": jnp.zeros((filters,))},
            "filter": {"kernel": uus((kernel_size, filters, filters)), "bias": jnp.zeros((filters,))},
            "residual": {"kernel": uus((1, filters, filters)), "bias": jnp.zeros((filters,))},
        })
    params = {
        "preprocess": {"kernel": uus((kernel_size, 1, filters)), "bias": jnp.zeros((filters,))},
        "layers": layers,
        "postprocess": {"kernel": uus((1, filters, latent_dim)), "bias": jnp.zeros((latent_dim,))},
    }
    return params, {}


def encoder_magenta_forward(params, state, x, *, train: bool = True, **_):
    """x: [B, T, 1] -> z_e [B, T/64, latent_dim] (six stride-2 1x1 convs).

    Mirrors encoder.py:38-63: shift_right, mu-law float, causal convs
    throughout (the reference's 'VALID' convs still left-pad)."""
    net = mu_law_encode(shift_right(x))
    en = causal_conv1d(net, params["preprocess"]["kernel"],
                       params["preprocess"]["bias"])
    for layer, dil in zip(params["layers"], MAGENTA_DILATIONS):
        d = conv1d(en, layer["down"]["kernel"], layer["down"]["bias"],
                   stride=2, padding="VALID")
        g = causal_conv1d(d, layer["gate"]["kernel"], layer["gate"]["bias"],
                          dilation=dil)
        f = causal_conv1d(d, layer["filter"]["kernel"], layer["filter"]["bias"],
                          dilation=dil)
        gated = jnp.tanh(g) * jax.nn.sigmoid(f)
        en = d + causal_conv1d(gated, layer["residual"]["kernel"],
                               layer["residual"]["bias"])
    z = causal_conv1d(en, params["postprocess"]["kernel"],
                      params["postprocess"]["bias"])
    return z, state


# ------------------------------------------------------------- Encoder_2019

def init_encoder_2019(key, latent_dim: int, filters: int = 768):
    keys = iter(jax.random.split(key, 10))

    def conv(ksize, c_in, c_out):
        return {"kernel": glorot_uniform_init(next(keys), (ksize, c_in, c_out)),
                "bias": jnp.zeros((c_out,))}

    params = {
        "pre1": conv(3, 13, filters),
        "pre2": conv(3, filters, filters),
        "strided": conv(4, filters, filters),
        "res": [conv(3, filters, filters) for _ in range(2)],
        "relu": [conv(3, filters, filters) for _ in range(4)],
        "out": conv(1, filters, latent_dim),
    }
    return params, {}


def encoder_2019_forward(params, state, x, *, train: bool = True, **_):
    """x: [B, T, 1] -> z_e [B, ceil(T/160)/2, latent_dim] (320x downsample).

    Faithful to encoder.py:72-98 including the `net = relu + relu` quirk of
    the four "relu layers" (encoder.py:91-93)."""
    net = mfcc(x[..., 0])
    net = jax.nn.relu(conv1d(net, params["pre1"]["kernel"],
                             params["pre1"]["bias"], padding="SAME"))
    conv_out = jax.nn.relu(conv1d(net, params["pre2"]["kernel"],
                                  params["pre2"]["bias"], padding="SAME"))
    net = conv_out + net
    net = jax.nn.relu(conv1d(net, params["strided"]["kernel"],
                             params["strided"]["bias"], stride=2,
                             padding="SAME"))
    for p in params["res"]:
        conv_out = jax.nn.relu(conv1d(net, p["kernel"], p["bias"],
                                      padding="SAME"))
        net = conv_out + net
    for p in params["relu"]:
        r = jax.nn.relu(conv1d(net, p["kernel"], p["bias"], padding="SAME"))
        net = r + r  # reference oddity: 2*relu(conv), NOT net + relu
    z = conv1d(net, params["out"]["kernel"], params["out"]["bias"],
               padding="SAME")
    return z, state


# ------------------------------------------------------------------ factory

ENCODERS = {
    "64": (init_encoder_64, encoder_64_forward, 64),
    "Magenta": (init_encoder_magenta, encoder_magenta_forward, 64),
    "2019": (init_encoder_2019, encoder_2019_forward, 320),
}


def init_encoder(key, name: str, latent_dim: int):
    if name not in ENCODERS:
        raise NotImplementedError(f"encoder {name} not implemented")
    init_fn, _, _ = ENCODERS[name]
    return init_fn(key, latent_dim)


def encoder_forward(name: str, params, state, x, *, train: bool,
                    norm: str = "batch", axis_name: Optional[str] = None):
    _, fwd, _ = ENCODERS[name]
    return fwd(params, state, x, train=train, norm=norm, axis_name=axis_name)


def encoder_downsample_rate(name: str) -> int:
    return ENCODERS[name][2]
