"""Causal / dilated convolution primitives, TPU-first.

Reference semantics reproduced (with file:line cites into /root/reference):
  * ``shift_right``      — Decoder/WaveNet/wavenet_ops.py:9-14 (pad+slice).
  * ``causal_conv1d``    — conv1d_v2 (wavenet_ops.py:59-90): left-pad
    ``dilation*(kernel_size-1)`` then a VALID conv; uniform-unit-scaling
    kernel init, zero bias init.
  * ``add_condition``    — wavenet_ops.py:93-101: a 1x1 no-bias conv on the
    condition, then an implicit nearest-upsample by reshape-broadcast-add.

TPU-first departures from the reference design:
  * No variable scopes — parameters are explicit pytrees.
  * The per-layer dilated conv used inside the WaveNet layer `lax.scan` is
    expressed as K shifted matmuls (``dilated_conv_taps``): for kernel
    position j, y += x[t - (K-1-j)*d] @ W[j].  A traced dilation ``d`` only
    moves a dynamic_slice start, so all 30 layers — whose dilations differ —
    run under one scan over stacked [L, ...] parameters.  Each tap is a
    [B*T, C_in] x [C_in, C_out] matmul: large, static, MXU-shaped.
  * The reference's time_to_batch/batch_to_time dilation trick
    (wavenet_ops.py:23-44) is unnecessary under XLA and not reproduced.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def uniform_unit_scaling_init(key, shape, factor: float = 1.0,
                              dtype=jnp.float32):
    """TF1 tf.uniform_unit_scaling_initializer semantics.

    input_size = prod(shape[:-1]); limit = factor * sqrt(3 / input_size);
    samples Uniform(-limit, limit).  Used by conv1d_v2 (factor 1.0,
    wavenet_ops.py:70), the codebook (factor 1.7, model.py:48) and the
    speaker embedding (factor 2.0, model.py:26).
    """
    input_size = float(np.prod(shape[:-1])) if len(shape) > 1 else float(shape[0])
    limit = factor * np.sqrt(3.0 / input_size)
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def shift_right(x):
    """Shift the time axis right by one, zero-filling t=0.  x: [B, T, C]."""
    return jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]


def conv1d(x, kernel, bias=None, *, stride: int = 1, padding="SAME",
           dilation: int = 1):
    """Plain 1-D conv.  x: [B, T, C_in], kernel: [K, C_in, C_out].
    padding: 'SAME' | 'VALID' | [(low, high)] explicit pair."""
    out = lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding=padding if isinstance(padding, str) else list(padding),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        out = out + bias
    return out


def causal_conv1d(x, kernel, bias=None, *, dilation: int = 1, stride: int = 1):
    """Causal dilated conv = left-pad dilation*(K-1) inside the conv op.

    Exactly conv1d_v2's 'CAUSAL' path (wavenet_ops.py:81-87): output[t]
    depends only on input[<= t].  The padding rides the convolution's own
    padding config rather than an explicit jnp.pad — the materialized
    pad copies cost 7.5 ms/step across the 30-layer stack (PERF.md #18).
    """
    k = kernel.shape[0]
    return conv1d(x, kernel, bias, stride=stride,
                  padding=[(dilation * (k - 1), 0)], dilation=dilation)


def dilated_conv_taps(x_padded, kernel, bias, dilation, *, seq_len: int,
                      max_pad: int):
    """Causal dilated conv as K shifted matmuls, for use under lax.scan
    where ``dilation`` is a traced per-layer scalar.

    Args:
      x_padded: [B, max_pad + T, C_in] — the layer input left-padded with
        ``max_pad`` zeros (max_pad >= (K-1) * max_dilation).
      kernel:   [K, C_in, C_out];  bias: [C_out] or None.
      dilation: int32 scalar (may be traced).
      seq_len:  static T.
      max_pad:  static left-pad length.
    Returns: [B, T, C_out].
    """
    k = kernel.shape[0]
    out = None
    for j in range(k):
        # kernel position j sees x[t - (K-1-j)*d]; in the padded array that
        # window starts at max_pad - (K-1-j)*d.
        start = max_pad - (k - 1 - j) * dilation
        tap = lax.dynamic_slice_in_dim(x_padded, start, seq_len, axis=1)
        contrib = jnp.einsum("btc,cf->btf", tap, kernel[j],
                             preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    if bias is not None:
        out = out + bias
    return out


def add_condition(net, condition, kernel):
    """Project condition with a 1x1 no-bias conv and broadcast-add it over
    each latent frame's block of samples (wavenet_ops.py:93-101).

    net: [B, T, C]; condition: [B, T_cond, C_cond] with T % T_cond == 0;
    kernel: [C_cond, C].
    """
    if condition is None:
        return net
    b, t, c = net.shape
    t_cond = condition.shape[1]
    enc = jnp.einsum("bsc,cf->bsf", condition, kernel,
                     preferred_element_type=jnp.float32)
    net = net.reshape(b, t_cond, t // t_cond, c) + enc[:, :, None, :]
    return net.reshape(b, t, c)
