"""Fast autoregressive WaveNet generation, entirely on device.

The reference implements the "fast WaveNet" queue algorithm
(arXiv:1611.09482) as a TF graph of per-tap tf.FIFOQueues executed with ONE
sess.run PER AUDIO SAMPLE (generate.py:108-113 — 32,768 host round trips for
a 2 s clip; its structurally dominant cost, see BASELINE.md).

Here the whole sampling loop is one ``lax.scan`` over time:
  * each residual layer's FIFO queues become a zero-initialized ring buffer
    of its layer input with natural size (K-1)*dilation (a power of two),
    stored in the scan carry — XLA updates them in place;
  * per step, kernel tap j reads slot (t - j*d) mod size; since t < j*d
    wraps to a not-yet-written slot, zero-init reproduces the reference's
    zero-enqueued queues (wavenet_ops.py:177-186) exactly;
  * sampling draws from the categorical logits with jax.random on device
    ('sample' mode; 'greedy' = argmax), then mu-law-decodes on device.

The step math mirrors wavenet.py:103-173 / wavenet_ops.py:147-267
layer-for-layer against the SAME parameter pytree the training graph uses,
so fast-vs-teacher-forced logits are bitwise-comparable (tested in
tests/test_fastgen.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode, mu_law_decode


def init_gen_state(cfg: WavenetConfig, batch_size: int, dtype=jnp.float32):
    """Zeroed generation state: per-layer ring buffers + preprocess window
    + the time counter.  Total slots = sum((K-1)*d) + preprocess K — the
    same 6,169-slot footprint as the reference's queues (SURVEY.md §2a)."""
    K = cfg.kernel_size
    R = cfg.residual_filters
    bufs = tuple(
        jnp.zeros(((K - 1) * d, batch_size, R), dtype)
        for d in cfg.dilation_rates)
    pre_buf = jnp.zeros((cfg.preprocess_kernel_size, batch_size, 1), dtype)
    return {"t": jnp.zeros((), jnp.int32), "pre_buf": pre_buf,
            "layer_bufs": bufs}


def gen_step(params, cfg: WavenetConfig, state, x_t, lc_t=None, gc_t=None,
             *, gate_order: str = "tanh_first"):
    """One autoregressive step.

    Args:
      state: from init_gen_state.
      x_t:  [B, 1] raw float audio at time t-1 (the previous output sample;
            zeros at t=0 — the reference starts from zeros, README.md:60).
      lc_t: [B, C_lc] local condition for this step or None.
      gc_t: [B, C_gc] global condition or None.
    Returns:
      (logits [B, Q], new_state).
    """
    K = cfg.kernel_size
    D = cfg.dilation_filters
    PK = cfg.preprocess_kernel_size
    t = state["t"]

    u_t = mu_law_encode(x_t, cfg.quantization_channels)  # [B, 1] float

    # -- preprocess conv over the last PK inputs, as one [B, PK] x [PK, F]
    pre_buf = lax.dynamic_update_index_in_dim(
        state["pre_buf"], u_t, jnp.remainder(t, PK), axis=0)
    # window in ascending time order: slot (t+1) mod PK holds x[t-PK+1]
    window = jnp.roll(pre_buf, -(jnp.remainder(t, PK) + 1), axis=0)
    w_pre = params["preprocess"]["kernel"][:, 0, :]  # [PK, F]
    current = (jnp.einsum("pb,pf->bf", window[:, :, 0], w_pre,
                          preferred_element_type=jnp.float32)
               + params["preprocess"]["bias"])

    skip = (current @ params["skip_start"]["kernel"][0]
            + params["skip_start"]["bias"])

    lp = params["layers"]
    new_bufs = []
    for i, d in enumerate(cfg.dilation_rates):
        buf = state["layer_bufs"][i]
        size = buf.shape[0]  # (K-1)*d
        kernel = lp["kernel"][i]         # [K, R, 2D]
        pre = current @ kernel[K - 1] + lp["bias"][i]
        for j in range(1, K):
            past = buf[jnp.remainder(t - j * d, size)]  # [B, R]
            pre = pre + past @ kernel[K - 1 - j]
        if lc_t is not None and "lc_kernel" in lp:
            pre = pre + lc_t @ lp["lc_kernel"][i]
        if gc_t is not None and "gc_kernel" in lp:
            pre = pre + gc_t @ lp["gc_kernel"][i]
            if "gc_bias" in lp:
                pre = pre + lp["gc_bias"][i]
        if gate_order == "tanh_first":
            gated = jnp.tanh(pre[:, :D]) * jax.nn.sigmoid(pre[:, D:])
        else:
            gated = jax.nn.sigmoid(pre[:, :D]) * jnp.tanh(pre[:, D:])
        skip = skip + gated @ lp["skip_kernel"][i] + lp["skip_bias"][i]
        # push this layer's INPUT into its ring buffer (read-before-write
        # above lets tap j = K-1 see x[t - (K-1)d] from the slot we reuse)
        new_bufs.append(lax.dynamic_update_index_in_dim(
            buf, current, jnp.remainder(t, size), axis=0))
        current = current + gated @ lp["res_kernel"][i] + lp["res_bias"][i]

    net = jax.nn.relu(skip)
    pp1 = params["postprocess1"]
    net = net @ pp1["kernel"][0] + pp1["bias"]
    if lc_t is not None and "lc_kernel" in pp1:
        net = net + lc_t @ pp1["lc_kernel"]
    if gc_t is not None and "gc_kernel" in pp1:
        net = net + gc_t @ pp1["gc_kernel"]
        if "gc_bias" in pp1:
            net = net + pp1["gc_bias"]
    net = jax.nn.relu(net)
    pp2 = params["postprocess2"]
    logits = net @ pp2["kernel"][0] + pp2["bias"]

    new_state = {"t": t + 1, "pre_buf": pre_buf,
                 "layer_bufs": tuple(new_bufs)}
    return logits, new_state


@partial(jax.jit, static_argnames=("cfg", "length", "mode", "gate_order"))
def _generate_jit(params, cfg: WavenetConfig, local_condition, key,
                  length: int, mode: str, gate_order: str = "tanh_first"):
    b = local_condition.shape[0]
    t_cond = local_condition.shape[1]
    ratio = length // t_cond
    state0 = init_gen_state(cfg, b)
    x0 = jnp.zeros((b, 1))

    def body(carry, i):
        state, x_t, key = carry
        lc_t = lax.dynamic_index_in_dim(
            local_condition, i // ratio, axis=1, keepdims=False)
        logits, state = gen_step(params, cfg, state, x_t, lc_t,
                                 gate_order=gate_order)
        key, sub = jax.random.split(key)
        if mode == "sample":
            bins = jax.random.categorical(sub, logits, axis=-1)
        elif mode == "greedy":
            bins = jnp.argmax(logits, axis=-1)
        else:
            raise NotImplementedError(f"decode mode {mode} not implemented")
        x_next = mu_law_decode(bins, cfg.quantization_channels)
        return (state, x_next[:, None], key), x_next

    (_, _, _), samples = lax.scan(body, (state0, x0, key),
                                  jnp.arange(length, dtype=jnp.int32))
    return samples.T  # [B, length]


def generate(params, cfg: WavenetConfig, local_condition, *, length: int,
             key=None, mode: str = "sample", gate_order: str = "tanh_first"):
    """Autoregressive generation: ONE device program for the whole clip.

    Args:
      local_condition: [B, T_cond, C_lc] (the vqvae_encode output);
        sample i is conditioned on frame i // (length // T_cond), exactly
        generate.py:108-113.
      length: number of samples; must be a multiple of T_cond.
      mode: 'sample' | 'greedy' (utils.py:30-46 semantics, on device).
    Returns:
      float waveform [B, length] in [-1, 1].
    """
    if mode not in ("sample", "greedy"):
        raise NotImplementedError(f"decode mode {mode} not implemented")
    if key is None:
        key = jax.random.PRNGKey(0)
    assert length % local_condition.shape[1] == 0, (
        "length must be a multiple of the conditioning frames "
        f"({local_condition.shape[1]})")
    return _generate_jit(params, cfg, local_condition, key, length, mode,
                         gate_order)


def teacher_forced_stepper(params, cfg: WavenetConfig, x, local_condition,
                           gate_order: str = "tanh_first"):
    """Drive gen_step with ground-truth audio (no sampling) and return the
    per-step logits [B, T, Q] — used to verify fast-gen == training graph."""
    b, t_len, _ = x.shape
    ratio = t_len // local_condition.shape[1]
    state = init_gen_state(cfg, b)
    inputs = jnp.concatenate([jnp.zeros((b, 1, 1)), x[:, :-1, :]], axis=1)

    def body(state, i):
        lc_t = lax.dynamic_index_in_dim(local_condition, i // ratio, axis=1,
                                        keepdims=False)
        logits, state = gen_step(params, cfg, state, inputs[:, i, :], lc_t,
                                 gate_order=gate_order)
        return state, logits

    _, logits = lax.scan(body, state, jnp.arange(t_len, dtype=jnp.int32))
    return jnp.transpose(logits, (1, 0, 2))
