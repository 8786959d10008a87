"""Fast autoregressive WaveNet generation, entirely on device.

The reference implements the "fast WaveNet" queue algorithm
(arXiv:1611.09482) as a TF graph of per-tap tf.FIFOQueues executed with ONE
sess.run PER AUDIO SAMPLE (generate.py:108-113 — 32,768 host round trips for
a 2 s clip; its structurally dominant cost, see BASELINE.md).

Here the whole sampling loop is one ``lax.scan`` over time whose body is a
``lax.fori_loop`` over the stacked layer parameters:

  * the reference's FIFO queues become ONE uniform ring buffer
    [L, BUF, B, R] with BUF = (K-1)*max_dilation, kept in the scan carry —
    threaded through the loop carries so XLA updates it in place.  Per step
    each layer reads its K-1 taps at (t - j*d_l) mod BUF and writes its
    input at t mod BUF (all layers share the write cursor);
  * zero-init correctness: while t < j*d the read slot wraps to an index in
    [t, BUF) which has not been written yet, reproducing the reference's
    zero-enqueued queues (wavenet_ops.py:177-186) exactly; once t >= BUF
    the slot being read at distance exactly BUF is the one about to be
    overwritten, and reads happen before the write;
  * sampling draws from the categorical logits with jax.random on device
    ('sample' | 'greedy'), then mu-law-decodes on device;
  * compute_dtype=bfloat16 halves the per-step HBM weight traffic — the
    binding constraint at small batch — with logits cast back to f32 for
    sampling.

The fori-loop-over-layers structure keeps the HLO O(1) in depth (30 layers
compile as one body), unlike an unrolled stack whose XLA program takes tens
of minutes to compile at this depth.

The step math mirrors wavenet.py:103-173 / wavenet_ops.py:147-267
layer-for-layer against the SAME parameter pytree the training graph uses,
so fast-vs-teacher-forced logits agree numerically (tests/test_fastgen.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode, mu_law_decode


def ring_buffer_len(cfg: WavenetConfig) -> int:
    return (cfg.kernel_size - 1) * cfg.max_dilation


def init_gen_state(cfg: WavenetConfig, batch_size: int, dtype=jnp.float32):
    """Zeroed generation state: the layer ring buffer, the preprocess input
    window, and the time counter."""
    return {
        "t": jnp.zeros((), jnp.int32),
        "pre_buf": jnp.zeros((cfg.preprocess_kernel_size, batch_size, 1),
                             dtype),
        "bufs": jnp.zeros((cfg.num_layers, ring_buffer_len(cfg), batch_size,
                           cfg.residual_filters), dtype),
    }


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
    BUF = ring_buffer_len(cfg)
    t = state["t"]
    dtype = state["pre_buf"].dtype
    b = x_t.shape[0]
    dilations = jnp.asarray(cfg.dilation_rates, jnp.int32)

    u_t = mu_law_encode(x_t, cfg.quantization_channels).astype(dtype)

    # -- preprocess conv over the last PK inputs, as one [B, PK] x [PK, F]
    pre_buf = lax.dynamic_update_index_in_dim(
        state["pre_buf"], u_t, jnp.remainder(t, PK), axis=0)
    # window in ascending time order: slot (t+1) mod PK holds x[t-PK+1]
    window = jnp.roll(pre_buf, -(jnp.remainder(t, PK) + 1), axis=0)
    w_pre = params["preprocess"]["kernel"][:, 0, :].astype(dtype)  # [PK, F]
    current = (jnp.einsum("pb,pf->bf", window[:, :, 0], w_pre,
                          preferred_element_type=jnp.float32).astype(dtype)
               + params["preprocess"]["bias"].astype(dtype))

    skip = (current @ params["skip_start"]["kernel"][0].astype(dtype)
            + params["skip_start"]["bias"].astype(dtype))

    lp = params["layers"]
    has_lc = lc_t is not None and "lc_kernel" in lp
    has_gc = gc_t is not None and "gc_kernel" in lp
    write_slot = jnp.remainder(t, BUF)

    def layer_body(i, carry):
        current, skip, bufs = carry
        kernel = lp["kernel"][i].astype(dtype)          # [K, R, 2D]
        d = dilations[i]
        pre = current @ kernel[K - 1] + lp["bias"][i].astype(dtype)
        for j in range(1, K):
            slot = jnp.remainder(t - j * d, BUF)
            past = lax.dynamic_slice(
                bufs, (i, slot, 0, 0),
                (1, 1, b, cfg.residual_filters))[0, 0]   # [B, R]
            pre = pre + past @ kernel[K - 1 - j]
        if has_lc:
            pre = pre + lc_t.astype(dtype) @ lp["lc_kernel"][i].astype(dtype)
        if has_gc:
            pre = pre + gc_t.astype(dtype) @ lp["gc_kernel"][i].astype(dtype)
            if "gc_bias" in lp:
                pre = pre + lp["gc_bias"][i].astype(dtype)
        if gate_order == "tanh_first":
            gated = jnp.tanh(pre[:, :D]) * jax.nn.sigmoid(pre[:, D:])
        else:
            gated = jax.nn.sigmoid(pre[:, :D]) * jnp.tanh(pre[:, D:])
        skip = skip + gated @ lp["skip_kernel"][i].astype(dtype) \
            + lp["skip_bias"][i].astype(dtype)
        # push this layer's INPUT into its ring slot (reads above happen
        # first, so the tap at distance exactly BUF sees the old value)
        bufs = lax.dynamic_update_slice(
            bufs, current[None, None], (i, write_slot, 0, 0))
        current = current + gated @ lp["res_kernel"][i].astype(dtype) \
            + lp["res_bias"][i].astype(dtype)
        return current, skip, bufs

    current, skip, bufs = lax.fori_loop(
        0, cfg.num_layers, layer_body, (current, skip, state["bufs"]))

    net = jax.nn.relu(skip)
    pp1 = params["postprocess1"]
    net = net @ pp1["kernel"][0].astype(dtype) + pp1["bias"].astype(dtype)
    if lc_t is not None and "lc_kernel" in pp1:
        net = net + lc_t.astype(dtype) @ pp1["lc_kernel"].astype(dtype)
    if gc_t is not None and "gc_kernel" in pp1:
        net = net + gc_t.astype(dtype) @ pp1["gc_kernel"].astype(dtype)
        if "gc_bias" in pp1:
            net = net + pp1["gc_bias"].astype(dtype)
    net = jax.nn.relu(net)
    pp2 = params["postprocess2"]
    logits = net @ pp2["kernel"][0].astype(dtype) + pp2["bias"].astype(dtype)

    new_state = {"t": t + 1, "pre_buf": pre_buf, "bufs": bufs}
    return logits, new_state


@partial(jax.jit, static_argnames=("cfg", "length", "mode", "gate_order",
                                   "compute_dtype"))
def _generate_jit(params, cfg: WavenetConfig, local_condition, key,
                  length: int, mode: str, gate_order: str = "tanh_first",
                  compute_dtype=jnp.float32, global_condition=None):
    b = local_condition.shape[0]
    t_cond = local_condition.shape[1]
    ratio = length // t_cond
    if compute_dtype != jnp.float32:
        # generation at small batch is weight-streaming-bound: bf16 params
        # halve the HBM traffic per step
        params = jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype), params)
        local_condition = local_condition.astype(compute_dtype)
    gc_t = (None if global_condition is None
            else global_condition[:, 0, :].astype(compute_dtype))
    state0 = init_gen_state(cfg, b, dtype=compute_dtype)
    x0 = jnp.zeros((b, 1), compute_dtype)

    def body(carry, i):
        state, x_t, key = carry
        lc_t = lax.dynamic_index_in_dim(
            local_condition, i // ratio, axis=1, keepdims=False)
        logits, state = gen_step(params, cfg, state, x_t, lc_t, gc_t,
                                 gate_order=gate_order)
        key, sub = jax.random.split(key)
        logits = logits.astype(jnp.float32)
        if mode == "sample":
            bins = jax.random.categorical(sub, logits, axis=-1)
        elif mode == "greedy":
            bins = jnp.argmax(logits, axis=-1)
        else:
            raise NotImplementedError(f"decode mode {mode} not implemented")
        x_next = mu_law_decode(bins, cfg.quantization_channels)
        return (state, x_next[:, None].astype(compute_dtype), key), x_next

    (_, _, _), samples = lax.scan(body, (state0, x0, key),
                                  jnp.arange(length, dtype=jnp.int32))
    return samples.T  # [B, length]


def _pallas_eligible(params, cfg: WavenetConfig, local_condition,
                     compute_dtype=jnp.bfloat16) -> bool:
    b, t_cond, c = local_condition.shape
    # shape gates first: the layout helpers below assert 128-alignment
    if not (jax.devices()[0].platform in ("tpu", "axon")
            and "lc_kernel" in params["layers"]
            and cfg.num_layers >= 4
            and cfg.residual_filters % 128 == 0
            and cfg.dilation_filters * 2 % 128 == 0
            and cfg.skip_filters % 128 == 0
            and cfg.quantization_channels % 128 == 0):
        return False
    # kernel mode selection is shared with the launch path
    # (ops/gen_pallas.py::select_mode) so the gate can never approve a
    # config the kernel then handles differently
    from vqvae_wavenet_tpu.ops import gen_pallas
    mode = gen_pallas.select_mode(cfg, c, b, t_cond, compute_dtype)
    if mode in ("resident", "hybrid"):
        return True
    # streamed fallback: its 4 weight slots + full ring + resident res
    # blocks must fit their own budget
    ring_rows = (cfg.kernel_size - 1) * sum(cfg.dilation_rates)
    ring_mb = ring_rows * b * cfg.residual_filters * 2 / 2 ** 20
    a_cols = max(2 * cfg.dilation_filters, cfg.skip_filters)
    a_rows = (cfg.kernel_size * cfg.residual_filters + c
              + cfg.dilation_filters + 2)
    g = gen_pallas._layers_per_dma(cfg, c, 2)
    slots_mb = 4 * g * a_rows * a_cols * 2 / 2 ** 20
    res_mb = (cfg.num_layers * (cfg.dilation_filters + 16)
              * cfg.residual_filters * 2 / 2 ** 20)
    gcon_mb = (cfg.num_layers * max(b, 8) * 2 * cfg.dilation_filters
               * 2 / 2 ** 20)
    return ring_mb + slots_mb + res_mb + gcon_mb <= 64.0


def generate(params, cfg: WavenetConfig, local_condition, *, length: int,
             key=None, mode: str = "sample", gate_order: str = "tanh_first",
             compute_dtype=jnp.float32, engine: str = "auto",
             global_condition=None, verbose: bool = False):
    """Autoregressive generation: ONE device program for the whole clip.

    Args:
      local_condition: [B, T_cond, C_lc] (the vqvae_encode output);
        sample i is conditioned on frame i // (length // T_cond), exactly
        generate.py:108-113.
      length: number of samples; must be a multiple of T_cond.
      mode: 'sample' | 'greedy' (utils.py:30-46 semantics, on device).
      compute_dtype: jnp.float32 | jnp.bfloat16 | jnp.int8 (weights [+
        activations]; sampling always in f32).  int8 = per-row-quantized
        weight streaming, Pallas engine only — falls back to a bf16 XLA
        scan when the kernel is ineligible.
      engine: 'auto' | 'xla' | 'pallas'.  'pallas' = the fused whole-clip
        kernel (ops/gen_pallas.py) — TPU only, small batch, 128-aligned
        channels; 'auto' picks it when eligible and compute_dtype is
        bf16/int8.
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

    if engine == "pallas" and jax.devices()[0].platform not in ("tpu",
                                                                "axon"):
        print("[generate] engine='pallas' needs a TPU; using the XLA scan")
        engine = "xla"
    use_pallas = engine == "pallas" or (
        engine == "auto" and compute_dtype in (jnp.bfloat16, jnp.int8)
        and _pallas_eligible(params, cfg, local_condition, compute_dtype))
    if verbose:
        print(f"[generate] engine={'pallas' if use_pallas else 'xla'} "
              f"dtype={jnp.dtype(compute_dtype).name} length={length} "
              f"batch={local_condition.shape[0]}")
    if use_pallas:
        from vqvae_wavenet_tpu.ops.gen_pallas import generate_pallas
        return generate_pallas(params, cfg, local_condition, length=length,
                               key=key, mode=mode, dtype=compute_dtype,
                               gate_order=gate_order,
                               global_condition=global_condition)
    if compute_dtype == jnp.int8:
        compute_dtype = jnp.bfloat16  # the XLA scan has no int8 path
    return _generate_jit(params, cfg, local_condition, key, length, mode,
                         gate_order, compute_dtype, global_condition)


def teacher_forced_stepper(params, cfg: WavenetConfig, x, local_condition,
                           gate_order: str = "tanh_first",
                           global_condition=None):
    """Drive gen_step with ground-truth audio (no sampling) and return the
    per-step logits [B, T, Q] — used to verify fast-gen == training graph."""
    b, t_len, _ = x.shape
    ratio = t_len // local_condition.shape[1]
    gc_t = (None if global_condition is None
            else global_condition[:, 0, :])
    state = init_gen_state(cfg, b)
    inputs = jnp.concatenate([jnp.zeros((b, 1, 1)), x[:, :-1, :]], axis=1)

    def body(state, i):
        lc_t = lax.dynamic_index_in_dim(local_condition, i // ratio, axis=1,
                                        keepdims=False)
        logits, state = gen_step(params, cfg, state, inputs[:, i, :], lc_t,
                                 gc_t, gate_order=gate_order)
        return state, logits

    _, logits = lax.scan(body, state, jnp.arange(t_len, dtype=jnp.int32))
    return jnp.transpose(logits, (1, 0, 2))
