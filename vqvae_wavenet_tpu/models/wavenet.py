"""WaveNet decoder: teacher-forced training forward pass.

Reproduces the reference graph (Decoder/WaveNet/wavenet.py:24-100) —
preprocess conv (K=32) -> skip-start 1x1 -> 30 residual layers (gated dilated
conv + per-layer local/global condition 1x1s + skip/residual 1x1s,
wavenet_ops.py:104-138) -> relu -> 1x1 (+condition) -> relu -> 1x1 logits —
as ONE ``lax.scan`` over stacked per-layer parameters [L, ...].

The per-layer dilations (1..512 cycling, wavenet_parameters.json:11-13)
differ across layers; the scan is possible because the dilated conv is
expressed as K shifted matmuls where the (traced) dilation only moves a
dynamic-slice start (see ops/conv.py::dilated_conv_taps).  This keeps
compile time flat in depth and turns the whole stack into large static
MXU matmuls.

Loss (sparse CE over 256 mu-law bins, mean over B*T) matches
wavenet.py:175-180 / model.py:90-94.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode
from vqvae_wavenet_tpu.ops.conv import (
    shift_right, causal_conv1d, dilated_conv_taps, add_condition,
    uniform_unit_scaling_init,
)


def init_wavenet_params(key, cfg: WavenetConfig, lc_channels: Optional[int],
                        gc_channels: Optional[int] = None):
    """Build the WaveNet parameter pytree.

    Per-layer parameters are stacked on a leading [L] axis so the whole
    residual stack runs under one lax.scan.  Kernel init is
    uniform-unit-scaling(1.0) and biases zero, matching conv1d_v2
    (wavenet_ops.py:66-76); condition projections have no bias
    (wavenet_ops.py:96).
    """
    L = cfg.num_layers
    K = cfg.kernel_size
    R = cfg.residual_filters
    D = cfg.dilation_filters
    S = cfg.skip_filters
    Q = cfg.quantization_channels
    PK, PF = cfg.preprocess_kernel_size, cfg.preprocess_filters

    keys = iter(jax.random.split(key, 16 + 8 * L))

    def uus(shape, factor=1.0):
        return uniform_unit_scaling_init(next(keys), shape, factor)

    def stack(shape):
        return jnp.stack([uus(shape) for _ in range(L)])

    params = {
        "preprocess": {"kernel": uus((PK, 1, PF)), "bias": jnp.zeros((PF,))},
        "skip_start": {"kernel": uus((1, PF, S)), "bias": jnp.zeros((S,))},
        "layers": {
            "kernel": stack((K, R, 2 * D)),
            "bias": jnp.zeros((L, 2 * D)),
            "skip_kernel": stack((D, S)),
            "skip_bias": jnp.zeros((L, S)),
            "res_kernel": stack((D, R)),
            "res_bias": jnp.zeros((L, R)),
        },
        "postprocess1": {"kernel": uus((1, S, S)), "bias": jnp.zeros((S,))},
        "postprocess2": {"kernel": uus((1, S, Q)), "bias": jnp.zeros((Q,))},
    }
    if lc_channels is not None:
        params["layers"]["lc_kernel"] = stack((lc_channels, 2 * D))
        params["postprocess1"]["lc_kernel"] = uus((lc_channels, S))
    if gc_channels is not None:
        params["layers"]["gc_kernel"] = stack((gc_channels, 2 * D))
        params["postprocess1"]["gc_kernel"] = uus((gc_channels, S))
    return params


def wavenet_forward(params, cfg: WavenetConfig, inputs,
                    local_condition=None, global_condition=None,
                    *, gate_order: str = "tanh_first",
                    engine: str = "auto"):
    """Teacher-forced forward pass.

    Args:
      inputs: raw float waveform [B, T, 1] in [-1, 1].
      local_condition: [B, T_cond, C_lc] (T % T_cond == 0) or None.
      global_condition: [B, T_gc, C_gc] or None (the main reference path
        folds the speaker embedding into local_condition, decoder.py:30-36).
      gate_order: 'tanh_first' (main impl, wavenet_ops.py:112-113) or
        'sigmoid_first' (Magenta variant, Magenta/config.py:345-348).
    Returns:
      logits [B*T, Q], labels [B*T] int32 — exactly wavenet.py:33-99.
    """
    labels = mu_law_encode(inputs, cfg.quantization_channels,
                           to_int=True).reshape(-1)
    net = wavenet_logits(params, cfg, inputs, local_condition,
                         global_condition, gate_order=gate_order,
                         engine=engine)
    return net.reshape(-1, cfg.quantization_channels), labels


def _cycle_pattern(cfg: WavenetConfig):
    """If the dilation list is periodic with period num_cycle_layers (true
    for the shipped config and the Magenta preset), return the per-cycle
    pattern — enabling a scan over CYCLES whose body uses static-dilation
    XLA convs (faster than the traced-dilation tap form: no max-dilation
    padding, no dynamic slices)."""
    p = cfg.num_cycle_layers
    pattern = cfg.dilation_rates[:p]
    for c in range(cfg.num_cycles):
        if tuple(cfg.dilation_rates[c * p:(c + 1) * p]) != tuple(pattern):
            return None
    return pattern


def wavenet_logits(params, cfg: WavenetConfig, inputs,
                   local_condition=None, global_condition=None,
                   *, gate_order: str = "tanh_first", pad_mask=None,
                   engine: str = "auto", return_skip: bool = False):
    """Teacher-forced logits, unflattened [B, T, Q] (the building block for
    both wavenet_forward and the time-sharded SP path in
    parallel/timeshard.py).

    engine: 'auto' routes the residual stack through the fused Pallas
    training kernel (ops/train_pallas.py) on TPU when the config is
    eligible; 'pallas' forces it (interpreted off-TPU, for tests);
    'xla' keeps the unrolled XLA path.

    pad_mask: optional [1|B, T, 1] multiplier applied to the residual
    stream after the preprocess conv and after every layer.  The SP path
    passes zeros over the first shard's halo so those positions behave
    exactly like the implicit zero padding a single-device causal conv
    applies at every layer (biased layers make recomputed halo activations
    nonzero otherwise, which would leak into both the forward values and
    the bias gradients at sequence start)."""
    B, T, _ = inputs.shape
    net = mu_law_encode(shift_right(inputs), cfg.quantization_channels)
    # mixed precision: bf16 inputs keep the residual stream bf16 (the f32
    # accumulations below are cast back); skip/logits accumulate in f32
    compute_dtype = net.dtype

    net = causal_conv1d(net, params["preprocess"]["kernel"],
                        params["preprocess"]["bias"])
    if pad_mask is not None:
        net = net * pad_mask.astype(net.dtype)
    skip = jnp.einsum("btc,cf->btf", net, params["skip_start"]["kernel"][0],
                      preferred_element_type=jnp.float32)
    skip = skip + params["skip_start"]["bias"]

    D = cfg.dilation_filters
    K = cfg.kernel_size
    max_pad = (K - 1) * cfg.max_dilation
    dilations = jnp.asarray(cfg.dilation_rates, dtype=jnp.int32)

    lp = params["layers"]
    has_lc = "lc_kernel" in lp and local_condition is not None
    has_gc = "gc_kernel" in lp and global_condition is not None
    t_cond = local_condition.shape[1] if has_lc else T
    reps = T // t_cond

    # bf16 mode: (a) cast `pre` to bf16 after the f32-accumulated conv —
    # halves the widest activation stream ([B,T,2D]); (b) defer the skip
    # connection: collect gated [B,T,D] per layer and contract the concat
    # [B,T,L*D] against the stacked skip kernels in ONE [L*D, S] matmul
    # instead of streaming the f32 [B,T,S] accumulator through all L
    # layers.  Measured 86.9 -> 56.2 ms decoder fwd+bwd (PERF.md #15).
    # The f32 path keeps the reference's exact per-layer accumulation.
    fused_skip = compute_dtype == jnp.bfloat16 and cfg.num_layers <= 64

    def apply_layer(net, skip, p, pre, gateds=None):
        # The per-layer condition add + gate runs in the frame-blocked 4-D
        # view [B, T_cond, T/T_cond, 2D]: the projected condition
        # broadcast-adds over each frame's block (add_condition semantics,
        # wavenet_ops.py:93-101) and the tanh*sigmoid gate consumes the
        # sum in the SAME elementwise fusion — materializing the
        # broadcast separately cost 8.4 ms/step over 30 layers (PERF #18).
        pre4 = pre.reshape(B, t_cond, reps, 2 * D) + p["bias"]
        if has_lc:
            enc = jnp.einsum("bsc,cf->bsf", local_condition, p["lc_kernel"],
                             preferred_element_type=jnp.float32)
            pre4 = pre4 + enc[:, :, None, :]
        if has_gc:
            genc = jnp.einsum("bsc,cf->bsf", global_condition,
                              p["gc_kernel"],
                              preferred_element_type=jnp.float32)
            # gc has T_gc == 1: broadcast over all frames and samples
            pre4 = pre4 + genc[:, :, None, :]
            if "gc_bias" in p:  # Magenta add_gc has a bias (config.py:186-192)
                pre4 = pre4 + p["gc_bias"]
        if fused_skip:
            pre4 = pre4.astype(compute_dtype)
        if gate_order == "tanh_first":
            gated = jnp.tanh(pre4[..., :D]) * jax.nn.sigmoid(pre4[..., D:])
        else:
            gated = jax.nn.sigmoid(pre4[..., :D]) * jnp.tanh(pre4[..., D:])
        gated = gated.reshape(B, T, D)
        if fused_skip:
            gateds.append(gated.astype(compute_dtype))
        else:
            skip = skip + jnp.einsum("btc,cf->btf", gated, p["skip_kernel"],
                                     preferred_element_type=jnp.float32) + p["skip_bias"]
        net = (net + jnp.einsum("btc,cf->btf", gated, p["res_kernel"],
                                preferred_element_type=jnp.float32)
               + p["res_bias"]).astype(compute_dtype)
        if pad_mask is not None:
            net = net * pad_mask.astype(net.dtype)
        return net, skip

    use_fused = False
    # gc with T_gc == 1 (the only form any model family produces) is
    # position-constant and folds into the kernel's precomputed
    # condition buffer — it does not disqualify the fused path
    gc_foldable = has_gc and global_condition.shape[1] == 1
    if engine != "xla" and pad_mask is None and has_lc \
            and (not has_gc or gc_foldable):
        from vqvae_wavenet_tpu.ops.train_pallas import (
            fused_stack_eligible, fused_residual_stack)
        on_tpu = jax.default_backend() == "tpu"
        if (engine == "pallas" or on_tpu) and fused_stack_eligible(
                cfg, B, T, t_cond, compute_dtype, has_lc,
                has_gc and not gc_foldable, pad_mask is not None):
            use_fused = True

    pattern = _cycle_pattern(cfg)
    if use_fused:
        # fused Pallas training stack: whole-layer chain per time tile in
        # VMEM, matmul-only custom backward (ops/train_pallas.py)
        skip = skip + fused_residual_stack(
            lp, cfg, net, local_condition,
            global_condition if has_gc else None,
            gate_order=gate_order, interpret=not on_tpu)
    elif cfg.num_layers <= 64:
        # fully unrolled: ~30% faster backward than the cycle-scan (the
        # scan's carry stacking/replay dominates, PERF.md #14); compile is
        # ~22 s for 30 layers — cheap at this depth.  The scans below
        # remain for very deep configs where compile time would bite.
        gateds = []
        for i, d in enumerate(cfg.dilation_rates):
            p = jax.tree_util.tree_map(lambda v: v[i], lp)
            # bias=None: the bias rides the condition-add + gate fusion in
            # apply_layer instead of a separate [B,T,2D] pass (PERF #18)
            pre = causal_conv1d(net, p["kernel"], None, dilation=int(d))
            net, skip = apply_layer(net, skip, p, pre, gateds)
        if fused_skip:
            gs = jnp.concatenate(gateds, axis=-1)       # [B, T, L*D]
            wsk = lp["skip_kernel"].reshape(-1, cfg.skip_filters)
            skip = skip + jnp.einsum(
                "btc,cf->btf", gs, wsk.astype(gs.dtype),
                preferred_element_type=jnp.float32) \
                + jnp.sum(lp["skip_bias"].astype(jnp.float32), axis=0)
    elif pattern is not None:
        # scan over cycles; the body unrolls one cycle of STATIC-dilation
        # causal convs (no max-dilation pad, no dynamic slices)
        P = cfg.num_cycle_layers
        lp_cycles = jax.tree_util.tree_map(
            lambda x: x.reshape((cfg.num_cycles, P) + x.shape[1:]), lp)

        def cycle_step(carry, cycle_params):
            net, skip = carry
            for j, dil in enumerate(pattern):
                p = jax.tree_util.tree_map(lambda x: x[j], cycle_params)
                pre = causal_conv1d(net, p["kernel"], None,
                                    dilation=int(dil))
                net, skip = apply_layer(net, skip, p, pre)
            return (net, skip), None

        (net, skip), _ = lax.scan(cycle_step, (net, skip), lp_cycles)
    else:
        def layer_step(carry, xs):
            net, skip = carry
            p, d = xs
            x_padded = jnp.pad(net, ((0, 0), (max_pad, 0), (0, 0)))
            pre = dilated_conv_taps(x_padded, p["kernel"], None, d,
                                    seq_len=T, max_pad=max_pad)
            net, skip = apply_layer(net, skip, p, pre)
            return (net, skip), None

        (net, skip), _ = lax.scan(layer_step, (net, skip), (lp, dilations))

    if return_skip:
        # the pre-relu skip sum [B, T, S] f32 — consumed by the fused
        # epilogue (ops/train_pallas.py::fused_epilogue), which applies
        # the postprocess heads + CE itself
        return skip

    net = jax.nn.relu(skip).astype(compute_dtype)
    pp1 = params["postprocess1"]
    net = jnp.einsum("btc,cf->btf", net, pp1["kernel"][0],
                     preferred_element_type=jnp.float32) + pp1["bias"]
    if "lc_kernel" in pp1 and local_condition is not None:
        net = add_condition(net, local_condition, pp1["lc_kernel"])
    if "gc_kernel" in pp1 and global_condition is not None:
        net = add_condition(net, global_condition, pp1["gc_kernel"])
        if "gc_bias" in pp1:
            net = net + pp1["gc_bias"]

    net = jax.nn.relu(net).astype(compute_dtype)
    pp2 = params["postprocess2"]
    net = jnp.einsum("btc,cf->btf", net, pp2["kernel"][0],
                     preferred_element_type=jnp.float32) + pp2["bias"]
    return net


def wavenet_loss(logits, labels):
    """Mean sparse softmax CE over flattened B*T (wavenet.py:175-180)."""
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def make_standalone_trainer(cfg: WavenetConfig, lc_channels=None,
                            gc_channels=None, schedule=None):
    """Standalone WaveNet trainer — the reference's Wavenet.get_loss path
    (wavenet.py:175-198: own global step, hardcoded 6-point LR schedule,
    Adam) so WaveNet trains alone without the VQVAE wrapper.

    Returns (init_fn(key) -> state, step_fn(state, x, lc, gc) -> (state,
    metrics)); step_fn is jit-compiled.
    """
    import optax
    from vqvae_wavenet_tpu.training.optimizer import (
        piecewise_constant_schedule, WAVENET_STANDALONE_SCHEDULE)

    schedule = schedule or WAVENET_STANDALONE_SCHEDULE
    lr_fn = piecewise_constant_schedule(schedule)
    opt = optax.adam(lr_fn)

    def init_fn(key):
        params = init_wavenet_params(key, cfg, lc_channels, gc_channels)
        return {"params": params, "opt_state": opt.init(params),
                "step": jnp.zeros((), jnp.int32)}

    def loss_fn(params, x, lc, gc):
        logits, labels = wavenet_forward(params, cfg, x, lc, gc)
        return wavenet_loss(logits, labels)

    @jax.jit
    def step_fn(state, x, lc=None, gc=None):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], x, lc, gc)
        updates, opt_state = opt.update(grads, state["opt_state"])
        params = optax.apply_updates(state["params"], updates)
        step = state["step"] + 1
        return ({"params": params, "opt_state": opt_state, "step": step},
                {"loss": loss, "lr": lr_fn(state["step"]), "step": step})

    return init_fn, step_fn
