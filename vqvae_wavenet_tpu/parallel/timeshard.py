"""Sequence parallelism (SP): shard the TIME axis of teacher-forced WaveNet
scoring/training across chips with halo exchange.

The reference keeps long-range structure inside one device via dilations
(receptive field 6,170 samples — wavenet.py:16-17) and simply caps segment
length; it has no sequence parallelism (SURVEY.md §2c).  Here, audio longer
than one chip's memory/FLOP budget is split into contiguous time shards
over a mesh axis; each shard pulls a LEFT halo of ceil(RF/ratio) latent
frames' worth of samples from its neighbor with ``lax.ppermute`` (causal
convs need only a left halo — the convolutional analogue of context
parallelism), runs the plain WaveNet stack locally, and keeps the
non-halo outputs.  Shard 0's ppermute input defaults to zeros, which is
exactly the global zero history at sequence start.

Halo size: output[t] depends on x[t-RF .. t-1] (shift_right plus the
RF-1-sample conv stack), so the halo is RF samples rounded up to a whole
number of conditioning frames.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vqvae_wavenet_tpu.config import ModelConfig, WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import wavenet_logits


def halo_sizes(cfg: WavenetConfig, ratio: int):
    """(halo_samples, halo_frames): RF rounded up to conditioning frames."""
    halo_frames = -(-cfg.receptive_field // ratio)
    return halo_frames * ratio, halo_frames


def _left_halo(x_l, halo: int, axis_name: str):
    """The ``halo`` columns of left context for each shard ([B, halo, C]);
    positions before the global sequence start arrive as zeros.

    When halo exceeds one shard's length the context spans several left
    neighbors: hop h ships shard i's full block to shard i+h, and the tail
    of the concatenation is kept.  (Round-2 limitation lifted: SP no
    longer requires halo <= T/n, so short clips can still use many
    shards.)"""
    if halo == 0:
        return x_l[:, :0, :]
    n = lax.axis_size(axis_name)
    L = x_l.shape[1]
    if halo <= L:   # common case: one tail transfer of exactly halo cols
        return lax.ppermute(x_l[:, -halo:, :], axis_name,
                            [(i, i + 1) for i in range(n - 1)])
    hops = -(-halo // L)
    parts = [lax.ppermute(x_l, axis_name,
                          [(i, i + h) for i in range(max(n - h, 0))])
             for h in range(hops, 0, -1)]
    return jnp.concatenate(parts, axis=1)[:, hops * L - halo:, :]


def _halo_pad_mask(halo: int, local_len: int, axis_name: str):
    """[1, halo+local, 1] residual-stream multiplier over the halo-extended
    window: zero where the halo reaches past the global sequence start
    (reproducing the single-device per-layer zero padding — biased layers
    would otherwise compute nonzero activations from the zero-filled
    ppermute input), one everywhere else."""
    s = lax.axis_index(axis_name)
    valid = (jnp.arange(halo) + s * local_len - halo >= 0)
    return jnp.concatenate([valid.astype(jnp.float32)[None, :, None],
                            jnp.ones((1, local_len, 1))], axis=1)


def time_sharded_logits(params, cfg: WavenetConfig, x, local_condition,
                        mesh, axis_name: str = "data",
                        gate_order: str = "tanh_first",
                        decoder_halo: str = "layer"):
    """Teacher-forced logits [B, T, Q] with T sharded over ``axis_name``.

    x: [B, T, 1]; local_condition: [B, T_cond, C].  Requires the per-shard
    sample count (T / n_shards) to be a multiple of T // T_cond.
    Numerically equal to wavenet_logits on one device (tested).
    """
    n = mesh.shape[axis_name]
    B, T, _ = x.shape
    t_cond = local_condition.shape[1]
    ratio = T // t_cond
    assert (T // n) % ratio == 0, (
        f"per-shard length {T // n} must be a multiple of ratio {ratio}")
    halo, halo_frames = halo_sizes(cfg, ratio)

    def local_fn(params, x_l, lc_l):
        # x_l: [B, T/n, 1], lc_l: [B, T_cond/n, C]
        if decoder_halo == "layer" and cfg.num_layers <= 64:
            return time_sharded_wavenet_logits(params, cfg, x_l, lc_l,
                                               axis_name,
                                               gate_order=gate_order)
        x_halo = _left_halo(x_l, halo, axis_name)
        lc_halo = _left_halo(lc_l, halo_frames, axis_name)
        x_ext = jnp.concatenate([x_halo, x_l], axis=1)
        lc_ext = jnp.concatenate([lc_halo, lc_l], axis=1)
        logits_ext = wavenet_logits(params, cfg, x_ext, lc_ext,
                                    gate_order=gate_order,
                                    pad_mask=_halo_pad_mask(
                                        halo, x_l.shape[1], axis_name))
        return logits_ext[:, halo:, :]

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(None, axis_name, None),
        check_rep=False,
    )
    return fn(params, x, local_condition)


# --------------------------------------------------------------------------
# SP TRAINING: full loss + backward with the time axis sharded across chips
# (round-2: round 1 sharded scoring only; this makes "train on audio longer
# than one chip" an actual capability — SURVEY.md §2c SP row).
# --------------------------------------------------------------------------

def _exchange_both(x_l, left: int, right: int, axis_name: str):
    """Pull `left` columns from the left neighbor and `right` from the
    right (edge shards receive zeros = global 'SAME' zero padding)."""
    n = lax.axis_size(axis_name)
    parts = [x_l]
    if left:
        halo = lax.ppermute(x_l[:, -left:, :], axis_name,
                            [(i, i + 1) for i in range(n - 1)])
        parts.insert(0, halo)
    if right:
        halo = lax.ppermute(x_l[:, :right, :], axis_name,
                            [(i + 1, i) for i in range(n - 1)])
        parts.append(halo)
    return jnp.concatenate(parts, axis=1)


def _sync_batch_norm(params, state, x_l, *, train: bool, axis_name,
                     momentum: float = 0.99, eps: float = 1e-3):
    """BatchNorm with (B, T) statistics pmean-synced over ``axis_name`` (a
    mesh axis name or tuple — the time axis, plus the data axis when the
    batch is sharded too) — bit-equal to single-device stats for equal
    shard sizes.  Statistics accumulate in f32 regardless of the activation
    dtype (the bf16 mixed-precision contract of encoders.py::batch_norm)."""
    xf = x_l.astype(jnp.float32)
    if train:
        mean = lax.pmean(jnp.mean(xf, axis=(0, 1)), axis_name)
        mean_sq = lax.pmean(jnp.mean(jnp.square(xf), axis=(0, 1)),
                            axis_name)
        var = mean_sq - jnp.square(mean)
        new_state = {"mean": momentum * state["mean"] + (1 - momentum) * mean,
                     "var": momentum * state["var"] + (1 - momentum) * var}
    else:
        mean, var, new_state = state["mean"], state["var"], state
    inv = lax.rsqrt(var + eps) * params["scale"].astype(jnp.float32)
    out = (xf - mean) * inv + params["bias"].astype(jnp.float32)
    return out.astype(x_l.dtype), new_state


def _sync_group_norm(params, x_l, *, axis_name: str, num_groups: int = 8,
                     eps: float = 1e-3):
    """GroupNorm whose (T, C/g) statistics span the FULL time axis via
    pmean — exactly the single-device group_norm (f32 statistics)."""
    b, t, c = x_l.shape
    g = num_groups if c % num_groups == 0 else 1
    xg = x_l.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = lax.pmean(jnp.mean(xg, axis=(1, 3), keepdims=True), axis_name)
    mean_sq = lax.pmean(jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True),
                        axis_name)
    var = mean_sq - jnp.square(mean)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    out = (xg.reshape(b, t, c) * params["scale"].astype(jnp.float32)
           + params["bias"].astype(jnp.float32))
    return out.astype(x_l.dtype)


def time_sharded_encoder_64(params, state, x_l, *, train: bool,
                            norm: str, axis_name: str, norm_axes=None):
    """Encoder_64 on a time shard: per-layer halo exchange makes each
    stride-2 'SAME' conv (k=5) exact at shard boundaries; norms are
    psum-synced so statistics span the whole sequence.

    XLA 'SAME' for k=5, s=2, even T pads (1 left, 3 right) — out[o] reads
    in[2o-1 .. 2o+3] — so the halo is 1 column from the left neighbor and
    3 from the right; edge shards get zeros, exactly the SAME zero pad.

    norm_axes: mesh axes for the BatchNorm statistic pmean — (time,) plus
    the data axis when the batch is sharded too (defaults to axis_name).

    x_l: [B/bn, T/n, 1] -> z_e_l [B/bn, T/(64 n), latent_dim], exactly the
    single-device encoder_64_forward output for this shard's frames.
    """
    from vqvae_wavenet_tpu.ops.conv import conv1d
    norm_axes = norm_axes if norm_axes is not None else axis_name
    net = x_l
    new_bn = []
    for i, conv in enumerate(params["convs"]):
        ext = _exchange_both(net, 1, 3, axis_name)
        net = conv1d(ext, conv["kernel"], conv["bias"], stride=2,
                     padding="VALID")
        net = jax.nn.relu(net)
        if norm == "batch":
            net, s = _sync_batch_norm(params["bn"][i], state["bn"][i], net,
                                      train=train, axis_name=norm_axes)
        else:
            net, s = _sync_group_norm(params["bn"][i], net,
                                      axis_name=axis_name), state["bn"][i]
        new_bn.append(s)
    net = conv1d(net, params["out"]["kernel"], params["out"]["bias"],
                 padding="VALID")
    i = len(params["convs"])
    if norm == "batch":
        net, s = _sync_batch_norm(params["bn"][i], state["bn"][i], net,
                                  train=train, axis_name=norm_axes)
    else:
        net, s = _sync_group_norm(params["bn"][i], net,
                                  axis_name=axis_name), state["bn"][i]
    new_bn.append(s)
    return net, {"bn": new_bn}


def _sharded_shift_right(x_l, axis_name: str):
    """shift_right with the time axis sharded: column 0 of each shard comes
    from the left neighbor's last column (zeros on shard 0 = the global
    zero at sequence start, wavenet_ops.py:9-14)."""
    left = _left_halo(x_l, 1, axis_name)
    return jnp.concatenate([left, x_l], axis=1)[:, :-1, :]


def _sharded_causal_conv(x_l, kernel, bias, dilation: int, axis_name: str):
    """Causal dilated conv on a time shard: pull the (K-1)*d left-context
    columns from the neighbor(s) and run a VALID conv — shard 0's zeros
    ARE the causal left padding, so the result is exact."""
    from vqvae_wavenet_tpu.ops.conv import conv1d
    k = kernel.shape[0]
    halo = (k - 1) * dilation
    ext = jnp.concatenate([_left_halo(x_l, halo, axis_name), x_l], axis=1)
    return conv1d(ext, kernel, bias, padding="VALID", dilation=dilation)


def time_sharded_wavenet_logits(params, cfg: WavenetConfig, x_l,
                                local_condition, axis_name: str, *,
                                global_condition=None,
                                gate_order: str = "tanh_first"):
    """The WaveNet decoder on a time shard via PER-LAYER halo exchange —
    round 4's SP-efficiency redesign.

    The original SP decoder (still available as decoder_halo='recompute')
    pulls ONE receptive-field-sized halo (RF = 6,144 samples for the
    shipped config) and recomputes it through all 30 layers: per-shard
    FLOPs scale as (T/n + RF)/(T/n), i.e. +92% when each chip holds one
    single-chip clip (T/n = 6656).  Here every causal conv instead pulls
    exactly its own (K-1)*dilation left-context columns from the neighbor
    — the total extra rows across the whole stack equal ONE receptive
    field (6,169 rows spread over 31 convs ≈ 3% of a 6,656-sample shard's
    row-layers) at the cost of one ppermute per conv (~31 small transfers
    riding ICI, overlappable with the next layer's matmul).

    Exactness needs no pad mask: each conv's operand columns are either
    the left neighbor's true activations or — on shard 0 — the zeros a
    single-device causal_conv1d left-pads with (ppermute edge shards
    receive zeros), so biased layers see identical inputs everywhere,
    unlike the recompute path whose halo positions required masking.

    Mirrors wavenet_logits' unrolled path (models/wavenet.py:122-301)
    including the bf16 fused-skip contraction (PERF.md #15); per-shard
    numerics are the single-device values exactly (reduction order of the
    convs aside).  Requires num_layers <= 64 (both shipped families).
    """
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode
    B, T, _ = x_l.shape
    net = mu_law_encode(_sharded_shift_right(x_l, axis_name),
                        cfg.quantization_channels)
    compute_dtype = net.dtype
    net = _sharded_causal_conv(net, params["preprocess"]["kernel"],
                               params["preprocess"]["bias"], 1, axis_name)
    skip = jnp.einsum("btc,cf->btf", net, params["skip_start"]["kernel"][0],
                      preferred_element_type=jnp.float32)
    skip = skip + params["skip_start"]["bias"]

    D = cfg.dilation_filters
    lp = params["layers"]
    has_lc = "lc_kernel" in lp and local_condition is not None
    has_gc = "gc_kernel" in lp and global_condition is not None
    t_cond = local_condition.shape[1] if has_lc else T
    reps = T // t_cond
    fused_skip = compute_dtype == jnp.bfloat16 and cfg.num_layers <= 64
    assert cfg.num_layers <= 64, "layer-halo SP mirrors the unrolled path"

    gateds = []
    for i, d in enumerate(cfg.dilation_rates):
        p = jax.tree_util.tree_map(lambda v: v[i], lp)
        pre = _sharded_causal_conv(net, p["kernel"], None, int(d),
                                   axis_name)
        # condition add + bias + gate in the frame-blocked view — the
        # same fusion as wavenet_logits::apply_layer (PERF.md #18)
        pre4 = pre.reshape(B, t_cond, reps, 2 * D) + p["bias"]
        if has_lc:
            enc = jnp.einsum("bsc,cf->bsf", local_condition, p["lc_kernel"],
                             preferred_element_type=jnp.float32)
            pre4 = pre4 + enc[:, :, None, :]
        if has_gc:
            genc = jnp.einsum("bsc,cf->bsf", global_condition,
                              p["gc_kernel"],
                              preferred_element_type=jnp.float32)
            pre4 = pre4 + genc[:, :, None, :]
            if "gc_bias" in p:
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
            skip = skip + jnp.einsum(
                "btc,cf->btf", gated, p["skip_kernel"],
                preferred_element_type=jnp.float32) + p["skip_bias"]
        net = (net + jnp.einsum("btc,cf->btf", gated, p["res_kernel"],
                                preferred_element_type=jnp.float32)
               + p["res_bias"]).astype(compute_dtype)
    if fused_skip:
        gs = jnp.concatenate(gateds, axis=-1)            # [B, T_l, L*D]
        wsk = lp["skip_kernel"].reshape(-1, cfg.skip_filters)
        skip = skip + jnp.einsum(
            "btc,cf->btf", gs, wsk.astype(gs.dtype),
            preferred_element_type=jnp.float32) \
            + jnp.sum(lp["skip_bias"].astype(jnp.float32), axis=0)

    from vqvae_wavenet_tpu.ops.conv import add_condition
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


def time_sharded_encoder_magenta(params, state, x_l, *, axis_name: str,
                                 **_):
    """Encoder_Magenta on a time shard (round-3 scope widening: SP was
    encoder='64'-only).  Every op is causal (encoders.py:172-192 /
    reference encoder.py:38-63), so only LEFT halos are exchanged; the 1x1
    stride-2 downsamples are pointwise and respect shard boundaries
    because per-shard lengths stay even (T/n divisible by 64).

    Unlike the decoder path there is no halo recomputation — each conv
    receives its neighbor's EXACT activations — so no pad mask is needed.
    """
    from vqvae_wavenet_tpu.ops.conv import conv1d
    from vqvae_wavenet_tpu.models.encoders import MAGENTA_DILATIONS
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode

    net = mu_law_encode(_sharded_shift_right(x_l, axis_name))
    en = _sharded_causal_conv(net, params["preprocess"]["kernel"],
                              params["preprocess"]["bias"], 1, axis_name)
    for layer, dil in zip(params["layers"], MAGENTA_DILATIONS):
        d = conv1d(en, layer["down"]["kernel"], layer["down"]["bias"],
                   stride=2, padding="VALID")
        g = _sharded_causal_conv(d, layer["gate"]["kernel"],
                                 layer["gate"]["bias"], dil, axis_name)
        f = _sharded_causal_conv(d, layer["filter"]["kernel"],
                                 layer["filter"]["bias"], dil, axis_name)
        gated = jnp.tanh(g) * jax.nn.sigmoid(f)
        en = d + conv1d(gated, layer["residual"]["kernel"],
                        layer["residual"]["bias"], padding="VALID")
    z = conv1d(en, params["postprocess"]["kernel"],
               params["postprocess"]["bias"], padding="VALID")
    return z, state


def _fused_sp_groups(cfg: WavenetConfig, ratio: int, T_l: int):
    """Layer-group plan for decoder_halo='fused': one group per dilation
    cycle, each with a recompute halo of its own receptive field
    sum((K-1)*d) rounded up to q = the largest kernel tile size dividing
    the shard length (so the start offset and every shard's halo prefix
    stay whole tiles AND whole conditioning frames — T_l and the halo are
    both q-multiples, q a multiple of ratio).

    Returns ([(lo, hi, halo_rows), ...], q) or None when the schedule is
    not cyclic or the alignment cannot be met.  q is also the kernel
    tile-size CAP (ops/train_pallas.py tt_cap): the plan must not pick a
    tile larger than q, or a shard whose halo prefix is a q-multiple but
    not a tile multiple would mis-skip (e.g. T_l=256, halo=256 ->
    T_ext=512 admits Tt=512, which the 256-row start offset does not
    divide).
    """
    P = cfg.num_cycle_layers
    if cfg.num_cycles * P != cfg.num_layers:
        return None
    q = next((t for t in (512, 256, 128, 64)
              if T_l % t == 0 and t % ratio == 0), None)
    if q is None:
        return None
    groups = []
    for c in range(cfg.num_cycles):
        lo, hi = c * P, (c + 1) * P
        raw = sum((cfg.kernel_size - 1) * int(d)
                  for d in cfg.dilation_rates[lo:hi])
        groups.append((lo, hi, -(-raw // q) * q))
    return groups, q


def time_sharded_wavenet_logits_fused(params, cfg: WavenetConfig, x_l,
                                      local_condition, axis_name: str, *,
                                      global_condition=None,
                                      gate_order: str = "tanh_first",
                                      groups, tt_cap: int,
                                      interpret: bool):
    """The WaveNet decoder on a time shard through the FUSED Pallas
    training engine (round 5 — VERDICT r4 ask #1): per-CYCLE layer groups
    with recompute halos.

    The layer-halo SP decoder (time_sharded_wavenet_logits) is exact with
    ~3% extra rows but runs plain XLA (~1.5x the fused engine's step,
    PERF.md table).  A whole-stack fused recompute halo would pay
    RF/(T/n) extra FLOPs (+93% at one clip per chip).  Splitting at cycle
    boundaries divides that: each group's halo is only its OWN receptive
    field (sum (K-1)d over the cycle ~ 2046 rows for the shipped config
    vs RF = 6170), exchanged on the group's INPUT stream — which the
    previous group's kernel computed exactly — so total recompute is
    ~cycles x 2048 rows through one cycle each ~ 31% extra row-layers,
    all of it running inside the fused kernel.

    Shard-boundary semantics need no pad mask and no lax.cond: every
    kernel takes a per-shard start offset s_rows = max(halo - idx*T_l, 0)
    (whole tiles by _fused_sp_groups' rounding) and SKIPS the tiles
    before it, so the first processed tile starts from the zeroed history
    arena = the single-device causal zero pad at the global sequence
    start (ops/train_pallas.py with_start).  The backward sweeps skip the
    same tiles; the halo rows' cotangents ride the _left_halo ppermute
    transposes back to their owning shards.

    Mirrors wavenet_logits + fused_residual_stack numerics exactly
    (reference Decoder/WaveNet/wavenet.py:24-100, wavenet_ops.py:59-138).
    """
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode
    from vqvae_wavenet_tpu.ops.train_pallas import fused_residual_stack

    B, T_l, _ = x_l.shape
    net = mu_law_encode(_sharded_shift_right(x_l, axis_name),
                        cfg.quantization_channels)
    compute_dtype = net.dtype
    net = _sharded_causal_conv(net, params["preprocess"]["kernel"],
                               params["preprocess"]["bias"], 1, axis_name)
    skip = jnp.einsum("btc,cf->btf", net, params["skip_start"]["kernel"][0],
                      preferred_element_type=jnp.float32)
    skip = skip + params["skip_start"]["bias"]

    t_cond = local_condition.shape[1]
    ratio = T_l // t_cond
    idx = lax.axis_index(axis_name)
    stream = net
    for gi, (lo, hi, halo) in enumerate(groups):
        hf = halo // ratio
        ext = jnp.concatenate(
            [_left_halo(stream, halo, axis_name), stream], axis=1)
        lc_ext = jnp.concatenate(
            [_left_halo(local_condition, hf, axis_name), local_condition],
            axis=1)
        s_rows = jnp.maximum(halo - idx * T_l, 0).astype(jnp.float32)
        last = gi == len(groups) - 1
        out = fused_residual_stack(
            params["layers"], cfg, ext, lc_ext, global_condition,
            gate_order=gate_order, interpret=interpret,
            start_rows=s_rows, layer_range=(lo, hi), with_xout=not last,
            tt_cap=tt_cap)
        if last:
            skip_g = out
        else:
            skip_g, stream_ext = out
            stream = stream_ext[:, halo:, :]
        skip = skip + skip_g[:, halo:, :]

    return _sharded_wavenet_postprocess(params, skip, local_condition,
                                        global_condition, compute_dtype)


def _sharded_wavenet_postprocess(params, skip, local_condition,
                                 global_condition, compute_dtype):
    """relu -> 1x1 (+conditions) -> relu -> 1x1 logits — the shard-local
    tail shared by the SP decoder paths (wavenet.py:94-99 semantics; all
    ops pointwise over time, so no halos are needed)."""
    from vqvae_wavenet_tpu.ops.conv import add_condition
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
    return jnp.einsum("btc,cf->btf", net, pp2["kernel"][0],
                      preferred_element_type=jnp.float32) + pp2["bias"]


def _fused_sp_ok(cfg: WavenetConfig, plan, B, T_l, ratio, dtype) -> bool:
    """All group kernels must pass the SP eligibility gate on their
    extended shapes (plan fits VMEM, sweep backward with in-kernel dsk)."""
    from vqvae_wavenet_tpu.ops.train_pallas import fused_sp_eligible
    if plan is None:
        return False
    groups, q = plan
    return all(
        fused_sp_eligible(cfg, B, T_l + halo, (T_l + halo) // ratio,
                          dtype, layer_range=(lo, hi), tt_cap=q)
        for lo, hi, halo in groups)


def time_sharded_encoder_2019(params, state, x_l, *, axis_name: str, **_):
    """Encoder_2019 on a time shard (round-5 scope widening — the last
    SP-excluded encoder; reference Encoder/encoder.py:66-98 +
    encoder_ops.py:14-43).

    The MFCC front end is local: frame f reads samples [160f, 160f+400),
    so the frames owned by a shard of T_l samples (T_l % 320 == 0) need a
    fixed RIGHT halo of window - hop = 240 samples from the next shard;
    the last shard's ppermute zeros ARE tf.signal's pad_end zeros (the
    global pad is (F-1)*160 + 400 - T = 240 exactly when T % 160 == 0).
    The conv tower on the frame axis is all 'SAME': k=3 convs exchange
    (1, 1) frame halos, the k=4 s=2 strided conv exchanges (1, 1) — XLA
    SAME for k=4, s=2, even length pads (1, 1), out[o] = in[2o-1 .. 2o+2]
    — and edge shards' zeros reproduce the global SAME zero padding, so
    no pad mask is needed anywhere.  Exact (reduction order aside) vs
    encoder_2019_forward; includes the `net = r + r` reference oddity.

    x_l: [B, T_l, 1] -> z_e_l [B, T_l/320, latent_dim].
    """
    from vqvae_wavenet_tpu.ops.conv import conv1d
    from vqvae_wavenet_tpu.ops.signal import mfcc

    ext = _exchange_both(x_l, 0, 240, axis_name)
    net = mfcc(ext[..., 0], pad_end=False)               # [B, T_l/160, 13]

    def same_k3(p, h):
        return conv1d(_exchange_both(h, 1, 1, axis_name), p["kernel"],
                      p["bias"], padding="VALID")

    net = jax.nn.relu(same_k3(params["pre1"], net))
    conv_out = jax.nn.relu(same_k3(params["pre2"], net))
    net = conv_out + net
    net = jax.nn.relu(conv1d(_exchange_both(net, 1, 1, axis_name),
                             params["strided"]["kernel"],
                             params["strided"]["bias"], stride=2,
                             padding="VALID"))
    for p in params["res"]:
        net = jax.nn.relu(same_k3(p, net)) + net
    for p in params["relu"]:
        r = jax.nn.relu(same_k3(p, net))
        net = r + r  # reference oddity: 2*relu(conv) (encoder.py:91-93)
    return conv1d(net, params["out"]["kernel"], params["out"]["bias"],
                  padding="VALID"), state


def time_sharded_loss(params, state, cfg: ModelConfig, x, y, mesh,
                      *, train: bool = True, axis_name: str = "time",
                      batch_axis=None, with_tensors: bool = False,
                      decoder_halo: str = "layer"):
    """VQVAE loss with the TIME axis sharded over ``axis_name`` and
    (optionally) the batch sharded over ``batch_axis`` — SP composed with
    DP on one 2-D mesh in a single program (round-3: SP and DP used to be
    mutually exclusive).

    Exact (up to reduction order) vs vqvae_forward on one device: the
    encoder exchanges per-layer halos, norms psum-sync their statistics
    over every sharded axis, VQ is pointwise with psum'd means, and the
    decoder pulls its receptive-field left halo (spanning multiple
    neighbors when RF exceeds a shard).  Scope: any of the three encoders
    ('64', 'Magenta', '2019' — round 5 lifted the 2019 exclusion via a
    fixed 240-sample MFCC right halo), vq_mode st/joint/ema or
    use_vq=False, no time_jitter / condition_upsample (asserted).

    x: [B, T, 1] (T divisible by ratio*n, ratio = the encoder's
    downsample rate: 64, or 320 for '2019'); y: [B, 1, S] one-hot or None.
    Returns (loss, aux) like vqvae_forward; for vq_mode='ema' aux carries
    globally-psum'd cluster stats under 'vq_stats' for
    vq.ema_codebook_apply (the update itself runs in the train step,
    mirroring train_loop.py:82-87).

    cfg.train_dtype='bf16' runs the same mixed-precision contract as
    vqvae_forward (round-4: SP used to be f32-only): encoder convs and the
    decoder stack in bf16 per shard — which engages the fused-skip
    contraction of models/wavenet.py (PERF.md #15) shard-locally — with
    norm statistics, labels, losses and the VQ argmin in f32.

    with_tensors=True additionally returns the TIME-SHARDED tensors the
    TensorBoard histogram set needs (z_e, q_z_x, e_k) as global arrays —
    the reference writes its full summary set in every mode
    (model.py:28-69), so the SP train step must not drop it.
    """
    from vqvae_wavenet_tpu.models import vq as vq_mod
    from vqvae_wavenet_tpu.models.vqvae import build_local_condition
    from vqvae_wavenet_tpu.models.wavenet import wavenet_loss
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode

    from vqvae_wavenet_tpu.models.encoders import encoder_downsample_rate
    assert cfg.encoder in ("64", "Magenta", "2019"), cfg.encoder
    assert not cfg.time_jitter and not cfg.condition_upsample
    if decoder_halo == "layer" and cfg.wavenet.num_layers > 64:
        # the layer-halo path mirrors wavenet_logits' UNROLLED stack
        # (time_sharded_wavenet_logits asserts num_layers <= 64); deeper
        # custom configs take the recompute halo, same guard as
        # time_sharded_logits (round-4 advisor finding)
        decoder_halo = "recompute"
    n = mesh.shape[axis_name]
    B, T, _ = x.shape
    ratio = encoder_downsample_rate(cfg.encoder)   # 64, or 320 for '2019'
    assert (T // n) % ratio == 0
    halo, halo_frames = halo_sizes(cfg.wavenet, ratio)
    # global reductions (losses, norm stats, VQ stats) span the time axis
    # AND the data axis when the batch is sharded
    red_axes = (axis_name,) if batch_axis is None else (batch_axis,
                                                        axis_name)

    bf16 = cfg.train_dtype == "bf16"

    def local_fn(params, state, x_l, y_l):
        # mixed precision (round 4): the same contract as vqvae_forward —
        # encoder convs bf16 (norm statistics stay f32 inside the sync
        # norms), z_e back to f32 for the VQ argmin
        enc_params = params["encoder"]
        x_enc = x_l
        if bf16:
            enc_params = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16), enc_params)
            x_enc = x_l.astype(jnp.bfloat16)
        if cfg.encoder == "Magenta":
            z_e, enc_state = time_sharded_encoder_magenta(
                enc_params, state["encoder"], x_enc,
                axis_name=axis_name)
        elif cfg.encoder == "2019":
            z_e, enc_state = time_sharded_encoder_2019(
                enc_params, state["encoder"], x_enc,
                axis_name=axis_name)
        else:
            z_e, enc_state = time_sharded_encoder_64(
                enc_params, state["encoder"], x_enc, train=train,
                norm=cfg.encoder_norm, axis_name=axis_name,
                norm_axes=red_axes)
        z_e = z_e.astype(jnp.float32)
        aux = {"state": {"encoder": enc_state}}
        if cfg.use_vq:
            q = vq_mod.quantize(params["vq"], z_e, mode=cfg.vq_mode)
            z_q, e_k = q["z_q"], q["e_k"]
            # perplexity over the global code distribution
            k = params["vq"]["embedding"].shape[0]
            avg = lax.pmean(jnp.mean(
                jax.nn.one_hot(q["q_z_x"].reshape(-1), k), axis=0),
                red_axes)
            aux["perplexity"] = jnp.exp(
                -jnp.sum(avg * jnp.log(avg + 1e-10)))
            if cfg.vq_mode == "ema":
                aux["vq_stats"] = vq_mod.ema_codebook_stats(
                    z_e, q["q_z_x"], k, axis_name=red_axes)
        else:
            z_q = e_k = z_e
        lc_l = build_local_condition(params, cfg, z_q, y_l, train=False)

        # decoder: left halo of RF samples/frames from the neighbor(s).
        # Under bf16 the per-shard stack runs the same mixed-precision
        # restructure as the single-chip path (bf16 residual stream +
        # fused-skip contraction, PERF.md #15); labels/loss stay f32.
        dec_params = params["decoder"]
        if bf16:
            dec_params = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16), dec_params)
            x_l_dec = x_l.astype(jnp.bfloat16)
            lc_l_dec = lc_l.astype(jnp.bfloat16)
        else:
            x_l_dec, lc_l_dec = x_l, lc_l
        halo_mode = decoder_halo
        if halo_mode == "fused":
            # round 5: per-cycle recompute halos through the fused Pallas
            # engine; falls back to the layer-halo XLA mirror when the
            # schedule/shape is ineligible (static decision — shapes and
            # dtypes are known at trace time)
            gplan = _fused_sp_groups(cfg.wavenet, ratio, x_l.shape[1])
            if not _fused_sp_ok(cfg.wavenet, gplan, x_l.shape[0],
                                x_l.shape[1], ratio,
                                jnp.bfloat16 if bf16 else jnp.float32):
                halo_mode = ("layer" if cfg.wavenet.num_layers <= 64
                             else "recompute")
        if halo_mode == "fused":
            logits = time_sharded_wavenet_logits_fused(
                dec_params, cfg.wavenet, x_l_dec, lc_l_dec, axis_name,
                groups=gplan[0], tt_cap=gplan[1],
                interpret=jax.default_backend() != "tpu"
            ).astype(jnp.float32)
        elif halo_mode == "layer":
            # round 4: per-layer halo exchange — one RF's worth of extra
            # rows across the whole stack instead of RF rows recomputed
            # through every layer (function docstring has the arithmetic)
            logits = time_sharded_wavenet_logits(
                dec_params, cfg.wavenet, x_l_dec, lc_l_dec,
                axis_name).astype(jnp.float32)
        else:
            x_ext = jnp.concatenate(
                [_left_halo(x_l_dec, halo, axis_name), x_l_dec], axis=1)
            lc_ext = jnp.concatenate(
                [_left_halo(lc_l_dec, halo_frames, axis_name), lc_l_dec],
                axis=1)
            logits_ext = wavenet_logits(dec_params, cfg.wavenet,
                                        x_ext, lc_ext,
                                        pad_mask=_halo_pad_mask(
                                            halo, x_l.shape[1], axis_name))
            logits = logits_ext[:, halo:, :].astype(jnp.float32)
        labels = mu_law_encode(x_l[..., 0], cfg.wavenet.quantization_channels,
                               to_int=True)
        recon = lax.pmean(
            wavenet_loss(
                logits.reshape(-1, cfg.wavenet.quantization_channels),
                labels.reshape(-1)),
            red_axes)
        loss = recon
        aux["reconstruction_loss"] = recon
        if cfg.use_vq:
            vq_loss, commit = vq_mod.vq_losses(z_e, e_k, cfg.beta,
                                               mode=cfg.vq_mode)
            vq_loss = lax.pmean(vq_loss, red_axes)
            commit = lax.pmean(commit, red_axes)
            loss = loss + vq_loss + commit
            aux["vq_loss"] = vq_loss
            aux["commitment_loss"] = commit
        aux["loss"] = loss
        # sharded summary tensors ride out of the shard_map as global
        # arrays (their out_specs below carry the time/batch sharding)
        tens = {}
        if with_tensors:
            tens["z_e"] = z_e
            if cfg.use_vq:
                tens["q_z_x"] = q["q_z_x"]
                tens["e_k"] = e_k
        return loss, aux, tens

    tens_specs = {}
    if with_tensors:
        tens_specs["z_e"] = P(batch_axis, axis_name, None)
        if cfg.use_vq:
            tens_specs["q_z_x"] = P(batch_axis, axis_name)
            tens_specs["e_k"] = P(batch_axis, axis_name, None)

    # out_specs P() for loss/aux: every leaf is replicated across shards
    # (each is either pmean/psum'd or computed identically on all shards)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(batch_axis, axis_name, None), P(batch_axis)),
        out_specs=(P(), P(), tens_specs),
        check_rep=False,
    )
    loss, aux, tens = fn(params, state, x, y)
    aux.update(tens)
    return loss, aux


def time_sharded_magenta_encode(params, x_l, *, axis_name: str):
    """The Magenta-family encoder (models/magenta.py::magenta_encode,
    reference Magenta/config.py:200-249) on a time shard.  Every conv is
    either pointwise (k=1 startconv/res/bottleneck) or causal (the gated
    dilated pair), so left-halo exchanges reproduce the single-device
    activations exactly; the window-2 avg pools are blockwise and respect
    shard boundaries because per-shard lengths stay even (T/n divisible
    by 64)."""
    from vqvae_wavenet_tpu.ops.conv import conv1d
    from vqvae_wavenet_tpu.ops.signal import pool1d
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode
    from vqvae_wavenet_tpu.models.magenta import AE_NUM_STAGES

    x_scaled = mu_law_encode(x_l)
    en = conv1d(x_scaled, params["startconv"]["kernel"],
                params["startconv"]["bias"], padding="SAME")  # k=1
    for i, layer in enumerate(params["layers"]):
        dilation = 2 ** (i % AE_NUM_STAGES)
        conv = _sharded_causal_conv(en, layer["conv"]["kernel"],
                                    layer["conv"]["bias"], dilation,
                                    axis_name)
        gate = _sharded_causal_conv(en, layer["gate"]["kernel"],
                                    layer["gate"]["bias"], dilation,
                                    axis_name)
        d = jnp.tanh(conv) * jax.nn.sigmoid(gate)
        en = en + conv1d(d, layer["res"]["kernel"], layer["res"]["bias"],
                         padding="SAME")  # k=1
        en = pool1d(en, 2, mode="avg")
    return conv1d(en, params["bottleneck"]["kernel"],
                  params["bottleneck"]["bias"], padding="SAME")  # k=1


def time_sharded_magenta_loss(params, cfg: ModelConfig, x, y, mesh,
                              *, axis_name: str = "time", batch_axis=None,
                              with_tensors: bool = False,
                              decoder_halo: str = "layer"):
    """The Magenta-family training loss (models/magenta.py::magenta_forward,
    reference Magenta/config.py:194-409) with the TIME axis sharded over
    ``axis_name`` — round-4 scope widening: SP used to cover only the main
    model family.  Same structure as time_sharded_loss: causal-encoder
    halos, pointwise VQ with pmean'd losses, decoder receptive-field halo
    with the halo pad mask, per-layer gc (T_gc=1 replicates per shard).
    Honors cfg.train_dtype='bf16' with the magenta_forward contract."""
    from vqvae_wavenet_tpu.models import vq as vq_mod
    from vqvae_wavenet_tpu.models.magenta import regularization_loss
    from vqvae_wavenet_tpu.models.wavenet import wavenet_loss
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode

    if decoder_halo == "layer" and cfg.wavenet.num_layers > 64:
        decoder_halo = "recompute"   # see time_sharded_loss (same guard)
    n = mesh.shape[axis_name]
    B, T, _ = x.shape
    ratio = 64
    assert (T // n) % ratio == 0
    halo, halo_frames = halo_sizes(cfg.wavenet, ratio)
    red_axes = (axis_name,) if batch_axis is None else (batch_axis,
                                                        axis_name)
    bf16 = cfg.train_dtype == "bf16"
    Q = cfg.wavenet.quantization_channels

    def local_fn(params, x_l, y_l):
        enc_params = params["encoder"]
        x_enc = x_l
        if bf16:
            enc_params = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16), enc_params)
            x_enc = x_l.astype(jnp.bfloat16)
        z_e = time_sharded_magenta_encode(enc_params, x_enc,
                                          axis_name=axis_name)
        z_e = z_e.astype(jnp.float32)
        q = vq_mod.quantize(params["vq"], z_e, mode="st")
        e_k, z_q = q["e_k"], q["z_q"]

        vq_loss = lax.pmean(jnp.mean(
            (jax.lax.stop_gradient(z_e) - e_k) ** 2), red_axes)
        commit = lax.pmean(0.25 * jnp.mean(
            (z_e - jax.lax.stop_gradient(e_k)) ** 2), red_axes)
        k = params["vq"]["embedding"].shape[0]
        avg = lax.pmean(jnp.mean(
            jax.nn.one_hot(q["q_z_x"].reshape(-1), k), axis=0), red_axes)
        perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))

        gc_idx = jnp.argmax(y_l, axis=-1)                 # [B_l, 1]
        gc = jnp.take(params["speaker_emb"], gc_idx, axis=0)

        dec = params["decoder"]
        x_dec, zq_dec, gc_dec = x_l, z_q, gc
        if bf16:
            dec = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16), dec)
            x_dec = x_l.astype(jnp.bfloat16)
            zq_dec = z_q.astype(jnp.bfloat16)
            gc_dec = gc.astype(jnp.bfloat16)
        halo_mode = decoder_halo
        if halo_mode == "fused":
            gplan = _fused_sp_groups(cfg.wavenet, ratio, x_l.shape[1])
            if not _fused_sp_ok(cfg.wavenet, gplan, x_l.shape[0],
                                x_l.shape[1], ratio,
                                jnp.bfloat16 if bf16 else jnp.float32):
                halo_mode = ("layer" if cfg.wavenet.num_layers <= 64
                             else "recompute")
        if halo_mode == "fused":
            logits = time_sharded_wavenet_logits_fused(
                dec, cfg.wavenet, x_dec, zq_dec, axis_name,
                global_condition=gc_dec, gate_order="sigmoid_first",
                groups=gplan[0], tt_cap=gplan[1],
                interpret=jax.default_backend() != "tpu"
            ).astype(jnp.float32)
        elif halo_mode == "layer":
            logits = time_sharded_wavenet_logits(
                dec, cfg.wavenet, x_dec, zq_dec, axis_name,
                global_condition=gc_dec,
                gate_order="sigmoid_first").astype(jnp.float32)
        else:
            x_ext = jnp.concatenate(
                [_left_halo(x_dec, halo, axis_name), x_dec], axis=1)
            lc_ext = jnp.concatenate(
                [_left_halo(zq_dec, halo_frames, axis_name), zq_dec], axis=1)
            logits_ext = wavenet_logits(dec, cfg.wavenet, x_ext, lc_ext,
                                        global_condition=gc_dec,
                                        gate_order="sigmoid_first",
                                        pad_mask=_halo_pad_mask(
                                            halo, x_l.shape[1], axis_name))
            logits = logits_ext[:, halo:, :].astype(jnp.float32)
        labels = mu_law_encode(x_l[..., 0], Q, to_int=True)
        recon = lax.pmean(
            wavenet_loss(logits.reshape(-1, Q), labels.reshape(-1)),
            red_axes)
        # reg depends only on the replicated params: pmean is the identity
        # forward and makes the shard_map transpose psum exact (each
        # shard's cotangent carries 1/n)
        reg = lax.pmean(regularization_loss(params), red_axes)
        loss = recon + reg + vq_loss + commit
        aux = {"loss": loss, "reconstruction_loss": recon,
               "vq_loss": vq_loss, "commitment_loss": commit,
               "reg_loss": reg, "perplexity": perplexity,
               "distances_mean": lax.pmean(q["distances_mean"], red_axes)}
        tens = {}
        if with_tensors:
            tens = {"z_e": z_e, "q_z_x": q["q_z_x"], "e_k": e_k}
        return loss, aux, tens

    tens_specs = {}
    if with_tensors:
        tens_specs = {"z_e": P(batch_axis, axis_name, None),
                      "q_z_x": P(batch_axis, axis_name),
                      "e_k": P(batch_axis, axis_name, None)}
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis_name, None), P(batch_axis)),
        out_specs=(P(), P(), tens_specs),
        check_rep=False,
    )
    loss, aux, tens = fn(params, x, y)
    aux.update(tens)
    return loss, aux


def make_sp_train_step(cfg: ModelConfig, mesh, axis_name: str = "time",
                       ema_decay: float = 0.999, batch_axis=None,
                       with_summaries: bool = False,
                       decoder_halo: str = "layer"):
    """Jitted full train step (fwd+bwd+Adam+EMA) over a time-sharded mesh,
    optionally composed with data parallelism on a 2-D (data x time) mesh.

    The train-state pytree replicates; the audio batch shards its time
    axis (and batch axis when ``batch_axis`` is given).  Gradients of the
    ppermute halos flow back automatically (collectives are
    differentiable); for a sharded batch the shard_map transpose psums the
    parameter cotangents over the data axis — standard DP reduction.

    Routes by cfg.model_family ('vqvae' | 'magenta' — round 4: the Magenta
    50-layer preset trains under SP too).  with_summaries=True returns the
    full TensorBoard tensor set under metrics['summaries'] exactly like
    train_loop.train_step — the reference writes its complete histogram
    set in every mode (model.py:28-69, 119-124)."""
    import optax
    from vqvae_wavenet_tpu.models import vq as vq_mod
    from vqvae_wavenet_tpu.training.optimizer import (
        piecewise_constant_schedule, ema_update, fused_adam_ema_step)

    def step(ts, batch):
        if cfg.model_family == "magenta":
            def loss_fn(params):
                return time_sharded_magenta_loss(
                    params, cfg, batch["x"], batch.get("y"), mesh,
                    axis_name=axis_name, batch_axis=batch_axis,
                    with_tensors=with_summaries,
                    decoder_halo=decoder_halo)
        else:
            def loss_fn(params):
                return time_sharded_loss(params, ts["model_state"], cfg,
                                         batch["x"], batch.get("y"), mesh,
                                         axis_name=axis_name,
                                         batch_axis=batch_axis,
                                         with_tensors=with_summaries,
                                         decoder_halo=decoder_halo)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts["params"])
        # one fused Adam+apply+EMA tree pass (PERF.md #29), identical
        # state layout/numerics to the optax chain
        params, ema_params, opt_state = fused_adam_ema_step(
            ts["params"], ts["ema_params"], ts["opt_state"], grads,
            piecewise_constant_schedule(cfg.learning_rate_schedule),
            b1=0.5 if cfg.model_family == "magenta" else 0.9,
            ema_decay=ema_decay)
        model_state = aux.get("state", ts["model_state"])
        if cfg.use_vq and cfg.vq_mode == "ema":
            # same post-optimizer codebook EMA as train_loop.py:82-87; the
            # cluster stats were psum'd across all shards inside shard_map
            cluster_size, dw = aux["vq_stats"]
            new_vq, new_vq_state = vq_mod.ema_codebook_apply(
                {"embedding": params["vq"]["embedding"]},
                ts["model_state"]["vq"], cluster_size, dw,
                decay=cfg.ema_decay)
            ema_params = dict(ema_params, vq=ema_update(
                ts["ema_params"]["vq"], new_vq, ema_decay))
            params = dict(params, vq=new_vq)
            model_state = dict(model_state, vq=new_vq_state)
        new_ts = {
            "params": params,
            "ema_params": ema_params,
            "model_state": model_state,
            "opt_state": opt_state,
            "step": ts["step"] + 1,
        }
        metrics = {"loss": loss, "step": new_ts["step"],
                   "reconstruction_loss": aux["reconstruction_loss"],
                   "lr": piecewise_constant_schedule(
                       cfg.learning_rate_schedule)(ts["step"])}
        for key in ("vq_loss", "commitment_loss", "perplexity",
                    "reg_loss", "distances_mean"):
            if key in aux:
                metrics[key] = aux[key]
        if with_summaries:
            # the same summary tensor set as train_loop.train_step:111-130
            summ = {"z_e": aux["z_e"], "grads": grads,
                    "grad_norm": optax.global_norm(grads)}
            if "q_z_x" in aux:
                summ["q_z_x"] = aux["q_z_x"]
            if "e_k" in aux:
                summ["e_k"] = aux["e_k"]
            if cfg.use_vq and "vq" in ts["params"]:
                emb = ts["params"]["vq"]["embedding"]
                flat = aux["z_e"].reshape(-1, emb.shape[1])[:1024]
                summ["distances"] = (jnp.sum(flat ** 2, -1, keepdims=True)
                                     - 2.0 * flat @ emb.T
                                     + jnp.sum(emb ** 2, -1)[None, :])
            metrics["summaries"] = summ
        return new_ts, metrics

    from jax.sharding import NamedSharding
    x_sharding = NamedSharding(mesh, P(batch_axis, axis_name, None))
    y_sharding = NamedSharding(mesh, P(batch_axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(step,
                   in_shardings=(repl, {"x": x_sharding, "y": y_sharding}),
                   donate_argnums=(0,))
