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


def _first_shard_pad_mask(halo: int, local_len: int, axis_name: str):
    """[1, halo+local, 1] residual-stream multiplier: zero over the halo on
    shard 0 (reproducing the single-device per-layer zero padding at
    sequence start — biased layers would otherwise compute nonzero halo
    activations from the zero-filled ppermute input), one everywhere else."""
    is_first = (lax.axis_index(axis_name) == 0).astype(jnp.float32)
    halo_part = jnp.full((1, halo, 1), 1.0) - is_first
    return jnp.concatenate([halo_part, jnp.ones((1, local_len, 1))], axis=1)


def time_sharded_logits(params, cfg: WavenetConfig, x, local_condition,
                        mesh, axis_name: str = "data",
                        gate_order: str = "tanh_first"):
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
    perm = [(i, i + 1) for i in range(n - 1)]  # send my tail to the right

    def local_fn(params, x_l, lc_l):
        # x_l: [B, T/n, 1], lc_l: [B, T_cond/n, C]
        x_tail = x_l[:, -halo:, :]
        lc_tail = lc_l[:, -halo_frames:, :]
        x_halo = lax.ppermute(x_tail, axis_name, perm)   # shard 0 gets zeros
        lc_halo = lax.ppermute(lc_tail, axis_name, perm)
        x_ext = jnp.concatenate([x_halo, x_l], axis=1)
        lc_ext = jnp.concatenate([lc_halo, lc_l], axis=1)
        logits_ext = wavenet_logits(params, cfg, x_ext, lc_ext,
                                    gate_order=gate_order,
                                    pad_mask=_first_shard_pad_mask(
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


def _sync_batch_norm(params, state, x_l, *, train: bool, axis_name: str,
                     momentum: float = 0.99, eps: float = 1e-3):
    """BatchNorm with (B, T) statistics pmean-synced over the time axis —
    bit-equal to single-device stats for equal shard sizes."""
    if train:
        mean = lax.pmean(jnp.mean(x_l, axis=(0, 1)), axis_name)
        mean_sq = lax.pmean(jnp.mean(jnp.square(x_l), axis=(0, 1)),
                            axis_name)
        var = mean_sq - jnp.square(mean)
        new_state = {"mean": momentum * state["mean"] + (1 - momentum) * mean,
                     "var": momentum * state["var"] + (1 - momentum) * var}
    else:
        mean, var, new_state = state["mean"], state["var"], state
    inv = lax.rsqrt(var + eps) * params["scale"]
    return (x_l - mean) * inv + params["bias"], new_state


def _sync_group_norm(params, x_l, *, axis_name: str, num_groups: int = 8,
                     eps: float = 1e-3):
    """GroupNorm whose (T, C/g) statistics span the FULL time axis via
    pmean — exactly the single-device group_norm."""
    b, t, c = x_l.shape
    g = num_groups if c % num_groups == 0 else 1
    xg = x_l.reshape(b, t, g, c // g)
    mean = lax.pmean(jnp.mean(xg, axis=(1, 3), keepdims=True), axis_name)
    mean_sq = lax.pmean(jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True),
                        axis_name)
    var = mean_sq - jnp.square(mean)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    return xg.reshape(b, t, c) * params["scale"] + params["bias"]


def time_sharded_encoder_64(params, state, x_l, *, train: bool,
                            norm: str, axis_name: str):
    """Encoder_64 on a time shard: per-layer halo exchange makes each
    stride-2 'SAME' conv (k=5) exact at shard boundaries; norms are
    psum-synced so statistics span the whole sequence.

    XLA 'SAME' for k=5, s=2, even T pads (1 left, 3 right) — out[o] reads
    in[2o-1 .. 2o+3] — so the halo is 1 column from the left neighbor and
    3 from the right; edge shards get zeros, exactly the SAME zero pad.

    x_l: [B, T/n, 1] -> z_e_l [B, T/(64 n), latent_dim], exactly the
    single-device encoder_64_forward output for this shard's frames.
    """
    from vqvae_wavenet_tpu.ops.conv import conv1d
    net = x_l
    new_bn = []
    for i, conv in enumerate(params["convs"]):
        ext = _exchange_both(net, 1, 3, axis_name)
        net = conv1d(ext, conv["kernel"], conv["bias"], stride=2,
                     padding="VALID")
        net = jax.nn.relu(net)
        if norm == "batch":
            net, s = _sync_batch_norm(params["bn"][i], state["bn"][i], net,
                                      train=train, axis_name=axis_name)
        else:
            net, s = _sync_group_norm(params["bn"][i], net,
                                      axis_name=axis_name), state["bn"][i]
        new_bn.append(s)
    net = conv1d(net, params["out"]["kernel"], params["out"]["bias"],
                 padding="VALID")
    i = len(params["convs"])
    if norm == "batch":
        net, s = _sync_batch_norm(params["bn"][i], state["bn"][i], net,
                                  train=train, axis_name=axis_name)
    else:
        net, s = _sync_group_norm(params["bn"][i], net,
                                  axis_name=axis_name), state["bn"][i]
    new_bn.append(s)
    return net, {"bn": new_bn}


def time_sharded_loss(params, state, cfg: ModelConfig, x, y, mesh,
                      *, train: bool = True, axis_name: str = "time"):
    """VQVAE loss with the TIME axis sharded over ``axis_name``.

    Exact (up to reduction order) vs vqvae_forward on one device: the
    encoder exchanges +-2-column halos per layer, norms psum-sync their
    statistics, VQ is pointwise with psum'd means, and the decoder pulls
    its receptive-field left halo.  Scope: encoder='64', vq_mode st/joint
    or use_vq=False, no time_jitter / condition_upsample (asserted).

    x: [B, T, 1] (T divisible by 64*n); y: [B, 1, S] one-hot or None.
    Returns (loss, aux) like vqvae_forward (aux carries new model state).
    """
    from vqvae_wavenet_tpu.models import vq as vq_mod
    from vqvae_wavenet_tpu.models.vqvae import build_local_condition
    from vqvae_wavenet_tpu.models.wavenet import wavenet_loss
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode

    assert cfg.encoder == "64", "SP training supports the default encoder"
    assert not cfg.time_jitter and not cfg.condition_upsample
    assert not (cfg.use_vq and cfg.vq_mode == "ema"), (
        "vq_mode='ema' not supported under SP yet")
    n = mesh.shape[axis_name]
    B, T, _ = x.shape
    ratio = 64
    assert (T // n) % ratio == 0
    halo, halo_frames = halo_sizes(cfg.wavenet, ratio)
    assert halo <= T // n, (
        f"decoder halo {halo} exceeds shard length {T // n}; use fewer "
        "shards or longer audio")

    def local_fn(params, state, x_l, y):
        z_e, enc_state = time_sharded_encoder_64(
            params["encoder"], state["encoder"], x_l, train=train,
            norm=cfg.encoder_norm, axis_name=axis_name)
        aux = {"state": {"encoder": enc_state}}
        if cfg.use_vq:
            q = vq_mod.quantize(params["vq"], z_e, mode=cfg.vq_mode)
            z_q, e_k = q["z_q"], q["e_k"]
            # perplexity over the global code distribution
            k = params["vq"]["embedding"].shape[0]
            avg = lax.pmean(jnp.mean(
                jax.nn.one_hot(q["q_z_x"].reshape(-1), k), axis=0),
                axis_name)
            aux["perplexity"] = jnp.exp(
                -jnp.sum(avg * jnp.log(avg + 1e-10)))
        else:
            z_q = e_k = z_e
        lc_l = build_local_condition(params, cfg, z_q, y, train=False)

        # decoder: left halo of RF samples/frames from the left neighbor
        perm = [(i, i + 1) for i in range(n - 1)]
        x_ext = jnp.concatenate(
            [lax.ppermute(x_l[:, -halo:, :], axis_name, perm), x_l], axis=1)
        lc_ext = jnp.concatenate(
            [lax.ppermute(lc_l[:, -halo_frames:, :], axis_name, perm), lc_l],
            axis=1)
        logits_ext = wavenet_logits(params["decoder"], cfg.wavenet,
                                    x_ext, lc_ext,
                                    pad_mask=_first_shard_pad_mask(
                                        halo, x_l.shape[1], axis_name))
        logits = logits_ext[:, halo:, :]
        labels = mu_law_encode(x_l[..., 0], cfg.wavenet.quantization_channels,
                               to_int=True)
        recon = lax.pmean(
            wavenet_loss(
                logits.reshape(-1, cfg.wavenet.quantization_channels),
                labels.reshape(-1)),
            axis_name)
        loss = recon
        aux["reconstruction_loss"] = recon
        if cfg.use_vq:
            vq_loss, commit = vq_mod.vq_losses(z_e, e_k, cfg.beta,
                                               mode=cfg.vq_mode)
            vq_loss = lax.pmean(vq_loss, axis_name)
            commit = lax.pmean(commit, axis_name)
            loss = loss + vq_loss + commit
            aux["vq_loss"] = vq_loss
            aux["commitment_loss"] = commit
        aux["loss"] = loss
        return loss, aux

    # out_specs P(): loss and every aux leaf are replicated across shards
    # (each is either pmean'd or computed identically on all shards)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name, None), P()),
        out_specs=P(),
        check_rep=False,
    )
    return fn(params, state, x, y)


def make_sp_train_step(cfg: ModelConfig, mesh, axis_name: str = "time",
                       ema_decay: float = 0.999):
    """Jitted full train step (fwd+bwd+Adam+EMA) over a time-sharded mesh.

    The train-state pytree replicates; only the audio batch's time axis is
    sharded.  Gradients of the ppermute halos flow back automatically
    (collectives are differentiable)."""
    import optax
    from vqvae_wavenet_tpu.training.optimizer import (
        piecewise_constant_schedule, ema_update)
    from vqvae_wavenet_tpu.training.train_loop import _family_optimizer

    opt = _family_optimizer(cfg)

    def step(ts, batch):
        def loss_fn(params):
            return time_sharded_loss(params, ts["model_state"], cfg,
                                     batch["x"], batch.get("y"), mesh,
                                     axis_name=axis_name)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts["params"])
        updates, opt_state = opt.update(grads, ts["opt_state"], ts["params"])
        params = optax.apply_updates(ts["params"], updates)
        new_ts = {
            "params": params,
            "ema_params": ema_update(ts["ema_params"], params, ema_decay),
            "model_state": aux["state"],
            "opt_state": opt_state,
            "step": ts["step"] + 1,
        }
        metrics = {"loss": loss, "step": new_ts["step"],
                   "reconstruction_loss": aux["reconstruction_loss"],
                   "lr": piecewise_constant_schedule(
                       cfg.learning_rate_schedule)(ts["step"])}
        for key in ("vq_loss", "commitment_loss", "perplexity"):
            if key in aux:
                metrics[key] = aux[key]
        return new_ts, metrics

    from jax.sharding import NamedSharding
    x_sharding = NamedSharding(mesh, P(None, axis_name, None))
    repl = NamedSharding(mesh, P())
    return jax.jit(step,
                   in_shardings=(repl, {"x": x_sharding, "y": repl}),
                   donate_argnums=(0,))
