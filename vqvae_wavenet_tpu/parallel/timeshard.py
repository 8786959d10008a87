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

import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import wavenet_logits


def halo_sizes(cfg: WavenetConfig, ratio: int):
    """(halo_samples, halo_frames): RF rounded up to conditioning frames."""
    halo_frames = -(-cfg.receptive_field // ratio)
    return halo_frames * ratio, halo_frames


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
                                    gate_order=gate_order)
        return logits_ext[:, halo:, :]

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(None, axis_name, None),
        check_rep=False,
    )
    return fn(params, x, local_condition)
