"""Pallas TPU kernel: fused VQ nearest-codebook search.

The VQ layer's hot op is the L2 nearest-neighbor search of every latent
frame against the codebook (reference computes a full [N, k] distance
tensor in HBM and argmins it — model.py:57-65).  This kernel tiles the
frames, computes the distance row-block as ||e||^2 - 2 z.E^T on the MXU
(the ||z||^2 term is row-constant and cannot change the argmin), and
reduces to per-row argmin while the block is still in VMEM — the [N, k]
matrix never touches HBM.

Forward-only by design: gradients in every VQ mode flow through the
embedding LOOKUP of the returned indices (and the straight-through
estimator), never through the distances (argmin has no gradient), so the
caller does `jnp.take(embedding, idx)` outside.

Falls back to the jnp path automatically off-TPU (models/vq.py chooses).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vq_argmin_kernel(z_ref, emb_ref, e_sq_ref, idx_ref):
    # z_ref: [TILE_N, D]; emb_ref: [D, K]; e_sq_ref: [1, K]; idx_ref: [TILE_N, 1]
    # HIGHEST precision: default bf16 MXU passes flip near-tie argmins
    dots = jnp.dot(z_ref[:], emb_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    dist = e_sq_ref[:] - 2.0 * dots            # [TILE_N, K]
    idx_ref[:] = jnp.argmin(dist, axis=-1, keepdims=True).astype(jnp.int32)


@partial(jax.jit, static_argnames=("tile_n",))
def vq_nearest_pallas(z_flat, embedding, *, tile_n: int = 256):
    """z_flat: [N, d] float; embedding: [k, d].  Returns int32 [N] argmin
    indices of the L2 distance."""
    n, d = z_flat.shape
    k, _ = embedding.shape
    n_pad = _round_up(max(n, 8), tile_n)
    d_pad = _round_up(d, 128)
    k_pad = _round_up(k, 128)

    z_p = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(
        z_flat.astype(jnp.float32))
    # pad the codebook with +inf-distance rows so padded columns never win:
    # distance column j for padded j is 0 - 2*z.0 = 0... so instead bias
    # padded columns' ||e||^2 to +inf.
    emb_t = jnp.zeros((d_pad, k_pad), jnp.float32).at[:d, :k].set(
        embedding.T.astype(jnp.float32))
    e_sq = jnp.full((1, k_pad), jnp.inf, jnp.float32).at[0, :k].set(
        jnp.sum(embedding.astype(jnp.float32) ** 2, axis=-1))

    grid = (n_pad // tile_n,)
    idx = pl.pallas_call(
        _vq_argmin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d_pad * k_pad,
            bytes_accessed=(n_pad * d_pad + d_pad * k_pad + n_pad) * 4,
            transcendentals=0),
    )(z_p, emb_t, e_sq)
    return idx[:n, 0]


def vq_nearest(z_flat, embedding, interpret_ok: bool = True):
    """Dispatch: Pallas kernel on TPU, jnp fallback elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return vq_nearest_pallas(z_flat, embedding)
    # jnp fallback (identical math)
    dots = jnp.einsum("nd,kd->nk", z_flat, embedding,
                      preferred_element_type=jnp.float32)
    dist = jnp.sum(embedding.astype(jnp.float32) ** 2, -1) - 2.0 * dots
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)
