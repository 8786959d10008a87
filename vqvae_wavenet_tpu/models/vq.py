"""Vector quantization: codebook, nearest-neighbor discretization,
straight-through gradients, and the alternative training modes.

Reference semantics:
  * codebook [k, d], uniform-unit-scaling(1.7) init — model.py:45-48
    ("normal" init option per README.md:28-30).
  * distances = ||z_e - e||^2, q(z|x) = argmin, e_k = lookup,
    z_q = z_e + stop_gradient(e_k - z_e) — model.py:57-74.  The distance is
    computed here in matmul-expanded form ||z||^2 - 2 z.E^T + ||E||^2
    (the Magenta/sonnet.py:91-93 formulation) which is MXU-shaped and never
    materializes the [BT, k, d] difference tensor.
  * vq_loss = mean((sg(z_e) - e_k)^2); commitment = beta*mean((z_e - sg(e_k))^2)
    — model.py:100-103.
  * "joint" mode = train z_e and e_k together without stop_gradient
    (README.md:25-27): the codebook receives reconstruction gradients through
    the lookup and both auxiliary losses keep their pull terms un-detached.
  * "ema" mode = sonnet VectorQuantizerEMA (Magenta/sonnet.py:124-261):
    codebook is not trained by the optimizer; it follows EMA cluster
    statistics with Laplace smoothing; only the commitment loss remains.
  * perplexity metric — Magenta/sonnet.py:105-106.

Under pjit the EMA cluster statistics are psum-reduced over the data axis
(``axis_name``) so multi-chip training matches single-chip exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vqvae_wavenet_tpu.ops.conv import uniform_unit_scaling_init


def init_vq_params(key, k: int, latent_dim: int, init: str = "uniform_scaling"):
    if init == "uniform_scaling":
        emb = uniform_unit_scaling_init(key, (k, latent_dim), factor=1.7)
    elif init == "normal":
        emb = jax.random.normal(key, (k, latent_dim))
    else:
        raise ValueError(f"unknown codebook init {init}")
    return {"embedding": emb}


def init_vq_state(params):
    """EMA statistics (only consumed in vq_mode='ema')."""
    k, _ = params["embedding"].shape
    return {"ema_cluster_size": jnp.zeros((k,)),
            "ema_means": params["embedding"]}


def quantize(params, z_e, *, mode: str = "st"):
    """Discretize z_e [..., d] against the codebook.

    Returns dict with z_q (decoder input, gradient behavior per mode),
    e_k (raw lookup), q_z_x (int32 code indices), perplexity.
    """
    from vqvae_wavenet_tpu.ops.vq_pallas import vq_nearest

    embedding = params["embedding"]
    k, d = embedding.shape
    flat = z_e.reshape(-1, d)
    # fused Pallas distance+argmin on TPU (never materializes [N, k] in
    # HBM); jnp fallback elsewhere.  Gradients flow through the lookup and
    # the ST estimator, never the argmin — both search inputs are detached
    # (the kernel is forward-only; autodiff would fail to linearize it).
    q_z_x = vq_nearest(jax.lax.stop_gradient(flat),
                       jax.lax.stop_gradient(embedding))
    e_k = jnp.take(embedding, q_z_x, axis=0).reshape(z_e.shape)
    q_z_x = q_z_x.reshape(z_e.shape[:-1])
    # mean over the full [N, k] distance set in closed form (for the
    # reference's 'distances' metric, model.py:62) without the matrix:
    # E[||z-e||^2] = E||z||^2 + E||e||^2 - 2 E[z].E[e]
    distances_mean = (jnp.mean(jnp.sum(flat ** 2, -1))
                      + jnp.mean(jnp.sum(embedding ** 2, -1))
                      - 2.0 * jnp.dot(jnp.mean(flat, 0),
                                      jnp.mean(embedding, 0)))

    if mode in ("st", "ema"):
        z_q = z_e + jax.lax.stop_gradient(e_k - z_e)
    elif mode == "joint":
        # no stop_gradient: recon grads flow into the codebook via the lookup
        z_q = e_k
    else:
        raise ValueError(f"unknown vq mode {mode}")

    avg_probs = jnp.mean(
        jax.nn.one_hot(q_z_x.reshape(-1), k, dtype=jnp.float32), axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    return {"z_q": z_q, "e_k": e_k, "q_z_x": q_z_x.astype(jnp.int32),
            "perplexity": perplexity, "distances_mean": distances_mean}


def vq_losses(z_e, e_k, beta: float, *, mode: str = "st"):
    """(vq_loss, commitment_loss) per model.py:100-103 / mode semantics."""
    if mode == "st":
        vq_loss = jnp.mean((jax.lax.stop_gradient(z_e) - e_k) ** 2)
        commitment = beta * jnp.mean((z_e - jax.lax.stop_gradient(e_k)) ** 2)
    elif mode == "joint":
        vq_loss = jnp.mean((z_e - e_k) ** 2)
        commitment = beta * jnp.mean((z_e - e_k) ** 2)
    elif mode == "ema":
        vq_loss = jnp.asarray(0.0)
        commitment = beta * jnp.mean((z_e - jax.lax.stop_gradient(e_k)) ** 2)
    else:
        raise ValueError(f"unknown vq mode {mode}")
    return vq_loss, commitment


def ema_codebook_stats(z_e, q_z_x, k: int, axis_name=None):
    """Per-batch cluster statistics for the EMA codebook update: counts
    [k] and code-wise sums dw [k, d].  ``axis_name`` (a mesh axis name or
    tuple of names) psums them — under SP/DP the z_e shards each
    contribute partial sums (parallel/timeshard.py)."""
    d = z_e.shape[-1]
    flat = jax.lax.stop_gradient(z_e).reshape(-1, d)
    onehot = jax.nn.one_hot(q_z_x.reshape(-1), k, dtype=jnp.float32)
    cluster_size = jnp.sum(onehot, axis=0)
    dw = jnp.einsum("nk,nd->kd", onehot, flat,
                    preferred_element_type=jnp.float32)
    if axis_name is not None:
        cluster_size = jax.lax.psum(cluster_size, axis_name)
        dw = jax.lax.psum(dw, axis_name)
    return cluster_size, dw


def ema_codebook_apply(params, state, cluster_size, dw, *,
                       decay: float = 0.99, epsilon: float = 1e-5):
    """Fold (already globally-reduced) cluster stats into the EMA codebook
    (Magenta/sonnet.py:224-241: Laplace-smoothed cluster sizes)."""
    k = params["embedding"].shape[0]
    new_cluster_size = (decay * state["ema_cluster_size"]
                        + (1 - decay) * cluster_size)
    new_means = decay * state["ema_means"] + (1 - decay) * dw

    n = jnp.sum(new_cluster_size)
    smoothed = ((new_cluster_size + epsilon) / (n + k * epsilon)) * n
    new_embedding = new_means / smoothed[:, None]

    return ({"embedding": new_embedding},
            {"ema_cluster_size": new_cluster_size, "ema_means": new_means})


def ema_codebook_update(params, state, z_e, q_z_x, *, decay: float = 0.99,
                        epsilon: float = 1e-5,
                        axis_name: Optional[str] = None):
    """VectorQuantizerEMA codebook update (Magenta/sonnet.py:224-241).

    Returns (new_params, new_state).  Statistics are psum-synced over the
    data mesh axis when ``axis_name`` is given.
    """
    cluster_size, dw = ema_codebook_stats(
        z_e, q_z_x, params["embedding"].shape[0], axis_name=axis_name)
    return ema_codebook_apply(params, state, cluster_size, dw,
                              decay=decay, epsilon=epsilon)
