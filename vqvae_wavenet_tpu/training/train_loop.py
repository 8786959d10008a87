"""Training step: pure function + ONE jit over the device mesh.

The reference's graph-assembly + sess.run loop (train.py:100-122) becomes a
jitted step over a TrainState pytree.  Batch is sharded on the 'data' mesh
axis; parameters replicate (or shard over 'model' per parallel/mesh.py TP
rules); GSPMD inserts the gradient psums.  The EMA(0.999) shadow-parameter
update runs inside the same program (model.py:126-128), as does the EMA
codebook update when vq_mode='ema' (Magenta/sonnet.py:224-241).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from vqvae_wavenet_tpu.config import ModelConfig
from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
from vqvae_wavenet_tpu.models import vq as vq_mod
from vqvae_wavenet_tpu.training.optimizer import (
    make_optimizer, piecewise_constant_schedule, ema_update)


def _family_optimizer(cfg: ModelConfig):
    if cfg.model_family == "magenta":
        from vqvae_wavenet_tpu.models.magenta import make_magenta_optimizer
        return make_magenta_optimizer(cfg.learning_rate_schedule)
    return make_optimizer(cfg.learning_rate_schedule)


def init_train_state(key, cfg: ModelConfig, num_speakers: Optional[int]):
    if cfg.model_family == "magenta":
        from vqvae_wavenet_tpu.models.magenta import init_magenta_params
        params, model_state = init_magenta_params(key, num_speakers), {}
    else:
        params, model_state = init_vqvae(key, cfg, num_speakers)
    opt = _family_optimizer(cfg)
    return {
        "params": params,
        # EMA shadows start equal to params but must be DISTINCT buffers:
        # aliased leaves would be donated twice by the jitted train step
        # ("Attempt to donate the same buffer twice").
        "ema_params": jax.tree_util.tree_map(lambda x: x.copy(), params),
        "model_state": model_state,
        "opt_state": opt.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def train_step(ts, batch, rng=None, *, cfg: ModelConfig,
               ema_decay: float = 0.999, with_summaries: bool = False):
    """One optimizer step.  batch = {'x': [B,T,1], 'y': [B,1,S] or None}.
    ``rng`` is only consumed by the optional time-jitter augmentation
    (cfg.time_jitter); pass None otherwise.

    with_summaries=True additionally returns the reference's TensorBoard
    tensor set (model.py:28-69, 119-124) under metrics['summaries']: z_e,
    q(z|x), e_k, a subsampled distance matrix, the raw gradients (per-layer
    histograms) and the gradient global norm.  Compiled as a second program
    and invoked only every `interval` steps, so the hot step stays lean."""
    if cfg.model_family == "magenta":
        from vqvae_wavenet_tpu.models.magenta import magenta_forward

        def loss_fn(params):
            return magenta_forward(params, batch["x"], batch.get("y"),
                                   train_dtype=cfg.train_dtype,
                                   engine=cfg.train_engine)
    else:
        def loss_fn(params):
            loss, aux = vqvae_forward(params, ts["model_state"], cfg,
                                      batch["x"], batch.get("y"), train=True,
                                      rng=rng)
            return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts["params"])
    # Adam + apply + EMA as ONE fused tree pass (PERF.md #29) — state
    # layout and numerics match the optax chain built by
    # _family_optimizer (same checkpoints, parity-tested)
    from vqvae_wavenet_tpu.training.optimizer import fused_adam_ema_step
    params, ema_params, opt_state = fused_adam_ema_step(
        ts["params"], ts["ema_params"], ts["opt_state"], grads,
        piecewise_constant_schedule(cfg.learning_rate_schedule),
        b1=0.5 if cfg.model_family == "magenta" else 0.9,
        ema_decay=ema_decay)
    model_state = aux.get("state", ts["model_state"])

    if cfg.use_vq and cfg.vq_mode == "ema":
        new_vq, new_vq_state = vq_mod.ema_codebook_update(
            {"embedding": params["vq"]["embedding"]}, ts["model_state"]["vq"],
            aux["z_e"], aux["q_z_x"], decay=cfg.ema_decay)
        # the EMA shadow must track the codebook-updated embedding, as
        # the unfused sequence did (ema_update ran after the VQ update)
        ema_params = dict(ema_params, vq=ema_update(
            ts["ema_params"]["vq"], new_vq, ema_decay))
        params = dict(params, vq=new_vq)
        model_state = dict(model_state, vq=new_vq_state)

    step = ts["step"] + 1
    new_ts = {
        "params": params,
        "ema_params": ema_params,
        "model_state": model_state,
        "opt_state": opt_state,
        "step": step,
    }
    lr = piecewise_constant_schedule(cfg.learning_rate_schedule)(ts["step"])
    metrics = {
        "loss": loss,
        "reconstruction_loss": aux["reconstruction_loss"],
        "lr": lr,
        "step": step,
    }
    for k in ("vq_loss", "commitment_loss", "perplexity", "reg_loss",
              "distances_mean"):
        if k in aux:
            metrics[k] = aux[k]

    if with_summaries:
        summ = {"z_e": aux["z_e"],
                "grads": grads,
                "grad_norm": optax.global_norm(grads)}
        if "q_z_x" in aux:
            summ["q_z_x"] = aux["q_z_x"]
        e_k = aux.get("e_k", aux.get("encoding"))
        if e_k is not None:
            summ["e_k"] = e_k
        if cfg.use_vq and "vq" in ts["params"]:
            # subsampled full distance matrix for the reference's
            # 'distances' histogram (model.py:62) — the training forward
            # never materializes [N, k] (Pallas kernel), so build it here
            # from the first rows only
            emb = ts["params"]["vq"]["embedding"]
            flat = aux["z_e"].reshape(-1, emb.shape[1])[:1024]
            summ["distances"] = (jnp.sum(flat ** 2, -1, keepdims=True)
                                 - 2.0 * flat @ emb.T
                                 + jnp.sum(emb ** 2, -1)[None, :])
        metrics["summaries"] = summ
    return new_ts, metrics


def make_jit_train_step(cfg: ModelConfig, mesh=None, donate: bool = True,
                        with_summaries: bool = False):
    """Close over the config and jit.  With a mesh, inputs get sharding
    constraints: batch over 'data', train state per TP rules.

    Donation requires every train-state leaf to be a DISTINCT buffer —
    init_train_state deep-copies the EMA shadows for exactly this reason."""
    step_fn = partial(train_step, cfg=cfg, with_summaries=with_summaries)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P
    from vqvae_wavenet_tpu.parallel.mesh import param_shardings, replicated

    def jit_with_shardings(ts_example):
        ts_sharding = {
            "params": param_shardings(mesh, ts_example["params"]),
            "ema_params": param_shardings(mesh, ts_example["ema_params"]),
            "model_state": jax.tree_util.tree_map(
                lambda _: replicated(mesh), ts_example["model_state"]),
            "opt_state": jax.tree_util.tree_map(
                lambda _: replicated(mesh), ts_example["opt_state"]),
            "step": replicated(mesh),
        }
        batch_sharding = {"x": NamedSharding(mesh, P("data")),
                          "y": NamedSharding(mesh, P("data"))}
        return jax.jit(
            step_fn,
            in_shardings=(ts_sharding, batch_sharding, replicated(mesh)),
            donate_argnums=(0,) if donate else (),
        )

    return jit_with_shardings
