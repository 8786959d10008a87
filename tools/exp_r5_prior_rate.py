#!/usr/bin/env python3
"""Prior-trainer step rate on the real TPU (round 5, VERDICT r4 #2).

The round-4 prior rework (bf16 mixed precision + mesh-aware batch
sharding, commit f1c5612) shipped without a measured step rate.  This lab
times the EXACT step the prior.py CLI jits — encoder+VQ code extraction
(the frozen VQVAE at the BASELINE config) followed by the prior stack's
fwd+bwd+Adam(+EMA) — at batch 8 x 6656 samples (416 latent frames), f32
vs bf16, one chip.

Timing: chained DONATED train state (forces execution on the axon
backend, .claude/skills/verify/SKILL.md) + one final host fetch, with a
measured no-op round trip subtracted.

Usage: python tools/exp_r5_prior_rate.py [--steps 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.models import encoders as enc
    from vqvae_wavenet_tpu.models import vq as vq_mod
    from vqvae_wavenet_tpu.models.prior import init_prior_params, prior_loss
    from vqvae_wavenet_tpu.models.vqvae import speaker_vector
    from vqvae_wavenet_tpu.training.train_loop import init_train_state

    def fetch(v):
        np.asarray(jax.device_get(jnp.ravel(v)[0]))

    def rtt():
        noop = jax.jit(lambda: jnp.zeros(()))
        fetch(noop())
        t0 = time.perf_counter()
        fetch(noop())
        return time.perf_counter() - t0

    cfg = ModelConfig()                       # shipped BASELINE config
    ts = init_train_state(jax.random.PRNGKey(0), cfg, 109)
    vq_params, model_state = ts["ema_params"], ts["model_state"]
    gc_ch = cfg.speaker_embedding if cfg.speaker_embedding > 0 else 109
    prior_init = init_prior_params(jax.random.PRNGKey(1), cfg.k,
                                   gc_channels=gc_ch)
    opt = optax.adam(1e-4)

    B, T = 8, 6656
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 109, 109)[:, None, :]

    for dtype in ("f32", "bf16"):
        # mirrors prior.py::step exactly (encode + loss + Adam + EMA)
        def loss_fn(params, codes, h):
            if dtype == "bf16":
                params = jax.tree_util.tree_map(
                    lambda v: v.astype(jnp.bfloat16), params)
                h = None if h is None else h.astype(jnp.bfloat16)
            return prior_loss(params, codes, h)

        def step(state, x, y):
            z_e, _ = enc.encoder_forward(cfg.encoder, vq_params["encoder"],
                                         model_state["encoder"], x,
                                         train=False, norm=cfg.encoder_norm)
            q = vq_mod.quantize(vq_params["vq"], z_e, mode=cfg.vq_mode)
            codes, h = q["q_z_x"], speaker_vector(vq_params, cfg, y)
            loss, grads = jax.value_and_grad(loss_fn)(state["params"],
                                                      codes, h)
            updates, opt_state = opt.update(grads, state["opt_state"])
            params = optax.apply_updates(state["params"], updates)
            new = dict(state, params=params, opt_state=opt_state,
                       step=state["step"] + 1,
                       ema_params=jax.tree_util.tree_map(
                           lambda e, p: 0.999 * e + 0.001 * p,
                           state["ema_params"], params))
            return new, loss

        # fresh buffers per dtype loop: the donated f32 state would other-
        # wise delete prior_init's leaves before the bf16 run
        p0 = jax.tree_util.tree_map(jnp.copy, prior_init)
        state = {"params": p0, "opt_state": opt.init(p0),
                 "step": jnp.zeros((), jnp.int32),
                 "ema_params": jax.tree_util.tree_map(jnp.copy, prior_init)}
        # the same mesh placement as prior.py:244-253 (a 1-device mesh —
        # the axon backend rejects donated states without explicit
        # shardings on this program)
        from vqvae_wavenet_tpu.parallel.mesh import (make_mesh,
                                                     batch_sharding,
                                                     replicated)
        mesh = make_mesh(num_data=1, num_model=1, devices=jax.devices()[:1])
        state = jax.device_put(state, replicated(mesh))
        x_d = jax.device_put(x, batch_sharding(mesh))
        y_d = jax.device_put(y, batch_sharding(mesh))
        step_fn = jax.jit(step, in_shardings=(replicated(mesh),
                                              batch_sharding(mesh),
                                              batch_sharding(mesh)),
                          donate_argnums=(0,))
        state, loss = step_fn(state, x_d, y_d)     # compile
        fetch(loss)
        r = rtt()
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = step_fn(state, x_d, y_d)
        fetch(loss)
        dt = max(time.perf_counter() - t0 - r, 1e-9) / args.steps
        print(f"prior {dtype:4s}: {dt * 1e3:7.2f} ms/step = "
              f"{1.0 / dt:6.1f} steps/s  (B={B} x T={T}, "
              f"{B * T / dt / 1e6:.2f}M audio samples/s; "
              f"loss={float(np.asarray(loss)):.4f})", flush=True)


if __name__ == "__main__":
    main()
