#!/usr/bin/env python3
"""Training-step performance lab (run on the TPU).

Measures, in ONE process (remote compiles are expensive through the
tunnel), the full shipped config (B=8 x 6656, bf16):

  * full train step (fwd+bwd+Adam+EMA) — the bench.py number;
  * decoder-only fwd and fwd+bwd;
  * encoder-only fwd+bwd;
  * optimizer-only (Adam+EMA on precomputed grads);
  * dilated-conv formulation A/B: conv_general_dilated vs the stacked
    shifted-matmul form (one [B,T,K*R] x [K*R,2D] dot per layer).

Usage: python tools/perf_lab_train.py [--variants a,b,...]
Results go to stdout; copy the table into PERF.md.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(out):
    """Force device completion by fetching one element to the host.

    On the axon remote backend jax.block_until_ready returns WITHOUT
    waiting for device execution — only a host fetch syncs.  The device
    queue is in-order, so fetching from the LAST call's output forces
    every queued call to finish."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def _rtt():
    import jax
    import jax.numpy as jnp
    noop = jax.jit(lambda: jnp.zeros(()))
    _fetch(noop())
    t0 = time.perf_counter()
    _fetch(noop())
    return time.perf_counter() - t0


def timeit(fn, *args, n=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fetch(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


def chain_timeit(step, ts, batch, n=20, warmup=2):
    """Time a donated train step by chaining states."""
    m = None
    for _ in range(warmup):
        ts, m = step(ts, batch, None)
    _fetch(m["loss"])
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        ts, m = step(ts, batch, None)
    _fetch(m["loss"])
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n, ts


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.models.vqvae import (
        init_vqvae, vqvae_forward, lc_channels)
    from vqvae_wavenet_tpu.models.wavenet import (
        wavenet_logits, wavenet_loss)
    from vqvae_wavenet_tpu.models import encoders as enc
    from vqvae_wavenet_tpu.training.train_loop import (
        init_train_state, make_jit_train_step, train_step)
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode

    import dataclasses
    engine = sys.argv[sys.argv.index("--engine") + 1] \
        if "--engine" in sys.argv else "auto"
    mcfg = dataclasses.replace(ModelConfig(), train_dtype="bf16",
                               train_engine=engine)
    cfg = mcfg.wavenet
    B, T = 8, 6656
    C = lc_channels(mcfg, 109)

    key = jax.random.PRNGKey(0)
    ts = init_train_state(key, mcfg, 109)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 109, 109)[:, None, :]
    batch = {"x": x, "y": y}
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, T // 64, C)) \
        .astype(jnp.bfloat16)
    dec16 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                   ts["params"]["decoder"])
    x16 = x.astype(jnp.bfloat16)
    labels = mu_law_encode(x, cfg.quantization_channels,
                           to_int=True).reshape(-1)

    results = {}
    want = sys.argv[sys.argv.index("--variants") + 1].split(",") \
        if "--variants" in sys.argv else None

    def sel(name):
        if want is None or name in want:
            print(f"[{time.strftime('%H:%M:%S')}] variant {name} ...",
                  flush=True)
            return True
        return False

    # ---- full step
    if sel("full"):
        step = make_jit_train_step(mcfg)
        dt, ts = chain_timeit(step, ts, batch)
        results["full_step"] = dt

    # ---- decoder fwd only
    if sel("dec_fwd"):
        @jax.jit
        def dec_fwd(p, x16, lc):
            return wavenet_logits(p, cfg, x16, lc,
                                  engine=engine).astype(jnp.float32)
        results["decoder_fwd"] = timeit(dec_fwd, dec16, x16, lc)

    # ---- decoder fwd+bwd
    if sel("dec_fb"):
        @jax.jit
        def dec_fb(p, x16, lc):
            def loss(p):
                logits = wavenet_logits(p, cfg, x16, lc, engine=engine)
                return wavenet_loss(
                    logits.astype(jnp.float32).reshape(-1, 256), labels)
            return jax.value_and_grad(loss)(p)
        results["decoder_fwd_bwd"] = timeit(dec_fb, dec16, x16, lc)

    # ---- encoder fwd+bwd
    if sel("enc_fb"):
        @jax.jit
        def enc_fb(p, st, x):
            def loss(p):
                z_e, _ = enc.encoder_forward("64", p, st, x, train=True)
                return jnp.mean(z_e ** 2)
            return jax.value_and_grad(loss)(p)
        results["encoder_fwd_bwd"] = timeit(
            enc_fb, ts["params"]["encoder"], ts["model_state"]["encoder"], x)

    # ---- optimizer only (Adam + EMA on precomputed grads)
    if sel("opt"):
        from vqvae_wavenet_tpu.training.optimizer import (
            make_optimizer, ema_update)
        opt = make_optimizer(mcfg.learning_rate_schedule)
        grads = jax.tree_util.tree_map(jnp.ones_like, ts["params"])

        @jax.jit
        def opt_only(params, ema, opt_state, grads):
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, ema_update(ema, params, 0.999), opt_state
        results["optimizer_ema"] = timeit(
            opt_only, ts["params"], ts["ema_params"], ts["opt_state"], grads)

    # ---- conv formulation A/B on one layer shape
    if sel("conv"):
        from vqvae_wavenet_tpu.ops.conv import causal_conv1d
        net = jax.random.normal(jax.random.PRNGKey(3),
                                (B, T, cfg.residual_filters),
                                dtype=jnp.bfloat16)
        kern = jax.random.normal(
            jax.random.PRNGKey(4),
            (cfg.kernel_size, cfg.residual_filters,
             2 * cfg.dilation_filters), dtype=jnp.bfloat16) * 0.05
        d = 512

        @jax.jit
        def conv_a(net, kern):
            def loss(net):
                return jnp.sum(causal_conv1d(net, kern, None,
                                             dilation=d).astype(jnp.float32))
            return jax.value_and_grad(loss)(net)

        @jax.jit
        def conv_b(net, kern):
            def loss(net):
                K = cfg.kernel_size
                taps = [jnp.pad(net, ((0, 0), ((K - 1 - j) * d, 0), (0, 0))
                                )[:, :T, :] for j in range(K)]
                stack = jnp.concatenate(taps, axis=-1)       # [B,T,K*R]
                w = kern.reshape(K * cfg.residual_filters,
                                 2 * cfg.dilation_filters)
                out = jnp.einsum("btc,cf->btf", stack, w,
                                 preferred_element_type=jnp.float32)
                return jnp.sum(out)
            return jax.value_and_grad(loss)(net)

        results["conv_dilated_d512_fb"] = timeit(conv_a, net, kern)
        results["conv_stacked_d512_fb"] = timeit(conv_b, net, kern)

    for k, v in results.items():
        print(f"{k:28s} {v * 1e3:8.2f} ms")
    print(f"steps/s (full): "
          f"{1.0 / results['full_step']:.2f}" if "full_step" in results
          else "")


if __name__ == "__main__":
    main()
