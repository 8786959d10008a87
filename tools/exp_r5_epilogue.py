#!/usr/bin/env python3
"""Round-5: what does the training step's EPILOGUE actually cost?
(VERDICT r4 ask #4: fuse relu->1x1(+cond)->relu->1x1->CE into the fused
kernels, or refuse with numbers.)

PERF.md #28 itemized ~2.4 ms of inter-kernel glue (VQ kernel + lc build +
postprocess heads + loss).  Before building a fused epilogue, measure the
postprocess+CE slice of that glue STANDALONE (fwd+bwd, same shapes/dtypes
as inside the step): if the whole XLA epilogue costs less than the
1.75 ms the 23.5 -> 24.5 steps/s target requires, a fused version cannot
reach the target even at zero cost and the ask resolves to a measured
refusal.

Variants (B=8, T=6656, bf16, shipped config):
  heads_ce    relu -> 1x1(+cond) -> relu -> 1x1 -> CE, fwd+bwd from a
              random [B,T,S] skip (exactly wavenet.py:286-301 + loss)
  heads_only  the same without the CE (isolates the loss's share)
  ce_only     CE from random [B*T,Q] logits, fwd+bwd
  lc_build    build_local_condition (z_q + speaker concat) fwd
  full_step   the shipped train step (context row)

Usage: python tools/exp_r5_epilogue.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from perf_lab_train import timeit, chain_timeit  # noqa: E402


def main():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.models.wavenet import (init_wavenet_params,
                                                  wavenet_loss)
    from vqvae_wavenet_tpu.ops.conv import add_condition

    cfg = ModelConfig().wavenet
    B, T, S, Q = 8, 6656, cfg.skip_filters, cfg.quantization_channels
    lc_ch = 128
    params = init_wavenet_params(jax.random.PRNGKey(0), cfg, lc_ch)
    pp1 = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16), params["postprocess1"])
    pp2 = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16), params["postprocess2"])
    skip = jax.random.normal(jax.random.PRNGKey(1), (B, T, S)) * 0.3
    lc = (jax.random.normal(jax.random.PRNGKey(2), (B, T // 64, lc_ch))
          * 0.3).astype(jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(3), (B * T,), 0, Q)
    logits = jax.random.normal(jax.random.PRNGKey(4), (B * T, Q))

    def heads(p1, p2, skip, lc):
        # wavenet.py:286-301 exactly (f32 skip in, bf16 heads)
        net = jax.nn.relu(skip).astype(jnp.bfloat16)
        net = jnp.einsum("btc,cf->btf", net, p1["kernel"][0],
                         preferred_element_type=jnp.float32) + p1["bias"]
        net = add_condition(net, lc, p1["lc_kernel"])
        net = jax.nn.relu(net).astype(jnp.bfloat16)
        net = jnp.einsum("btc,cf->btf", net, p2["kernel"][0],
                         preferred_element_type=jnp.float32) + p2["bias"]
        return net

    def heads_ce(p1, p2, skip, lc):
        return wavenet_loss(heads(p1, p2, skip, lc).reshape(-1, Q), labels)

    def heads_only(p1, p2, skip, lc):
        return jnp.mean(heads(p1, p2, skip, lc))

    def ce_only(lg):
        return wavenet_loss(lg, labels)

    g_hc = jax.jit(jax.value_and_grad(heads_ce, argnums=(0, 1, 2)))
    g_h = jax.jit(jax.value_and_grad(heads_only, argnums=(0, 1, 2)))
    g_ce = jax.jit(jax.value_and_grad(ce_only))

    for name, fn in (("heads_ce", lambda: g_hc(pp1, pp2, skip, lc)[0]),
                     ("heads_only", lambda: g_h(pp1, pp2, skip, lc)[0]),
                     ("ce_only", lambda: g_ce(logits)[0])):
        dt = timeit(fn, n=30)
        print(f"{name:10s} {dt*1e3:7.3f} ms fwd+bwd", flush=True)

    # lc build: z_q + tiled speaker embedding concat (vqvae.py:77-111)
    from vqvae_wavenet_tpu.models.vqvae import (init_vqvae,
                                                build_local_condition,
                                                speaker_vector)
    mcfg = dataclasses.replace(ModelConfig(), train_dtype="bf16")
    vp, _ = init_vqvae(jax.random.PRNGKey(5), mcfg, num_speakers=109)
    z_q = jax.random.normal(jax.random.PRNGKey(6), (B, T // 64, 64))
    y = jax.nn.one_hot(jnp.arange(B) % 109, 109)[:, None, :]
    lc_fn = jax.jit(lambda p, z, y: build_local_condition(p, mcfg, z, y,
                                                          train=False))
    dt = timeit(lambda: lc_fn(vp, z_q, y), n=30)
    print(f"{'lc_build':10s} {dt*1e3:7.3f} ms fwd", flush=True)

    # context: the shipped full step
    from vqvae_wavenet_tpu.training.train_loop import (init_train_state,
                                                       make_jit_train_step)
    ts = init_train_state(jax.random.PRNGKey(7), mcfg, 109)
    x = jax.random.uniform(jax.random.PRNGKey(8), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    batch = {"x": x, "y": y}
    dt, _ = chain_timeit(make_jit_train_step(mcfg), ts, batch)
    print(f"{'full_step':10s} {dt*1e3:7.3f} ms = {1/dt:.2f} steps/s",
          flush=True)


if __name__ == "__main__":
    main()
