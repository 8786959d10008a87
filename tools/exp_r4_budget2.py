#!/usr/bin/env python3
"""Round-4 experiment 2: forward kernel at Tt=512 (budget-admitted) and the
full train step with the raised budget (chain Tt=256 + fwd Tt=512).

Usage: python tools/exp_r4_budget2.py [--variants fwd100,fwd116,full116,magenta116]
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_lab_train import timeit, chain_timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.ops import train_pallas as tp
    from vqvae_wavenet_tpu.models.vqvae import lc_channels
    from vqvae_wavenet_tpu.models.wavenet import wavenet_logits
    from vqvae_wavenet_tpu.training.train_loop import (
        init_train_state, make_jit_train_step)

    mcfg = dataclasses.replace(ModelConfig(), train_dtype="bf16")
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

    want = sys.argv[sys.argv.index("--variants") + 1].split(",") \
        if "--variants" in sys.argv else None
    results = {}

    def sel(name):
        if want is None or name in want:
            print(f"[{time.strftime('%H:%M:%S')}] variant {name} ...",
                  flush=True)
            return True
        return False

    def clear_caches():
        tp._make_fused_stack.cache_clear()
        tp._make_bwd_kernel.cache_clear()
        tp._make_dk_kernel.cache_clear()

    def fwd_once(tag, budget):
        tp._TRAIN_VMEM_BUDGET_MB = budget
        clear_caches()
        plan = tp._plan(cfg.num_layers, cfg.kernel_size,
                        cfg.residual_filters, cfg.dilation_filters,
                        cfg.skip_filters, tuple(cfg.dilation_rates),
                        B, T, 64, 2)
        print(f"  fwd plan: Tt={plan['Tt']}", flush=True)

        @jax.jit
        def dec_fwd(p, x16, lc):
            return wavenet_logits(p, cfg, x16, lc).astype(jnp.float32)
        results[tag] = timeit(dec_fwd, dec16, x16, lc)
        print(f"  {tag}: {results[tag]*1e3:.2f} ms", flush=True)

    def full_once(tag, budget, config=None):
        tp._TRAIN_VMEM_BUDGET_MB = budget
        clear_caches()
        c = config or mcfg
        tss = init_train_state(jax.random.PRNGKey(3), c, 109)
        step = make_jit_train_step(c)
        dt, _ = chain_timeit(step, tss, batch)
        results[tag] = dt
        print(f"  {tag}: {dt*1e3:.2f} ms = {1/dt:.2f} steps/s", flush=True)

    if sel("fwd100"):
        fwd_once("fwd_budget100", 100.0)
    if sel("fwd116"):
        fwd_once("fwd_budget116", 116.0)
    if sel("full116"):
        full_once("full_budget116", 116.0)
    if sel("magenta116"):
        mcfg_m = ModelConfig.from_json(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "magenta_parameters.json"))
        mcfg_m = dataclasses.replace(mcfg_m, train_dtype="bf16")
        bm, tm = 8, 6144
        xm = jax.random.uniform(jax.random.PRNGKey(1), (bm, tm, 1),
                                minval=-0.9, maxval=0.9)
        ym = jax.nn.one_hot(jnp.arange(bm) % 109, 109)[:, None, :]
        tp._TRAIN_VMEM_BUDGET_MB = 116.0
        clear_caches()
        tss = init_train_state(jax.random.PRNGKey(3), mcfg_m, 109)
        step = make_jit_train_step(mcfg_m)
        dt, _ = chain_timeit(step, tss, {"x": xm, "y": ym})
        results["magenta_budget116"] = dt
        print(f"  magenta_budget116: {dt*1e3:.2f} ms = {1/dt:.2f} steps/s",
              flush=True)

    for k, v in results.items():
        print(f"{k:24s} {v * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
