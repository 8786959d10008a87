#!/usr/bin/env python3
"""Round-4 experiment 4: full-step integration after the per-kernel budget
split (chain auto-picks Tt=256), the Magenta preset's new backward plan,
and a fused single-pass Adam+EMA A/B.

Usage: python tools/exp_r4_fullstep.py [--variants full,magenta,opt]
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
    import optax
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.ops import train_pallas as tp
    from vqvae_wavenet_tpu.training.train_loop import (
        init_train_state, make_jit_train_step)

    mcfg = dataclasses.replace(ModelConfig(), train_dtype="bf16")
    B, T = 8, 6656
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 109, 109)[:, None, :]
    batch = {"x": x, "y": y}

    want = sys.argv[sys.argv.index("--variants") + 1].split(",") \
        if "--variants" in sys.argv else None
    results = {}

    def sel(name):
        if want is None or name in want:
            print(f"[{time.strftime('%H:%M:%S')}] variant {name} ...",
                  flush=True)
            return True
        return False

    if sel("full"):
        cfg = mcfg.wavenet
        plan = tp._plan_bwd(cfg.num_layers, cfg.kernel_size,
                            cfg.residual_filters, cfg.dilation_filters,
                            cfg.skip_filters, tuple(cfg.dilation_rates),
                            B, T, 64, 2)
        print(f"  bwd plan: Tt={plan['Tt']} dsk_in={plan['dsk_in']}",
              flush=True)
        ts = init_train_state(jax.random.PRNGKey(3), mcfg, 109)
        step = make_jit_train_step(mcfg)
        dt, _ = chain_timeit(step, ts, batch)
        results["full_step_bf16"] = dt
        print(f"  {dt*1e3:.2f} ms = {1/dt:.2f} steps/s", flush=True)

    if sel("magenta"):
        mcfg_m = ModelConfig.from_json(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "magenta_parameters.json"))
        mcfg_m = dataclasses.replace(mcfg_m, train_dtype="bf16")
        cfg = mcfg_m.wavenet
        bm, tm = 8, 6144
        plan = tp._plan_bwd(cfg.num_layers, cfg.kernel_size,
                            cfg.residual_filters, cfg.dilation_filters,
                            cfg.skip_filters, tuple(cfg.dilation_rates),
                            bm, tm, 64, 2)
        print(f"  magenta bwd plan: Tt={plan['Tt']} dsk_in={plan['dsk_in']}",
              flush=True)
        xm = jax.random.uniform(jax.random.PRNGKey(1), (bm, tm, 1),
                                minval=-0.9, maxval=0.9)
        ym = jax.nn.one_hot(jnp.arange(bm) % 109, 109)[:, None, :]
        ts = init_train_state(jax.random.PRNGKey(3), mcfg_m, 109)
        step = make_jit_train_step(mcfg_m)
        dt, _ = chain_timeit(step, ts, {"x": xm, "y": ym})
        results["magenta_full_bf16"] = dt
        print(f"  {dt*1e3:.2f} ms = {1/dt:.2f} steps/s", flush=True)

    if sel("opt"):
        # A: optax.adam + apply_updates + ema_update (three tree passes)
        # B: one manual tree_map computing adam + ema together
        from vqvae_wavenet_tpu.training.optimizer import (
            make_optimizer, ema_update)
        ts = init_train_state(jax.random.PRNGKey(3), mcfg, 109)
        opt = make_optimizer(mcfg.learning_rate_schedule)
        grads = jax.tree_util.tree_map(jnp.ones_like, ts["params"])

        @jax.jit
        def opt_a(params, ema, opt_state, grads):
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, ema_update(ema, params, 0.999), opt_state
        results["opt_optax"] = timeit(
            opt_a, ts["params"], ts["ema_params"], ts["opt_state"], grads)
        print(f"  opt_optax: {results['opt_optax']*1e3:.2f} ms", flush=True)

        b1, b2, eps, lr, dec = 0.9, 0.999, 1e-8, 8e-5, 0.999

        @jax.jit
        def opt_b(params, ema, opt_state, grads):
            adam_state = opt_state[0]
            count = adam_state.count + 1
            c1 = 1.0 - b1 ** count.astype(jnp.float32)
            c2 = 1.0 - b2 ** count.astype(jnp.float32)

            def leaf(p, e, m, v, g):
                m = b1 * m + (1 - b1) * g
                v = b2 * v + (1 - b2) * (g * g)
                p = p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
                e = dec * e + (1 - dec) * p
                return p, e, m, v
            out = jax.tree_util.tree_map(leaf, params, ema,
                                         adam_state.mu, adam_state.nu,
                                         grads)
            flat, treedef = jax.tree_util.tree_flatten(
                out, is_leaf=lambda x: isinstance(x, tuple))
            ps = jax.tree_util.tree_unflatten(treedef, [t[0] for t in flat])
            es = jax.tree_util.tree_unflatten(treedef, [t[1] for t in flat])
            return ps, es
        results["opt_fused"] = timeit(
            opt_b, ts["params"], ts["ema_params"], ts["opt_state"], grads)
        print(f"  opt_fused: {results['opt_fused']*1e3:.2f} ms", flush=True)

    for k, v in results.items():
        print(f"{k:24s} {v * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
