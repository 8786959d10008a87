#!/usr/bin/env python3
"""Round-4 experiment 3: backward-chain DSK hoist A/B on the TPU.

  A: chain Tt=256, fused [dX|dskip] dot (round-4 budget-raise winner)
  B: chain Tt=128 + per-tile hoisted dskip@skipw^T group dots

Also cross-checks numerics: hoist vs plain on identical inputs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_lab_bwd import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vqvae_wavenet_tpu.config import WavenetConfig
    from vqvae_wavenet_tpu.ops import train_pallas as tp

    cfg = WavenetConfig()
    L, K = cfg.num_layers, cfg.kernel_size
    R, D, S = (cfg.residual_filters, cfg.dilation_filters, cfg.skip_filters)
    D2 = 2 * D
    dils = tuple(cfg.dilation_rates)
    B, T = 8, 6656
    cdtype = jnp.bfloat16

    act = jax.random.uniform(jax.random.PRNGKey(0), (L, B, T, D2), cdtype,
                             0.1, 0.9)
    k16 = jax.random.normal(jax.random.PRNGKey(2), (L, K, R, D2),
                            cdtype) * 0.05
    skipw = jax.random.normal(jax.random.PRNGKey(3), (L, D, S), cdtype) * 0.05
    resw = jax.random.normal(jax.random.PRNGKey(4), (L, D, R), cdtype) * 0.05
    dskip = jax.random.normal(jax.random.PRNGKey(5), (B, T, S), cdtype)
    kcat = k16.transpose(0, 3, 1, 2).reshape(L, D2, K * R)
    rs_cat = jnp.concatenate(
        [resw.transpose(0, 2, 1), skipw.transpose(0, 2, 1)], axis=1)
    rsT = resw.transpose(0, 2, 1)                      # [L, R, D]
    skw_all = skipw.transpose(2, 0, 1).reshape(S, L * D)

    tp._BWD_VMEM_BUDGET_MB = 116.0
    results = {}

    print(f"[{time.strftime('%H:%M:%S')}] plain Tt=256 ...", flush=True)
    bwd_plain = tp._make_bwd_kernel(L, K, R, D, S, dils, B, T, 64,
                                    "tanh_first", "bf16", False)
    jplain = jax.jit(lambda a, ds, kc, rc: bwd_plain(kc, rc, ds, a))
    out_p = jplain(act, dskip, kcat, rs_cat)
    results["chain_plain_Tt256"] = timeit(jplain, act, dskip, kcat, rs_cat)
    print(f"  {results['chain_plain_Tt256']*1e3:.2f} ms", flush=True)

    print(f"[{time.strftime('%H:%M:%S')}] hoist ...", flush=True)
    plan = tp._plan_bwd(L, K, R, D, S, dils, B, T, 64, 2, False, True)
    print(f"  hoist plan: {plan['Tt']}, dsk_in={plan['dsk_in']}", flush=True)
    bwd_h = tp._make_bwd_kernel(L, K, R, D, S, dils, B, T, 64,
                                "tanh_first", "bf16", False, False, True)
    jh = jax.jit(lambda a, ds, kc, rc, sk: bwd_h(kc, rc, ds, a, sk))
    out_h = jh(act, dskip, kcat, rsT, skw_all)
    # numerics cross-check (bf16 rounding of the hoisted half allowed)
    for i, (p, h) in enumerate(zip(out_p, out_h)):
        p32 = np.asarray(p, np.float32)
        h32 = np.asarray(h, np.float32)
        rel = np.abs(h32 - p32).max() / (np.abs(p32).max() + 1e-9)
        print(f"  out[{i}] max rel diff {rel:.2e}", flush=True)
    results["chain_hoist_Tt128"] = timeit(jh, act, dskip, kcat, rsT, skw_all)
    print(f"  {results['chain_hoist_Tt128']*1e3:.2f} ms", flush=True)

    for k, v in results.items():
        print(f"{k:24s} {v * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
