#!/usr/bin/env python3
"""Round-4 experiment: do the fused backward kernels get faster with a
bigger time tile, admitted by raising the VMEM budget toward the ~128 MB
physical capacity (PERF.md #10 allocation probe)?

  chain kernel: budget 100 -> plan (dsk_in, Tt=128); budget ~115 MiB ->
                (dsk_in, Tt=256)
  dk kernel:    budget 100 -> Tt=256; budget ~105 MiB -> Tt=512

Usage: python tools/exp_r4_budget.py [--variants chain128,chain256,dk256,dk512]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_lab_bwd import timeit  # noqa: E402  (amortized-fetch timing)


def main():
    import jax
    import jax.numpy as jnp
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
    xst = jax.random.normal(jax.random.PRNGKey(1), (L, B, T, R), cdtype)
    k16 = jax.random.normal(jax.random.PRNGKey(2), (L, K, R, D2),
                            cdtype) * 0.05
    skipw = jax.random.normal(jax.random.PRNGKey(3), (L, D, S), cdtype) * 0.05
    resw = jax.random.normal(jax.random.PRNGKey(4), (L, D, R), cdtype) * 0.05
    dskip = jax.random.normal(jax.random.PRNGKey(5), (B, T, S), cdtype)
    dpre_all = jax.random.normal(jax.random.PRNGKey(6), (L, B, T, D2), cdtype)
    kcat = k16.transpose(0, 3, 1, 2).reshape(L, D2, K * R)
    rs_cat = jnp.concatenate(
        [resw.transpose(0, 2, 1), skipw.transpose(0, 2, 1)], axis=1)

    want = sys.argv[sys.argv.index("--variants") + 1].split(",") \
        if "--variants" in sys.argv else None

    def sel(name):
        if want is None or name in want:
            print(f"[{time.strftime('%H:%M:%S')}] variant {name} ...",
                  flush=True)
            return True
        return False

    results = {}

    def run_chain(tag, budget):
        tp._BWD_VMEM_BUDGET_MB = budget
        tp._make_bwd_kernel.cache_clear()
        plan = tp._plan_bwd(L, K, R, D, S, dils, B, T, 64, 2)
        print(f"  plan: Tt={plan['Tt']} dsk_in={plan['dsk_in']}", flush=True)
        bwd_call = tp._make_bwd_kernel(L, K, R, D, S, dils, B, T, 64,
                                       "tanh_first", "bf16", False)
        jcall = jax.jit(lambda a, ds, kc, rc: bwd_call(kc, rc, ds, a))
        results[tag] = timeit(jcall, act, dskip, kcat, rs_cat)
        print(f"  {tag}: {results[tag]*1e3:.2f} ms", flush=True)

    def run_dk(tag, budget):
        tp._TRAIN_VMEM_BUDGET_MB = budget
        tp._make_dk_kernel.cache_clear()
        dk_call = tp._make_dk_kernel(L, K, R, D, S, dils, B, T, "bf16", False)
        jdk = jax.jit(lambda dp, xi: dk_call(dp, xi))
        results[tag] = timeit(jdk, dpre_all, xst)
        print(f"  {tag}: {results[tag]*1e3:.2f} ms", flush=True)

    if sel("chain128"):
        run_chain("chain_Tt128_dskin", 100.0)
    if sel("chain256"):
        run_chain("chain_Tt256_dskin", 116.0)
    if sel("dk256"):
        run_dk("dk_Tt256", 100.0)
    if sel("dk512"):
        run_dk("dk_Tt512", 106.0)

    for k, v in results.items():
        print(f"{k:24s} {v * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
