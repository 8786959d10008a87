#!/usr/bin/env python3
"""Round-4 experiment (PERF.md #33): FUSED chain+dW backward vs the
two-kernel path, and the gate-precompute critical-path trim.

Variants (shipped shapes B=8, T=6656, bf16):
  two        chain kernel (streams dpre) + dW kernel, back to back —
             the current production backward, one jit
  two_gprec  same with the gate-derivative factors precomputed off the
             dgated->c_all critical path
  fused      layer-group sweeps with in-kernel dk (dpre never in HBM)
  fused_gprec
  fused_lg10 fused with the group size capped at 10 (3 sweeps, ~89 MB
             per sweep vs Lg=15's ~115 MB — Mosaic scoped-alloc safety)
  full/full_two  full train step with the dispatcher flag auto/off

Usage: python tools/exp_r4_fusedk.py [--variants a,b,...]
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
    R, D, S = (cfg.residual_filters, cfg.dilation_filters,
               cfg.skip_filters)
    D2 = 2 * D
    dils = tuple(cfg.dilation_rates)
    B, T, FR = 8, 6656, 64
    cdtype = jnp.bfloat16
    PH = tp._xpad_rows(K, dils)

    act = jax.random.uniform(jax.random.PRNGKey(0), (L, B, T, D2), cdtype,
                             0.1, 0.9)
    xst = jax.random.normal(jax.random.PRNGKey(1), (L, B, T + PH, R),
                            cdtype)
    k16 = jax.random.normal(jax.random.PRNGKey(2), (L, K, R, D2),
                            cdtype) * 0.05
    skipw = jax.random.normal(jax.random.PRNGKey(3), (L, D, S),
                              cdtype) * 0.05
    resw = jax.random.normal(jax.random.PRNGKey(4), (L, D, R),
                             cdtype) * 0.05
    dskip = jax.random.normal(jax.random.PRNGKey(5), (B, T, S), cdtype)
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

    def run_two(tag, gprec):
        tp._make_bwd_kernel.cache_clear()
        tp._make_dk_kernel.cache_clear()
        bwd_call = tp._make_bwd_kernel(L, K, R, D, S, dils, B, T, FR,
                                       "tanh_first", "bf16", False,
                                       gate_precomp=gprec)
        dk_call = tp._make_dk_kernel(L, K, R, D, S, dils, B, T, "bf16",
                                     False, PH)

        @jax.jit
        def two(a, xs, ds, kc, rc):
            dpre, dx0, dlc, dsk, drs, drb = bwd_call(kc, rc, ds, a)
            dk = dk_call(dpre, xs)
            return dx0, dlc, dsk, drs, drb, dk
        results[tag] = timeit(two, act, xst, dskip, kcat, rs_cat)
        print(f"  {tag}: {results[tag]*1e3:.2f} ms", flush=True)

    def run_fused(tag, gprec, lg_cap=None, mx_reduce=True):
        tp._make_bwd_sweep_kernel.cache_clear()
        plan = tp._plan_bwd_fused_dk(L, K, R, D, S, dils, B, T, FR, 2,
                                     lg_cap=lg_cap)
        Lg, ng = plan["Lg"], L // plan["Lg"]
        print(f"  plan: Tt={plan['Tt']} Lg={Lg} sweeps={ng} "
              f"dsk_in={plan['dsk_in']}", flush=True)
        calls = []
        for g in reversed(range(ng)):
            offs_g, modes_g, AR_g = plan["layouts"][g]
            calls.append((g, tp._make_bwd_sweep_kernel(
                L, K, R, D, S, dils, B, T, FR, "tanh_first", "bf16",
                False, g * Lg, Lg, plan["Tt"], plan["Ft"], offs_g,
                modes_g, AR_g, plan["dsk_in"], g == ng - 1, PH, gprec,
                mx_reduce)))

        @jax.jit
        def fused(a, xs, ds, kc, rc):
            dxs, parts = None, []
            for g, call in calls:
                dxs, dlc_g, dsk_g, drs_g, drb_g, dk_g = call(
                    kc[g * Lg:(g + 1) * Lg], rc[g * Lg:(g + 1) * Lg],
                    ds, dxs, a, xs)
                parts.append((dlc_g, dsk_g, drs_g, drb_g, dk_g))
            return dxs, parts
        results[tag] = timeit(fused, act, xst, dskip, kcat, rs_cat)
        print(f"  {tag}: {results[tag]*1e3:.2f} ms", flush=True)

    if sel("two"):
        run_two("two_kernel", False)
    if sel("two_gprec"):
        run_two("two_kernel_gprec", True)
    if sel("fused"):
        run_fused("fused_sweeps", False)
    if sel("fused_gprec"):
        run_fused("fused_sweeps_gprec", True)
    if sel("fused_lg10"):
        run_fused("fused_sweeps_lg10", False, lg_cap=10)
    if sel("fused_lg10_gprec"):
        run_fused("fused_sweeps_lg10_gprec", True, lg_cap=10)
    if sel("fused_nomx"):
        run_fused("fused_sweeps_nomx", False, mx_reduce=False)
    if sel("fused_mx"):
        run_fused("fused_sweeps_mx", False, mx_reduce=True)
    if sel("fused_mx_gprec"):
        run_fused("fused_sweeps_mx_gprec", True, mx_reduce=True)

    for k, v in results.items():
        print(f"{k:28s} {v * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
