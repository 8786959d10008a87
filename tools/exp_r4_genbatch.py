#!/usr/bin/env python3
"""Round-4 experiment 5: large-batch generation curve through the adaptive
hybrid threshold (VERDICT r3 weak #4): per-stream cost at B=8/32/64/128,
plus the Magenta 50-layer preset through the batched hybrid path.

Per-call timing with the host-fetch sync + measured-RTT subtraction
(amortized over repeats), matching bench.py's aggregate methodology.

Usage: python tools/exp_r4_genbatch.py [--variants b8,b32,b64,b128,magenta]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vqvae_wavenet_tpu.config import WavenetConfig
    from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params
    from vqvae_wavenet_tpu.generation.fast import generate
    from vqvae_wavenet_tpu.ops import gen_pallas as gp

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(jnp.ravel(leaf)[0]))

    def measure_rtt():
        noop = jax.jit(lambda: jnp.zeros(()))
        fetch(noop())
        t0 = time.perf_counter()
        fetch(noop())
        return time.perf_counter() - t0

    cfg = WavenetConfig()
    length = 4096
    lc_channels = 128
    t_cond = length // 64
    key = jax.random.PRNGKey(0)
    params = init_wavenet_params(key, cfg, lc_channels=lc_channels)

    want = sys.argv[sys.argv.index("--variants") + 1].split(",") \
        if "--variants" in sys.argv else None

    def sel(name):
        if want is None or name in want:
            print(f"[{time.strftime('%H:%M:%S')}] variant {name} ...",
                  flush=True)
            return True
        return False

    results = {}

    def run(tag, b):
        lc = jax.random.normal(jax.random.PRNGKey(5), (b, t_cond,
                                                       lc_channels))
        mode = gp.select_mode(cfg, lc_channels, b, t_cond, jnp.bfloat16)
        thr = gp._hybrid_threshold(cfg, lc_channels, b, t_cond,
                                   jnp.bfloat16) if mode == "hybrid" \
            else None
        print(f"  mode={mode} vmem_ring_threshold={thr}", flush=True)
        w = generate(params, cfg, lc, length=length, key=key,
                     compute_dtype=jnp.bfloat16, engine="auto")
        fetch(w)
        rtt = measure_rtt()
        best = float("inf")
        for trial in range(3):
            n = 2
            t0 = time.perf_counter()
            for i in range(n):
                w = generate(params, cfg, lc, length=length,
                             key=jax.random.PRNGKey(20 + trial * n + i),
                             compute_dtype=jnp.bfloat16, engine="auto")
            fetch(w)
            best = min(best, (time.perf_counter() - t0 - rtt) / n)
        us = best / length * 1e6
        agg = b * length / best
        results[tag] = (us, agg)
        print(f"  {us:.1f} us/step/stream, {agg/1e6:.3f} M samples/s "
              f"aggregate", flush=True)

    for b in (8, 32, 64, 128):
        if sel(f"b{b}"):
            run(f"b{b}", b)

    if sel("magenta"):
        from vqvae_wavenet_tpu.config import ModelConfig
        mcfg = ModelConfig.from_json(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "magenta_parameters.json"))
        wcfg = mcfg.wavenet
        bm = 32
        t_cond_m = length // 64
        from vqvae_wavenet_tpu.models.magenta import init_magenta_params
        mp = init_magenta_params(jax.random.PRNGKey(1), 109)
        lc = jax.random.normal(jax.random.PRNGKey(6),
                               (bm, t_cond_m, mp["decoder"]["lc_kernel"]
                                .shape[-2] if "lc_kernel" in mp["decoder"]
                                else 64))
        # per-layer gc: one speaker embedding row per stream
        gc = jnp.take(mp["speaker_emb"], jnp.arange(bm) % 109,
                      axis=0)[:, None, :]
        mode = gp.select_mode(wcfg, lc.shape[-1], bm, t_cond_m,
                              jnp.bfloat16)
        print(f"  magenta mode={mode}", flush=True)
        w = generate(mp["decoder"], wcfg, lc, length=length, key=key,
                     compute_dtype=jnp.bfloat16, engine="auto",
                     global_condition=gc, gate_order="sigmoid_first")
        fetch(w)
        rtt = measure_rtt()
        best = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            w = generate(mp["decoder"], wcfg, lc, length=length,
                         key=jax.random.PRNGKey(40 + trial),
                         compute_dtype=jnp.bfloat16, engine="auto",
                         global_condition=gc, gate_order="sigmoid_first")
            fetch(w)
            best = min(best, time.perf_counter() - t0 - rtt)
        us = best / length * 1e6
        results["magenta_b32"] = (us, bm * length / best)
        print(f"  {us:.1f} us/step/stream, {bm*length/best/1e6:.3f} M "
              f"samples/s aggregate", flush=True)

    for k, (us, agg) in results.items():
        print(f"{k:14s} {us:8.1f} us/step  {agg/1e6:8.3f} M samples/s",
              flush=True)


if __name__ == "__main__":
    main()
