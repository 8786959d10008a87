#!/usr/bin/env python3
"""Round-5: per-shard cost of the SP decoder schemes on the real TPU
(VERDICT r4 ask #1 — "per-shard step ~ the fused single-chip rate").

Only one chip is attached, so the COMPUTE each shard runs is measured as
a standalone jitted program; the pieces a real mesh adds (ppermutes on
ICI, psums) are structurally tiny (~31 transfers of <= (K-1)*d rows for
the layer scheme, 2 per group for the fused scheme) and are covered by
the CPU-mesh overhead factors in tools/exp_r4_sp.py / PERF.md #36.

Variants, all fwd+bwd (value_and_grad of a CE-like scalar over logits),
B=8 bf16:
  fused1     the single-chip fused decoder at [B, T_l]       (the target)
  xla1       the single-chip XLA decoder at [B, T_l]         (~= what a
             'layer'-halo SP shard runs: +3% rows + collectives on top)
  spfused    the per-cycle group chain of ops/train_pallas with_start
             kernels at [B, T_l + halo_g] per group, self-halos (cost-
             identical to the real neighbor tails), s_rows = 0 traced —
             exactly a shard i>0's program under decoder_halo='fused'

Usage: python tools/exp_r5_spfused.py [--Tl 6656,13312] [--magenta]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from perf_lab_train import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Tl", type=str, default="6656,13312")
    ap.add_argument("--magenta", action="store_true")
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vqvae_wavenet_tpu.config import WavenetConfig
    from vqvae_wavenet_tpu.models.wavenet import (init_wavenet_params,
                                                  wavenet_logits)
    from vqvae_wavenet_tpu.models import magenta as mg
    from vqvae_wavenet_tpu.ops.train_pallas import fused_residual_stack
    from vqvae_wavenet_tpu.parallel.timeshard import _fused_sp_groups

    B = 8
    if args.magenta:
        cfg = mg.magenta_wavenet_config()
        lc_ch = mg.AE_BOTTLENECK_WIDTH
        gate_order = "sigmoid_first"
    else:
        cfg = WavenetConfig()
        lc_ch = 64 + 64   # latent + speaker embedding (shipped config)
        gate_order = "tanh_first"
    ratio = 64
    params = init_wavenet_params(jax.random.PRNGKey(0), cfg, lc_ch)
    params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16), params)

    def cast(v):
        return v.astype(jnp.bfloat16)

    for T_l in [int(t) for t in args.Tl.split(",")]:
        x = cast(jax.random.uniform(jax.random.PRNGKey(1), (B, T_l, 1),
                                    minval=-0.9, maxval=0.9))
        lc = cast(jax.random.normal(jax.random.PRNGKey(2),
                                    (B, T_l // ratio, lc_ch)) * 0.3)
        w = jax.random.normal(jax.random.PRNGKey(3),
                              (cfg.quantization_channels,)) * 0.1

        def mk_single(engine):
            def loss(p, x, lc):
                out = wavenet_logits(p, cfg, x, lc, gate_order=gate_order,
                                     engine=engine)
                return jnp.mean(jnp.tanh(out.astype(jnp.float32)) * w)
            return jax.jit(jax.value_and_grad(loss))

        groups, q = _fused_sp_groups(cfg, ratio, T_l)

        def sp_loss(p, x, lc):
            # mirrors timeshard.time_sharded_wavenet_logits_fused with
            # SELF-halos (stream tails) standing in for the neighbor
            # tails a real mesh ppermutes — identical FLOPs/DMA traffic
            from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode
            from vqvae_wavenet_tpu.ops.conv import (causal_conv1d,
                                                    shift_right)
            net = mu_law_encode(shift_right(x), cfg.quantization_channels)
            net = causal_conv1d(net, p["preprocess"]["kernel"],
                                p["preprocess"]["bias"])
            skip = jnp.einsum("btc,cf->btf", net,
                              p["skip_start"]["kernel"][0],
                              preferred_element_type=jnp.float32) \
                + p["skip_start"]["bias"]
            s_rows = jnp.zeros(())          # a shard i>0's start offset
            stream = net
            for gi, (lo, hi, halo) in enumerate(groups):
                hf = halo // ratio
                ext = jnp.concatenate([stream[:, -halo:, :], stream], 1)
                lc_ext = jnp.concatenate([lc[:, -hf:, :], lc], 1)
                last = gi == len(groups) - 1
                out = fused_residual_stack(
                    p["layers"], cfg, ext, lc_ext, gate_order=gate_order,
                    start_rows=s_rows, layer_range=(lo, hi),
                    with_xout=not last, tt_cap=q)
                if last:
                    skip_g = out
                else:
                    skip_g, stream_ext = out
                    stream = stream_ext[:, halo:, :]
                skip = skip + skip_g[:, halo:, :]
            net2 = jax.nn.relu(skip).astype(jnp.bfloat16)
            pp1, pp2 = p["postprocess1"], p["postprocess2"]
            net2 = jnp.einsum("btc,cf->btf", net2, pp1["kernel"][0],
                              preferred_element_type=jnp.float32) \
                + pp1["bias"]
            net2 = jax.nn.relu(net2).astype(jnp.bfloat16)
            out = jnp.einsum("btc,cf->btf", net2, pp2["kernel"][0],
                             preferred_element_type=jnp.float32) \
                + pp2["bias"]
            return jnp.mean(jnp.tanh(out.astype(jnp.float32)) * w)

        sp_fn = jax.jit(jax.value_and_grad(sp_loss))
        halos = [g[2] for g in groups]
        print(f"T_l={T_l}  groups={halos} q={q} "
              f"(+{100*sum(h*(hi-lo) for (lo,hi,_),h in zip(groups,halos)) / (T_l*cfg.num_layers):.1f}% row-layers)",
              flush=True)
        for name, fn in (("fused1", mk_single("auto")),
                         ("xla1", mk_single("xla")),
                         ("spfused", sp_fn)):
            t0 = time.strftime("%H:%M:%S")
            dt = timeit(lambda: fn(params, x, lc)[0], n=args.n)
            print(f"  [{t0}] {name:8s} {dt*1e3:8.2f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
