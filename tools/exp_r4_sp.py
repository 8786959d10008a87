"""SP training overhead vs the single-device step, on a virtual-CPU mesh.

VERDICT r3 #2 asked for "a PERF note quantifying SP overhead vs
single-chip bf16 on the 8-device CPU mesh".  Only one real TPU chip is
attached, so this is the honest way to measure what SP *adds* ON TOP of
its per-shard compute: under decoder_halo='layer'/'recompute' that
compute is a hand-written XLA mirror of the stack (whether or not a pad
mask is involved), so a CPU mesh exposes exactly the delta — per-layer
ppermute halo exchange, halo recompute rows, shard_map bookkeeping, and
the psum'd losses/stats — against the same XLA single-device program.
CAVEAT (round-4 advisor): on real TPU the single-chip bf16 baseline runs
the FUSED Pallas stack (~1.5x the XLA mirror), so the factor here
UNDERSTATES SP's true cost vs a single chip by that per-shard engine gap
for the XLA halo modes; decoder_halo='fused' (round 5) closes it — its
per-shard compute IS the fused kernel, at a (T/n + halo)/(T/n) recompute
overhead, measured on hardware in tools/exp_r5_spfused.py / PERF.md.

Absolute times are 1-core-CPU-bound and meaningless; the RATIO
(SP step time x n_shards worth of devices vs single-device step time on
the same total sequence) is the number: on real hardware each shard runs
on its own chip, so per-step wall would be ~(single / n) x the measured
overhead factor.  We report seconds/step per variant and the overhead
factor = t_sp / t_single (all n virtual devices share one core, so ideal
SP on this box = 1.0x; anything above is halo recompute + collectives).

Config: the shipped 30-layer architecture with channels shrunk 4x
(64/128/64 vs 256/512/256) so a CPU step is seconds, at the SP use case
shape — ONE clip of T=26624 (4x the single-chip 6656 training length),
the "audio longer than one chip" scenario SP exists for
(reference model.py trains fixed 6656-sample crops; SURVEY §2c).

Usage:  python tools/exp_r4_sp.py [--steps 3] [--variants single,sp2,...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def shrunk_cfg(train_dtype="bf16"):
    from vqvae_wavenet_tpu.config import ModelConfig, WavenetConfig
    wn = WavenetConfig(
        quantization_channels=256, num_cycles=3, num_cycle_layers=10,
        dilation_rates=[1, 2, 4, 8, 16, 32, 64, 128, 256, 512] * 3,
        kernel_size=3, dilation_filters=64, skip_filters=128,
        residual_filters=64, preprocess_kernel_size=32,
        preprocess_filters=64)
    return ModelConfig(encoder="64", use_vq=True, speaker_embedding=16,
                       k=128, latent_dim=32, beta=0.25, wavenet=wn,
                       learning_rate_schedule={0: 1e-4},
                       train_dtype=train_dtype)


def make_batch(T, mesh=None):
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (1, T, 1),
                                      minval=-0.9, maxval=0.9))
    y = np.zeros((1, 1, 4), np.float32)
    y[0, 0, 0] = 1.0
    if mesh is None:
        return {"x": jax.numpy.asarray(x), "y": jax.numpy.asarray(y)}
    return {"x": jax.device_put(x, NamedSharding(mesh, P(None, "time", None))),
            "y": jax.device_put(y, NamedSharding(mesh, P()))}


def run(step, ts, batch, n_steps):
    ts, m = step(ts, batch)               # compile + step 1
    jax.block_until_ready(m["loss"])      # real sync on the CPU backend
    t0 = time.perf_counter()
    for _ in range(n_steps):
        ts, m = step(ts, batch)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--T", type=int, default=26624)
    ap.add_argument("--variants", type=str,
                    default="single,single_f32,sp2,sp4,sp8,sp4_f32")
    args = ap.parse_args()

    from vqvae_wavenet_tpu.training.train_loop import (
        init_train_state, make_jit_train_step)
    from vqvae_wavenet_tpu.parallel.timeshard import make_sp_train_step

    results = {}
    for name in args.variants.split(","):
        dtype = "f32" if name.endswith("f32") else "bf16"
        cfg = shrunk_cfg(dtype)
        ts = init_train_state(jax.random.PRNGKey(0), cfg, num_speakers=4)
        if name.startswith("single"):
            step = make_jit_train_step(cfg)
            batch = make_batch(args.T)
        else:
            tag = name.split("_")[0][2:]          # sp4 -> layer, sp4r -> recompute
            halo = "recompute" if tag.endswith("r") else "layer"
            n = int(tag.rstrip("r"))
            mesh = Mesh(np.asarray(jax.devices()[:n]), ("time",))
            step = make_sp_train_step(cfg, mesh, decoder_halo=halo)
            batch = make_batch(args.T, mesh)
        t = run(step, ts, batch, args.steps)
        results[name] = t
        base = (None if name.startswith("single")
                else results.get("single_f32" if dtype == "f32"
                                 else "single"))
        factor = f"  overhead x{t / base:.3f}" if base else ""
        print(f"{name:12s} {t * 1e3:9.1f} ms/step{factor}", flush=True)

    print({k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
