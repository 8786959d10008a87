#!/usr/bin/env python3
"""WaveNet prior over VQ codes: train it on a trained VQ-VAE's code
sequences, then sample novel audio end-to-end (prior codes -> codebook
lookup -> fast WaveNet decode).

Completes the reference's unfinished prior (prior.py:3-33 is a non-runnable
sketch; README.md:90-91 TODO "Train a prior based on vq").

  # train the prior against a trained VQ-VAE checkpoint
  python3 prior.py -restore saved_model/weights-110640 -dataset VCTK \
      -length 6656 -batch 8 -step 50000 -save saved_model/prior

  # sample novel audio (no conditioning wav needed)
  python3 prior.py -restore saved_model/weights-110640 \
      -prior saved_model/prior/weights-50000 -sample 4 -seconds 1.0 \
      -speakers p225 p226 p227 p228
"""
import argparse
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-restore", dest="restore_path", required=True,
                        help="trained VQ-VAE checkpoint (weights-<step>)")
    parser.add_argument("-params", default="model_parameters.json",
                        dest="parameter_path")
    parser.add_argument("-data", default="data/", dest="data_path")
    # training flags
    parser.add_argument("-dataset", default="VCTK")
    parser.add_argument("-length", default=6656, type=int, dest="max_len")
    parser.add_argument("-batch", default=8, type=int, dest="batch_size")
    parser.add_argument("-step", default=50000, type=int, dest="num_steps")
    parser.add_argument("-save", default="saved_model/prior",
                        dest="save_path")
    parser.add_argument("-lr", default=1e-3, type=float)
    parser.add_argument("-interval", default=200, type=int)
    parser.add_argument("-log_every", default=0, type=int, metavar="N",
                        help="fetch+print the nll line every N steps "
                             "(0 = auto: 1 on CPU, 20 on TPU; a per-step "
                             "device fetch costs more than the step over "
                             "the remote-TPU tunnel — PERF.md #16)")
    # sampling flags
    parser.add_argument("-prior", dest="prior_path",
                        help="trained prior checkpoint; enables sampling")
    parser.add_argument("-sample", type=int, default=0,
                        help="number of clips to sample")
    parser.add_argument("-seconds", type=float, default=1.0)
    parser.add_argument("-speakers", nargs="+", default=None)
    parser.add_argument("-mode", default="sample")
    parser.add_argument("-temperature", default=1.0, type=float)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.data.datasets import DATASETS
    from vqvae_wavenet_tpu.models import vq as vq_mod
    from vqvae_wavenet_tpu.models import encoders as enc
    from vqvae_wavenet_tpu.models.vqvae import (
        build_local_condition, speaker_vector)
    from vqvae_wavenet_tpu.models.prior import (
        init_prior_params, prior_loss, prior_sample)
    from vqvae_wavenet_tpu.training.train_loop import init_train_state
    from vqvae_wavenet_tpu.training.checkpoint import restore_checkpoint

    cfg = ModelConfig.from_json(args.parameter_path)
    assert cfg.use_vq, "a prior needs a VQ model (use_vq=true)"

    if args.sample > 0:
        num_speakers = {"VCTK": 109, "Aishell": 340,
                        "LibriSpeech": 251}[args.dataset]
    else:
        dataset = DATASETS[args.dataset](
            batch_size=args.batch_size, max_len=args.max_len,
            relative_path=args.data_path).start()
        num_speakers = dataset.num_speakers

    ts = init_train_state(jax.random.PRNGKey(0), cfg, num_speakers)
    ts = restore_checkpoint(args.restore_path, ts)
    vq_params = ts["ema_params"]
    model_state = ts["model_state"]
    gc_dim = cfg.speaker_embedding if cfg.speaker_embedding > 0 else num_speakers

    prior_init = init_prior_params(jax.random.PRNGKey(1), cfg.k,
                                   gc_channels=gc_dim)

    if args.sample > 0:
        # ---- sampling: prior codes -> codebook -> fast WaveNet decode
        from vqvae_wavenet_tpu.generation.fast import generate
        from generate import speaker_one_hots
        from scipy.io import wavfile

        with ocp.StandardCheckpointer() as ckptr:
            prior_params = ckptr.restore(os.path.abspath(args.prior_path),
                                         prior_init)
        b = args.sample
        if args.speakers:
            y, _ = speaker_one_hots(args.speakers, args.data_path)
            assert len(args.speakers) == b
        else:
            y = np.zeros((b, 1, num_speakers), np.float32)
        y = jnp.asarray(y)
        h = speaker_vector(vq_params, cfg, y)  # [B, 1, gc_dim]

        downsample = enc.encoder_downsample_rate(cfg.encoder)
        length = int(args.seconds * 16000) // downsample * downsample
        t_lat = length // downsample

        codes = prior_sample(prior_params, jax.random.PRNGKey(2),
                             batch_size=b, length=t_lat, gc=h,
                             temperature=args.temperature)
        z_q = jnp.take(vq_params["vq"]["embedding"], codes, axis=0)
        lc = build_local_condition(vq_params, cfg, z_q, y, train=False,
                                   target_len=length)
        audio = np.asarray(generate(vq_params["decoder"], cfg.wavenet, lc,
                                    length=length,
                                    key=jax.random.PRNGKey(3),
                                    mode=args.mode))
        out_dir = os.path.dirname(args.prior_path) or "."
        for i in range(b):
            name = (args.speakers[i] if args.speakers else f"sample{i}")
            wavfile.write(os.path.join(out_dir, f"prior_{name}.wav"), 16000,
                          audio[i].astype(np.float32))
        print(f"wrote {b} sampled wav(s) to {out_dir}")
        return

    # ---- training: encode batches to codes, maximize code likelihood
    opt = optax.adam(args.lr)

    def encode_codes(x, y):
        z_e, _ = enc.encoder_forward(cfg.encoder, vq_params["encoder"],
                                     model_state["encoder"], x, train=False,
                                     norm=cfg.encoder_norm)
        q = vq_mod.quantize(vq_params["vq"], z_e, mode=cfg.vq_mode)
        return q["q_z_x"], speaker_vector(vq_params, cfg, y)

    @jax.jit
    def step_fn(prior_params, opt_state, x, y):
        codes, h = encode_codes(x, y)
        loss, grads = jax.value_and_grad(prior_loss)(prior_params, codes, h)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(prior_params, updates), opt_state, loss

    prior_params = prior_init
    opt_state = opt.init(prior_params)
    os.makedirs(args.save_path, exist_ok=True)
    log_every = args.log_every or (
        1 if jax.devices()[0].platform == "cpu" else 20)
    t_win = time.time()
    for step in range(1, 1 + args.num_steps):
        batch = dataset.next()
        prior_params, opt_state, loss = step_fn(
            prior_params, opt_state, jnp.asarray(batch["x"]),
            jnp.asarray(batch["y"]))
        if step % log_every == 0 or step == args.num_steps:
            now = time.time()
            t = (now - t_win) / log_every
            t_win = now
            print(f"\r[prior step {step}] [nll {float(loss):.5f}] "
                  f"[batch {t:.3f}s]", end="")
            sys.stdout.flush()
    dataset.stop()
    path = os.path.abspath(os.path.join(args.save_path,
                                        f"weights-{args.num_steps}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(prior_params), force=True)
    print(f"\nsaved prior to {path}")


if __name__ == "__main__":
    main()
