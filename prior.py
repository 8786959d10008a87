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
    parser.add_argument("-ckpt_interval", default=2000, type=int,
                        help="steps between periodic async prior "
                             "checkpoints (failure-recovery parity with "
                             "the main trainer)")
    parser.add_argument("-prior_restore", default=None, metavar="PATH",
                        help="resume prior TRAINING from a prior "
                             "checkpoint (weights-<step> dir, or the save "
                             "dir for latest)")
    parser.add_argument("-ema", default=0.999, type=float, dest="ema_decay",
                        help="EMA decay for prior shadow params (sampling "
                             "prefers the shadow, like the main model's "
                             "generate path, model.py:33); 0 disables")
    parser.add_argument("-train_dtype", default="f32",
                        choices=["f32", "bf16"],
                        help="bf16 runs the prior stack in mixed precision "
                             "(master params/losses f32) — the same "
                             "contract as the main trainer's train_dtype")
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


def _restore_prior_for_sampling(path, prior_init, opt=None):
    """Restore prior params for sampling.

    Prefers the EMA shadow when the checkpoint carries one (matching the
    main model's generate-time EMA restore, model.py:33 +
    generate.py:88-90); accepts both the full-train-state format written
    by this trainer and the bare-params format of earlier versions."""
    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp
    import os
    from vqvae_wavenet_tpu.training.checkpoint import restore_checkpoint

    opt = opt or optax.adam(1e-3)
    base = {"params": prior_init, "opt_state": opt.init(prior_init),
            "step": jnp.zeros((), jnp.int32)}
    with_ema = dict(base, ema_params=jax.tree_util.tree_map(jnp.copy,
                                                            prior_init))
    for template in (with_ema, base):
        try:
            st = restore_checkpoint(path, template)
            return st.get("ema_params", st["params"])
        except Exception:
            continue
    with ocp.StandardCheckpointer() as ckptr:    # legacy bare params
        return ckptr.restore(os.path.abspath(path), prior_init)


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

        prior_params = _restore_prior_for_sampling(args.prior_path,
                                                   prior_init, opt=None)
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

    # ---- training: encode batches to codes, maximize code likelihood.
    # Failure-recovery parity with the main trainer: full train state
    # (params, optional EMA shadows, opt state, step) checkpointed
    # periodically and asynchronously; -prior_restore resumes.
    from vqvae_wavenet_tpu.training.checkpoint import save_checkpoint
    from vqvae_wavenet_tpu.training.metrics import MetricWriter

    opt = optax.adam(args.lr)
    state = {"params": prior_init, "opt_state": opt.init(prior_init),
             "step": jnp.zeros((), jnp.int32)}
    ema_decay = args.ema_decay
    if ema_decay > 0:
        state["ema_params"] = jax.tree_util.tree_map(jnp.copy, prior_init)
    if args.prior_restore is not None:
        state = restore_checkpoint(args.prior_restore, state)
    gs = int(np.asarray(state["step"]))
    print(f"[prior restore] last prior step: {gs}")

    def encode_codes(x, y):
        z_e, _ = enc.encoder_forward(cfg.encoder, vq_params["encoder"],
                                     model_state["encoder"], x, train=False,
                                     norm=cfg.encoder_norm)
        q = vq_mod.quantize(vq_params["vq"], z_e, mode=cfg.vq_mode)
        return q["q_z_x"], speaker_vector(vq_params, cfg, y)

    def loss_fn(params, codes, h):
        if args.train_dtype == "bf16":
            # mixed precision: the prior stack runs in bf16 (the main
            # trainer's train_dtype contract); master params, the code
            # embedding lookup dtype and the NLL stay f32
            params = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16), params)
            h = None if h is None else h.astype(jnp.bfloat16)
        return prior_loss(params, codes, h)

    def step(state, x, y):
        codes, h = encode_codes(x, y)
        loss, grads = jax.value_and_grad(loss_fn)(state["params"],
                                                  codes, h)
        updates, opt_state = opt.update(grads, state["opt_state"])
        params = optax.apply_updates(state["params"], updates)
        new = dict(state, params=params, opt_state=opt_state,
                   step=state["step"] + 1)
        if "ema_params" in state:
            new["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state["ema_params"], params)
        # code-usage observability (the prior's analogue of the VQ
        # perplexity metric, Magenta/sonnet.py:105-106): empirical code
        # distribution of this batch -> perplexity + fraction-used
        p = jnp.mean(jax.nn.one_hot(codes, cfg.k), axis=(0, 1))
        perplexity = jnp.exp(-jnp.sum(p * jnp.log(p + 1e-10)))
        usage = jnp.mean((p > 0).astype(jnp.float32))
        return new, {"nll": loss, "code_perplexity": perplexity,
                     "code_usage": usage}

    # mesh-aware batch sharding (round 4): the prior step runs as one
    # jitted program over the 'data' mesh axis with a donated train state,
    # the same machinery as the main trainer (train_loop.py) — the prior
    # used to be the one train loop that ignored it
    import math
    from vqvae_wavenet_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                                 replicated)
    n_dev = len(jax.devices())
    num_data = math.gcd(args.batch_size * jax.process_count(), n_dev) or 1
    mesh = make_mesh(num_data=num_data, num_model=1,
                     devices=jax.devices()[:num_data])
    state = jax.device_put(state, replicated(mesh))
    x_sh = batch_sharding(mesh)
    step_fn = jax.jit(step, in_shardings=(replicated(mesh), x_sh, x_sh),
                      donate_argnums=(0,))

    os.makedirs(args.save_path, exist_ok=True)
    writer = MetricWriter(args.save_path)
    log_every = args.log_every or (
        1 if jax.devices()[0].platform == "cpu" else 20)
    t_win = time.time()
    last_print = 0
    metrics = {}
    for step in range(1, 1 + args.num_steps):
        batch = dataset.next()
        state, metrics = step_fn(state, jnp.asarray(batch["x"]),
                                 jnp.asarray(batch["y"]))
        if (gs + step) % args.interval == 0:
            writer.scalars(gs + step,
                           {f"prior/{k}": v for k, v in metrics.items()})
            writer.flush()
        if step % log_every == 0 or step == args.num_steps:
            now = time.time()
            t = (now - t_win) / (step - last_print)
            t_win, last_print = now, step
            print(f"\r[prior step {gs + step}] "
                  f"[nll {float(metrics['nll']):.5f}] "
                  f"[perplexity {float(metrics['code_perplexity']):.1f}] "
                  f"[batch {t:.3f}s]", end="")
            sys.stdout.flush()
        if step % args.ckpt_interval == 0:
            save_checkpoint(args.save_path, state)   # async
    dataset.stop()
    path = save_checkpoint(args.save_path, state, wait=True)
    writer.close()
    print(f"\nsaved prior to {path}")


if __name__ == "__main__":
    main()
