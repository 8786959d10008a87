#!/usr/bin/env python3
"""Training CLI — flag-compatible with the reference train.py:12-37.

  python3 train.py -dataset VCTK -length 6656 -batch 8 -step 100000 \
      -save saved_model/weights [-restore saved_model/weights-110640] \
      [-interval 200] [-params model_parameters.json]

TPU-native: the whole step (fwd+bwd+Adam+EMA) is one jitted program over a
jax.sharding.Mesh with the batch sharded on the 'data' axis; the host side
only pumps prefetched numpy batches and writes metrics/checkpoints.
"""
import argparse
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-dataset", default="VCTK", type=str,
                        help="VCTK or LibriSpeech or Aishell", metavar="DATASET")
    parser.add_argument("-length", default=6656, type=int, dest="max_len",
                        metavar="int",
                        help="number of samples one audio will contain")
    parser.add_argument("-step", default=1000000, type=int, dest="num_steps",
                        metavar="int", help="number of steps to train")
    parser.add_argument("-batch", default=8, type=int, dest="batch_size",
                        metavar="int", help="batch size")
    parser.add_argument("-interval", default=200, type=int, dest="interval",
                        metavar="int", help="save log every interval step")
    parser.add_argument("-restore", dest="restore_path", metavar="string",
                        help="path to restore weights")
    parser.add_argument("-save", default="saved_model/weights",
                        dest="save_path", metavar="string",
                        help="path to save weights")
    parser.add_argument("-params", default="model_parameters.json",
                        dest="parameter_path", metavar="str",
                        help="path to parameters file")
    parser.add_argument("-data", default="data/", dest="data_path",
                        metavar="str", help="dataset root directory")
    parser.add_argument("-ckpt_interval", default=2000, type=int,
                        help="steps between checkpoints")
    parser.add_argument("-profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of steps 10-15 "
                             "into DIR (view with TensorBoard)")
    # multi-slice / multi-host: DCN process group via jax.distributed
    # (SURVEY.md §5 — the reference has no distributed backend at all)
    parser.add_argument("-coordinator", default=None, metavar="HOST:PORT",
                        help="jax.distributed coordinator address "
                             "(multi-slice/multi-host training)")
    parser.add_argument("-num_processes", default=None, type=int)
    parser.add_argument("-process_id", default=None, type=int)
    parser.add_argument("-log_every", default=0, type=int, metavar="N",
                        help="fetch+print the progress line every N steps "
                             "(0 = auto: 1 on CPU, 20 on TPU).  The "
                             "reference prints every step; over the "
                             "remote-TPU tunnel a per-step device fetch "
                             "costs more than the train step itself")
    parser.add_argument("-loader", default="auto",
                        choices=["auto", "python", "native"],
                        help="input pipeline: the native C++ thread-pooled "
                             "loader (16 kHz PCM16 corpora), the python "
                             "prefetch pipeline (any corpus; resamples), "
                             "or auto-dispatch")
    parser.add_argument("-trim_silence", action="store_true",
                        help="trim leading/trailing silence before the "
                             "random crop (the reference's in-memory-path "
                             "option, dataset.py:23-31; python loader only)")
    parser.add_argument("-time_shards", default=1, type=int, metavar="N",
                        help="shard the audio TIME axis over N chips "
                             "(sequence parallelism with receptive-field "
                             "halo exchange — train on audio longer than "
                             "one chip; -length/N must be a multiple of 64)")
    parser.add_argument("-decoder_halo", default="auto",
                        choices=["auto", "fused", "layer", "recompute"],
                        help="SP decoder scheme under -time_shards: "
                             "'fused' = per-cycle recompute halos through "
                             "the fused Pallas engine (round 5), 'layer' = "
                             "per-layer halo exchange (XLA), 'recompute' = "
                             "one RF-sized halo + pad mask; 'auto' picks "
                             "fused on TPU (per-shard fallback to layer "
                             "when ineligible) and layer off-TPU")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    if args.coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.data.datasets import make_input_pipeline
    from vqvae_wavenet_tpu.parallel.mesh import make_mesh, batch_sharding
    from vqvae_wavenet_tpu.training.train_loop import (
        init_train_state, make_jit_train_step)
    from vqvae_wavenet_tpu.training.checkpoint import (
        save_checkpoint, restore_checkpoint)
    from vqvae_wavenet_tpu.training.metrics import (
        MetricWriter, display_time, summary_histograms)

    dataset = make_input_pipeline(
        args.dataset, batch_size=args.batch_size, max_len=args.max_len,
        relative_path=args.data_path, loader=args.loader,
        trim_silence=args.trim_silence)

    cfg = ModelConfig.from_json(args.parameter_path)
    if cfg.verbose:
        print("wavenet receptive_field:", cfg.wavenet.receptive_field)

    # data-parallel over as many devices as divide the (global) batch;
    # -batch is per-process, so multi-host runs scale it by process count
    import math
    n_dev = len(jax.devices())
    global_batch = args.batch_size * jax.process_count()
    num_data = math.gcd(global_batch, n_dev)
    mesh = make_mesh(num_data=num_data, num_model=1,
                     devices=jax.devices()[:num_data])
    key = jax.random.PRNGKey(0)
    ts = init_train_state(key, cfg, dataset.num_speakers)

    if args.restore_path is not None:
        ts = restore_checkpoint(args.restore_path, ts)
    from vqvae_wavenet_tpu.parallel.mesh import replicated
    ts = jax.device_put(ts, replicated(mesh))  # replicate over the mesh
    gs = int(np.asarray(ts["step"]))
    print(f"[restore] last global step: {gs}")

    # save_path like 'saved_model/weights' -> dir 'saved_model'
    save_dir = os.path.dirname(args.save_path) or "."
    os.makedirs(save_dir, exist_ok=True)
    writer = MetricWriter(save_dir)

    if args.time_shards > 1:
        # sequence parallelism: time axis sharded with halo exchange
        # (parallel/timeshard.py), COMPOSED with data parallelism when
        # more devices remain — one 2-D (data x time) mesh in a single
        # jit, e.g. 8 chips = 4-way batch x 2-way time
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from vqvae_wavenet_tpu.parallel.timeshard import make_sp_train_step
        n_time = args.time_shards
        n_data = math.gcd(global_batch, n_dev // n_time) or 1
        mesh_t = Mesh(np.asarray(
            jax.devices()[:n_data * n_time]).reshape(n_data, n_time),
            ("data", "time"))
        if n_data > 1:
            print(f"[mesh] data={n_data} x time={n_time}")
        halo = args.decoder_halo
        if halo == "auto":
            # fused engages only on TPU (interpret-mode Pallas on a CPU
            # mesh is test-only); ineligible shapes fall back per shard
            # inside time_sharded_loss
            halo = ("fused" if jax.devices()[0].platform == "tpu"
                    else "layer")
        sp_step = make_sp_train_step(cfg, mesh_t, batch_axis="data",
                                     decoder_halo=halo)
        sp_summary = make_sp_train_step(cfg, mesh_t, batch_axis="data",
                                        with_summaries=True,
                                        decoder_halo=halo)
        x_sh = NamedSharding(mesh_t, P("data", "time", None))
        y_sh = NamedSharding(mesh_t, P("data"))
        repl = NamedSharding(mesh_t, P())
        ts = jax.device_put(ts, repl)

        def step_fn(ts, batch, sub):
            return sp_step(ts, batch)

        def summary_fn(ts, batch, sub):
            # full histogram summary set under -time_shards too (the
            # reference writes it in every mode, model.py:28-69)
            return sp_summary(ts, batch)

        def put_batch(b):
            return {"x": jax.device_put(b["x"], x_sh),
                    "y": jax.device_put(b["y"], y_sh)}
    else:
        # the mesh-aware jit path: batch sharded over 'data', params per
        # the TP rules in parallel/mesh.py (replicated at num_model=1)
        step_fn = make_jit_train_step(cfg, mesh=mesh)(ts)
        summary_fn = make_jit_train_step(cfg, mesh=mesh,
                                         with_summaries=True)(ts)
        x_sharding = batch_sharding(mesh)

        if jax.process_count() > 1:
            # multi-host: each process contributes its local shard of the
            # global batch (the reference is single-process; SURVEY.md §2c)
            def put_batch(b):
                return {k: jax.make_array_from_process_local_data(
                            x_sharding, v) for k, v in b.items()}
        else:
            def put_batch(b):
                return {k: jax.device_put(v, x_sharding)
                        for k, v in b.items()}

    # Fetching the loss scalar to the host EVERY step (as the reference's
    # per-step print does, train.py:116-119) costs a device round trip
    # that dwarfs the 64 ms step over the remote-TPU tunnel.  Fetch and
    # print every `log_every` steps instead; global step advances by host
    # arithmetic in between.
    log_every = args.log_every or (
        1 if jax.devices()[0].platform == "cpu" else 20)
    t_win = time.time()
    last_print = 0
    for step in range(1, 1 + args.num_steps):
        if args.profile and step == 10:
            jax.profiler.start_trace(args.profile)
        if args.profile and step == 15:
            # jax.block_until_ready is a NO-OP on the remote-TPU backend
            # (returns before device execution; PERF.md #21 correction) —
            # only a host fetch syncs.  The device queue is in-order, so
            # fetching one scalar drains every queued step into the trace.
            np.asarray(ts["step"])
            jax.profiler.stop_trace()
            print(f"\n[profile] trace written to {args.profile}")
        batch = put_batch(dataset.next())
        # rng feeds only the optional time-jitter augmentation
        sub = jax.random.PRNGKey(gs + step) if cfg.time_jitter else None
        want_summaries = (gs + step) % args.interval == 0
        ts, metrics = (summary_fn if want_summaries else step_fn)(
            ts, batch, sub)
        if want_summaries:
            s = gs + step
            scalars = {k: v for k, v in metrics.items()
                       if k not in ("step", "summaries")}
            if "summaries" in metrics:
                summ = jax.device_get(metrics.pop("summaries"))
                scalars["global_norm/gradient_norm"] = summ.pop("grad_norm")
                writer.histograms(
                    s, summary_histograms(jax.device_get(ts["params"]),
                                          summ))
            writer.scalars(s, scalars)
            writer.flush()
        if step % log_every == 0 or step == args.num_steps:
            rl = float(np.asarray(metrics["reconstruction_loss"]))
            lr = float(np.asarray(metrics["lr"]))
            now = time.time()
            # divide by the steps actually elapsed since the last print —
            # the final window is shorter when num_steps % log_every != 0
            t = (now - t_win) / (step - last_print)
            t_win, last_print = now, step
            progress = "\r[step %d] %.2f" % (
                gs + step, step / args.num_steps * 100) + "%"
            loss_str = " [recons %.5f] [lr %.5f]" % (rl, lr)
            if "distances_mean" in metrics:   # mean ||z_e - e||^2 — a live
                loss_str += " [dist %.2f]" % float(   # codebook-health cue
                    np.asarray(metrics["distances_mean"]))
            second = (args.num_steps - step) * t
            print(progress + loss_str + display_time(t, second), end="")
            sys.stdout.flush()
        if step % args.ckpt_interval == 0:
            save_checkpoint(save_dir, ts)          # async; loop keeps going
    gs += args.num_steps
    path = save_checkpoint(save_dir, ts, wait=True)
    print(f"\nsaved {path}")
    dataset.stop()
    writer.close()


if __name__ == "__main__":
    main()
