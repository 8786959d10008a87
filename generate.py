#!/usr/bin/env python3
"""Generation CLI — flag-compatible with the reference generate.py:14-31.

  python3 generate.py -restore saved_model/weights-110640 \
      -audio data/VCTK-Corpus/wav48/p225/p225_001.wav \
      -speakers p225 p226 None -mode sample [-params model_parameters.json]

The reference runs one sess.run PER SAMPLE (generate.py:108-113); here the
entire clip is ONE on-device lax.scan (generation/fast.py) — encoder+VQ run
once over the conditioning audio, then the fast WaveNet ring-buffer loop
samples every timestep with jax.random, and the host gets the finished
waveform.  EMA shadow parameters are used for inference (generate.py:88-90
semantics), codebook / speaker embeddings are dumped as .npy side files
(generate.py:96-101), and one wav per requested speaker is written.
"""
import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-restore", dest="restore_path",
                        help="path to weights")
    parser.add_argument("-audio", dest="audio_path", help="path to audio")
    parser.add_argument("-speakers", nargs="+", dest="speakers",
                        help="speaker id")
    parser.add_argument("-mode", default="sample", dest="mode",
                        help="decode mode, sample or greedy")
    parser.add_argument("-params", default="model_parameters.json",
                        dest="parameter_path", metavar="str",
                        help="path to parameters file")
    parser.add_argument("-data", default="data/", dest="data_path",
                        metavar="str", help="dataset root (speaker files)")
    parser.add_argument("-seed", default=0, type=int, help="sampling PRNG seed")
    parser.add_argument("-dtype", default=None, dest="dtype",
                        choices=["f32", "bf16", "int8"],
                        help="generation compute dtype (default: bf16 on "
                             "TPU, f32 elsewhere; int8 = quantized weight "
                             "streaming, Pallas engine only)")
    parser.add_argument("-engine", default="auto", dest="engine",
                        choices=["auto", "xla", "pallas"],
                        help="generation engine: fused Pallas kernel vs XLA "
                             "scan ('auto' picks Pallas when eligible)")
    parser.add_argument("-data_shards", default=1, type=int,
                        dest="data_shards",
                        help="shard the speaker batch over this many chips "
                             "('data' mesh axis, parallel/genshard.py); the "
                             "speaker count must divide evenly")
    return parser.parse_args(argv)


def speaker_one_hots(speakers, data_path):
    """Reference speaker table semantics (generate.py:46-61): corpus chosen
    by the first speaker's prefix, hardcoded sizes VCTK=109 / aishell=340 /
    LibriSpeech=251, 'None' -> all-zero vector."""
    from vqvae_wavenet_tpu.data.datasets import get_speaker_to_int

    def find(name, sub):
        for cand in (os.path.join(data_path, name),
                     os.path.join(data_path, sub, name)):
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(f"{name} under {data_path}")

    if speakers[0][0] == "p":  # VCTK
        table = get_speaker_to_int(find("vctk_speakers.txt", "vctk_info"))
        num_speakers = 109
    elif speakers[0][0].lower() == "s":  # aishell
        table = get_speaker_to_int(find("aishell_speakers.txt", "aishell_info"))
        num_speakers = 340
    else:  # LibriSpeech
        table = get_speaker_to_int(find("librispeech_speakers.txt",
                                        "librispeech_info"))
        num_speakers = 251
    one_hot = np.zeros((len(speakers), 1, num_speakers), np.float32)
    for i, s in enumerate(speakers):
        if s.lower() != "none":
            one_hot[i, 0, table[s]] = 1.0
    return one_hot, num_speakers


def main(argv=None):
    args = parse_args(argv)

    import jax
    from scipy.io import wavfile
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.data.datasets import read_wav_16k
    from vqvae_wavenet_tpu.models.vqvae import vqvae_encode
    from vqvae_wavenet_tpu.generation.fast import generate
    from vqvae_wavenet_tpu.training.checkpoint import restore_checkpoint
    from vqvae_wavenet_tpu.training.train_loop import init_train_state

    gs = int(args.restore_path.rstrip("/").split("-")[-1])
    batch_size = len(args.speakers)

    wav = read_wav_16k(args.audio_path)
    # truncate to a multiple of the largest dilation (generate.py:38-39)
    wav = wav[: len(wav) // 512 * 512]
    length = len(wav)
    # pad up to a compile bucket: the generation program is specialized on
    # length, so bucketing means a handful of compiles instead of one per
    # distinct input file; the padded tail is cut after generation.  Short
    # clips bucket at 1024 so they don't pay for an 8192-sample program.
    # The encoder sees ONLY the unpadded wav (the reference encodes exactly
    # the //512-truncated audio, generate.py:36-44; Encoder_64/2019 are
    # non-causal, so a zero tail would leak into the last latent frames) —
    # the LOCAL CONDITION is zero-padded to the bucket instead, which the
    # kept samples never read (sample t consumes frame t//ratio < F_exact).
    bucket = 8192 if length > 4096 else 1024
    padded = -(-length // bucket) * bucket
    x = np.tile(wav.reshape(1, -1, 1), (batch_size, 1, 1)).astype(np.float32)

    y, num_speakers = speaker_one_hots(args.speakers, args.data_path)

    cfg = ModelConfig.from_json(args.parameter_path)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, num_speakers)
    ts = restore_checkpoint(args.restore_path, ts)
    if cfg.model_family == "magenta":
        params = ts["params"]   # Magenta/generate.py restores raw variables
    else:
        params = ts["ema_params"]          # EMA shadows at inference
    state = ts["model_state"]

    save_path = args.restore_path.split("/weights")[0]
    os.makedirs(save_path, exist_ok=True)
    if cfg.use_vq:
        np.save(os.path.join(save_path, f"embedding_{gs}.npy"),
                np.asarray(params["vq"]["embedding"]))
    spk_key = ("speaker_emb" if cfg.model_family == "magenta"
               else "speaker_embedding")
    if cfg.speaker_embedding > 0 and spk_key in params:
        np.save(os.path.join(save_path, f"speaker_embedding_{gs}.npy"),
                np.asarray(params[spk_key]))

    # compute dtype: default bf16 on TPU (the benchmarked fast path), f32
    # elsewhere; 'auto' engine dispatches to the fused Pallas kernel when
    # the model/batch is eligible (generation/fast.py:_pallas_eligible)
    import jax.numpy as jnp
    if args.dtype is None:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    else:
        compute_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                         "int8": jnp.int8}[args.dtype]

    import time
    t0 = time.time()
    if cfg.model_family == "magenta":
        from vqvae_wavenet_tpu.models.magenta import magenta_generate
        # magenta_generate encodes the exact wav and zero-pads the latent
        # frames out to `length` itself (frames beyond the wav are unread
        # by the kept samples)
        audio = magenta_generate(params, x, y, length=padded,
                                 key=jax.random.PRNGKey(args.seed),
                                 mode=args.mode, compute_dtype=compute_dtype,
                                 engine=args.engine, verbose=True,
                                 data_shards=args.data_shards)
    else:
        lc, _codes = vqvae_encode(params, state, cfg, x, y)
        if padded > length:
            # zero-pad the CONDITION to the compile bucket (not the wav):
            # kept samples t < length read frames t//ratio, all of which
            # come from the unpadded encode — bit-identical tail to an
            # exact-length run (tests/test_generate_padding.py)
            ratio = length // lc.shape[1]
            assert padded % ratio == 0, (
                f"bucket {padded} not a multiple of frame ratio {ratio}")
            lc = jnp.pad(lc, ((0, 0), (0, (padded - length) // ratio),
                              (0, 0)))
        if args.data_shards > 1:
            from vqvae_wavenet_tpu.parallel.genshard import generate_sharded
            audio = generate_sharded(
                params["decoder"], cfg.wavenet, lc, length=padded,
                key=jax.random.PRNGKey(args.seed), mode=args.mode,
                compute_dtype=compute_dtype, engine=args.engine,
                num_shards=args.data_shards, verbose=True)
        else:
            audio = generate(params["decoder"], cfg.wavenet, lc,
                             length=padded,
                             key=jax.random.PRNGKey(args.seed),
                             mode=args.mode, compute_dtype=compute_dtype,
                             engine=args.engine, verbose=True)
    audio = np.asarray(audio)[:, :length]
    dt = time.time() - t0
    print(f"[generate] {batch_size}x{padded} samples in {dt:.2f}s "
          f"({batch_size * padded / dt:,.0f} samples/s incl. compile)")

    for i, s in enumerate(args.speakers):
        s = "no_speaker" if s == "None" else s
        wavfile.write(os.path.join(save_path, f"{gs}_{s}.wav"), 16000,
                      audio[i].astype(np.float32))
    print(f"wrote {batch_size} wav(s) to {save_path}")


if __name__ == "__main__":
    main()
