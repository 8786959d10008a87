"""Batch-sharded multi-chip autoregressive generation (serving scale-out).

The reference generates one stream per requested speaker in a single
process on one device (generate.py:36-44; the fast-gen loop :103-113).
Generation has no cross-stream math — every audio stream evolves
independently — so the TPU-native scale-out is pure data parallelism:
shard the stream batch over the 'data' axis of a device mesh and run the
SAME whole-clip engine (the fused Pallas kernel or the XLA scan,
generation/fast.py) on each chip's shard under one ``shard_map``.  No
collectives appear anywhere in the program; aggregate throughput is
exactly N x the single-chip batch curve (PERF.md #30-31), so e.g. the
B=64 hybrid point (3.56M samples/s) becomes ~28M samples/s on an 8-chip
v5e slice at B=512.

RNG semantics: 'sample' mode draws each shard's streams from an
independent per-shard key (``jax.random.split(key, n)[shard]``) — valid
categorical samples, but not bitwise the single-device draw order (the
same contract as DP training's per-device VQ/jitter keys).  'greedy'
decoding is deterministic per stream, so the sharded output matches the
single-device output exactly (tests/test_genshard.py pins this).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vqvae_wavenet_tpu.config import WavenetConfig


def data_mesh(num_shards=None, devices=None) -> Mesh:
    """A 1-D mesh over 'data' for generation scale-out."""
    devices = devices if devices is not None else jax.devices()
    n = num_shards if num_shards is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} shards but only {len(devices)} "
                         "devices are attached")
    return Mesh(np.asarray(devices[:n]), ("data",))


@lru_cache(maxsize=32)
def _build(mesh: Mesh, cfg: WavenetConfig, length: int, mode: str,
           gate_order: str, cdtype_name: str, use_pallas: bool,
           has_gc: bool, lc_channels: int):
    """jitted shard_map program for one (mesh, config, shapes) combination.

    The cache avoids a retrace per generate call; all array inputs ride in
    through ``inputs`` (params/packed replicated, lc/gc/keys sharded)."""
    cdtype = jnp.dtype(cdtype_name)
    specs = {"params": P(), "lc": P("data"), "keys": P("data")}
    if has_gc:
        specs["gc"] = P("data")
    if use_pallas:
        specs["packed"] = P()

    def body(inputs):
        params, lc = inputs["params"], inputs["lc"]
        key = inputs["keys"][0]
        gc = inputs["gc"] if has_gc else None
        if use_pallas:
            from vqvae_wavenet_tpu.ops.gen_pallas import _generate_pallas_jit
            return _generate_pallas_jit(
                inputs["packed"], params, lc, gc, key, cfg=cfg,
                lc_channels=lc_channels, length=length, mode=mode,
                dtype=cdtype, gate_order=gate_order)
        from vqvae_wavenet_tpu.generation.fast import _generate_jit
        return _generate_jit(params, cfg, lc, key, length, mode,
                             gate_order, cdtype, gc)

    fn = shard_map(body, mesh=mesh, in_specs=(specs,),
                   out_specs=P("data"), check_rep=False)
    return jax.jit(fn)


def _launch(params, cfg: WavenetConfig, local_condition, global_condition,
            key, mesh: Mesh, *, length: int, mode: str, gate_order: str,
            cdtype, use_pallas: bool):
    """Shared launch path (engine already resolved) — also the seam the
    CPU interpret-mode tests use to force the Pallas engine off-TPU."""
    n = mesh.shape["data"]
    c = local_condition.shape[2]
    # arrays arriving here are usually committed to device 0 (outputs of
    # earlier single-device jits: the encoder, PRNGKey, _packed_for), which
    # a multi-device shard_map rejects — place every input explicitly on
    # the mesh (replicated params, batch-sharded conditioning/keys)
    repl = NamedSharding(mesh, P())
    over_b = NamedSharding(mesh, P("data"))
    inputs = {
        "params": jax.device_put(params, repl),
        "lc": jax.device_put(local_condition, over_b),
        "keys": jax.device_put(jax.random.split(key, n), over_b),
    }
    has_gc = global_condition is not None
    if has_gc:
        inputs["gc"] = jax.device_put(global_condition, over_b)
    if use_pallas:
        # pack once on concrete params (identity-cached, gen_pallas.py
        # _packed_for) and replicate the packed tree into every shard —
        # repacking inside the shard_map body would re-run the 11.5 ms
        # device pack per call and per shard.
        from vqvae_wavenet_tpu.ops.gen_pallas import _packed_for
        inputs["packed"] = jax.device_put(
            _packed_for(params, cfg, c, cdtype), repl)
    jfn = _build(mesh, cfg, length, mode, gate_order,
                 jnp.dtype(cdtype).name, use_pallas, has_gc, c)
    return jfn(inputs)


def generate_sharded(params, cfg: WavenetConfig, local_condition, *,
                     length: int, key=None, mode: str = "sample",
                     gate_order: str = "tanh_first",
                     compute_dtype=jnp.float32, engine: str = "auto",
                     global_condition=None, mesh: Mesh = None,
                     num_shards=None, verbose: bool = False):
    """Drop-in, multi-chip ``generation.fast.generate``.

    Same contract as ``generate`` (local_condition [B, T_cond, C_lc] ->
    float waveform [B, length]) with the stream batch sharded over the
    'data' axis of ``mesh`` (built over ``num_shards`` devices when no
    mesh is given).  B must divide evenly by the shard count; engine
    eligibility is evaluated at the PER-SHARD batch B/n, so a batch too
    big for one chip's VMEM ring can still run the fused kernel when
    split across chips.
    """
    if mode not in ("sample", "greedy"):
        raise NotImplementedError(f"decode mode {mode} not implemented")
    if mesh is None:
        mesh = data_mesh(num_shards)
    if "data" not in mesh.shape:
        raise ValueError(f"mesh {dict(mesh.shape)} has no 'data' axis")
    n = mesh.shape["data"]
    if n == 1:
        from vqvae_wavenet_tpu.generation.fast import generate
        return generate(params, cfg, local_condition, length=length,
                        key=key, mode=mode, gate_order=gate_order,
                        compute_dtype=compute_dtype, engine=engine,
                        global_condition=global_condition, verbose=verbose)
    b = local_condition.shape[0]
    if b % n:
        raise ValueError(f"batch {b} does not divide over {n} shards; pad "
                         "the speaker batch or drop to num_shards that "
                         "divides it")
    assert length % local_condition.shape[1] == 0, (
        "length must be a multiple of the conditioning frames "
        f"({local_condition.shape[1]})")
    if key is None:
        key = jax.random.PRNGKey(0)

    from vqvae_wavenet_tpu.generation.fast import _pallas_eligible
    if engine == "pallas" and jax.devices()[0].platform not in ("tpu",
                                                                "axon"):
        print("[generate_sharded] engine='pallas' needs a TPU; "
              "using the XLA scan")
        engine = "xla"
    # eligibility at the PER-SHARD batch: each chip sees B/n streams
    use_pallas = engine == "pallas" or (
        engine == "auto" and compute_dtype in (jnp.bfloat16, jnp.int8)
        and _pallas_eligible(params, cfg, local_condition[:b // n],
                             compute_dtype))
    cdtype = compute_dtype
    if not use_pallas and cdtype == jnp.int8:
        cdtype = jnp.bfloat16   # the XLA scan has no int8 path
    if verbose:
        print(f"[generate_sharded] shards={n} "
              f"engine={'pallas' if use_pallas else 'xla'} "
              f"dtype={jnp.dtype(cdtype).name} length={length} "
              f"batch={b} ({b // n}/chip)")
    return _launch(params, cfg, local_condition, global_condition, key,
                   mesh, length=length, mode=mode, gate_order=gate_order,
                   cdtype=cdtype, use_pallas=use_pallas)
