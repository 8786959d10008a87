"""Batch-sharded multi-chip generation (parallel/genshard.py): the stream
batch shards over a 'data' mesh with zero collectives, so greedy decoding
must match the single-device engine exactly (each stream's math is
row-independent).  Runs on the 8-virtual-CPU-device mesh (conftest)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl
from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params
from vqvae_wavenet_tpu.generation.fast import generate
from vqvae_wavenet_tpu.parallel.genshard import (
    data_mesh, generate_sharded, _launch)


def tiny_cfg(**kw):
    base = dict(
        quantization_channels=32,
        num_cycles=2, num_cycle_layers=3, dilation_rates=[1, 2, 4, 1, 2, 4],
        kernel_size=3, dilation_filters=8, skip_filters=12,
        residual_filters=10, preprocess_kernel_size=4, preprocess_filters=10)
    base.update(kw)
    return WavenetConfig(**base)


def _mk(key, b=8, t_cond=4, c=5, with_gc=False):
    cfg = tiny_cfg()
    params = init_wavenet_params(key, cfg, lc_channels=c,
                                 gc_channels=3 if with_gc else None)
    lc = jax.random.normal(jax.random.PRNGKey(1), (b, t_cond, c)) * 0.3
    gc = (jax.random.normal(jax.random.PRNGKey(2), (b, 1, 3)) * 0.3
          if with_gc else None)
    return cfg, params, lc, gc


@pytest.mark.parametrize("n", [2, 8])
def test_sharded_greedy_matches_single(key, n):
    cfg, params, lc, _ = _mk(key)
    single = np.asarray(generate(params, cfg, lc, length=32, mode="greedy"))
    shard = np.asarray(generate_sharded(
        params, cfg, lc, length=32, mode="greedy", num_shards=n))
    np.testing.assert_array_equal(shard, single)


def test_sharded_gc_greedy_matches_single(key):
    cfg, params, lc, gc = _mk(key, with_gc=True)
    single = np.asarray(generate(params, cfg, lc, length=32, mode="greedy",
                                 global_condition=gc))
    shard = np.asarray(generate_sharded(
        params, cfg, lc, length=32, mode="greedy", global_condition=gc,
        num_shards=4))
    np.testing.assert_array_equal(shard, single)


def test_sharded_sample_per_shard_keys(key):
    # identical conditioning in every row: greedy rows agree, 'sample'
    # rows drawn on DIFFERENT shards diverge (independent per-shard keys)
    cfg, params, lc, _ = _mk(key, b=4)
    lc = jnp.tile(lc[:1], (4, 1, 1))
    out = np.asarray(generate_sharded(
        params, cfg, lc, length=64, mode="sample", num_shards=4,
        key=jax.random.PRNGKey(7)))
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0
    assert not np.array_equal(out[0], out[1])
    g = np.asarray(generate_sharded(
        params, cfg, lc, length=32, mode="greedy", num_shards=4))
    np.testing.assert_array_equal(g[0], g[3])


def test_sharded_batch_must_divide(key):
    cfg, params, lc, _ = _mk(key, b=6)
    with pytest.raises(ValueError, match="divide"):
        generate_sharded(params, cfg, lc, length=32, mode="greedy",
                         num_shards=4)


def test_single_shard_delegates(key):
    cfg, params, lc, _ = _mk(key, b=2)
    single = np.asarray(generate(params, cfg, lc, length=32, mode="greedy"))
    shard = np.asarray(generate_sharded(
        params, cfg, lc, length=32, mode="greedy", num_shards=1))
    np.testing.assert_array_equal(shard, single)


def test_magenta_sharded_greedy_matches_single(key, monkeypatch):
    """magenta_generate(data_shards=N): the Magenta family's per-layer
    biased global conditioning (gate_order='sigmoid_first') rides the
    same zero-collective batch sharding; greedy output must be
    bit-identical to the unsharded call.  Preset shrunk for CPU speed —
    the functions read the module knobs at call time."""
    from vqvae_wavenet_tpu.models import magenta as mg
    monkeypatch.setattr(mg, "NUM_LAYERS", 6)
    monkeypatch.setattr(mg, "NUM_STAGES", 3)
    monkeypatch.setattr(mg, "WIDTH", 16)
    monkeypatch.setattr(mg, "SKIP_WIDTH", 16)
    monkeypatch.setattr(mg, "AE_WIDTH", 16)
    monkeypatch.setattr(mg, "AE_BOTTLENECK_WIDTH", 8)
    monkeypatch.setattr(mg, "K_CODES", 16)
    params = mg.init_magenta_params(key, num_speakers=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 128, 1),
                           minval=-0.5, maxval=0.5)
    gc = jax.nn.one_hot(jnp.arange(4) % 4, 4)[:, None, :]
    single = np.asarray(mg.magenta_generate(params, x, gc, mode="greedy"))
    shard = np.asarray(mg.magenta_generate(params, x, gc, mode="greedy",
                                           data_shards=2))
    np.testing.assert_array_equal(shard, single)


@pytest.mark.slow
def test_sharded_pallas_interpret_greedy(key, monkeypatch):
    """The fused Pallas kernel inside shard_map (interpret mode on CPU):
    per-shard kernels see B/n streams and must reproduce the single-device
    kernel bit-for-bit in greedy mode."""
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    cfg = WavenetConfig(
        quantization_channels=256, num_cycles=1, num_cycle_layers=4,
        dilation_rates=[1, 2, 4, 8], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)
    b, c = 2, 128
    params = init_wavenet_params(key, cfg, lc_channels=c)
    lc = jax.random.normal(jax.random.PRNGKey(1), (b, 2, c)) * 0.3
    from vqvae_wavenet_tpu.ops.gen_pallas import generate_pallas
    single = np.asarray(generate_pallas(params, cfg, lc, length=16,
                                        mode="greedy", dtype=jnp.float32))
    mesh = data_mesh(2)
    shard = np.asarray(_launch(
        params, cfg, lc, None, jax.random.PRNGKey(0), mesh, length=16,
        mode="greedy", gate_order="tanh_first", cdtype=jnp.float32,
        use_pallas=True))
    np.testing.assert_array_equal(shard, single)
