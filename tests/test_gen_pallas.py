"""Pallas whole-clip generation kernel: greedy parity with the XLA scan
path (interpreter mode on CPU; compiled validation happens on TPU in
bench/integration)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl
from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params
from vqvae_wavenet_tpu.generation import fast
from vqvae_wavenet_tpu.ops import gen_pallas


def tiny_cfg():
    # channel sizes at TPU-lane granularity (the kernel requires 128-mult)
    return WavenetConfig(
        quantization_channels=256, num_cycles=1, num_cycle_layers=4,
        dilation_rates=[1, 2, 4, 8], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def test_pack_layout(key):
    cfg = tiny_cfg()
    params = init_wavenet_params(key, cfg, lc_channels=128)
    a, res, scales, small = gen_pallas.pack_gen_params(params, cfg, 128,
                                                       dtype=jnp.float32)
    lay = gen_pallas._layout(cfg, 128)
    assert a.shape == (4, lay["a_rows"], 128)
    # taps land in rows [0, K*R)
    np.testing.assert_allclose(
        np.asarray(a[0, :3 * 128, :128]),
        np.asarray(params["layers"]["kernel"][0].reshape(3 * 128, 128)),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res[2, :64, :128]),
        np.asarray(params["layers"]["res_kernel"][2]), rtol=1e-6)


@pytest.mark.slow
def test_pallas_greedy_matches_xla(key, interpret_pallas):
    cfg = tiny_cfg()
    B, T_COND, C, LEN = 1, 4, 128, 32
    params = init_wavenet_params(key, cfg, lc_channels=C)
    lc = jax.random.normal(jax.random.PRNGKey(1), (B, T_COND, C)) * 0.3

    ref = np.asarray(fast.generate(params, cfg, lc, length=LEN,
                                   mode="greedy"))
    got = np.asarray(gen_pallas.generate_pallas(
        params, cfg, lc, length=LEN, mode="greedy", dtype=jnp.float32))
    assert got.shape == ref.shape == (B, LEN)
    # identical greedy argmax trajectory
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_pallas_batch2_greedy(key, interpret_pallas):
    """Batched generation through the kernel (sample mode needs the TPU
    PRNG, which the CPU interpreter lacks — validated on hardware)."""
    cfg = tiny_cfg()
    B = 2
    params = init_wavenet_params(key, cfg, lc_channels=128)
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 128)) * 0.3
    ref = np.asarray(fast.generate(params, cfg, lc, length=16,
                                   mode="greedy"))
    got = np.asarray(gen_pallas.generate_pallas(
        params, cfg, lc, length=16, mode="greedy", dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_int8_pack_roundtrip(key):
    """Per-row int8 quantization reconstructs weights to ~1% relative."""
    cfg = tiny_cfg()
    params = init_wavenet_params(key, cfg, lc_channels=128)
    a, res, scales, small = gen_pallas.pack_gen_params(params, cfg, 128,
                                                       dtype=jnp.int8)
    assert a.dtype == jnp.int8
    deq = np.asarray(a, np.float32) * np.asarray(scales)
    orig = np.asarray(params["layers"]["kernel"][0].reshape(3 * 128, 128))
    got = deq[0, :3 * 128, :128]
    denom = np.abs(orig).max()
    assert np.abs(got - orig).max() / denom < 0.01


@pytest.mark.slow
def test_pallas_gc_sigmoid_first_matches_xla(key, interpret_pallas):
    """Round-2 extension: per-layer global conditioning (the Magenta
    'add_gc' path, Magenta/config.py:178-192) + sigmoid_first gate order
    through the fused kernel must match the XLA scan exactly (greedy)."""
    cfg = tiny_cfg()
    B, T_COND, C, GC, LEN = 1, 4, 128, 64, 24
    params = init_wavenet_params(key, cfg, lc_channels=C, gc_channels=GC)
    # give the gc path biases like the Magenta preset has
    L = cfg.num_layers
    params["layers"]["gc_bias"] = jnp.ones((L, 2 * cfg.dilation_filters))
    params["postprocess1"]["gc_bias"] = jnp.ones((cfg.skip_filters,))
    lc = jax.random.normal(jax.random.PRNGKey(1), (B, T_COND, C)) * 0.3
    gc = jax.random.normal(jax.random.PRNGKey(2), (B, 1, GC)) * 0.3

    ref = np.asarray(fast.generate(params, cfg, lc, length=LEN,
                                   mode="greedy", gate_order="sigmoid_first",
                                   global_condition=gc, engine="xla"))
    got = np.asarray(gen_pallas.generate_pallas(
        params, cfg, lc, length=LEN, mode="greedy", dtype=jnp.float32,
        gate_order="sigmoid_first", global_condition=gc))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # and the gc must actually matter (zero-gc differs)
    got0 = np.asarray(gen_pallas.generate_pallas(
        params, cfg, lc, length=LEN, mode="greedy", dtype=jnp.float32,
        gate_order="sigmoid_first", global_condition=None))
    assert not np.allclose(got0, ref)


@pytest.mark.slow
def test_int8_generation_close_to_f32(key, interpret_pallas):
    """int8 weight streaming is lossy but must track the f32 trajectory
    closely at the start (before AR divergence) and stay valid."""
    cfg = tiny_cfg()
    params = init_wavenet_params(key, cfg, lc_channels=128)
    lc = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 128)) * 0.3
    ref = np.asarray(gen_pallas.generate_pallas(
        params, cfg, lc, length=16, mode="greedy", dtype=jnp.float32))
    got = np.asarray(gen_pallas.generate_pallas(
        params, cfg, lc, length=16, mode="greedy", dtype=jnp.int8))
    assert got.shape == ref.shape
    assert np.isfinite(got).all() and np.abs(got).max() <= 1.0
    # early samples agree before quantization noise compounds
    assert np.abs(got[:, :4] - ref[:, :4]).max() < 0.05
