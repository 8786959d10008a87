"""Sequence parallelism: time-sharded teacher forcing must equal the
single-device forward exactly (halo exchange correctness)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params, wavenet_logits
from vqvae_wavenet_tpu.parallel.mesh import make_mesh
from vqvae_wavenet_tpu.parallel.timeshard import (
    time_sharded_logits, halo_sizes)


def tiny_cfg():
    return WavenetConfig(
        quantization_channels=32, num_cycles=2, num_cycle_layers=3,
        dilation_rates=[1, 2, 4, 1, 2, 4], kernel_size=3,
        dilation_filters=8, skip_filters=12, residual_filters=10,
        preprocess_kernel_size=4, preprocess_filters=10)


def test_halo_sizes():
    cfg = tiny_cfg()  # RF = 14*2 + 1 + 3 = 32
    halo, frames = halo_sizes(cfg, ratio=16)
    assert halo == 32 and frames == 2
    halo, frames = halo_sizes(cfg, ratio=10)
    assert halo == 40 and frames == 4  # rounded up to whole frames


@pytest.mark.parametrize("n_shards", [2, 4])
def test_time_sharded_matches_single(key, n_shards):
    cfg = tiny_cfg()
    B, T, C = 2, 256, 5
    ratio = 16
    params = init_wavenet_params(key, cfg, lc_channels=C)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, T // ratio, C))

    ref = np.asarray(wavenet_logits(params, cfg, x, lc))
    mesh = make_mesh(num_data=n_shards, num_model=1,
                     devices=jax.devices()[:n_shards])
    got = np.asarray(time_sharded_logits(params, cfg, x, lc, mesh))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_time_sharded_rejects_misaligned(key):
    cfg = tiny_cfg()
    params = init_wavenet_params(key, cfg, lc_channels=3)
    x = jnp.zeros((1, 128, 1))
    lc = jnp.zeros((1, 2, 3))  # ratio 64; per-shard 128/4=32 not multiple
    mesh = make_mesh(num_data=4, num_model=1, devices=jax.devices()[:4])
    with pytest.raises(AssertionError):
        time_sharded_logits(params, cfg, x, lc, mesh)
