"""Pallas VQ kernel: argmin parity with the dense computation (interpreter
mode on CPU; compiled on TPU via bench/integration)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.ops import vq_pallas


def dense_argmin(z, e):
    d = ((z[:, None, :] - e[None]) ** 2).sum(-1)
    return np.argmin(d, axis=-1)


@pytest.mark.parametrize("n,k,d", [(100, 512, 64), (7, 16, 4), (256, 512, 64)])
def test_pallas_kernel_interpret_matches_dense(n, k, d):
    rng = np.random.default_rng(0)
    z = rng.standard_normal((n, d)).astype(np.float32)
    e = rng.standard_normal((k, d)).astype(np.float32)
    # interpreter mode: run the actual kernel body on CPU
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    try:
        import functools
        pl.pallas_call = functools.partial(orig, interpret=True)
        got = np.asarray(vq_pallas.vq_nearest_pallas(jnp.asarray(z),
                                                     jnp.asarray(e)))
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(got, dense_argmin(z, e))


def test_jnp_fallback_matches_dense():
    rng = np.random.default_rng(1)
    z = rng.standard_normal((50, 8)).astype(np.float32)
    e = rng.standard_normal((32, 8)).astype(np.float32)
    got = np.asarray(vq_pallas.vq_nearest(jnp.asarray(z), jnp.asarray(e)))
    np.testing.assert_array_equal(got, dense_argmin(z, e))


def test_quantize_still_correct(key):
    """models/vq.quantize after the kernel wiring."""
    from vqvae_wavenet_tpu.models.vq import init_vq_params, quantize
    params = init_vq_params(key, k=16, latent_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4))
    q = quantize(params, z)
    expect = dense_argmin(np.asarray(z).reshape(-1, 4),
                          np.asarray(params["embedding"]))
    np.testing.assert_array_equal(np.asarray(q["q_z_x"]).reshape(-1), expect)
    assert np.isfinite(float(q["distances_mean"]))
