"""Vector quantizer: nearest-neighbor correctness, straight-through
gradients, mode semantics, EMA codebook dynamics, perplexity."""
import jax
import jax.numpy as jnp
import numpy as np

from vqvae_wavenet_tpu.models.vq import (
    init_vq_params, init_vq_state, quantize, vq_losses, ema_codebook_update)


def test_quantize_picks_nearest(key):
    params = init_vq_params(key, k=16, latent_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4))
    q = quantize(params, z)
    emb = np.asarray(params["embedding"])
    zf = np.asarray(z).reshape(-1, 4)
    expect = np.argmin(((zf[:, None, :] - emb[None]) ** 2).sum(-1), axis=-1)
    np.testing.assert_array_equal(np.asarray(q["q_z_x"]).reshape(-1), expect)
    np.testing.assert_allclose(np.asarray(q["e_k"]).reshape(-1, 4),
                               emb[expect], rtol=1e-5)
    # forward value of z_q equals e_k in all modes
    np.testing.assert_allclose(np.asarray(q["z_q"]), np.asarray(q["e_k"]),
                               rtol=1e-5)


def test_straight_through_gradient(key):
    params = init_vq_params(key, k=8, latent_dim=3)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 3))

    def f(z):
        return jnp.sum(quantize(params, z, mode="st")["z_q"] * jnp.arange(3.0))

    g = jax.grad(f)(z)
    # ST estimator: dz_q/dz_e == identity
    np.testing.assert_allclose(np.asarray(g),
                               np.tile(np.arange(3.0), (4, 1)), rtol=1e-6)

    def f_emb(p):
        return jnp.sum(quantize(p, z, mode="st")["z_q"])

    g_emb = jax.grad(f_emb)(params)["embedding"]
    # in ST mode the codebook gets NO reconstruction gradient
    np.testing.assert_allclose(np.asarray(g_emb), 0.0, atol=1e-7)


def test_joint_mode_gradient(key):
    params = init_vq_params(key, k=8, latent_dim=3)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 3))

    def f_emb(p):
        return jnp.sum(quantize(p, z, mode="joint")["z_q"])

    g_emb = np.asarray(jax.grad(f_emb)(params)["embedding"])
    assert np.abs(g_emb).max() > 0  # codebook DOES get recon gradient


def test_losses_modes(key):
    params = init_vq_params(key, k=8, latent_dim=3)
    z = jax.random.normal(jax.random.PRNGKey(3), (10, 3))
    q = quantize(params, z)
    vq_l, com_l = vq_losses(z, q["e_k"], beta=0.25, mode="st")
    # numerically identical magnitudes, scaled by beta
    np.testing.assert_allclose(float(com_l), 0.25 * float(vq_l), rtol=1e-5)
    vq_e, com_e = vq_losses(z, q["e_k"], beta=0.25, mode="ema")
    assert float(vq_e) == 0.0 and float(com_e) > 0


def test_ema_update_moves_codebook_toward_data(key):
    params = init_vq_params(key, k=4, latent_dim=2)
    state = init_vq_state(params)
    target = jnp.asarray([[5.0, 5.0]])
    z = jnp.tile(target, (64, 1)) + 0.01 * jax.random.normal(key, (64, 2))
    for _ in range(50):
        q = quantize(params, z, mode="ema")
        params, state = ema_codebook_update(params, state, z, q["q_z_x"],
                                            decay=0.8)
    emb = np.asarray(params["embedding"])
    winner = np.asarray(quantize(params, z, mode="ema")["q_z_x"])[0]
    np.testing.assert_allclose(emb[winner], [5.0, 5.0], atol=0.1)


def test_perplexity_bounds(key):
    params = init_vq_params(key, k=16, latent_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(5), (256, 4)) * 10
    q = quantize(params, z)
    p = float(q["perplexity"])
    assert 1.0 <= p <= 16.0
    # degenerate input -> single code -> perplexity ~ 1
    q1 = quantize(params, jnp.zeros((64, 4)))
    assert abs(float(q1["perplexity"]) - 1.0) < 1e-3


def test_normal_init(key):
    params = init_vq_params(key, k=512, latent_dim=64, init="normal")
    e = np.asarray(params["embedding"])
    assert abs(e.std() - 1.0) < 0.05
