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


def test_codebook_init_reachable_from_config(key):
    """README.md:28-30's uniform-vs-normal init axis must be selectable via
    ModelConfig (round-1 gap: vq.py had it, init_vqvae never passed it)."""
    from vqvae_wavenet_tpu.config import ModelConfig, WavenetConfig
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae

    wn = WavenetConfig(
        quantization_channels=32, num_cycles=1, num_cycle_layers=2,
        dilation_rates=[1, 2], kernel_size=2, dilation_filters=8,
        skip_filters=8, residual_filters=8, preprocess_kernel_size=2,
        preprocess_filters=8)
    base = dict(encoder="64", use_vq=True, speaker_embedding=4, k=256,
                latent_dim=64, beta=0.25, wavenet=wn)
    p_unif, _ = init_vqvae(key, ModelConfig(**base), 4)
    p_norm, _ = init_vqvae(key, ModelConfig(**base, codebook_init="normal"), 4)
    e_u = np.asarray(p_unif["vq"]["embedding"])
    e_n = np.asarray(p_norm["vq"]["embedding"])
    # uniform_unit_scaling(1.7) is bounded; normal is not and has std ~ 1
    assert abs(e_n.std() - 1.0) < 0.05
    assert e_u.max() < 1.0  # bound = 1.7 * sqrt(3/64) ~ 0.37
    assert not np.allclose(e_u, e_n)

    # json plumb
    import json, tempfile, os
    with tempfile.TemporaryDirectory() as d:
        wn_path = os.path.join(d, "wn.json")
        with open(wn_path, "w") as f:
            json.dump(wn.to_dict(), f)
        mp = dict(encoder="64", use_vq=True, speaker_embedding=4, k=256,
                  latent_dim=64, beta=0.25, wavenet_parameters=wn_path,
                  learning_rate_schedule={"0": 1e-4},
                  codebook_init="normal")
        mp_path = os.path.join(d, "model.json")
        with open(mp_path, "w") as f:
            json.dump(mp, f)
        cfg = ModelConfig.from_json(mp_path)
        assert cfg.codebook_init == "normal"
