"""WaveNet prior over VQ codes: causality, loss, overfit, sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqvae_wavenet_tpu.models.prior import (
    init_prior_params, prior_logits, prior_loss, prior_sample)


def test_prior_causality(key):
    params = init_prior_params(key, k=8, embed_dim=4, filters=8)
    codes = jax.random.randint(key, (1, 32), 0, 8)
    logits = np.asarray(prior_logits(params, codes))
    codes2 = codes.at[:, 10:].set(0)
    logits2 = np.asarray(prior_logits(params, codes2))
    # logits at t depend only on codes[< t]
    np.testing.assert_allclose(logits[:, :11], logits2[:, :11],
                               rtol=1e-4, atol=1e-5)
    assert not np.allclose(logits[:, 11:], logits2[:, 11:])


def test_prior_loss_and_overfit(key):
    k = 8
    params = init_prior_params(key, k=k, embed_dim=4, filters=16)
    # a deterministic repeating pattern is easy to memorize
    codes = jnp.tile(jnp.arange(k, dtype=jnp.int32), (2, 4))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(prior_loss)(params, codes)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(80):
        params, opt_state, loss = step(params, opt_state)
        first = first or float(loss)
    assert float(loss) < first * 0.5
    assert float(loss) < np.log(k)


def test_prior_sample(key):
    params = init_prior_params(key, k=8, embed_dim=4, filters=8)
    codes = prior_sample(params, key, batch_size=2, length=16)
    c = np.asarray(codes)
    assert c.shape == (2, 16)
    assert c.min() >= 0 and c.max() < 8


def test_prior_gc_conditioning(key):
    params = init_prior_params(key, k=8, embed_dim=4, filters=8,
                               gc_channels=3)
    codes = jax.random.randint(key, (2, 16), 0, 8)
    gc0 = jnp.zeros((2, 1, 3))
    gc1 = jnp.ones((2, 1, 3))
    a = np.asarray(prior_logits(params, codes, gc0))
    b = np.asarray(prior_logits(params, codes, gc1))
    assert not np.allclose(a, b)
