import time
import jax, jax.numpy as jnp
from functools import partial
from vqvae_wavenet_tpu.config import ModelConfig
from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
from vqvae_wavenet_tpu.models.wavenet import wavenet_logits, init_wavenet_params
from vqvae_wavenet_tpu.models import encoders as enc

def timeit(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

B, T = 8, 6656
cfg = ModelConfig()
params, state = init_vqvae(jax.random.PRNGKey(0), cfg, 109)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1), minval=-.5, maxval=.5)
y = jax.nn.one_hot(jnp.arange(B) % 109, 109)[:, None, :]

fwd = jax.jit(lambda p: vqvae_forward(p, state, cfg, x, y, train=True)[0])
print("full fwd f32: %.1f ms" % timeit(fwd, params))
g = jax.jit(jax.grad(lambda p: vqvae_forward(p, state, cfg, x, y, train=True)[0]))
print("full fwd+bwd f32: %.1f ms" % timeit(g, params))

lc = jax.random.normal(jax.random.PRNGKey(2), (B, T // 64, 128))
dec = params["decoder"]
dfwd = jax.jit(lambda p: wavenet_logits(p, cfg.wavenet, x, lc).sum())
print("decoder fwd f32: %.1f ms" % timeit(dfwd, dec))
dg = jax.jit(jax.grad(lambda p: wavenet_logits(p, cfg.wavenet, x, lc).sum()))
print("decoder fwd+bwd f32: %.1f ms" % timeit(dg, dec))

dec16 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), dec)
x16, lc16 = x.astype(jnp.bfloat16), lc.astype(jnp.bfloat16)
dfwd16 = jax.jit(lambda p: wavenet_logits(p, cfg.wavenet, x16, lc16).sum())
print("decoder fwd bf16: %.1f ms" % timeit(dfwd16, dec16))
dg16 = jax.jit(jax.grad(lambda p: wavenet_logits(
    p, cfg.wavenet, x16, lc16).sum().astype(jnp.float32)))
print("decoder fwd+bwd bf16: %.1f ms" % timeit(dg16, dec16))

efwd = jax.jit(lambda p: enc.encoder_forward("64", p, state["encoder"], x,
                                             train=True)[0].sum())
print("encoder fwd f32: %.1f ms" % timeit(efwd, params["encoder"]))
eg = jax.jit(jax.grad(lambda p: enc.encoder_forward(
    "64", p, state["encoder"], x, train=True)[0].sum()))
print("encoder fwd+bwd f32: %.1f ms" % timeit(eg, params["encoder"]))
