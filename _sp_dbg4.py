import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from jax.sharding import Mesh
from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params, wavenet_logits, wavenet_loss
from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_logits
from vqvae_wavenet_tpu.ops.mu_law import mu_law_encode

cfg = WavenetConfig(
    quantization_channels=32, num_cycles=2, num_cycle_layers=3,
    dilation_rates=[1, 2, 4, 1, 2, 4], kernel_size=3,
    dilation_filters=8, skip_filters=12, residual_filters=10,
    preprocess_kernel_size=4, preprocess_filters=10)
key = jax.random.PRNGKey(0)
params = init_wavenet_params(key, cfg, lc_channels=5)
B, T, ratio = 1, 512, 64
x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1), minval=-0.9, maxval=0.9)
lc = jax.random.normal(jax.random.PRNGKey(2), (B, T // ratio, 5))
labels = mu_law_encode(x[..., 0], 32, to_int=True).reshape(-1)
mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))

def single(p):
    lg = wavenet_logits(p, cfg, x, lc)
    return wavenet_loss(lg.reshape(-1, 32), labels)

def sp(p):
    lg = time_sharded_logits(p, cfg, x, lc, mesh)
    return wavenet_loss(lg.reshape(-1, 32), labels)

print("loss:", float(single(params)), float(sp(params)))
g1 = jax.grad(single)(params)
g2 = jax.grad(sp)(params)
for path, leaf in jax.tree_util.tree_leaves_with_path(g1):
    other = dict(jax.tree_util.tree_leaves_with_path(g2))[path]
    d = float(jnp.abs(leaf - other).max())
    m = float(jnp.abs(leaf).max())
    print("/".join(str(getattr(k, 'key', k)) for k in path), "maxdiff", d, "scale", m)

import vqvae_wavenet_tpu.parallel.timeshard as tsh
orig = tsh.halo_sizes
tsh.halo_sizes = lambda cfg, ratio: (2 * orig(cfg, ratio)[0],
                                     2 * orig(cfg, ratio)[1])
g3 = jax.grad(sp)(params)
print("--- with 2x halo ---")
for path, leaf in jax.tree_util.tree_leaves_with_path(g1):
    other = dict(jax.tree_util.tree_leaves_with_path(g3))[path]
    d = float(jnp.abs(leaf - other).max())
    name = "/".join(str(getattr(k, 'key', k)) for k in path)
    if "bias" in name:
        print(name, "maxdiff", d)
