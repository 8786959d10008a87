import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np, jax.numpy as jnp
from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params
from vqvae_wavenet_tpu.ops.gen_pallas import generate_pallas
cfg = WavenetConfig()
params = init_wavenet_params(jax.random.PRNGKey(0), cfg, lc_channels=128)
lc = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 128))
a = np.asarray(generate_pallas(params, cfg, lc, length=2048, mode="greedy",
                               dtype=jnp.bfloat16, ring_mode="resident"))
b = np.asarray(generate_pallas(params, cfg, lc, length=2048, mode="greedy",
                               dtype=jnp.bfloat16, ring_mode="hybrid"))
match = (a == b).mean()
print("bitwise match fraction:", match)
assert match == 1.0
print("OK hybrid==resident bit-identical (greedy B=8 len 2048)")
