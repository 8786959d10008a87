import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map
from vqvae_wavenet_tpu.config import ModelConfig, WavenetConfig
from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
from vqvae_wavenet_tpu.models import encoders as enc

wn = WavenetConfig(
    quantization_channels=32, num_cycles=2, num_cycle_layers=3,
    dilation_rates=[1, 2, 4, 1, 2, 4], kernel_size=3,
    dilation_filters=8, skip_filters=12, residual_filters=10,
    preprocess_kernel_size=4, preprocess_filters=10)
cfg = ModelConfig(encoder="64", use_vq=True, speaker_embedding=4, k=8,
                  latent_dim=4, beta=0.25, wavenet=wn,
                  learning_rate_schedule={0: 1e-3})
key = jax.random.PRNGKey(0)
params, state = init_vqvae(key, cfg, 4)
B, T = 1, 512
x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1), minval=-0.9, maxval=0.9)

from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_encoder_64
ref_ze, _ = enc.encoder_forward("64", params["encoder"], state["encoder"], x,
                                train=True, norm="batch")
mesh = Mesh(np.asarray(jax.devices()[:4]), ("time",))
fn = shard_map(
    lambda p, s, xl: time_sharded_encoder_64(p, s, xl, train=True,
                                             norm="batch", axis_name="time")[0],
    mesh=mesh, in_specs=(P(), P(), P(None, "time", None)),
    out_specs=P(None, "time", None), check_rep=False)
sp_ze = fn(params["encoder"], state["encoder"], x)
print("z_e max diff @4 shards:", float(jnp.abs(sp_ze - ref_ze).max()))

from vqvae_wavenet_tpu.models import vq as vq_mod
qr = vq_mod.quantize(params["vq"], ref_ze, mode="st")
qs = vq_mod.quantize(params["vq"], sp_ze, mode="st")
print("code flips:", int((qr["q_z_x"] != qs["q_z_x"]).sum()), "/", qr["q_z_x"].size)
