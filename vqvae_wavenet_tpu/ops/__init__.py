from vqvae_wavenet_tpu.ops.mu_law import (
    mu_law_encode,
    mu_law_decode,
    mu_law_encode_np,
    mu_law_decode_np,
)
from vqvae_wavenet_tpu.ops.conv import (
    shift_right,
    causal_conv1d,
    conv1d,
    add_condition,
    uniform_unit_scaling_init,
)
