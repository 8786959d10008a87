"""Magenta/nsynth variant: config preset, encoder downsampling, forward
loss with the reg term, gate-order difference, optimizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.models import magenta as mg
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params, wavenet_forward


def test_config_preset():
    cfg = mg.magenta_wavenet_config()
    assert cfg.num_layers == 50
    assert tuple(cfg.dilation_rates[:11]) == (1, 2, 4, 8, 16, 32, 64, 128,
                                              256, 512, 1)
    assert cfg.kernel_size == 2
    assert cfg.skip_filters == 512


@pytest.mark.slow
def test_magenta_encode_shapes(key):
    params = mg.init_magenta_params(key, num_speakers=4)
    x = jax.random.uniform(key, (1, 256, 1), minval=-0.5, maxval=0.5)
    z = mg.magenta_encode(params["encoder"], x)
    assert z.shape == (1, 4, 64)  # 2^6 = 64x downsample


def test_gate_order_differs(key):
    """sigmoid_first and tanh_first must genuinely differ."""
    from vqvae_wavenet_tpu.config import WavenetConfig
    cfg = WavenetConfig(quantization_channels=32, num_cycles=1,
                        num_cycle_layers=2, dilation_rates=[1, 2],
                        kernel_size=2, dilation_filters=8, skip_filters=8,
                        residual_filters=8, preprocess_kernel_size=2,
                        preprocess_filters=8)
    params = init_wavenet_params(key, cfg, lc_channels=None)
    x = jax.random.uniform(key, (1, 32, 1), minval=-0.5, maxval=0.5)
    a, _ = wavenet_forward(params, cfg, x, gate_order="tanh_first")
    b, _ = wavenet_forward(params, cfg, x, gate_order="sigmoid_first")
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_regularization_loss(key):
    params = {"embedding": jnp.ones((4, 2)), "w": jnp.ones((3,))}
    reg = float(mg.regularization_loss(params))
    # embedding: 1e-6*10*8 + w: 1e-6*3
    assert reg == pytest.approx(8e-5 + 3e-6, rel=1e-4)


@pytest.mark.slow
def test_magenta_forward_loss(key):
    params = mg.init_magenta_params(key, num_speakers=4)
    x = jax.random.uniform(key, (1, 256, 1), minval=-0.5, maxval=0.5)
    gc = jax.nn.one_hot(jnp.zeros((1, 1), jnp.int32), 4)
    loss, aux = mg.magenta_forward(params, x, gc)
    assert np.isfinite(float(loss))
    assert float(aux["reg_loss"]) > 0
    assert abs(float(loss) - float(aux["reconstruction_loss"])
               - float(aux["vq_loss"]) - float(aux["commitment_loss"])
               - float(aux["reg_loss"])) < 1e-5
    # magenta conditions the decoder on e_k (config.py:278)
    assert aux["encoding"].shape == (1, 4, 64)


def test_magenta_optimizer():
    opt = mg.make_magenta_optimizer()
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones(3)}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_magenta_fastgen_with_gc_matches_teacher_forcing(key):
    """Per-layer biased global conditioning through the generation path must
    match the training graph (the FastGenerationConfig guarantee)."""
    import jax
    from vqvae_wavenet_tpu.config import WavenetConfig
    from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params, wavenet_forward
    from vqvae_wavenet_tpu.generation.fast import teacher_forced_stepper
    cfg = WavenetConfig(quantization_channels=32, num_cycles=1,
                        num_cycle_layers=3, dilation_rates=[1, 2, 4],
                        kernel_size=2, dilation_filters=8, skip_filters=8,
                        residual_filters=8, preprocess_kernel_size=2,
                        preprocess_filters=8)
    B, T, S, C, G = 1, 24, 3, 4, 5
    params = init_wavenet_params(key, cfg, lc_channels=C, gc_channels=G)
    params["layers"]["gc_bias"] = jnp.ones((3, 16))
    params["postprocess1"]["gc_bias"] = jnp.ones((8,))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, S, C))
    gc = jax.random.normal(jax.random.PRNGKey(3), (B, 1, G))
    ref, _ = wavenet_forward(params, cfg, x, lc, gc,
                             gate_order="sigmoid_first")
    fast = teacher_forced_stepper(params, cfg, x, lc,
                                  gate_order="sigmoid_first",
                                  global_condition=gc)
    np.testing.assert_allclose(np.asarray(ref).reshape(B, T, -1),
                               np.asarray(fast), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_magenta_generate_e2e(key):
    params = mg.init_magenta_params(key, num_speakers=4)
    x = jax.random.uniform(key, (1, 128, 1), minval=-0.5, maxval=0.5)
    gc = jax.nn.one_hot(jnp.ones((1, 1), jnp.int32), 4)
    wav = mg.magenta_generate(params, x, gc, mode="greedy")
    w = np.asarray(wav)
    assert w.shape == (1, 128)
    assert np.isfinite(w).all() and np.abs(w).max() <= 1.0


HW_MAGENTA_TRAIN_SCRIPT = """
import sys
import jax, jax.numpy as jnp
import numpy as np
if jax.devices()[0].platform not in ("tpu", "axon"):
    print("SKIP"); sys.exit(0)
from vqvae_wavenet_tpu.config import ModelConfig
from vqvae_wavenet_tpu.models import magenta as mg
# the full preset, NOT monkeypatched (Magenta/config.py:4-16)
assert mg.NUM_LAYERS == 50 and mg.WIDTH == 256 and mg.SKIP_WIDTH == 512
cfg = ModelConfig.from_json("magenta_parameters.json")
from vqvae_wavenet_tpu.training.train_loop import (
    init_train_state, make_jit_train_step)
ts = init_train_state(jax.random.PRNGKey(0), cfg, 109)
step = make_jit_train_step(cfg)
x = jax.random.uniform(jax.random.PRNGKey(1), (2, 6144, 1),
                       minval=-0.9, maxval=0.9)
y = jax.nn.one_hot(jnp.arange(2) % 109, 109)[:, None, :]
losses = []
for _ in range(4):
    ts, m = step(ts, {"x": x, "y": y}, None)
    losses.append(float(m["loss"]))
assert np.isfinite(losses).all(), losses
assert losses[-1] < losses[0], losses
print("OK", [round(l, 3) for l in losses])
"""


@pytest.mark.slow
def test_hardware_magenta_full_preset_train_step():
    """The REAL 50-layer Magenta preset (no module-constant shrinking)
    compiles and trains on TPU hardware: 4 full train steps, finite and
    decreasing loss.  Runs the default (axon/TPU) backend in a
    subprocess; skips when no TPU is attached.  (Round-2 weakness: the
    CLI e2e test monkeypatched NUM_LAYERS down, so the unshrunk preset
    was never validated for training.)"""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    out = subprocess.run(
        [sys.executable, "-c", HW_MAGENTA_TRAIN_SCRIPT],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=3000)
    if "SKIP" in out.stdout:
        pytest.skip("no TPU backend available")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout, out.stdout
