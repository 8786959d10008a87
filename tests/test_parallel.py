"""Multi-chip paths on the 8-virtual-CPU mesh: DP-sharded training equals
single-device training; TP sharding rules engage; graft entry dryrun."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vqvae_wavenet_tpu.config import ModelConfig, WavenetConfig
from vqvae_wavenet_tpu.parallel.mesh import (
    make_mesh, param_shardings, replicated, batch_sharding)
from vqvae_wavenet_tpu.training.train_loop import init_train_state, train_step
from functools import partial


def tiny_cfg(**kw):
    wn = WavenetConfig(
        quantization_channels=32, num_cycles=1, num_cycle_layers=3,
        dilation_rates=[1, 2, 4], kernel_size=2, dilation_filters=8,
        skip_filters=8, residual_filters=8, preprocess_kernel_size=2,
        preprocess_filters=8)
    base = dict(encoder="64", use_vq=True, speaker_embedding=4, k=8,
                latent_dim=4, beta=0.25, wavenet=wn,
                learning_rate_schedule={0: 1e-4})
    base.update(kw)
    return ModelConfig(**base)


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    mesh2 = make_mesh(num_data=4, num_model=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}


def test_dp_matches_single_device(key):
    """The GSPMD-partitioned step (batch sharded over 'data') must produce
    the same loss and parameter update as the unsharded computation —
    includes sync-BN and global loss means."""
    cfg = tiny_cfg()
    ts = init_train_state(key, cfg, num_speakers=4)
    B, T = 8, 128
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    batch = {"x": x, "y": y}
    rng = jax.random.PRNGKey(2)

    ts_single, m_single = jax.jit(partial(train_step, cfg=cfg))(ts, batch, rng)

    mesh = make_mesh(num_data=8, num_model=1)
    shard = batch_sharding(mesh)
    sharded_batch = {"x": jax.device_put(x, shard),
                     "y": jax.device_put(y, shard)}
    ts_repl = jax.device_put(ts, replicated(mesh))
    ts_multi, m_multi = jax.jit(partial(train_step, cfg=cfg))(
        ts_repl, sharded_batch, rng)

    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_multi["loss"]), rtol=1e-4)
    a = np.asarray(ts_single["params"]["decoder"]["preprocess"]["kernel"])
    b = np.asarray(ts_multi["params"]["decoder"]["preprocess"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)


def test_tp_param_shardings(key):
    cfg = tiny_cfg(wavenet=WavenetConfig(
        quantization_channels=32, num_cycles=1, num_cycle_layers=2,
        dilation_rates=[1, 2], kernel_size=2, dilation_filters=8,
        skip_filters=512, residual_filters=8, preprocess_kernel_size=2,
        preprocess_filters=8))
    ts = init_train_state(key, cfg, num_speakers=4)
    mesh = make_mesh(num_data=4, num_model=2)
    shardings = param_shardings(mesh, ts["params"])
    skip_spec = shardings["decoder"]["layers"]["skip_kernel"].spec
    assert skip_spec == P(None, None, "model")
    pp1_spec = shardings["decoder"]["postprocess1"]["kernel"].spec
    assert pp1_spec == P(None, "model", None)
    # biases replicate
    assert shardings["decoder"]["layers"]["skip_bias"].spec == P()


def test_tp_step_runs_and_matches(key):
    """Full train step with params actually sharded over the model axis."""
    cfg = tiny_cfg(wavenet=WavenetConfig(
        quantization_channels=32, num_cycles=1, num_cycle_layers=2,
        dilation_rates=[1, 2], kernel_size=2, dilation_filters=8,
        skip_filters=512, residual_filters=8, preprocess_kernel_size=2,
        preprocess_filters=8))
    ts = init_train_state(key, cfg, num_speakers=4)
    B, T = 4, 128
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    rng = jax.random.PRNGKey(2)

    ts_single, m_single = jax.jit(partial(train_step, cfg=cfg))(
        ts, {"x": x, "y": y}, rng)

    mesh = make_mesh(num_data=4, num_model=2)
    ts_shardings = {
        "params": param_shardings(mesh, ts["params"]),
        "ema_params": param_shardings(mesh, ts["ema_params"]),
        "model_state": jax.tree_util.tree_map(
            lambda _: replicated(mesh), ts["model_state"]),
        "opt_state": jax.tree_util.tree_map(
            lambda _: replicated(mesh), ts["opt_state"]),
        "step": replicated(mesh),
    }
    ts_sharded = jax.device_put(ts, ts_shardings)
    shard = NamedSharding(mesh, P("data"))
    batch = {"x": jax.device_put(x, shard), "y": jax.device_put(y, shard)}
    ts_multi, m_multi = jax.jit(partial(train_step, cfg=cfg))(
        ts_sharded, batch, rng)
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_multi["loss"]), rtol=1e-4)


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_multihost_batch_construction():
    """train.py's multi-host branch builds the global batch with
    jax.make_array_from_process_local_data; at process_count==1 this must
    equal a plain device_put (the API is identical across hosts — each
    process passes its local shard)."""
    mesh = make_mesh(num_data=4, num_model=1, devices=jax.devices()[:4])
    sharding = batch_sharding(mesh)
    x = np.arange(4 * 8 * 2, dtype=np.float32).reshape(4, 8, 2)
    arr = jax.make_array_from_process_local_data(sharding, x)
    assert arr.shape == (4, 8, 2)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding.is_equivalent_to(sharding, 3)


def test_graft_entry_dryrun_driver_conditions():
    """The driver imports __graft_entry__ and calls dryrun_multichip(8)
    directly — no conftest, no pre-set XLA_FLAGS (MULTICHIP_r01 failed
    because the function relied on the caller configuring the backend).
    Reproduce those exact conditions in a clean subprocess."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    assert "'data': 4, 'model': 2" in out.stdout, out.stdout
