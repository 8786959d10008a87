"""Training subsystem: LR schedule semantics, EMA, train step, checkpoint
round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.config import ModelConfig, WavenetConfig
from vqvae_wavenet_tpu.training.optimizer import (
    piecewise_constant_schedule, ema_update, WAVENET_STANDALONE_SCHEDULE)
from vqvae_wavenet_tpu.training.train_loop import (
    init_train_state, train_step, make_jit_train_step)
from vqvae_wavenet_tpu.training.checkpoint import (
    save_checkpoint, restore_checkpoint, latest_checkpoint)


def tiny_cfg(**kw):
    wn = WavenetConfig(
        quantization_channels=32, num_cycles=1, num_cycle_layers=3,
        dilation_rates=[1, 2, 4], kernel_size=2, dilation_filters=8,
        skip_filters=8, residual_filters=8, preprocess_kernel_size=2,
        preprocess_filters=8)
    base = dict(encoder="64", use_vq=True, speaker_embedding=4, k=8,
                latent_dim=4, beta=0.25, wavenet=wn,
                learning_rate_schedule={0: 8e-5, 100: 6e-5, 200: 4e-5})
    base.update(kw)
    return ModelConfig(**base)


def make_batch(key, B=2, T=128, S=3):
    x = jax.random.uniform(key, (B, T, 1), minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.arange(B) % S, S)[:, None, :]
    return {"x": x, "y": y}


def test_piecewise_schedule():
    """Reference model.py:110-114 semantics: lr = value at the largest
    boundary <= step (and correct regardless of dict order)."""
    fn = piecewise_constant_schedule({200: 4e-5, 0: 8e-5, 100: 6e-5})
    assert float(fn(0)) == pytest.approx(8e-5)
    assert float(fn(99)) == pytest.approx(8e-5)
    assert float(fn(100)) == pytest.approx(6e-5)
    assert float(fn(150)) == pytest.approx(6e-5)
    assert float(fn(200)) == pytest.approx(4e-5)
    assert float(fn(10_000_000)) == pytest.approx(4e-5)
    # the standalone WaveNet trainer's hardcoded schedule (wavenet.py:180-188)
    fn2 = piecewise_constant_schedule(WAVENET_STANDALONE_SCHEDULE)
    assert float(fn2(0)) == pytest.approx(4e-4)
    assert float(fn2(40000)) == pytest.approx(2e-4)


def test_ema_update():
    ema = {"a": jnp.zeros(3)}
    p = {"a": jnp.ones(3)}
    out = ema_update(ema, p, decay=0.999)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.001, rtol=1e-5)


def test_train_step_updates_and_metrics(key):
    cfg = tiny_cfg()
    ts = init_train_state(key, cfg, num_speakers=3)
    batch = make_batch(key)
    new_ts, metrics = train_step(ts, batch, key, cfg=cfg)
    assert int(new_ts["step"]) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["lr"]) == pytest.approx(8e-5)
    assert "perplexity" in metrics
    # params moved
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        ts["params"], new_ts["params"])
    assert max(jax.tree_util.tree_leaves(delta)) > 0
    # ema shadows lag params
    assert not np.allclose(
        np.asarray(new_ts["ema_params"]["decoder"]["preprocess"]["kernel"]),
        np.asarray(new_ts["params"]["decoder"]["preprocess"]["kernel"]))


def test_train_step_ema_vq_mode(key):
    cfg = tiny_cfg(vq_mode="ema")
    ts = init_train_state(key, cfg, num_speakers=3)
    assert "vq" in ts["model_state"]
    batch = make_batch(key)
    new_ts, _ = train_step(ts, batch, key, cfg=cfg)
    # codebook changed via EMA stats, not optimizer
    assert not np.allclose(
        np.asarray(new_ts["params"]["vq"]["embedding"]),
        np.asarray(ts["params"]["vq"]["embedding"]))
    assert float(jnp.sum(new_ts["model_state"]["vq"]["ema_cluster_size"])) > 0


def test_jit_train_step_multi_steps(key):
    cfg = tiny_cfg()
    ts = init_train_state(key, cfg, num_speakers=3)
    step_fn = make_jit_train_step(cfg, donate=False)
    batch = make_batch(key)
    losses = []
    for i in range(5):
        ts, metrics = step_fn(ts, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert int(ts["step"]) == 5
    assert np.isfinite(losses).all()


def test_checkpoint_roundtrip(key, tmp_path):
    cfg = tiny_cfg()
    ts = init_train_state(key, cfg, num_speakers=3)
    ts, _ = train_step(ts, make_batch(key), key, cfg=cfg)
    save_dir = str(tmp_path / "saved_model")
    os.makedirs(save_dir)
    path = save_checkpoint(save_dir, ts)
    assert path.endswith("weights-1")
    assert latest_checkpoint(save_dir) == path

    template = init_train_state(jax.random.PRNGKey(9), cfg, num_speakers=3)
    restored = restore_checkpoint(save_dir, template)
    np.testing.assert_array_equal(np.asarray(restored["step"]), 1)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["vq"]["embedding"]),
        np.asarray(ts["params"]["vq"]["embedding"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored["ema_params"]["decoder"]["preprocess"]["kernel"]),
        np.asarray(ts["ema_params"]["decoder"]["preprocess"]["kernel"]),
        rtol=1e-6)


def test_mixed_precision_train_step(key):
    """train_dtype='bf16': the decoder stack runs in bf16 (f32 labels,
    loss, optimizer); the loss must track the f32 step closely and the
    model must still learn."""
    cfg32 = tiny_cfg()
    cfg16 = tiny_cfg(train_dtype="bf16")
    ts32 = init_train_state(key, cfg32, num_speakers=3)
    ts16 = jax.tree_util.tree_map(lambda x: x.copy(), ts32)
    batch = make_batch(jax.random.PRNGKey(1))

    _, m32 = train_step(ts32, batch, None, cfg=cfg32)
    _, m16 = train_step(ts16, batch, None, cfg=cfg16)
    # identical params/batch: bf16 rounding only
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=2e-2)

    losses = []
    ts = ts16
    from functools import partial
    step = jax.jit(partial(train_step, cfg=cfg16))
    for i in range(8):
        ts, m = step(ts, batch, None)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params stay f32 (master weights)
    assert ts["params"]["decoder"]["preprocess"]["kernel"].dtype == jnp.float32


def test_fused_adam_ema_matches_optax_chain(key):
    """fused_adam_ema_step (PERF.md #29) vs the literal optax sequence
    (adam.update -> apply_updates -> ema_update) over several steps,
    crossing a schedule boundary, for both family b1 values."""
    import optax
    from vqvae_wavenet_tpu.training.optimizer import (
        make_optimizer, fused_adam_ema_step)

    schedule = {0: 1e-3, 3: 5e-4}
    params = {"w": jax.random.normal(key, (16, 8)),
              "b": {"c": jnp.ones((8,)) * 0.3}}
    for b1 in (0.9, 0.5):
        opt = optax.adam(piecewise_constant_schedule(schedule),
                         b1=b1, b2=0.999)
        p_a = jax.tree_util.tree_map(jnp.copy, params)
        e_a = jax.tree_util.tree_map(jnp.copy, params)
        s_a = opt.init(p_a)
        p_b = jax.tree_util.tree_map(jnp.copy, params)
        e_b = jax.tree_util.tree_map(jnp.copy, params)
        s_b = opt.init(p_b)
        assert jax.tree_util.tree_structure(s_a) \
            == jax.tree_util.tree_structure(s_b)
        for i in range(6):
            g = jax.tree_util.tree_map(
                lambda v: jnp.full_like(v, 0.1 * (i + 1)), params)
            upd, s_a = opt.update(g, s_a, p_a)
            p_a = optax.apply_updates(p_a, upd)
            e_a = ema_update(e_a, p_a, 0.999)
            p_b, e_b, s_b = fused_adam_ema_step(
                p_b, e_b, s_b, g,
                piecewise_constant_schedule(schedule), b1=b1,
                ema_decay=0.999)
        # state layout identical (checkpoint interchangeability)
        assert jax.tree_util.tree_structure(s_a) \
            == jax.tree_util.tree_structure(s_b)
        for la, lb in zip(jax.tree_util.tree_leaves((p_a, e_a, s_a)),
                          jax.tree_util.tree_leaves((p_b, e_b, s_b))):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-6, atol=2e-7)
