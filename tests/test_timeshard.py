"""Sequence parallelism: time-sharded teacher forcing must equal the
single-device forward exactly (halo exchange correctness)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params, wavenet_logits
from vqvae_wavenet_tpu.parallel.mesh import make_mesh
from vqvae_wavenet_tpu.parallel.timeshard import (
    time_sharded_logits, halo_sizes)


def tiny_cfg():
    return WavenetConfig(
        quantization_channels=32, num_cycles=2, num_cycle_layers=3,
        dilation_rates=[1, 2, 4, 1, 2, 4], kernel_size=3,
        dilation_filters=8, skip_filters=12, residual_filters=10,
        preprocess_kernel_size=4, preprocess_filters=10)


def test_halo_sizes():
    cfg = tiny_cfg()  # RF = 14*2 + 1 + 3 = 32
    halo, frames = halo_sizes(cfg, ratio=16)
    assert halo == 32 and frames == 2
    halo, frames = halo_sizes(cfg, ratio=10)
    assert halo == 40 and frames == 4  # rounded up to whole frames


def bump_biases(params, delta=0.1):
    """Give every bias a nonzero value: a trained checkpoint's recomputed
    halo activations differ from the single-device zero padding at shard 0
    unless the SP path masks them (invisible at zero-bias init)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: x + delta if "bias" in str(p[-1]) else x, params)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_time_sharded_matches_single(key, n_shards):
    cfg = tiny_cfg()
    B, T, C = 2, 256, 5
    ratio = 16
    params = bump_biases(init_wavenet_params(key, cfg, lc_channels=C))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, T // ratio, C))

    ref = np.asarray(wavenet_logits(params, cfg, x, lc))
    mesh = make_mesh(num_data=n_shards, num_model=1,
                     devices=jax.devices()[:n_shards])
    got = np.asarray(time_sharded_logits(params, cfg, x, lc, mesh))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_time_sharded_rejects_misaligned(key):
    cfg = tiny_cfg()
    params = init_wavenet_params(key, cfg, lc_channels=3)
    x = jnp.zeros((1, 128, 1))
    lc = jnp.zeros((1, 2, 3))  # ratio 64; per-shard 128/4=32 not multiple
    mesh = make_mesh(num_data=4, num_model=1, devices=jax.devices()[:4])
    with pytest.raises(AssertionError):
        time_sharded_logits(params, cfg, x, lc, mesh)


# ---------------------------- SP TRAINING (round 2) ----------------------


def sp_model_cfg(**kw):
    from vqvae_wavenet_tpu.config import ModelConfig
    base = dict(encoder="64", use_vq=True, speaker_embedding=4, k=8,
                latent_dim=4, beta=0.25, wavenet=tiny_cfg(),
                learning_rate_schedule={0: 1e-3})
    base.update(kw)
    return ModelConfig(**base)


def time_mesh(n):
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:n]), ("time",))


@pytest.mark.parametrize("n_shards,norm,halo", [
    (2, "batch", "layer"), (4, "group", "layer"), (4, "batch", "recompute")])
def test_sp_loss_matches_single_device(key, n_shards, norm, halo):
    """time_sharded_loss == vqvae_forward: encoder halos + sync-norm +
    decoder halo + psum'd losses reproduce the one-device computation —
    for BOTH decoder halo schemes (per-layer exchange, the round-4
    default, and the receptive-field recompute path)."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg(encoder_norm=norm)
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 2, 512
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    ref_loss, ref_aux = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, sp_aux = time_sharded_loss(params, state, cfg, x, y,
                                        time_mesh(n_shards),
                                        decoder_halo=halo)
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(float(sp_aux["reconstruction_loss"]),
                               float(ref_aux["reconstruction_loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(sp_aux["vq_loss"]),
                               float(ref_aux["vq_loss"]), rtol=2e-4)
    if norm == "batch":   # BN running stats must match too
        ref_bn = ref_aux["state"]["encoder"]["bn"][0]["mean"]
        sp_bn = sp_aux["state"]["encoder"]["bn"][0]["mean"]
        np.testing.assert_allclose(np.asarray(sp_bn), np.asarray(ref_bn),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("halo", ["layer", "recompute"])
def test_sp_gradients_match_single_device(key, halo):
    """Backward through the halo ppermutes must equal one-device grads —
    both decoder halo schemes (the per-layer scheme differentiates ~31
    ppermutes; the recompute scheme one RF-sized ppermute + pad mask)."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg()
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 1, 512
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    mesh = time_mesh(4)

    g_ref = jax.grad(
        lambda p: vqvae_forward(p, state, cfg, x, y, train=True)[0])(params)
    g_sp = jax.grad(
        lambda p: time_sharded_loss(p, state, cfg, x, y, mesh,
                                    decoder_halo=halo)[0])(params)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(g_sp))
    for path, leaf in flat_ref:
        got = flat_sp[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), rtol=5e-4, atol=5e-6,
            err_msg=str(path))


def test_sp_multihop_halo_matches_single(key):
    """Halo > shard length: the receptive-field context spans MULTIPLE left
    neighbors (round-3: the halo <= T/n cap is lifted).  RF=32, shards of
    16 samples -> 2-hop halo."""
    cfg = tiny_cfg()
    B, T, C = 1, 128, 5
    ratio = 8
    params = bump_biases(init_wavenet_params(key, cfg, lc_channels=C))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, T // ratio, C))

    ref = np.asarray(wavenet_logits(params, cfg, x, lc))
    mesh = make_mesh(num_data=8, num_model=1, devices=jax.devices()[:8])
    assert halo_sizes(cfg, ratio)[0] > T // 8  # actually multi-hop
    got = np.asarray(time_sharded_logits(params, cfg, x, lc, mesh,
                                         decoder_halo="recompute"))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_sp_layerhalo_multihop_matches_single(key):
    """Per-layer halo exchange when a single LAYER's halo exceeds the
    shard length ((K-1)*d = 8 > 4-sample shards -> 2-hop _left_halo
    inside _sharded_causal_conv)."""
    cfg = tiny_cfg()
    B, T, C = 1, 32, 5
    ratio = 4
    params = bump_biases(init_wavenet_params(key, cfg, lc_channels=C))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(2), (B, T // ratio, C))

    ref = np.asarray(wavenet_logits(params, cfg, x, lc))
    mesh = make_mesh(num_data=8, num_model=1, devices=jax.devices()[:8])
    assert (cfg.kernel_size - 1) * max(cfg.dilation_rates) > T // 8
    got = np.asarray(time_sharded_logits(params, cfg, x, lc, mesh,
                                         decoder_halo="layer"))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_sp_composed_with_dp_matches_single(key):
    """2(data) x 4(time) mesh: batch AND time sharded in one program must
    equal the single-device loss/metrics (round-3: SP x DP composition)."""
    from jax.sharding import Mesh
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg()
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 2, 512
    # PRNGKey(13), not (1): with this fixture's weights, seed 1 leaves one
    # encoder relu pre-activation 1.9e-7 from the kink, and the sharded
    # forward's different reduction order flips that gate — an O(1)
    # gradient delta in a measure-zero event, not an SP bug.  Seed 13's
    # smallest kink margin is 5e-6, ~30x the reduction noise.
    x = jax.random.uniform(jax.random.PRNGKey(13), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "time"))

    ref_loss, ref_aux = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, sp_aux = time_sharded_loss(params, state, cfg, x, y, mesh,
                                        batch_axis="data")
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(float(sp_aux["reconstruction_loss"]),
                               float(ref_aux["reconstruction_loss"]),
                               rtol=2e-5)
    # sync-BN stats must span the full (B, T) across both mesh axes
    ref_bn = ref_aux["state"]["encoder"]["bn"][0]["mean"]
    sp_bn = sp_aux["state"]["encoder"]["bn"][0]["mean"]
    np.testing.assert_allclose(np.asarray(sp_bn), np.asarray(ref_bn),
                               rtol=1e-5, atol=1e-7)

    # and gradients through the composed mesh (halo ppermutes + DP psum)
    g_ref = jax.grad(
        lambda p: vqvae_forward(p, state, cfg, x, y, train=True)[0])(params)
    g_sp = jax.grad(
        lambda p: time_sharded_loss(p, state, cfg, x, y, mesh,
                                    batch_axis="data")[0])(params)
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(g_sp))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        np.testing.assert_allclose(
            np.asarray(flat_sp[path]), np.asarray(leaf), rtol=5e-4,
            atol=5e-6, err_msg=str(path))


def test_sp_magenta_encoder_matches_single(key):
    """encoder='Magenta' under SP (round-3 scope widening): the causal
    encoder's left-halo exchanges must reproduce the single-device z_e and
    loss exactly."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg(encoder="Magenta")
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 2, 512
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    ref_loss, ref_aux = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, sp_aux = time_sharded_loss(params, state, cfg, x, y,
                                        time_mesh(2))
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(float(sp_aux["vq_loss"]),
                               float(ref_aux["vq_loss"]), rtol=2e-4)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sp_2019_encoder_matches_single(key, n_shards):
    """encoder='2019' under SP (round-5 scope widening — the last excluded
    encoder): the 240-sample MFCC right halo + frame-axis SAME halos must
    reproduce the single-device loss (VERDICT r4 ask #3)."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg(encoder="2019")
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 2, 320 * 4 * n_shards   # per-shard T_l a multiple of 320
    x = jax.random.uniform(jax.random.PRNGKey(17), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    ref_loss, ref_aux = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, sp_aux = time_sharded_loss(params, state, cfg, x, y,
                                        time_mesh(n_shards))
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(float(sp_aux["reconstruction_loss"]),
                               float(ref_aux["reconstruction_loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(sp_aux["vq_loss"]),
                               float(ref_aux["vq_loss"]), rtol=2e-4)


def test_sp_2019_gradients_match_single(key):
    """Backward through the 2019 SP front end: the MFCC right-halo
    ppermute and every frame-axis halo must transpose to one-device
    gradients (the framing gather's transpose scatters into both the
    shard and its halo)."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg(encoder="2019")
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 1, 320 * 4 * 2
    x = jax.random.uniform(jax.random.PRNGKey(19), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    mesh = time_mesh(2)

    g_ref = jax.grad(
        lambda p: vqvae_forward(p, state, cfg, x, y, train=True)[0])(params)
    g_sp = jax.grad(
        lambda p: time_sharded_loss(p, state, cfg, x, y, mesh)[0])(params)
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(g_sp))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        np.testing.assert_allclose(
            np.asarray(flat_sp[path]), np.asarray(leaf),
            rtol=5e-4, atol=5e-6, err_msg=str(path))


def test_sp_ema_vq_matches_single(key):
    """vq_mode='ema' under SP (round-3): psum'd cluster stats + the
    post-step codebook apply must equal the single-device EMA update."""
    from vqvae_wavenet_tpu.models import vq as vq_mod
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg(vq_mode="ema")
    params, state = init_vqvae(key, cfg, num_speakers=4)
    B, T = 2, 512
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    ref_loss, ref_aux = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, sp_aux = time_sharded_loss(params, state, cfg, x, y,
                                        time_mesh(4))
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)

    # the codebook update from SP stats == the single-device update
    ref_vq, ref_state = vq_mod.ema_codebook_update(
        {"embedding": params["vq"]["embedding"]}, state["vq"],
        ref_aux["z_e"], ref_aux["q_z_x"], decay=cfg.ema_decay)
    cs, dw = sp_aux["vq_stats"]
    sp_vq, sp_state = vq_mod.ema_codebook_apply(
        {"embedding": params["vq"]["embedding"]}, state["vq"],
        cs, dw, decay=cfg.ema_decay)
    np.testing.assert_allclose(np.asarray(sp_vq["embedding"]),
                               np.asarray(ref_vq["embedding"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp_state["ema_cluster_size"]),
                               np.asarray(ref_state["ema_cluster_size"]),
                               rtol=1e-6)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sp_bf16_loss_and_grads_match_single(key, n_shards):
    """train_dtype='bf16' under SP (round 4: SP used to be f32-only): the
    per-shard mixed-precision stack must reproduce the single-device bf16
    loss and gradients (identical per-position values; only reduction
    orders differ)."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg(train_dtype="bf16")
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 2, 512
    x = jax.random.uniform(jax.random.PRNGKey(13), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    mesh = time_mesh(n_shards)

    ref_loss, ref_aux = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, sp_aux = time_sharded_loss(params, state, cfg, x, y, mesh)
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-2)
    np.testing.assert_allclose(float(sp_aux["reconstruction_loss"]),
                               float(ref_aux["reconstruction_loss"]),
                               rtol=2e-2)

    g_ref = jax.grad(
        lambda p: vqvae_forward(p, state, cfg, x, y, train=True)[0])(params)
    g_sp = jax.grad(
        lambda p: time_sharded_loss(p, state, cfg, x, y, mesh)[0])(params)
    import optax
    gn = float(optax.global_norm(g_ref))
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(g_sp))
    for path, ref in jax.tree_util.tree_leaves_with_path(g_ref):
        got = np.asarray(flat_sp[path], np.float32)
        ref = np.asarray(ref, np.float32)
        nd = np.linalg.norm(got - ref)
        rel = nd / (np.linalg.norm(ref) + 1e-12)
        # bias-into-norm grads are cancellation-dominated (BN removes a
        # bias shift almost exactly): tiny absolute norms carry bf16
        # noise at O(1) relative error — gate those on the GLOBAL scale
        assert rel < 5e-2 or nd < 1e-2 * gn, \
            f"{path}: rel L2 err {rel}, abs {nd} vs global {gn}"


def test_sp_bf16_composed_with_dp_matches_single(key):
    """bf16 SP x DP on a 2(data) x 4(time) mesh (round 4)."""
    from jax.sharding import Mesh
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg(train_dtype="bf16")
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 2, 512
    x = jax.random.uniform(jax.random.PRNGKey(13), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "time"))

    ref_loss, _ = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, _ = time_sharded_loss(params, state, cfg, x, y, mesh,
                                   batch_axis="data")
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-2)

    g_ref = jax.grad(
        lambda p: vqvae_forward(p, state, cfg, x, y, train=True)[0])(params)
    g_sp = jax.grad(
        lambda p: time_sharded_loss(p, state, cfg, x, y, mesh,
                                    batch_axis="data")[0])(params)
    import optax
    gn = float(optax.global_norm(g_ref))
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(g_sp))
    for path, ref in jax.tree_util.tree_leaves_with_path(g_ref):
        got = np.asarray(flat_sp[path], np.float32)
        ref = np.asarray(ref, np.float32)
        nd = np.linalg.norm(got - ref)
        rel = nd / (np.linalg.norm(ref) + 1e-12)
        # looser than the 1-D SP test: the 2x4 mesh pmean-combines sync-BN
        # statistics over 8 partials, so bf16 activation rounding flips
        # more relu/BN ulps (the f32 composed test above this one pins the
        # machinery at 5e-4; this test only bounds bf16 noise)
        assert rel < 1e-1 or nd < 3e-2 * gn, \
            f"{path}: rel L2 err {rel}, abs {nd} vs global {gn}"


def test_sp_with_tensors_returns_global_summary_tensors(key):
    """with_tensors=True must return z_e/q_z_x/e_k as GLOBAL arrays whose
    values equal the single-device forward's (the -time_shards summary
    path, round 4 — reference writes its full histogram set in every
    mode)."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg()
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 2, 512
    x = jax.random.uniform(jax.random.PRNGKey(13), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    _, ref_aux = vqvae_forward(params, state, cfg, x, y, train=True)
    _, sp_aux = time_sharded_loss(params, state, cfg, x, y, time_mesh(4),
                                  with_tensors=True)
    assert sp_aux["z_e"].shape == ref_aux["z_e"].shape
    np.testing.assert_allclose(np.asarray(sp_aux["z_e"]),
                               np.asarray(ref_aux["z_e"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sp_aux["q_z_x"]),
                                  np.asarray(ref_aux["q_z_x"]))
    np.testing.assert_allclose(np.asarray(sp_aux["e_k"]),
                               np.asarray(ref_aux["e_k"]),
                               rtol=1e-5, atol=1e-6)


def test_sp_summary_train_step_full_histogram_set(key):
    """make_sp_train_step(with_summaries=True) must return the same
    summary tensor set as the single-device summary step
    (train_loop.train_step:111-130) — z_e, q_z_x, e_k, distances, grads,
    grad_norm."""
    from vqvae_wavenet_tpu.training.train_loop import init_train_state
    from vqvae_wavenet_tpu.parallel.timeshard import make_sp_train_step

    cfg = sp_model_cfg()
    mesh = time_mesh(4)
    ts = init_train_state(key, cfg, num_speakers=4)
    step = make_sp_train_step(cfg, mesh, with_summaries=True)
    B, T = 1, 512
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    from jax.sharding import NamedSharding, PartitionSpec
    batch = {"x": jax.device_put(x, NamedSharding(
                 mesh, PartitionSpec(None, "time", None))),
             "y": jax.device_put(y, NamedSharding(mesh, PartitionSpec()))}
    ts, m = step(ts, batch)
    summ = m["summaries"]
    assert set(summ) >= {"z_e", "q_z_x", "e_k", "distances", "grads",
                         "grad_norm"}
    assert summ["z_e"].shape == (B, T // 64, cfg.latent_dim)
    assert summ["distances"].shape[1] == cfg.k
    assert np.isfinite(float(summ["grad_norm"]))
    # grads cover the whole param tree (per-layer kernel histograms)
    assert jax.tree_util.tree_structure(summ["grads"]) == \
        jax.tree_util.tree_structure(ts["params"])


@pytest.mark.slow
def test_sp_magenta_family_matches_single(key):
    """model_family='magenta' under SP (round 4): the time-sharded Magenta
    loss (causal-encoder halos + per-layer gc decoder + reg term) must
    equal magenta_forward on one device."""
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.models import magenta as mg
    from vqvae_wavenet_tpu.parallel.timeshard import (
        time_sharded_magenta_loss)

    cfg = ModelConfig(model_family="magenta", encoder="Magenta",
                      wavenet=mg.magenta_wavenet_config(),
                      learning_rate_schedule=mg.MAGENTA_LR_SCHEDULE)
    params = mg.init_magenta_params(key, num_speakers=4)
    B, T = 1, 256
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.zeros((B, 1), jnp.int32), 4)

    ref_loss, ref_aux = mg.magenta_forward(params, x, y)
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("time",))
    sp_loss, sp_aux = time_sharded_magenta_loss(params, cfg, x, y, mesh)
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(float(sp_aux["reconstruction_loss"]),
                               float(ref_aux["reconstruction_loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(sp_aux["reg_loss"]),
                               float(ref_aux["reg_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(sp_aux["vq_loss"]),
                               float(ref_aux["vq_loss"]), rtol=2e-4)


def test_sp_train_step_runs_and_learns(key):
    """make_sp_train_step: 5 full steps on a 4-way time mesh; loss drops."""
    from vqvae_wavenet_tpu.training.train_loop import init_train_state
    from vqvae_wavenet_tpu.parallel.timeshard import make_sp_train_step

    cfg = sp_model_cfg()
    mesh = time_mesh(4)
    ts = init_train_state(key, cfg, num_speakers=4)
    step = make_sp_train_step(cfg, mesh)
    B, T = 1, 512
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.5, maxval=0.5)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    from jax.sharding import NamedSharding, PartitionSpec
    batch = {"x": jax.device_put(x, NamedSharding(
                 mesh, PartitionSpec(None, "time", None))),
             "y": jax.device_put(y, NamedSharding(mesh, PartitionSpec()))}
    losses = []
    for _ in range(5):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    assert int(np.asarray(ts["step"])) == 5
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sp_deep_config_falls_back_from_layer_halo(key):
    """A >64-layer custom config under the DEFAULT decoder_halo='layer'
    must silently take the recompute path (time_sharded_wavenet_logits
    asserts num_layers <= 64) instead of failing at trace time — round-4
    advisor finding.  Loss must still match the single device."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    deep_wn = WavenetConfig(
        quantization_channels=32, num_cycles=33, num_cycle_layers=2,
        dilation_rates=[1, 2] * 33, kernel_size=2,
        dilation_filters=4, skip_filters=4, residual_filters=4,
        preprocess_kernel_size=2, preprocess_filters=4)
    cfg = sp_model_cfg(wavenet=deep_wn)
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 1, 256
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    ref_loss, _ = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, _ = time_sharded_loss(params, state, cfg, x, y, time_mesh(2),
                                   decoder_halo="layer")
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)


# ---------------- decoder_halo='fused' (round 5) -------------------------


def sp_fused_cfg(**kw):
    """Channels at kernel lane granularity (R/S % 128, 2D % 128) so the
    fused SP decoder path is eligible on the CPU interpret backend."""
    from vqvae_wavenet_tpu.config import ModelConfig
    wn = WavenetConfig(
        quantization_channels=64, num_cycles=2, num_cycle_layers=2,
        dilation_rates=[1, 2, 1, 2], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)
    base = dict(encoder="64", use_vq=True, speaker_embedding=4, k=8,
                latent_dim=4, beta=0.25, wavenet=wn,
                learning_rate_schedule={0: 1e-3})
    base.update(kw)
    return ModelConfig(**base)


def test_sp_fused_decoder_matches_single(key):
    """decoder_halo='fused' (VERDICT r4 ask #1): per-cycle recompute
    halos through the fused Pallas engine (interpret mode here) must
    reproduce the single-device loss — shard 0's halo tiles are SKIPPED
    via the kernel start offset instead of masked."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import (
        time_sharded_loss, _fused_sp_groups)

    cfg = sp_fused_cfg()
    # the plan must actually engage (guard against a silent fallback)
    assert _fused_sp_groups(cfg.wavenet, 64, 256) is not None
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 1, 512                      # 2 shards x 256; halo rounds to 256
    x = jax.random.uniform(jax.random.PRNGKey(23), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    ref_loss, ref_aux = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, sp_aux = time_sharded_loss(params, state, cfg, x, y,
                                        time_mesh(2),
                                        decoder_halo="fused")
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-4)
    np.testing.assert_allclose(float(sp_aux["reconstruction_loss"]),
                               float(ref_aux["reconstruction_loss"]),
                               rtol=2e-4)


def test_sp_fused_decoder_gradients(key):
    """Backward through the fused SP decoder: the group-sweep kernels'
    skipped tiles, the x_out cotangent seeding, and the halo ppermute
    transposes must together equal one-device gradients."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_fused_cfg()
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 1, 512
    x = jax.random.uniform(jax.random.PRNGKey(29), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]
    mesh = time_mesh(2)

    g_ref = jax.grad(
        lambda p: vqvae_forward(p, state, cfg, x, y, train=True)[0])(params)
    g_sp = jax.grad(
        lambda p: time_sharded_loss(p, state, cfg, x, y, mesh,
                                    decoder_halo="fused")[0])(params)
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(g_sp))
    gmax = max(np.abs(np.asarray(v)).max()
               for v in jax.tree_util.tree_leaves(g_ref))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        got = np.asarray(flat_sp[path], np.float64)
        ref = np.asarray(leaf, np.float64)
        # leaves that are ~zero on the GLOBAL gradient scale (bias-into-
        # BN shift cancellation: abs values ~1e-9 vs gmax ~0.5) carry
        # only reduction-order noise
        scale = max(np.abs(ref).max(), 1e-4 * gmax)
        assert np.abs(got - ref).max() / scale < 5e-3, str(path)


def test_sp_fused_multihop_start_offsets(key):
    """4 shards with a group halo (192) LARGER than the shard (64): the
    halo spans multiple neighbors and shards 0/1/2 skip 3/2/1 tiles via
    s_rows = max(halo - idx*T_l, 0) — the generalized start-offset
    formula at its hardest."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import (
        time_sharded_loss, _fused_sp_groups)

    wn = WavenetConfig(
        quantization_channels=64, num_cycles=2, num_cycle_layers=2,
        dilation_rates=[1, 64, 1, 64], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)
    cfg = sp_fused_cfg(wavenet=wn)
    groups, q = _fused_sp_groups(cfg.wavenet, 64, 64)
    assert q == 64 and groups[0][2] == 192   # (K-1)*(1+64) -> 192
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 1, 256                      # 4 shards x 64 samples
    x = jax.random.uniform(jax.random.PRNGKey(31), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    ref_loss, _ = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, _ = time_sharded_loss(params, state, cfg, x, y, time_mesh(4),
                                   decoder_halo="fused")
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-4)


def test_sp_fused_falls_back_when_ineligible(key):
    """A non-lane-multiple config must silently take the layer-halo XLA
    path under decoder_halo='fused' (no assert, same numbers)."""
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
    from vqvae_wavenet_tpu.parallel.timeshard import time_sharded_loss

    cfg = sp_model_cfg()               # tiny 10-channel config
    params, state = init_vqvae(key, cfg, num_speakers=4)
    params = bump_biases(params)
    B, T = 1, 512
    x = jax.random.uniform(jax.random.PRNGKey(37), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    ref_loss, _ = vqvae_forward(params, state, cfg, x, y, train=True)
    sp_loss, _ = time_sharded_loss(params, state, cfg, x, y, time_mesh(2),
                                   decoder_halo="fused")
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)


def test_sp_fused_gc_sigmoid_first(key):
    """The Magenta-family shape of the fused SP decoder: per-layer global
    conditioning (T_gc=1, folded into the kernel's condition buffer) and
    the sigmoid_first gate order, against the single-device XLA stack.
    Covers the path time_sharded_magenta_loss(decoder_halo='fused')
    dispatches (the full 50-layer preset is interpret-prohibitive on CPU;
    hardware runs exercise it compiled)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from vqvae_wavenet_tpu.parallel.timeshard import (
        time_sharded_wavenet_logits_fused, _fused_sp_groups)

    cfg = sp_fused_cfg().wavenet
    params = bump_biases(init_wavenet_params(key, cfg, lc_channels=4,
                                             gc_channels=8))
    B, T, ratio = 1, 512, 64
    x = jax.random.uniform(jax.random.PRNGKey(43), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(44), (B, T // ratio, 4)) * .3
    gc = jax.random.normal(jax.random.PRNGKey(45), (B, 1, 8)) * .3

    ref = np.asarray(wavenet_logits(params, cfg, x, lc, gc,
                                    gate_order="sigmoid_first",
                                    engine="xla"))
    mesh = time_mesh(2)
    groups, q = _fused_sp_groups(cfg, ratio, T // 2)

    def local_fn(p, x_l, lc_l, gc_r):
        return time_sharded_wavenet_logits_fused(
            p, cfg, x_l, lc_l, "time", global_condition=gc_r,
            gate_order="sigmoid_first", groups=groups, tt_cap=q,
            interpret=True)

    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(P(), P(None, "time", None),
                             P(None, "time", None), P()),
                   out_specs=P(None, "time", None), check_rep=False)
    got = np.asarray(fn(params, x, lc, gc))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
