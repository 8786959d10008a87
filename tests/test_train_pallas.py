"""Fused Pallas TRAINING residual-stack kernel: forward + gradient parity
with the unrolled XLA path (interpreter mode on CPU; compiled validation
and throughput happen on TPU, PERF.md #21).

The kernel fuses the whole teacher-forced residual stack
(Decoder/WaveNet/wavenet.py:24-100 + wavenet_ops.py:104-138) per time
tile; its custom-VJP backward is matmul-only over saved activations, so
gradient parity against jax.grad of the XLA path is the load-bearing
check here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import init_wavenet_params, \
    wavenet_logits
from vqvae_wavenet_tpu.ops import train_pallas


def tiny_cfg():
    # channel sizes at TPU-lane granularity (the kernel requires 128-mult)
    return WavenetConfig(
        quantization_channels=256, num_cycles=1, num_cycle_layers=4,
        dilation_rates=[1, 2, 4, 8], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)


def make_inputs(cfg, B, T, t_cond, dtype=jnp.float32, seed=0):
    params = init_wavenet_params(jax.random.PRNGKey(seed), cfg,
                                 lc_channels=128)
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(seed + 2),
                           (B, t_cond, 128)) * 0.3
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16), params)
        x, lc = x.astype(jnp.bfloat16), lc.astype(jnp.bfloat16)
    return params, x, lc


def test_eligibility_gate():
    cfg = tiny_cfg()
    ok = train_pallas.fused_stack_eligible(
        cfg, 1, 128, 16, jnp.float32, True, False, False)
    assert ok
    # shipped 30-layer config at the training shape (B=8, len 6656,
    # encoder stride 64) is eligible in bf16; f32 doubles the resident
    # weights (~71 MB) + history arena (~51 MB) past the VMEM plan
    full = WavenetConfig()
    assert train_pallas.fused_stack_eligible(
        full, 8, 6656, 104, jnp.bfloat16, True, False, False)
    assert not train_pallas.fused_stack_eligible(
        full, 8, 6656, 104, jnp.float32, True, False, False)
    # hard gates: global conditioning, pad_mask (SP halos), missing lc,
    # non-lane-multiple channels, too-low condition rate
    assert not train_pallas.fused_stack_eligible(
        cfg, 1, 128, 16, jnp.float32, True, True, False)
    assert not train_pallas.fused_stack_eligible(
        cfg, 1, 128, 16, jnp.float32, True, False, True)
    assert not train_pallas.fused_stack_eligible(
        cfg, 1, 128, 16, jnp.float32, False, False, False)
    bad = WavenetConfig(
        quantization_channels=256, num_cycles=1, num_cycle_layers=4,
        dilation_rates=[1, 2, 4, 8], kernel_size=3, dilation_filters=48,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)
    assert not train_pallas.fused_stack_eligible(
        bad, 1, 128, 16, jnp.float32, True, False, False)
    assert not train_pallas.fused_stack_eligible(
        cfg, 1, 128, 32, jnp.float32, True, False, False)  # FR=4 < 8


@pytest.mark.slow
def test_fused_forward_matches_xla_f32(key):
    cfg = tiny_cfg()
    params, x, lc = make_inputs(cfg, B=1, T=128, t_cond=16)
    ref = np.asarray(wavenet_logits(params, cfg, x, lc, engine="xla"))
    got = np.asarray(wavenet_logits(params, cfg, x, lc, engine="pallas"))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_forward_multitile_deep_history(key):
    """T=1024 -> two 512 tiles, and the d=384 layer's (K-1)*d = 768-row
    history exceeds the tile: exercises the cross-tile history carry,
    the chunked in-arena shift (Hl > Tt), and the o >= Tt tap clip."""
    cfg = WavenetConfig(
        quantization_channels=256, num_cycles=1, num_cycle_layers=4,
        dilation_rates=[1, 2, 4, 384], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)
    params, x, lc = make_inputs(cfg, B=1, T=1024, t_cond=128, seed=3)
    ref = np.asarray(wavenet_logits(params, cfg, x, lc, engine="xla"))
    got = np.asarray(wavenet_logits(params, cfg, x, lc, engine="pallas"))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_gradients_match_xla(key):
    """Full-tree gradient parity: the custom-VJP backward (matmul-only,
    saved activations) against jax.grad through the unrolled XLA stack.
    Covers every layer-param grad (conv taps incl. the o >= T edge,
    skip/res 1x1s + biases, condition projection + conv bias via the
    folded lc_encb) AND the flow back into preprocess/skip_start."""
    cfg = tiny_cfg()
    params, x, lc = make_inputs(cfg, B=2, T=128, t_cond=16, seed=5)
    w = jax.random.normal(jax.random.PRNGKey(9), (256,)) * 0.1

    def loss(p, engine):
        out = wavenet_logits(p, cfg, x, lc, engine=engine)
        return jnp.mean(jnp.tanh(out) * w)

    lr, gr = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    lp_, gp = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
    assert abs(float(lr) - float(lp_)) < 1e-5
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (kr, vr), (kp, vp) in zip(flat_r, flat_p):
        assert kr == kp
        vr, vp = np.asarray(vr, np.float64), np.asarray(vp, np.float64)
        scale = np.abs(vr).max() + 1e-12
        rel = np.abs(vr - vp).max() / scale
        assert rel < 5e-3, (jax.tree_util.keystr(kr), rel)


@pytest.mark.slow
def test_fused_gradients_multitile_ring(key):
    """Gradient parity across MULTIPLE reverse time tiles with a layer
    whose (K-1)*d exceeds the tile: exercises the fused backward's
    cross-tile spill arena in BOTH modes — the small aligned regions
    (d=1,2,4) and the Tt-chunk ring (d=384 -> 6 chunks at Tt=128) — plus
    the tile-boundary dpre/act DMA rotation (PERF.md #22)."""
    cfg = WavenetConfig(
        quantization_channels=256, num_cycles=1, num_cycle_layers=4,
        dilation_rates=[1, 2, 4, 384], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)
    params, x, lc = make_inputs(cfg, B=2, T=1024, t_cond=128, seed=11)
    # the fused BACKWARD and dW kernels must actually be in play for
    # these shapes (otherwise this parity test silently re-validates the
    # XLA fallback)
    assert train_pallas._make_bwd_kernel(
        4, 3, 128, 64, 128, (1, 2, 4, 384), 2, 1024, 8,
        "tanh_first", "f32", True) is not None
    assert train_pallas._make_dk_kernel(
        4, 3, 128, 64, 128, (1, 2, 4, 384), 2, 1024, "f32",
        True) is not None
    w = jax.random.normal(jax.random.PRNGKey(13), (256,)) * 0.1

    def loss(p, engine):
        out = wavenet_logits(p, cfg, x, lc, engine=engine)
        return jnp.mean(jnp.tanh(out) * w)

    lr, gr = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    lp_, gp = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
    assert abs(float(lr) - float(lp_)) < 1e-5
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (kr, vr), (kp, vp) in zip(flat_r, flat_p):
        assert kr == kp
        vr, vp = np.asarray(vr, np.float64), np.asarray(vp, np.float64)
        scale = np.abs(vr).max() + 1e-12
        rel = np.abs(vr - vp).max() / scale
        assert rel < 5e-3, (jax.tree_util.keystr(kr), rel)


def _grad_parity(cfg, params, x, lc, wseed=13):
    w = jax.random.normal(jax.random.PRNGKey(wseed), (256,)) * 0.1

    def loss(p, engine):
        out = wavenet_logits(p, cfg, x, lc, engine=engine)
        return jnp.mean(jnp.tanh(out) * w)

    lr, gr = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    lp_, gp = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
    assert abs(float(lr) - float(lp_)) < 1e-5
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (kr, vr), (kp, vp) in zip(flat_r, flat_p):
        assert kr == kp
        vr, vp = np.asarray(vr, np.float64), np.asarray(vp, np.float64)
        rel = np.abs(vr - vp).max() / (np.abs(vr).max() + 1e-12)
        assert rel < 5e-3, (jax.tree_util.keystr(kr), rel)


def _ring_cfg():
    return WavenetConfig(
        quantization_channels=256, num_cycles=1, num_cycle_layers=4,
        dilation_rates=[1, 2, 4, 384], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)


@pytest.mark.slow
def test_fused_dk_multisweep_boundary(key, monkeypatch):
    """FUSED chain+dW backward (PERF.md #33) split into TWO layer-group
    sweeps: exercises the group-boundary dX HBM stream (first=True top
    sweep without the dxin read, non-first bottom sweep reading it), the
    per-group spill-arena layouts, and the in-kernel dk accumulation
    against the padded-xstack tap DMAs — all vs jax.grad of XLA."""
    monkeypatch.setattr(train_pallas, "_FORCE_FUSED_LG", 2)
    cfg = _ring_cfg()
    params, x, lc = make_inputs(cfg, B=2, T=1024, t_cond=128, seed=17)
    plan = train_pallas._plan_bwd_fused_dk(
        4, 3, 128, 64, 128, (1, 2, 4, 384), 2, 1024, 8, 4, lg_cap=2)
    assert plan is not None and plan["Lg"] == 2 and len(plan["layouts"]) == 2
    _grad_parity(cfg, params, x, lc, wseed=18)


@pytest.mark.slow
def test_fused_dk_gate_precomp(key, monkeypatch):
    """Gate-derivative precompute (Ga/Gb from saved activations ahead of
    the dgated dot, PERF.md #33) re-associates the bf16 elementwise
    products — parity must hold within the same tolerance."""
    monkeypatch.setattr(train_pallas, "_GATE_PRECOMP", True)
    cfg = _ring_cfg()
    params, x, lc = make_inputs(cfg, B=2, T=1024, t_cond=128, seed=19)
    _grad_parity(cfg, params, x, lc, wseed=20)


@pytest.mark.slow
def test_fwd_gate_fold_hook(key, monkeypatch):
    """The forward gate-fold A/B hook (condition add fused into the
    transcendental pass; measured +0.2 ms slower so default-off,
    PERF.md #33) must stay numerically exact — it changes the f32
    summation order to conv-then-condition, which matches XLA."""
    monkeypatch.setattr(train_pallas, "_FWD_GATE_FOLD", True)
    train_pallas._make_fused_stack.cache_clear()
    cfg = tiny_cfg()
    params, x, lc = make_inputs(cfg, B=2, T=128, t_cond=16, seed=23)
    ref = np.asarray(wavenet_logits(params, cfg, x, lc, engine="xla"))
    got = np.asarray(wavenet_logits(params, cfg, x, lc, engine="pallas"))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
    train_pallas._make_fused_stack.cache_clear()


@pytest.mark.slow
def test_two_kernel_backward_fallback(key, monkeypatch):
    """With the fused chain+dW sweeps disabled, the two-kernel path
    (chain streaming dpre to HBM + the separate dW pass over the padded
    xstack) must still be grad-exact — it remains the fallback for
    configs whose group plan doesn't fit."""
    monkeypatch.setattr(train_pallas, "_BWD_FUSED_DK", "off")
    cfg = _ring_cfg()
    params, x, lc = make_inputs(cfg, B=2, T=1024, t_cond=128, seed=21)
    _grad_parity(cfg, params, x, lc, wseed=22)


def test_fused_dk_plan_shipped():
    """Group plans on the real configs: the shipped 30-layer bf16
    training shape splits into 15-layer sweeps at Tt=256 with dsk
    in-kernel; the Magenta 50-layer preset gets 10-layer sweeps (its
    old chain plan only fit dsk at Tt=64, PERF.md #28d)."""
    cfg = WavenetConfig()
    plan = train_pallas._plan_bwd_fused_dk(
        cfg.num_layers, cfg.kernel_size, cfg.residual_filters,
        cfg.dilation_filters, cfg.skip_filters,
        tuple(cfg.dilation_rates), 8, 6656, 64, 2)
    assert plan is not None
    assert (plan["Tt"], plan["Lg"], plan["dsk_in"]) == (256, 15, True)
    from vqvae_wavenet_tpu.models.magenta import magenta_wavenet_config
    m = magenta_wavenet_config()
    pm = train_pallas._plan_bwd_fused_dk(
        m.num_layers, m.kernel_size, m.residual_filters,
        m.dilation_filters, m.skip_filters, tuple(m.dilation_rates),
        8, 6144, 64, 2)
    assert pm is not None and pm["dsk_in"]


@pytest.mark.slow
def test_fused_gradients_foldable_gc(key):
    """Per-layer global conditioning with T_gc == 1 (the Magenta add_gc
    form incl. its bias-init-1.0 quirk, Magenta/config.py:178-192) folds
    into the kernel's precomputed condition buffer; gc_kernel/gc_bias
    grads flow through autodiff of the fold.  sigmoid_first exercises
    the Magenta gate order end to end."""
    cfg = tiny_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(31), cfg,
                                 lc_channels=128, gc_channels=16)
    params["layers"]["gc_bias"] = jnp.ones(
        (cfg.num_layers, 2 * cfg.dilation_filters))
    x = jax.random.uniform(jax.random.PRNGKey(32), (2, 128, 1),
                           minval=-0.9, maxval=0.9)
    lc = jax.random.normal(jax.random.PRNGKey(33), (2, 16, 128)) * 0.3
    gc = jax.random.normal(jax.random.PRNGKey(34), (2, 1, 16)) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(35), (256,)) * 0.1

    def loss(p, engine):
        out = wavenet_logits(p, cfg, x, lc, gc, engine=engine,
                             gate_order="sigmoid_first")
        return jnp.mean(jnp.tanh(out) * w)

    lr, gr = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    lp_, gp = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
    assert abs(float(lr) - float(lp_)) < 1e-5
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (kr, vr), (kp, vp) in zip(flat_r, flat_p):
        assert kr == kp
        vr, vp = np.asarray(vr, np.float64), np.asarray(vp, np.float64)
        rel = np.abs(vr - vp).max() / (np.abs(vr).max() + 1e-12)
        assert rel < 5e-3, (jax.tree_util.keystr(kr), rel)


@pytest.mark.slow
def test_fused_gradients_dsk_outside(key, monkeypatch):
    """Gradient parity when the chain kernel's dsk accumulator does NOT
    fit VMEM (the Magenta-50 path): dsk becomes one batched einsum over
    the saved activations, everything else stays in-kernel."""
    cfg = tiny_cfg()
    params, x, lc = make_inputs(cfg, B=2, T=128, t_cond=16, seed=21)
    # _FORCE_DSK_OUT is read at trace time and passed into the cached
    # kernel builders explicitly (it participates in their lru_cache
    # keys), so flipping it needs no cache_clear
    monkeypatch.setattr(train_pallas, "_FORCE_DSK_OUT", True)
    assert not train_pallas._plan_bwd(
        4, 3, 128, 64, 128, (1, 2, 4, 8), 2, 128, 8, 4,
        dsk_forced_out=True)["dsk_in"]
    w = jax.random.normal(jax.random.PRNGKey(23), (256,)) * 0.1

    def loss(p, engine):
        out = wavenet_logits(p, cfg, x, lc, engine=engine)
        return jnp.mean(jnp.tanh(out) * w)

    lr, gr = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    lp_, gp = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
    assert abs(float(lr) - float(lp_)) < 1e-5
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (kr, vr), (kp, vp) in zip(flat_r, flat_p):
        vr, vp = np.asarray(vr, np.float64), np.asarray(vp, np.float64)
        rel = np.abs(vr - vp).max() / (np.abs(vr).max() + 1e-12)
        assert rel < 5e-3, (jax.tree_util.keystr(kr), rel)


@pytest.mark.slow
def test_fused_bf16_close_to_f32_reference(key):
    """bf16 through the kernel tracks the f32 XLA reference about as
    closely as the bf16 XLA path does (same tolerance class as the
    mixed-precision parity test in test_training.py)."""
    cfg = tiny_cfg()
    params, x, lc = make_inputs(cfg, B=1, T=128, t_cond=16, seed=7)
    ref = np.asarray(wavenet_logits(params, cfg, x, lc, engine="xla"),
                     np.float32)
    p16, x16, lc16 = make_inputs(cfg, B=1, T=128, t_cond=16,
                                 dtype=jnp.bfloat16, seed=7)
    got = np.asarray(wavenet_logits(p16, cfg, x16, lc16, engine="pallas"),
                     np.float32)
    xla16 = np.asarray(wavenet_logits(p16, cfg, x16, lc16, engine="xla"),
                       np.float32)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.05
    # kernel bf16 is no further from f32 truth than XLA bf16 (2x slack
    # for summation-order luck)
    assert np.abs(got - ref).max() <= 2 * np.abs(xla16 - ref).max() + 1e-3


HW_GRAD_PARITY_SCRIPT = r"""
import jax
if jax.default_backend() not in ("tpu", "axon") and not any(
        d.platform == "tpu" for d in jax.devices()):
    print("SKIP")
    raise SystemExit(0)
import jax.numpy as jnp, numpy as np
import sys, os
sys.path.insert(0, os.getcwd())
from vqvae_wavenet_tpu.config import WavenetConfig
from vqvae_wavenet_tpu.models.wavenet import wavenet_logits, \
    init_wavenet_params
cfg = WavenetConfig(
    quantization_channels=256, num_cycles=1, num_cycle_layers=4,
    dilation_rates=[1, 2, 4, 384], kernel_size=3, dilation_filters=64,
    skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
    preprocess_filters=128)
params = init_wavenet_params(jax.random.PRNGKey(11), cfg, lc_channels=128)
x = jax.random.uniform(jax.random.PRNGKey(12), (2, 1024, 1),
                       minval=-0.9, maxval=0.9)
lc = jax.random.normal(jax.random.PRNGKey(13), (2, 128, 128)) * 0.3
w = jax.random.normal(jax.random.PRNGKey(14), (256,)) * 0.1
def loss(p, engine):
    out = wavenet_logits(p, cfg, x, lc, engine=engine)
    return jnp.mean(jnp.tanh(out) * w)
lr, gr = jax.jit(jax.value_and_grad(lambda p: loss(p, "xla")))(params)
lp, gp = jax.jit(jax.value_and_grad(lambda p: loss(p, "pallas")))(params)
assert abs(float(lr) - float(lp)) < 1e-5, (float(lr), float(lp))
for (kx, vx), (_, vp) in zip(jax.tree_util.tree_flatten_with_path(gr)[0],
                             jax.tree_util.tree_flatten_with_path(gp)[0]):
    vx = np.asarray(vx, np.float64); vp = np.asarray(vp, np.float64)
    rel = np.abs(vx - vp).max() / (np.abs(vx).max() + 1e-12)
    assert rel < 5e-3, (jax.tree_util.keystr(kx), rel)
print("OK")
"""


@pytest.mark.slow
def test_hw_gradients_match_xla_compiled():
    """COMPILED (Mosaic) gradient parity on real TPU hardware for the
    full fused training path — forward, backward chain (ring + small
    spill arenas), and dW kernels — against jax.grad of the XLA stack.
    The interpreter tests above validate semantics; this one validates
    what Mosaic actually compiles (DMA ordering, arena aliasing,
    alignment).  Skips when no TPU is attached (same subprocess pattern
    as the generation chi-square test)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    out = subprocess.run(
        [sys.executable, "-c", HW_GRAD_PARITY_SCRIPT],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    if "SKIP" in out.stdout:
        pytest.skip("no TPU backend available")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout, out.stdout


def test_engine_dispatch(key, monkeypatch):
    """engine='auto' off-TPU keeps the XLA path (the kernel is TPU-only
    by default); engine='pallas' forces the fused stack; engine='xla'
    never consults eligibility."""
    cfg = tiny_cfg()
    params, x, lc = make_inputs(cfg, B=1, T=128, t_cond=16)
    calls = []
    real = train_pallas.fused_residual_stack

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(train_pallas, "fused_residual_stack", spy)
    wavenet_logits(params, cfg, x, lc, engine="auto")
    assert not calls            # CPU backend -> XLA path
    wavenet_logits(params, cfg, x, lc, engine="pallas")
    assert calls


# ---------------- SP start-offset + layer-group chain (round 5) ----------


def _frs(params, cfg, x0, lc, **kw):
    from vqvae_wavenet_tpu.ops.train_pallas import fused_residual_stack
    return fused_residual_stack(params["layers"], cfg, x0, lc,
                                interpret=True, **kw)


def _stack_inputs(cfg, B, T, t_cond, seed=21):
    params, x, lc = make_inputs(cfg, B=B, T=T, t_cond=t_cond, seed=seed)
    x0 = jax.random.normal(jax.random.PRNGKey(seed + 7), (B, T, 128)) * 0.2
    return params, x0, lc


@pytest.mark.slow
def test_fused_start_rows_skips_prefix(key):
    """with_start semantics: skipping the first h rows must equal running
    the plain stack on the suffix alone — the zeroed history arena at the
    first processed tile IS the causal zero pad of a sequence start
    (wavenet_ops.py:81-87).  This is the SP shard-0 contract
    (parallel/timeshard.py, decoder_halo='fused')."""
    cfg = tiny_cfg()
    B, T, FR = 1, 192, 8        # T = 3 x 64 forces the Tt=64 plan
    h, hf = 64, 8
    params, x0, lc = _stack_inputs(cfg, B, T, T // FR)

    got = _frs(params, cfg, x0, lc, start_rows=jnp.asarray(float(h)))
    ref = _frs(params, cfg, x0[:, h:], lc[:, hf:])
    np.testing.assert_allclose(np.asarray(got[:, h:]), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_start_rows_gradients(key):
    """Backward with a start offset: weight/x0/lc grads of the kept rows
    must equal the plain suffix stack's grads, and the skipped-region x0
    cotangent must be EXACTLY zero (the sweep kernel zeroes skipped dxout
    tiles; garbage there would ship NaNs through the SP halo transpose)."""
    cfg = tiny_cfg()
    B, T, FR = 1, 192, 8
    h, hf = 64, 8
    params, x0, lc = _stack_inputs(cfg, B, T, T // FR, seed=31)
    w = jax.random.normal(jax.random.PRNGKey(9), (128,)) * 0.1

    def loss_start(p, x0, lc):
        out = _frs(p, cfg, x0, lc, start_rows=jnp.asarray(float(h)))
        return jnp.mean(jnp.tanh(out[:, h:]) * w)

    def loss_suffix(p, x0s, lcs):
        return jnp.mean(jnp.tanh(_frs(p, cfg, x0s, lcs)) * w)

    ls, grads = jax.value_and_grad(loss_start, argnums=(0, 1, 2))(
        params, x0, lc)
    gs, gx, glc = grads
    lr, ref = jax.value_and_grad(loss_suffix, argnums=(0, 1, 2))(
        params, x0[:, h:], lc[:, hf:])
    gr, gxr, glcr = ref
    assert abs(float(ls) - float(lr)) < 1e-6
    flat_s = jax.tree_util.tree_flatten_with_path(gs["layers"])[0]
    flat_r = dict(jax.tree_util.tree_flatten_with_path(gr["layers"])[0])
    for kp, vs in flat_s:
        vr = np.asarray(flat_r[kp], np.float64)
        vs = np.asarray(vs, np.float64)
        scale = np.abs(vr).max() + 1e-12
        assert np.abs(vr - vs).max() / scale < 5e-3, \
            jax.tree_util.keystr(kp)
    np.testing.assert_allclose(np.asarray(gx[:, h:]), np.asarray(gxr),
                               atol=2e-5, rtol=1e-4)
    assert np.all(np.asarray(gx[:, :h]) == 0.0)
    np.testing.assert_allclose(np.asarray(glc[:, hf:]), np.asarray(glcr),
                               atol=2e-5, rtol=1e-4)
    assert np.all(np.asarray(glc[:, :hf]) == 0.0)


@pytest.mark.slow
def test_fused_layer_group_chain_matches_full(key):
    """layer_range + with_xout: running the stack as two chained groups
    (skip sums added, the first group's x_out feeding the second) must
    equal the whole-stack call — values AND the full gradient tree
    (the x_out cotangent seeds the top sweep's dX chain)."""
    cfg = tiny_cfg()
    B, T, FR = 1, 192, 8
    params, x0, lc = _stack_inputs(cfg, B, T, T // FR, seed=41)
    w = jax.random.normal(jax.random.PRNGKey(11), (128,)) * 0.1

    def loss_full(p, x0, lc):
        return jnp.mean(jnp.tanh(_frs(p, cfg, x0, lc)) * w)

    def loss_groups(p, x0, lc):
        s1, xo = _frs(p, cfg, x0, lc, layer_range=(0, 2), with_xout=True)
        s2 = _frs(p, cfg, xo, lc, layer_range=(2, 4))
        return jnp.mean(jnp.tanh(s1 + s2) * w)

    lf, gf = jax.value_and_grad(loss_full)(params, x0, lc)
    lg, gg = jax.value_and_grad(loss_groups)(params, x0, lc)
    assert abs(float(lf) - float(lg)) < 1e-6
    flat_f = jax.tree_util.tree_flatten_with_path(gf["layers"])[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(gg["layers"])[0])
    for kp, vf in flat_f:
        vg = np.asarray(flat_g[kp], np.float64)
        vf = np.asarray(vf, np.float64)
        scale = np.abs(vf).max() + 1e-12
        assert np.abs(vf - vg).max() / scale < 5e-3, \
            jax.tree_util.keystr(kp)


@pytest.mark.slow
def test_fused_start_rows_with_groups(key):
    """start_rows composed with the group chain — the exact SP shard-0
    shape: both groups skip the same halo tiles and the kept rows equal
    the plain suffix group chain."""
    cfg = tiny_cfg()
    B, T, FR = 1, 192, 8
    h, hf = 64, 8
    params, x0, lc = _stack_inputs(cfg, B, T, T // FR, seed=51)
    s = jnp.asarray(float(h))

    s1, xo = _frs(params, cfg, x0, lc, layer_range=(0, 2), with_xout=True,
                  start_rows=s)
    s2 = _frs(params, cfg, xo, lc, layer_range=(2, 4), start_rows=s)
    got = (s1 + s2)[:, h:]
    r1, xor_ = _frs(params, cfg, x0[:, h:], lc[:, hf:], layer_range=(0, 2),
                    with_xout=True)
    r2 = _frs(params, cfg, xor_, lc[:, hf:], layer_range=(2, 4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(r1 + r2),
                               atol=2e-4, rtol=1e-4)


# ---------------- fused epilogue (round 5) -------------------------------


@pytest.mark.slow
def test_fused_epilogue_matches_xla(key):
    """fused_epilogue == relu -> 1x1(+cond) -> relu -> 1x1 -> mean CE
    (wavenet.py:286-301 + wavenet_loss), values AND grads w.r.t. the
    head params, the skip stream, and the condition."""
    from vqvae_wavenet_tpu.ops.conv import add_condition
    from vqvae_wavenet_tpu.models.wavenet import wavenet_loss

    cfg = tiny_cfg()
    S, Q, B, T, C = 128, 256, 1, 192, 128
    params, _, lc = make_inputs(cfg, B=B, T=T, t_cond=T // 8,
                                dtype=jnp.bfloat16, seed=61)
    pp1 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                 params["postprocess1"])
    pp2 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                 params["postprocess2"])
    skip = jax.random.normal(jax.random.PRNGKey(62), (B, T, S)) * 0.5
    labels = jax.random.randint(jax.random.PRNGKey(63), (B, T), 0, Q)

    def xla_ref(pp1, pp2, skip, lc):
        net = jax.nn.relu(skip).astype(jnp.bfloat16)
        net = jnp.einsum("btc,cf->btf", net, pp1["kernel"][0],
                         preferred_element_type=jnp.float32) + pp1["bias"]
        net = add_condition(net, lc, pp1["lc_kernel"])
        net = jax.nn.relu(net).astype(jnp.bfloat16)
        net = jnp.einsum("btc,cf->btf", net, pp2["kernel"][0],
                         preferred_element_type=jnp.float32) + pp2["bias"]
        return wavenet_loss(net.reshape(-1, Q), labels.reshape(-1))

    def fe(pp1, pp2, skip, lc):
        return train_pallas.fused_epilogue(pp1, pp2, skip, lc, None,
                                           labels, interpret=True)

    lr, gr = jax.value_and_grad(xla_ref, argnums=(0, 1, 2, 3))(
        pp1, pp2, skip, lc)
    lf, gf = jax.value_and_grad(fe, argnums=(0, 1, 2, 3))(
        pp1, pp2, skip, lc)
    assert abs(float(lr) - float(lf)) < 2e-5, (float(lr), float(lf))
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(gf)[0])
    for kp, vr in flat_r:
        vf = np.asarray(flat_f[kp], np.float64)
        vr = np.asarray(vr, np.float64)
        scale = np.abs(vr).max() + 1e-9
        # 2e-2: the kernel saves the softmax probabilities bf16 (the same
        # class of saved-activation rounding as the main fused stack's
        # bf16 gate activations), while the XLA reference's dlogits stay
        # f32 — the value parity above pins the forward to 2e-5
        assert np.abs(vr - vf).max() / scale < 2e-2, \
            (jax.tree_util.keystr(kp), np.abs(vr - vf).max() / scale)


@pytest.mark.slow
def test_fused_epilogue_in_vqvae_forward(key):
    """The vqvae_forward bf16 path with the fused epilogue engaged
    (engine='pallas', interpret) must match _EPILOGUE='off' — same loss,
    same full gradient tree (covers the lc/speaker-concat cotangent
    split and the head-param grads through the fold)."""
    import dataclasses
    from vqvae_wavenet_tpu.config import ModelConfig
    from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward

    wn = WavenetConfig(
        quantization_channels=256, num_cycles=1, num_cycle_layers=4,
        dilation_rates=[1, 2, 4, 8], kernel_size=3, dilation_filters=64,
        skip_filters=128, residual_filters=128, preprocess_kernel_size=8,
        preprocess_filters=128)
    cfg = ModelConfig(encoder="64", use_vq=True, speaker_embedding=8,
                      k=8, latent_dim=120, beta=0.25, wavenet=wn,
                      learning_rate_schedule={0: 1e-3},
                      train_dtype="bf16", train_engine="pallas")
    params, state = init_vqvae(key, cfg, num_speakers=4)
    B, T = 1, 192
    x = jax.random.uniform(jax.random.PRNGKey(71), (B, T, 1),
                           minval=-0.9, maxval=0.9)
    y = jax.nn.one_hot(jnp.arange(B) % 4, 4)[:, None, :]

    def run(p):
        return vqvae_forward(p, state, cfg, x, y, train=True)[0]

    import vqvae_wavenet_tpu.ops.train_pallas as tp
    assert tp._EPILOGUE == "auto"
    l_fe, g_fe = jax.value_and_grad(run)(params)
    tp._EPILOGUE = "off"
    try:
        l_ref, g_ref = jax.value_and_grad(run)(params)
    finally:
        tp._EPILOGUE = "auto"
    assert abs(float(l_fe) - float(l_ref)) < 2e-5
    flat_fe = dict(jax.tree_util.tree_leaves_with_path(g_fe))
    import optax
    gn = float(optax.global_norm(g_ref))
    # the same gate as test_sp_bf16_loss_and_grads_match_single: the
    # epilogue's dskip is bf16 (saved-probs rounding) and seeds the whole
    # stack backward, so deltas are single bf16 ulps; bias-into-norm
    # leaves are cancellation-dominated and gated on the GLOBAL L2 scale
    for path, ref in jax.tree_util.tree_leaves_with_path(g_ref):
        got = np.asarray(flat_fe[path], np.float64)
        ref = np.asarray(ref, np.float64)
        nd = np.linalg.norm(got - ref)
        rel = nd / (np.linalg.norm(ref) + 1e-12)
        assert rel < 2e-2 or nd < 1e-3 * gn, \
            f"{path}: rel L2 {rel}, abs {nd} vs global {gn}"


HW_EPILOGUE_PARITY_SCRIPT = r"""
import jax
if jax.default_backend() not in ("tpu", "axon") and not any(
        d.platform == "tpu" for d in jax.devices()):
    print("SKIP")
    raise SystemExit(0)
import dataclasses, sys, os
import jax.numpy as jnp, numpy as np
sys.path.insert(0, os.getcwd())
from vqvae_wavenet_tpu.config import ModelConfig
import vqvae_wavenet_tpu.ops.train_pallas as tp
from vqvae_wavenet_tpu.models.vqvae import init_vqvae, vqvae_forward
import optax
mcfg = dataclasses.replace(ModelConfig(), train_dtype="bf16")
params, state = init_vqvae(jax.random.PRNGKey(0), mcfg, num_speakers=109)
B, T = 8, 6656
x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1),
                       minval=-0.9, maxval=0.9)
y = jax.nn.one_hot(jnp.arange(B) % 109, 109)[:, None, :]
def run(p):
    return vqvae_forward(p, state, mcfg, x, y, train=True)[0]
assert tp._EPILOGUE == "auto"
l_on, g_on = jax.jit(jax.value_and_grad(run))(params)
tp._EPILOGUE = "off"
l_off, g_off = jax.jit(jax.value_and_grad(run))(params)
tp._EPILOGUE = "auto"
assert abs(float(l_on) - float(l_off)) < 5e-4, (float(l_on), float(l_off))
gn = float(optax.global_norm(g_off))
flat_on = dict(jax.tree_util.tree_leaves_with_path(g_on))
for path, ref in jax.tree_util.tree_leaves_with_path(g_off):
    got = np.asarray(flat_on[path], np.float64)
    ref = np.asarray(ref, np.float64)
    nd = np.linalg.norm(got - ref)
    rel = nd / (np.linalg.norm(ref) + 1e-12)
    # bf16-saved-probs rounding seeds dskip; cancellation-dominated
    # bias-into-norm leaves (norms ~1% of global) amplify it — gate on
    # the GLOBAL scale (measured worst: 7e-2 rel on a leaf at 1.5% of
    # global norm; loss parity is 1e-5 relative)
    assert rel < 1e-1 or nd < 2e-3 * gn, (str(path), rel, nd, gn)
print("OK")
"""


@pytest.mark.slow
def test_hw_fused_epilogue_parity_compiled():
    """COMPILED (Mosaic) parity of the fused postprocess+CE epilogue on
    real TPU at the SHIPPED config — the interpret tests validate
    semantics; this validates the compiled layout choices (int32 one-hot
    compare, scalar CE reductions, lane0 accumulator).  Skips without a
    TPU."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    out = subprocess.run(
        [sys.executable, "-c", HW_EPILOGUE_PARITY_SCRIPT],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    if "SKIP" in out.stdout:
        pytest.skip("no TPU backend available")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout, out.stdout
