"""Causal conv primitives: causality property, tap-matmul vs conv parity,
init statistics, condition broadcast semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_wavenet_tpu.ops.conv import (
    shift_right, conv1d, causal_conv1d, dilated_conv_taps, add_condition,
    uniform_unit_scaling_init)


def test_shift_right():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 6, 1)
    y = np.asarray(shift_right(x))[0, :, 0]
    np.testing.assert_array_equal(y, [0, 0, 1, 2, 3, 4])


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
@pytest.mark.parametrize("ksize", [2, 3, 32])
def test_causal_conv_causality(key, dilation, ksize):
    """output[t] must be independent of input[> t] (strictly causal conv
    includes input[t]; teacher forcing shifts separately)."""
    B, T, C = 2, 64, 3
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (B, T, C))
    kernel = jax.random.normal(k2, (ksize, C, 5))
    y = causal_conv1d(x, kernel, dilation=dilation)
    assert y.shape == (B, T, 5)
    t = 20
    x2 = x.at[:, t + 1:, :].set(99.0)
    y2 = causal_conv1d(x2, kernel, dilation=dilation)
    np.testing.assert_allclose(np.asarray(y[:, :t + 1]),
                               np.asarray(y2[:, :t + 1]), atol=1e-5)
    # and y[t] DOES depend on x[t]
    x3 = x.at[:, t, :].set(99.0)
    y3 = causal_conv1d(x3, kernel, dilation=dilation)
    assert not np.allclose(np.asarray(y[:, t]), np.asarray(y3[:, t]))


@pytest.mark.parametrize("dilation", [1, 2, 16, 512])
def test_dilated_taps_match_conv(key, dilation):
    """The shifted-matmul formulation (used under the layer scan) must equal
    the XLA dilated causal conv exactly."""
    B, T, C, F, K = 2, 1024, 4, 6, 3
    max_pad = (K - 1) * 512
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (B, T, C))
    kernel = jax.random.normal(k2, (K, C, F))
    bias = jax.random.normal(k3, (F,))
    ref = causal_conv1d(x, kernel, bias, dilation=dilation)
    x_padded = jnp.pad(x, ((0, 0), (max_pad, 0), (0, 0)))
    got = dilated_conv_taps(x_padded, kernel, bias,
                            jnp.int32(dilation), seq_len=T, max_pad=max_pad)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_dilated_taps_traced_dilation(key):
    """dilation as a traced scalar under jit (the lax.scan situation)."""
    B, T, C, F, K = 1, 128, 3, 4, 3
    max_pad = (K - 1) * 16
    x = jax.random.normal(key, (B, T, C))
    kernel = jax.random.normal(key, (K, C, F))

    @jax.jit
    def f(d):
        xp = jnp.pad(x, ((0, 0), (max_pad, 0), (0, 0)))
        return dilated_conv_taps(xp, kernel, None, d, seq_len=T,
                                 max_pad=max_pad)

    for d in [1, 2, 8, 16]:
        ref = causal_conv1d(x, kernel, dilation=d)
        np.testing.assert_allclose(np.asarray(ref),
                                   np.asarray(f(jnp.int32(d))),
                                   rtol=1e-5, atol=1e-5)


def test_stride_conv_same():
    x = jnp.ones((1, 16, 2))
    kernel = jnp.ones((5, 2, 3))
    y = conv1d(x, kernel, stride=2, padding="SAME")
    assert y.shape == (1, 8, 3)


def test_add_condition_broadcast(key):
    """Condition frame s must be added (after 1x1 proj) to net samples
    [s*ratio, (s+1)*ratio) — the reshape-broadcast of wavenet_ops.py:93-101."""
    B, T, C, S, CC = 2, 12, 3, 4, 5
    net = jax.random.normal(key, (B, T, C))
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, S, CC))
    kern = jax.random.normal(jax.random.PRNGKey(2), (CC, C))
    out = add_condition(net, cond, kern)
    proj = np.asarray(cond) @ np.asarray(kern)
    ratio = T // S
    expect = np.asarray(net).copy()
    for s in range(S):
        expect[:, s * ratio:(s + 1) * ratio, :] += proj[:, s:s + 1, :]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)
    # None condition is identity
    assert add_condition(net, None, kern) is net


def test_uniform_unit_scaling_init(key):
    # factor * sqrt(3/input_size) bound; input_size = prod(shape[:-1])
    w = uniform_unit_scaling_init(key, (3, 256, 512), factor=1.0)
    limit = np.sqrt(3.0 / (3 * 256))
    w = np.asarray(w)
    assert w.max() <= limit and w.min() >= -limit
    assert w.max() > 0.8 * limit  # actually fills the range
    w2 = np.asarray(uniform_unit_scaling_init(key, (512, 64), factor=1.7))
    assert abs(w2).max() <= 1.7 * np.sqrt(3.0 / 512)
