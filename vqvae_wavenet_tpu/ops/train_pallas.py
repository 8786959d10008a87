"""Pallas TPU kernel: the WaveNet TRAINING residual stack, fused.

The teacher-forced stack (Decoder/WaveNet/wavenet.py:24-100 +
wavenet_ops.py:104-138 in the reference) is, per layer, a serial chain
  dilated conv -> +bias/+condition -> tanh*sigmoid gate -> skip/res 1x1s
that XLA compiles into one fusion PER OP, streaming the [B, T, 2D]
activations through HBM between them (~20 ms forward at B=8 x 6656 vs a
~10 ms pure-MXU floor, PERF.md #18).  This kernel runs the WHOLE
30-layer stack for one TIME TILE without leaving VMEM:

  * grid = time tiles (sequential); per layer, a VMEM "history" arena
    carries the last (K-1)*d rows of that layer's input across tiles, so
    every dilated-conv tap is a contiguous slice — the conv becomes <=2
    [B*Tt, R] x [R, 2D] MXU dots per tap with f32 accumulation, exactly
    conv1d_v2's CAUSAL zero-pad semantics (wavenet_ops.py:59-90: the
    arena starts zeroed);
  * all layer weights stay RESIDENT in VMEM (~36 MB bf16 for the shipped
    config): zero per-tile HBM weight traffic;
  * the per-layer condition+bias add rides the same VMEM pre-activation
    buffer (add_condition reshape-broadcast semantics,
    wavenet_ops.py:93-101), frames looped statically;
  * the skip connection accumulates in an f32 VMEM buffer across all
    layers (one output write per tile) — the in-kernel equivalent of the
    deferred-skip contraction (models/wavenet.py, PERF.md #15);
  * the backward pass is MATMUL-ONLY: the kernel saves each layer's
    gate activations (tanh(a), sigmoid(b)) and layer inputs to HBM via
    double-buffered async DMA overlapped with compute; the custom-VJP
    backward then needs no convolutions and no transcendentals.

`fused_residual_stack` is the public entry; `wavenet_logits`
(models/wavenet.py) dispatches here for eligible configs under
`train_engine` in {'auto', 'pallas'}.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae_wavenet_tpu.ops.conv import conv1d


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# resident weights + history arena + tile buffers must fit under this
# (v5e VMEM is ~128 MB/core; leave headroom for Mosaic's own buffers)
_TRAIN_VMEM_BUDGET_MB = 100.0


def _plan(L, K, R, D, S, dils, B, T, FR, itemsize, Ft_cap=64):
    """Choose the time-tile size and lay out the history arena.

    Returns None if no tile size fits the VMEM budget / divisibility
    constraints.  hist region r for layer l holds the last (K-1)*d_l
    rows of that layer's input; regions are 16-row aligned (bf16 sublane
    tile) so every slice below is at a static, aligned-enough offset.
    """
    D2 = 2 * D
    hist_offs, off = [], 0
    for d in dils:
        hist_offs.append(off)
        off += _round_up((K - 1) * d, 16)
    HIST = max(off, 16)

    resident = (L * K * R * D2 + L * D * S + L * D * R) * itemsize \
        + L * R * 4 + B * HIST * R * itemsize
    for Tt in (512, 256, 128, 64):
        if T % Tt or Tt % FR:
            continue
        Ft = Tt // FR
        tile = (2 * B * Tt * R * itemsize        # x ping/pong
                + B * Tt * D2 * 4                # pre (f32)
                + B * Tt * S * 4                 # skip accumulator (f32)
                + 2 * B * Tt * D2 * itemsize     # act DMA slots
                + 2 * B * Tt * R * itemsize      # x0 input pipeline
                + 2 * L * B * Ft * D2 * 4        # lc_enc input pipeline
                + 2 * B * Tt * S * itemsize)     # skip output pipeline
        if resident + tile <= _TRAIN_VMEM_BUDGET_MB * 2 ** 20:
            return {"Tt": Tt, "n_tiles": T // Tt, "Ft": Ft,
                    "hist_offs": tuple(hist_offs), "HIST": HIST}
    return None


def fused_stack_eligible(cfg, B, T, t_cond, compute_dtype, has_lc, has_gc,
                         has_pad_mask) -> bool:
    """Static gate for the fused training kernel (mirrors
    generation/fast.py::_pallas_eligible's role for the training side)."""
    if has_gc or not has_lc or has_pad_mask:
        return False
    if compute_dtype not in (jnp.bfloat16, jnp.float32):
        return False
    K, R, D, S = (cfg.kernel_size, cfg.residual_filters,
                  cfg.dilation_filters, cfg.skip_filters)
    if R % 128 or (2 * D) % 128 or S % 128 or K < 2 or cfg.num_layers < 2:
        return False
    if T % t_cond:
        return False
    FR = T // t_cond
    if FR < 8:
        return False
    itemsize = 2 if compute_dtype == jnp.bfloat16 else 4
    return _plan(cfg.num_layers, K, R, D, S, tuple(cfg.dilation_rates),
                 B, T, FR, itemsize) is not None


@functools.lru_cache(maxsize=16)
def _make_fused_stack(L, K, R, D, S, dils, B, T, FR, gate_order,
                      cdtype_name, interpret):
    """Build the custom-VJP fused stack for one static configuration.

    Primal signature (shapes; dtypes follow the caller's params):
      kernel  [L, K, R, 2D]   dilated-conv taps
      skipw   [L, D, S]       skip 1x1
      resw    [L, D, R]       residual 1x1
      res_b   [L, R]          residual bias
      lc_encb [L, F, B, 2D]   f32 per-layer condition + conv bias,
                              precomputed (wavenet_ops.py:93-101 constant
                              fold: enc + bias never changes within a step)
      x0      [B, T, R]       residual-stream input (post preprocess conv)
    Returns skip_sum [B, T, S] (compute dtype): sum over layers of
    gated @ skipw (skip BIASES are summed outside — they are
    position-independent constants, models/wavenet.py fused-skip path).
    """
    cdtype = jnp.bfloat16 if cdtype_name == "bf16" else jnp.float32
    itemsize = 2 if cdtype == jnp.bfloat16 else 4
    D2 = 2 * D
    plan = _plan(L, K, R, D, S, dils, B, T, FR, itemsize)
    assert plan is not None, "caller must check fused_stack_eligible first"
    Tt, n_tiles, Ft = plan["Tt"], plan["n_tiles"], plan["Ft"]
    hist_offs, HIST = plan["hist_offs"], plan["HIST"]
    F = T // FR
    tanh_first = gate_order == "tanh_first"

    def kernel_body(tapw, skipw, resw, res_b, lc_ref, x0_ref,
                    skip_out, act_out, xst_out,
                    hist, xa, xb, pre, skipacc, actsl, actsem, xsem):
        i = pl.program_id(0)
        t0 = i * Tt

        @pl.when(i == 0)
        def _zero_hist():
            hist[...] = jnp.zeros_like(hist)

        def m2(v, ch):
            return v.reshape(B * v.shape[1], ch)

        bufs = (xa, xb)
        last_act = {}   # slot -> last layer whose act DMA is unretired

        def act_dma(slot, l):
            return pltpu.make_async_copy(
                actsl.at[slot],
                act_out.at[l, :, pl.ds(t0, Tt), :],
                actsem.at[slot])

        def x_dma(buf_idx, j):
            return pltpu.make_async_copy(
                bufs[buf_idx],
                xst_out.at[j, :, pl.ds(t0, Tt), :],
                xsem.at[buf_idx])

        xcur_ref = x0_ref
        for l in range(L):
            d = dils[l]
            Hl = (K - 1) * d
            roff = hist_offs[l]

            # ---- dilated conv: K taps, each <=2 contiguous-slice dots
            # (tap j sees x[t - (K-1-j)*d], ops/conv.py::dilated_conv_taps)
            acc = jnp.dot(m2(xcur_ref[:, :, :], R), tapw[l, (K - 1) * R:K * R, :],
                          preferred_element_type=jnp.float32)
            pre[...] = acc.reshape(B, Tt, D2)
            # condition + bias, broadcast per FR-sample frame
            for f in range(Ft):
                pre[:, f * FR:(f + 1) * FR, :] = (
                    pre[:, f * FR:(f + 1) * FR, :]
                    + lc_ref[l, f, :, :][:, None, :])
            for j in range(K - 1):
                o = (K - 1 - j) * d
                w = tapw[l, j * R:(j + 1) * R, :]
                m_h = min(o, Tt)
                hseg = hist[:, roff + Hl - o: roff + Hl - o + m_h, :]
                hout = jnp.dot(m2(hseg, R), w,
                               preferred_element_type=jnp.float32)
                pre[:, 0:m_h, :] = pre[:, 0:m_h, :] \
                    + hout.reshape(B, m_h, D2)
                if o < Tt:
                    tseg = xcur_ref[:, 0:Tt - o, :]
                    tout = jnp.dot(m2(tseg, R), w,
                                   preferred_element_type=jnp.float32)
                    pre[:, o:Tt, :] = pre[:, o:Tt, :] \
                        + tout.reshape(B, Tt - o, D2)

            # ---- history update: keep the last Hl rows of (hist || tile)
            if Hl <= Tt:
                hist[:, roff:roff + Hl, :] = xcur_ref[:, Tt - Hl:Tt, :]
            else:
                nshift = Hl - Tt
                c0 = 0
                while c0 < nshift:           # ordered chunks: each reads
                    ch = min(Tt, nshift - c0)  # ahead of the next write
                    hist[:, roff + c0:roff + c0 + ch, :] = \
                        hist[:, roff + c0 + Tt:roff + c0 + Tt + ch, :]
                    c0 += ch
                hist[:, roff + nshift:roff + Hl, :] = xcur_ref[:, :, :]

            # ---- gate (wavenet_ops.py:112-113 / Magenta config.py:345-348)
            a = pre[:, :, :D]
            b = pre[:, :, D:]
            if tanh_first:
                f16 = jnp.tanh(a).astype(cdtype)
                g16 = jax.nn.sigmoid(b).astype(cdtype)
            else:
                f16 = jax.nn.sigmoid(a).astype(cdtype)
                g16 = jnp.tanh(b).astype(cdtype)
            slot = l % 2
            if l >= 2:
                act_dma(slot, l - 2).wait()
            actsl[slot, :, :, :D] = f16
            actsl[slot, :, :, D:] = g16
            act_dma(slot, l).start()
            last_act[slot] = (slot, l)
            gated = f16 * g16

            # ---- skip accumulation (f32 across all layers)
            sk = jnp.dot(m2(gated, D), skipw[l],
                         preferred_element_type=jnp.float32)
            if l == 0:
                skipacc[...] = sk.reshape(B, Tt, S)
            else:
                skipacc[...] = skipacc[...] + sk.reshape(B, Tt, S)

            # ---- residual
            rs = jnp.dot(m2(gated, D), resw[l],
                         preferred_element_type=jnp.float32)
            buf_idx = l % 2
            if l >= 2:
                x_dma(buf_idx, l - 2).wait()
            out_buf = bufs[buf_idx]
            out_buf[...] = (xcur_ref[:, :, :].astype(jnp.float32)
                            + rs.reshape(B, Tt, R)
                            + res_b[l][None, None, :]).astype(cdtype)
            if l <= L - 2:
                x_dma(buf_idx, l).start()
            xcur_ref = out_buf

        skip_out[...] = skipacc[...].astype(cdtype)
        # retire every DMA still in flight before the tile ends: act DMAs
        # for layers <= L-3 and x DMAs for j <= L-3 were waited at slot
        # reuse inside the loop, so exactly these remain
        for slot, l in last_act.values():
            act_dma(slot, l).wait()
        x_dma((L - 2) % 2, L - 2).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # tapw
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # skipw
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # resw
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # res_b
            # frame axis third-from-last: Mosaic requires the last two
            # block dims be 8/128-divisible or whole
            pl.BlockSpec((L, Ft, B, D2), lambda i: (0, i, 0, 0)),  # lc_encb
            pl.BlockSpec((B, Tt, R), lambda i: (0, i, 0)),         # x0
        ],
        out_specs=(
            pl.BlockSpec((B, Tt, S), lambda i: (0, i, 0)),         # skip_sum
            pl.BlockSpec(memory_space=pltpu.ANY),                  # act
            pl.BlockSpec(memory_space=pltpu.ANY),                  # xstack
        ),
        scratch_shapes=[
            pltpu.VMEM((B, HIST, R), cdtype),       # hist arena
            pltpu.VMEM((B, Tt, R), cdtype),         # x ping
            pltpu.VMEM((B, Tt, R), cdtype),         # x pong
            pltpu.VMEM((B, Tt, D2), jnp.float32),   # pre
            pltpu.VMEM((B, Tt, S), jnp.float32),    # skip accumulator
            pltpu.VMEM((2, B, Tt, D2), cdtype),     # act DMA slots
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def _fwd_call(kernel, skipw, resw, res_b, lc_encb, x0):
        tapw16 = kernel.reshape(L, K * R, D2).astype(cdtype)
        skipw16 = skipw.astype(cdtype)
        resw16 = resw.astype(cdtype)
        res_b32 = res_b.astype(jnp.float32)
        lc32 = lc_encb.astype(jnp.float32)
        x016 = x0.astype(cdtype)
        skip_sum, act, xstack = pl.pallas_call(
            kernel_body,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((B, T, S), cdtype),
                jax.ShapeDtypeStruct((L, B, T, D2), cdtype),
                jax.ShapeDtypeStruct((max(L - 1, 1), B, T, R), cdtype),
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=int(_TRAIN_VMEM_BUDGET_MB * 2 ** 20) +
                8 * 2 ** 20),
            interpret=interpret,
        )(tapw16, skipw16, resw16, res_b32, lc32, x016)
        return skip_sum, act, xstack

    @jax.custom_vjp
    def fused(kernel, skipw, resw, res_b, lc_encb, x0):
        skip_sum, _, _ = _fwd_call(kernel, skipw, resw, res_b, lc_encb, x0)
        return skip_sum

    def fused_fwd(kernel, skipw, resw, res_b, lc_encb, x0):
        skip_sum, act, xstack = _fwd_call(kernel, skipw, resw, res_b,
                                          lc_encb, x0)
        return skip_sum, (act, xstack, kernel.astype(cdtype),
                          skipw.astype(cdtype), resw.astype(cdtype),
                          x0.astype(cdtype))

    def fused_bwd(res, dskip):
        """Matmul-only backward over the saved activations.

        Per layer (reverse), with t=tanh(a), s=sigmoid(b) saved bf16:
          dgated = dX_{l+1} @ resw^T + dskip @ skipw^T
          da = dgated * s * (1 - t^2);  db = dgated * t * s * (1 - s)
          dX_l = dX_{l+1} + sum_j shift_left_{o_j}(dpre @ W_j^T)
          dW_j = sum_t x[t - o_j] dpre[t]   (slice-aligned, no pads)
        The gate derivative consumes the SAVED activations, so the
        backward has no transcendentals and no convolution ops.
        """
        (act, xstack, k16, skipw16, resw16, x016) = res
        dskip16 = dskip.astype(cdtype)
        # per-layer grads collect in python lists and stack ONCE — a
        # .at[l].set on the stacked buffer would copy the whole (up to
        # 47 MB) gradient tensor every layer
        dks, dsks, drss, drbs, dlcs = [], [], [], [], []
        dX = jnp.zeros((B, T, R), cdtype)
        for l in reversed(range(L)):
            d = dils[l]
            xin = x016 if l == 0 else xstack[l - 1]
            f16 = act[l, :, :, :D]
            g16 = act[l, :, :, D:]
            gated = f16 * g16
            dgated = (jnp.einsum("btr,dr->btd", dX, resw16[l],
                                 preferred_element_type=jnp.float32)
                      + jnp.einsum("bts,ds->btd", dskip16, skipw16[l],
                                   preferred_element_type=jnp.float32))
            # gate derivative in the compute dtype: the [B,T,2D] chains are
            # the widest elementwise streams in the backward, and the
            # forward evaluates the same products at this precision
            dg16 = dgated.astype(cdtype)
            one = jnp.asarray(1.0, cdtype)
            if tanh_first:
                da = dg16 * g16 * (one - f16 * f16)
                db = dg16 * f16 * g16 * (one - g16)
            else:
                da = dg16 * g16 * f16 * (one - f16)
                db = dg16 * f16 * (one - g16 * g16)
            dpre16 = jnp.concatenate([da, db], axis=-1)
            dlcs.append(dpre16.astype(jnp.float32)
                        .reshape(B, F, FR, D2).sum(axis=2)
                        .transpose(1, 0, 2))
            dsks.append(jnp.einsum("btd,bts->ds", gated, dskip16,
                                   preferred_element_type=jnp.float32))
            drss.append(jnp.einsum("btd,btr->dr", gated, dX,
                                   preferred_element_type=jnp.float32))
            drbs.append(dX.astype(jnp.float32).sum(axis=(0, 1)))
            # conv grads via linear_transpose of the SAME conv op the XLA
            # forward uses (ops/conv.py::causal_conv1d): one grad-input
            # conv + one grad-weight conv per layer — per-tap slice
            # einsums made ~6 passes over the [B,T,*] streams and cost
            # 2-3x this (PERF.md #21)
            pad = [((K - 1) * d, 0)]
            dX_conv, = jax.linear_transpose(
                lambda t: conv1d(t, k16[l], None, padding=pad, dilation=d),
                jax.ShapeDtypeStruct((B, T, R), cdtype))(dpre16)
            dk_l, = jax.linear_transpose(
                lambda w: conv1d(xin, w, None, padding=pad, dilation=d),
                jax.ShapeDtypeStruct((K, R, D2), cdtype))(dpre16)
            dks.append(dk_l.astype(jnp.float32))
            dX = (dX.astype(jnp.float32)
                  + dX_conv.astype(jnp.float32)).astype(cdtype)
        dk = jnp.stack(dks[::-1])
        dsk = jnp.stack(dsks[::-1])
        drs = jnp.stack(drss[::-1])
        drb = jnp.stack(drbs[::-1])
        dlc = jnp.stack(dlcs[::-1])
        # primal dtypes: the caller passes layer params and x0 in the
        # compute dtype (bf16 tree under train_dtype='bf16', f32 else)
        # and lc_encb in f32 — cotangents must match
        return (dk.astype(cdtype), dsk.astype(cdtype), drs.astype(cdtype),
                drb.astype(cdtype), dlc, dX.astype(cdtype))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_residual_stack(lp, cfg, x0, local_condition, *,
                         gate_order: str = "tanh_first",
                         interpret: bool = False):
    """Run the residual stack through the fused kernel.

    Args:
      lp: the stacked layer params (models/wavenet.py::init_wavenet_params,
        'layers' subtree) — kernel [L,K,R,2D], bias [L,2D], lc_kernel
        [L,C,2D], skip_kernel [L,D,S], skip_bias [L,S], res_kernel [L,D,R],
        res_bias [L,R].
      x0: residual stream after the preprocess conv, [B, T, R].
      local_condition: [B, T_cond, C].
    Returns skip_sum [B, T, S] f32 INCLUDING the summed skip biases (the
    caller adds the skip-start projection).
    """
    B, T, R = x0.shape
    t_cond = local_condition.shape[1]
    FR = T // t_cond
    cdtype = x0.dtype
    cdtype_name = "bf16" if cdtype == jnp.bfloat16 else "f32"
    # per-layer condition projection + conv bias, folded once
    # (wavenet_ops.py:93-101; bias from conv1d_v2, wavenet_ops.py:66-76)
    lc_encb = jnp.einsum("bsc,lcf->lsbf", local_condition, lp["lc_kernel"],
                         preferred_element_type=jnp.float32) \
        + lp["bias"].astype(jnp.float32)[:, None, None, :]
    fused = _make_fused_stack(
        cfg.num_layers, cfg.kernel_size, cfg.residual_filters,
        cfg.dilation_filters, cfg.skip_filters, tuple(cfg.dilation_rates),
        B, T, FR, gate_order, cdtype_name, interpret)
    skip_sum = fused(lp["kernel"], lp["skip_kernel"], lp["res_kernel"],
                     lp["res_bias"], lc_encb, x0)
    return skip_sum.astype(jnp.float32) \
        + jnp.sum(lp["skip_bias"].astype(jnp.float32), axis=0)
