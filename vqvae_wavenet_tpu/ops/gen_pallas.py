"""Pallas TPU kernel: the ENTIRE autoregressive WaveNet generation loop.

The XLA scan path (generation/fast.py) already replaces the reference's
one-sess.run-per-sample loop (generate.py:108-113) with one device
program, but each of its steps still pays XLA loop/dispatch overheads
around ~60 small matmuls.  This kernel turns the whole clip into ONE
pallas_call whose grid is the sample index:

  * RESIDENT mode (default when model+ring fit in ~96MB of the v5e's
    ~128MB VMEM): the packed weights live in VMEM for the whole clip —
    zero per-step HBM weight traffic; the layer loop is fully unrolled
    (static ring offsets); the taps+lc conv issues as one fused
    [B, K*R+C]x[K*R+C, 2D] dot and the skip+res 1x1s as one
    [B, D]x[D, S+R] dot against a lane-concatenated block (PERF.md
    #10-#13: 13-18 us/sample on the shipped 30-layer model);
  * STREAMED fallback (model too big for VMEM, or int8): per-layer
    weights packed into row-aligned HBM arrays are rotated through 4
    VMEM slots with async DMA, 3 transfers outstanding, continuing
    seamlessly across sample boundaries;
  * the fast-WaveNet ring buffers live entirely in VMEM scratch (flat
    [sum((K-1)d), B, R]), with per-layer offsets/dilations in SMEM via
    scalar prefetch;
  * sampling happens in-kernel: Gumbel-max over the logits using the TPU
    PRNG (pltpu.prng_random_bits), or argmax for greedy — so the sampled
    mu-law bin feeds the next step without leaving the core;
  * packing, gc precompute, seed derivation, and mu-law decode all run
    under the SAME jit as the kernel launch: one host dispatch per clip.

generation/fast.py::generate(engine=...) dispatches here on TPU and falls
back to the XLA scan otherwise.  Sampling uses the hardware PRNG stream
(a different stream than jax.random — same distribution); greedy mode
matches the XLA path's outputs.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae_wavenet_tpu.config import WavenetConfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# cap on the 4 rotating weight slots (VMEM is ~128MB/core; ring + resident
# res matrices + lc share it)
_SLOT_BUDGET_MB = 24.0

# weights + ring must fit under this to skip the DMA stream entirely
# (module-level so tests can force the streamed fallback)
_RESIDENT_BUDGET_MB = 96.0


def _layers_per_dma(cfg: WavenetConfig, lc_channels: int, itemsize: int) -> int:
    """Group G consecutive layers into each streamed DMA block.

    The weight stream is issue-overhead-bound at ~1.2MB granules (measured
    ~1.25us exposed setup per DMA at depth-3, PERF.md #7) — larger blocks
    amortize it.  G must divide L with at least 4 blocks so the 4-slot /
    depth-3 rotation still pipelines across sample boundaries."""
    L = cfg.num_layers
    lay = _layout(cfg, lc_channels)
    best = 1
    for g in range(2, L + 1):
        if L % g or L // g < 4:
            continue
        if 4 * g * lay["a_rows"] * lay["a_cols"] * itemsize \
                <= _SLOT_BUDGET_MB * 2 ** 20:
            best = g
    return best


def _layout(cfg: WavenetConfig, lc_channels: int):
    """Static row layout of the two packed per-layer weight blocks."""
    K, R, D, S = (cfg.kernel_size, cfg.residual_filters,
                  cfg.dilation_filters, cfg.skip_filters)
    assert 2 * D % 128 == 0 and S % 128 == 0 and R % 128 == 0
    # Streamed block A per layer: taps, lc, skip, biases (one DMA/layer).
    # The small res matrices stay RESIDENT in VMEM (loaded once per launch)
    # so they cost no per-step HBM bandwidth.
    a_cols = max(2 * D, S)
    rows_taps = K * R                      # K tap matrices [R, 2D]
    rows_lc = lc_channels                  # [C, 2D]
    rows_skip = D                          # [D, S]
    off_bias = rows_taps + rows_lc + rows_skip
    a_rows = off_bias + 2
    return {
        "a_cols": a_cols, "a_rows": _round_up(a_rows, 16),
        "off_lc": rows_taps, "off_skip": rows_taps + rows_lc,
        "off_bias": off_bias,
        "off_skip_bias": off_bias + 1,
        "res_rows": _round_up(D + 1, 16), "off_res_bias": D,
    }


def pack_gen_params(params, cfg: WavenetConfig, lc_channels: int,
                    dtype=jnp.bfloat16):
    """Pack the stacked layer params into the kernel's streamed block plus
    the small resident tensors.

    dtype=jnp.int8 quantizes the streamed block per ROW (absmax/127 scale,
    scales resident in VMEM): halves the per-step HBM traffic again vs
    bf16 — an opt-in lossy mode for maximum generation throughput."""
    L = cfg.num_layers
    K = cfg.kernel_size
    D = cfg.dilation_filters
    S = cfg.skip_filters
    R = cfg.residual_filters
    lay = _layout(cfg, lc_channels)
    lp = params["layers"]

    quantize_int8 = dtype == jnp.int8
    pack_dtype = jnp.float32 if quantize_int8 else dtype
    a = jnp.zeros((L, lay["a_rows"], lay["a_cols"]), pack_dtype)
    # taps: kernel [L, K, R, 2D] -> rows [K*R, 2D]
    a = a.at[:, :K * R, :2 * D].set(
        lp["kernel"].reshape(L, K * R, 2 * D).astype(pack_dtype))
    a = a.at[:, lay["off_lc"]:lay["off_lc"] + lc_channels, :2 * D].set(
        lp["lc_kernel"].astype(pack_dtype))
    a = a.at[:, lay["off_skip"]:lay["off_skip"] + D, :S].set(
        lp["skip_kernel"].astype(pack_dtype))
    a = a.at[:, lay["off_bias"], :2 * D].set(lp["bias"].astype(pack_dtype))
    a = a.at[:, lay["off_skip_bias"], :S].set(lp["skip_bias"].astype(pack_dtype))

    small_dtype = jnp.bfloat16 if quantize_int8 else dtype
    res = jnp.zeros((L, lay["res_rows"], R), small_dtype)
    res = res.at[:, :D, :].set(lp["res_kernel"].astype(small_dtype))
    res = res.at[:, lay["off_res_bias"], :].set(
        lp["res_bias"].astype(small_dtype))

    if quantize_int8:
        absmax = jnp.max(jnp.abs(a), axis=2, keepdims=True)      # [L, rows, 1]
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        a_q = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
        a, scales = a_q, scale.astype(jnp.float32)
    else:
        scales = jnp.zeros((L, lay["a_rows"], 1), jnp.float32)  # unused

    sd = jnp.bfloat16 if quantize_int8 else dtype
    small = {
        "w_pre": params["preprocess"]["kernel"][:, 0, :].astype(sd),
        "b_pre": params["preprocess"]["bias"].astype(sd)[None, :],
        "w_ss": params["skip_start"]["kernel"][0].astype(sd),
        "b_ss": params["skip_start"]["bias"].astype(sd)[None, :],
        "w_pp1": params["postprocess1"]["kernel"][0].astype(sd),
        "b_pp1": params["postprocess1"]["bias"].astype(sd)[None, :],
        "w_pp1_lc": params["postprocess1"]["lc_kernel"].astype(sd),
        "w_pp2": params["postprocess2"]["kernel"][0].astype(sd),
        "b_pp2": params["postprocess2"]["bias"].astype(sd)[None, :],
    }
    return a, res, scales, small


def _ring_tables(cfg: WavenetConfig):
    sizes = [(cfg.kernel_size - 1) * d for d in cfg.dilation_rates]
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    total = int(np.sum(sizes))
    return (np.asarray(offs, np.int32),
            np.asarray(cfg.dilation_rates, np.int32),
            np.asarray(sizes, np.int32),
            _round_up(max(total, 8), 8))


# layers whose ring exceeds this many rows move to the HBM ring in hybrid
# mode (the large-dilation rings dominate VMEM at big batch: d=512 K=3 is
# 1024 rows/layer while d<=64 layers sum to 762 for the whole shipped
# stack).  The threshold ADAPTS downward with batch (round 4): at B=128
# even the mid-dilation rings outgrow VMEM, so more of them move to HBM —
# _hybrid_threshold picks the largest value that fits the budget.
_HYBRID_VMEM_MAX_ROWS = 128

# HBM-ring zero-fill chunk (rows per DMA at clip start)
_Z_CHUNK = 64


def _hybrid_tables(cfg: WavenetConfig, max_rows: int = _HYBRID_VMEM_MAX_ROWS):
    """Split the per-layer rings between VMEM and HBM.

    Returns (vmem_offs, hbm_offs, sizes, big_index, vmem_rows, hbm_rows):
    per layer, exactly one of vmem_offs/hbm_offs is >= 0; big_index maps a
    big layer to its slot in the prefetch buffers."""
    sizes = [(cfg.kernel_size - 1) * d for d in cfg.dilation_rates]
    vmem_offs, hbm_offs, big_index = [], [], []
    v = h = nbig = 0
    for s in sizes:
        if s > max_rows:
            vmem_offs.append(-1)
            hbm_offs.append(h)
            big_index.append(nbig)
            h += s
            nbig += 1
        else:
            vmem_offs.append(v)
            hbm_offs.append(-1)
            big_index.append(-1)
            v += s
    return (np.asarray(vmem_offs, np.int32), np.asarray(hbm_offs, np.int32),
            np.asarray(sizes, np.int32), np.asarray(big_index, np.int32),
            _round_up(max(v, 8), 8), _round_up(max(h, 256), 256))


def select_mode(cfg: WavenetConfig, lc_channels: int, batch: int,
                t_cond: int, dtype) -> str:
    """Pick the kernel mode from static shapes — the single source of
    truth for both the launch path and generation/fast.py's eligibility
    gate.

      'resident' — weights AND all rings in VMEM (fastest; small batch);
      'hybrid'   — weights resident, large-dilation rings in HBM with
                   double-buffered tap prefetch (large batch: the ring is
                   B-proportional, ~3.1 MB/stream for the shipped config);
      'streamed' — 4-slot weight-streaming DMA pipeline (huge models,
                   int8; its own slot budget is checked by the caller).
    """
    import jax.numpy as jnp
    lay = _layout(cfg, lc_channels)
    K, R, S = cfg.kernel_size, cfg.residual_filters, cfg.skip_filters
    D = cfg.dilation_filters
    itemsize = 1 if dtype == jnp.int8 else jnp.dtype(dtype).itemsize
    act = 4 if dtype == jnp.float32 else 2
    budget = _RESIDENT_BUDGET_MB * 2 ** 20
    a_bytes = cfg.num_layers * lay["a_rows"] * lay["a_cols"] * itemsize
    sr_bytes = cfg.num_layers * lay["res_rows"] * (S + R) * \
        (2 if dtype == jnp.int8 else act)
    lc_bytes = t_cond * batch * lc_channels * act
    gcon_bytes = cfg.num_layers * batch * 2 * D * act
    ring_bytes = _ring_tables(cfg)[3] * batch * R * act
    if (dtype != jnp.int8
            and a_bytes + sr_bytes + ring_bytes + lc_bytes <= budget):
        return "resident"
    if dtype != jnp.int8 and batch % 8 == 0 \
            and _hybrid_threshold(cfg, lc_channels, batch, t_cond,
                                  dtype) is not None:
        return "hybrid"
    return "streamed"


def _hybrid_threshold(cfg: WavenetConfig, lc_channels: int, batch: int,
                      t_cond: int, dtype):
    """Largest VMEM-ring row threshold whose hybrid layout fits the budget
    (None if none does).  Lower thresholds move more rings to HBM: cheap
    in bandwidth (each ring row is touched K times per step regardless)
    but more DMA issues per step, so prefer the largest that fits."""
    import jax.numpy as jnp
    lay = _layout(cfg, lc_channels)
    K, R, S = cfg.kernel_size, cfg.residual_filters, cfg.skip_filters
    D = cfg.dilation_filters
    itemsize = jnp.dtype(dtype).itemsize
    act = 4 if dtype == jnp.float32 else 2
    budget = _RESIDENT_BUDGET_MB * 2 ** 20
    a_bytes = cfg.num_layers * lay["a_rows"] * lay["a_cols"] * itemsize
    sr_bytes = cfg.num_layers * lay["res_rows"] * (S + R) * act
    lc_bytes = t_cond * batch * lc_channels * act
    gcon_bytes = cfg.num_layers * batch * 2 * D * act
    for max_rows in (128, 64, 32, 16, 8):
        _, _, _, bidx, vmem_rows, _ = _hybrid_tables(cfg, max_rows)
        nbig = int((bidx >= 0).sum())
        if not nbig:
            continue
        hybrid_bytes = (a_bytes + sr_bytes + vmem_rows * batch * R * act
                        + 2 * nbig * (K - 1) * batch * R * act  # taps_buf
                        + 2 * nbig * batch * R * act            # wcur
                        + _Z_CHUNK * batch * R * act            # zbuf
                        + lc_bytes + gcon_bytes)
        if hybrid_bytes <= budget:
            return max_rows
    return None


def _pick_block_S(cfg: WavenetConfig, lc_channels: int, batch: int,
                  t_cond: int, dtype, length: int, max_rows: int) -> int:
    """Tap-prefetch block depth for hybrid mode (round 4, PERF.md #31).

    The per-step schedule starts ~27 single-row ring DMAs per step at
    B=64/threshold 128; block prefetch replaces them with ONE contiguous
    S-row DMA per (layer, tap) every S steps (and one S-row write flush
    per layer per S steps).  Measured worth 3-4% at B=32/64 (PERF #31 —
    the step is serial-chain-compute-bound, so fewer DMA issues help
    only modestly).  Legality (all checked here; S=1 = per-step scheme):
      * S | length — write flushes happen at block ends;
      * S | d and S | size for every HBM-ring layer — the S tap rows for
        steps [b*S, (b+1)*S) sit contiguously in the ring with no
        intra-block wrap (block starts are 0 mod S);
      * 3*S <= min d over HBM layers — reads for block c are issued at
        the start of block c-1, where the newest write KNOWN COMPLETE
        is block c-3's flush (waited there), covering steps through
        (c-2)*S-1; the newest row a block-c read needs is step
        (c+1)*S-1-d, so d >= 3S makes the race impossible (issue-order
        alone gives no DMA ordering);
      * the widened [2, nbig, K-1, S, B, R] taps_buf + [2, nbig, S, B, R]
        wcur staging still fits the VMEM budget.
    """
    import jax.numpy as jnp
    lay = _layout(cfg, lc_channels)
    K, R, S = cfg.kernel_size, cfg.residual_filters, cfg.skip_filters
    D = cfg.dilation_filters
    itemsize = jnp.dtype(dtype).itemsize
    act = 4 if dtype == jnp.float32 else 2
    budget = _RESIDENT_BUDGET_MB * 2 ** 20
    _, _, _, bidx, vmem_rows, _ = _hybrid_tables(cfg, max_rows)
    nbig = int((bidx >= 0).sum())
    _, dils, sizes, _ = _ring_tables(cfg)
    big_d = [int(d) for d, s in zip(dils, sizes) if s > max_rows]
    if not big_d:
        return 1
    base = (cfg.num_layers * lay["a_rows"] * lay["a_cols"] * itemsize
            + cfg.num_layers * lay["res_rows"] * (S + R) * act
            + vmem_rows * batch * R * act
            + _Z_CHUNK * batch * R * act
            + t_cond * batch * lc_channels * act
            + cfg.num_layers * batch * 2 * D * act)
    big_sz = [int(s) for s in sizes if s > max_rows]
    for sb in (8, 4, 2):
        if length % sb or 3 * sb > min(big_d):
            continue
        if any(d % sb or s % sb for d, s in zip(big_d, big_sz)):
            continue
        staged = (2 * nbig * (K - 1) * sb * batch * R * act   # taps_buf
                  + 2 * nbig * sb * batch * R * act)          # wcur
        if base + staged <= budget:
            return sb
    return 1


def _mu_law_encode_f32(x, q):
    mu = float(q - 1)
    x = jnp.clip(x, -1.0, 1.0)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / math.log1p(mu)


def _mu_law_decode_f32(bins, q):
    mu = float(q - 1)
    y = (2.0 * bins.astype(jnp.float32) / mu) - 1.0
    return jnp.clip(jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu,
                    -1.0, 1.0)


def _make_kernel(cfg: WavenetConfig, lc_channels: int, batch: int,
                 length: int, t_cond: int, mode: str, dtype,
                 gate_order: str = "tanh_first", G: int = 1,
                 resident: bool = False, hybrid: bool = False,
                 hybrid_rows: int = _HYBRID_VMEM_MAX_ROWS,
                 block_S: int = 1):
    L = cfg.num_layers
    K = cfg.kernel_size
    D = cfg.dilation_filters
    S = cfg.skip_filters
    R = cfg.residual_filters
    Q = cfg.quantization_channels
    PK = cfg.preprocess_kernel_size
    ratio = length // t_cond
    lay = _layout(cfg, lc_channels)
    B = batch
    NB = L // G            # DMA blocks per sample (G layers each)
    quantized = dtype == jnp.int8
    act_dtype = jnp.bfloat16 if quantized else dtype
    # f32 verification builds use exact accumulation; bf16 production dots
    # are single-pass on the MXU either way
    prec = (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)

    # split each block DMA into P parallel sub-copies on separate
    # semaphores so multiple DMA engines pull the stream concurrently;
    # sub-copies must stay 8-row-aligned (TPU tiling)
    block_rows = G * lay["a_rows"]
    P = next(p for p in (4, 2, 1) if block_rows % (8 * p) == 0)
    sub_rows = block_rows // P
    _offs_np, _dils_np, _sizes_np, _ = _ring_tables(cfg)
    if hybrid:
        # hybrid ring split: large-dilation rings live in HBM with
        # double-buffered tap prefetch one step ahead — reads at step i
        # were written >= d (>=128) steps earlier, so prefetching during
        # step i-1's compute is hazard-free (tap rows i-j*d never collide
        # with writes at i-1 or i: j*d mod (K-1)d is never 1 or 2 for
        # d > 2).  VMEM keeps only the small-d rings.
        (_voffs_np, _hoffs_np, _sizes_np2, _bidx_np,
         _, _hbm_rows) = _hybrid_tables(cfg, hybrid_rows)
        _big_layers = [l for l in range(L) if _hoffs_np[l] >= 0]
        NBIG = len(_big_layers)
        SB = block_S               # tap-prefetch block depth (#31)
        N_BLK = length // SB

    def kernel(off_ref, dil_ref, size_ref, seed_ref,          # scalar prefetch
               a_hbm, res_ref, scale_ref, lc_ref, w_pre, b_pre, w_ss, b_ss,
               w_pp1, b_pp1, w_pp1_lc, w_pp2, b_pp2,
               gcon_ref, g_pp1_ref,                           # inputs
               out_ref,                                       # output(s)
               *rest):                                        # [ring] + scratch
        if hybrid:
            (hbm_ring, w512, deq, ring, win, prev, stage, sems,
             taps_buf, wcur, zbuf, rsem, wsem) = rest
        else:
            (w512, deq, ring, win, prev, stage, sems) = rest
        i = pl.program_id(0)

        if hybrid:
            blk = jax.lax.div(i, SB)
            ph = jax.lax.rem(i, SB)

            def read_dma(step, l, j):
                # SB == 1 path: one row per (layer, tap) per step
                bi = int(_bidx_np[l])
                d_ = int(_dils_np[l])
                size_ = int(_sizes_np[l])
                hoff = int(_hoffs_np[l])
                row = hoff + jax.lax.rem(step - j * d_ + j * size_, size_)
                slot = jax.lax.rem(step, 2)
                return pltpu.make_async_copy(
                    hbm_ring.at[row], taps_buf.at[slot, bi, j - 1],
                    rsem.at[slot, bi, j - 1])

            def write_dma(step, l):
                bi = int(_bidx_np[l])
                size_ = int(_sizes_np[l])
                hoff = int(_hoffs_np[l])
                row = hoff + jax.lax.rem(step, size_)
                slot = jax.lax.rem(step, 2)
                return pltpu.make_async_copy(
                    wcur.at[slot, bi], hbm_ring.at[row],
                    wsem.at[slot, bi])

            def read_blk_dma(b_idx, l, j):
                # SB > 1 path (#31): the SB tap rows for steps
                # [b*SB, (b+1)*SB) sit contiguously (S | d, S | size,
                # block starts 0 mod S — _pick_block_S): ONE DMA
                bi = int(_bidx_np[l])
                d_ = int(_dils_np[l])
                size_ = int(_sizes_np[l])
                hoff = int(_hoffs_np[l])
                row0 = hoff + jax.lax.rem(b_idx * SB - j * d_ + j * size_,
                                          size_)
                slot = jax.lax.rem(b_idx, 2)
                return pltpu.make_async_copy(
                    hbm_ring.at[pl.ds(row0, SB)],
                    taps_buf.at[slot, bi, j - 1],
                    rsem.at[slot, bi, j - 1])

            def write_blk_dma(b_idx, l):
                bi = int(_bidx_np[l])
                size_ = int(_sizes_np[l])
                hoff = int(_hoffs_np[l])
                row0 = hoff + jax.lax.rem(b_idx * SB, size_)
                slot = jax.lax.rem(b_idx, 2)
                return pltpu.make_async_copy(
                    wcur.at[slot, bi], hbm_ring.at[pl.ds(row0, SB)],
                    wsem.at[slot, bi])

            @pl.when(i == 0)
            def _zero_hbm_ring():
                # outputs start uninitialized; the fast-WaveNet queues
                # start zeroed (wavenet_ops.py:177-186)
                zbuf[...] = jnp.zeros_like(zbuf)
                for c in range(_hbm_rows // _Z_CHUNK):
                    dma = pltpu.make_async_copy(
                        zbuf, hbm_ring.at[pl.ds(c * _Z_CHUNK, _Z_CHUNK)],
                        rsem.at[0, 0, 0])
                    dma.start()
                    dma.wait()

            if SB == 1:
                @pl.when(i > 0)
                def _retire_writes():
                    for l in _big_layers:
                        write_dma(i - 1, l).wait()

                @pl.when(i == 0)
                def _prefetch_first():
                    for l in _big_layers:
                        for j in range(1, K):
                            read_dma(0, l, j).start()

                @pl.when(i + 1 < length)
                def _prefetch_next():
                    for l in _big_layers:
                        for j in range(1, K):
                            read_dma(i + 1, l, j).start()
            else:
                # block schedule: at each block start, retire the flush
                # of block b-2 (wcur slot reuse), prefetch block b+1's
                # taps, then retire block b's own reads (issued at the
                # start of block b-1, or below at i == 0 for block 0)
                @pl.when(i == 0)
                def _prefetch_blk0():
                    for l in _big_layers:
                        for j in range(1, K):
                            read_blk_dma(0, l, j).start()

                @pl.when(jnp.logical_and(ph == 0, i >= 2 * SB))
                def _retire_flush():
                    for l in _big_layers:
                        write_blk_dma(blk - 2, l).wait()

                @pl.when(jnp.logical_and(ph == 0, i + SB < length))
                def _prefetch_next_blk():
                    for l in _big_layers:
                        for j in range(1, K):
                            read_blk_dma(blk + 1, l, j).start()

                @pl.when(ph == 0)
                def _wait_blk_reads():
                    for l in _big_layers:
                        for j in range(1, K):
                            read_blk_dma(blk, l, j).wait()

        def dma_a(l, slot, p):
            return pltpu.make_async_copy(
                a_hbm.at[l, pl.ds(p * sub_rows, sub_rows)],
                w512.at[slot, pl.ds(p * sub_rows, sub_rows)],
                sems.at[slot, p])

        def start_block(l, slot):
            for p in range(P):
                dma_a(l, slot, p).start()

        def wait_block(l, slot):
            for p in range(P):
                dma_a(l, slot, p).wait()

        @pl.when(i == 0)
        def _init():
            if mode == "sample":   # greedy needs no PRNG (and CPU
                pltpu.prng_seed(seed_ref[0])  # interpret mode lacks one)
            ring[...] = jnp.zeros_like(ring)
            win[...] = jnp.zeros_like(win)
            prev[...] = jnp.zeros_like(prev)
            if not resident:
                start_block(0, 0)
                start_block(1, 1)
                start_block(2, 2)

        # ---- preprocess: mu-law encode prev sample, roll it into the window
        u_t = _mu_law_encode_f32(prev[0, :], Q)                 # [B]
        w_shift = pltpu.roll(win[...], PK - 1, 0)               # [PK, B]
        win[...] = w_shift
        win[PK - 1, :] = u_t
        current = (
            lax.dot_general(win[...].astype(act_dtype), w_pre[...],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec)
            + b_pre[...]).astype(act_dtype)                         # [B, F=R]
        skip = (jnp.dot(current, w_ss[...],
                        preferred_element_type=jnp.float32, precision=prec)
                + b_ss[...])                                    # [B, S] f32

        lc_t = lc_ref[pl.ds(i // ratio, 1)][0].astype(act_dtype)    # [B, C]
        # the lc columns of the fused input vector change only when the
        # conditioning frame advances; the taps columns change per layer
        stage[:, lay["off_lc"]:lay["off_lc"] + lc_channels] = lc_t

        t = i

        def block_body(bl, carry):
            # 4 rotating weight slots keep 3 DMAs outstanding so the HBM
            # stream never drains (the step is weight-streaming-bound);
            # each DMA carries G consecutive layers to amortize per-DMA
            # setup latency (PERF.md #7/#9).  Slots follow the GLOBAL
            # stream index i*NB + bl: the rotation phase must carry across
            # sample boundaries when NB % 3 != 0.
            current, skip = carry
            if resident:
                # the whole packed weight array lives in VMEM (~36MB fits
                # the v5e's ~128MB VMEM, measured): no weight DMA at all
                a = a_hbm.at[bl]
            else:
                gidx = i * NB + bl
                slot = jax.lax.rem(gidx, 4)
                wait_block(bl, slot)
                nxt = jax.lax.rem(bl + 3, NB)
                nslot = jax.lax.rem(gidx + 3, 4)

                @pl.when(jnp.logical_or(i < length - 1, bl < NB - 3))
                def _():
                    start_block(nxt, nslot)

                if quantized:
                    # dequantize the slot once: int8 rows * per-row scale
                    deq[...] = (
                        w512.at[slot][...].astype(jnp.bfloat16)
                        * scale_ref[pl.ds(bl, 1)][0].astype(jnp.bfloat16))
                    a = deq
                else:
                    a = w512.at[slot]

            # inner layers of the block: STATIC row offsets into the slot
            for g in range(G):
                l = bl * G + g
                r0 = g * lay["a_rows"]
                is_big = hybrid and isinstance(l, int) and _hoffs_np[l] >= 0
                if isinstance(l, int):   # unrolled: fold the ring tables
                    d = int(_dils_np[l])
                    off = int((_voffs_np if hybrid else _offs_np)[l])
                    size = int(_sizes_np[l])
                else:
                    d = dil_ref[l]
                    off = off_ref[l]
                    size = size_ref[l]

                # ONE fused [B, K*R + C] x [K*R + C, 2D] dot replaces the
                # K tap dots + the lc dot: same MXU passes, 1/4 the issue
                # overhead (the step is compute-latency-bound at B=1 once
                # weights are resident).  Taps columns are rewritten per
                # layer; lc columns persist for the whole cond frame.
                stage[:, (K - 1) * R:K * R] = current
                if is_big:
                    # taps were prefetched from the HBM ring during the
                    # PREVIOUS step/block's compute; consume (SB > 1:
                    # already retired at the block start)
                    bi = int(_bidx_np[l])
                    if SB == 1:
                        slot = jax.lax.rem(t, 2)
                        for j in range(1, K):
                            read_dma(t, l, j).wait()
                            stage[:, (K - 1 - j) * R:(K - j) * R] = \
                                taps_buf[slot, bi, j - 1].astype(act_dtype)
                    else:
                        slot = jax.lax.rem(blk, 2)
                        for j in range(1, K):
                            stage[:, (K - 1 - j) * R:(K - j) * R] = \
                                taps_buf[slot, bi, j - 1,
                                         ph].astype(act_dtype)
                else:
                    for j in range(1, K):
                        past = ring[pl.ds(off + jax.lax.rem(
                            t - j * d + j * size, size), 1)][0]  # [B, R]
                        stage[:, (K - 1 - j) * R:(K - j) * R] = \
                            past.astype(act_dtype)
                pre = jnp.dot(stage[...],
                              a[r0:r0 + lay["off_skip"], :2 * D],
                              preferred_element_type=jnp.float32,
                              precision=prec)
                pre += a[r0 + lay["off_bias"], :2 * D].astype(jnp.float32)
                # per-layer global-condition contribution, precomputed at
                # pack time (gc is constant over the clip — 'add_gc',
                # Magenta/config.py:178-192): one [B, 2D] add per layer
                pre += gcon_ref[pl.ds(l, 1)][0].astype(jnp.float32)
                if gate_order == "tanh_first":
                    gated = (jnp.tanh(pre[:, :D])
                             * jax.nn.sigmoid(pre[:, D:2 * D])
                             ).astype(act_dtype)
                else:   # sigmoid_first — Magenta/config.py:345-348
                    gated = (jax.nn.sigmoid(pre[:, :D])
                             * jnp.tanh(pre[:, D:2 * D])).astype(act_dtype)
                # push this layer's input, then skip + residual-update
                if is_big:
                    if SB == 1:
                        wcur[jax.lax.rem(t, 2), int(_bidx_np[l])] = current
                        write_dma(t, l).start()
                    else:
                        wcur[jax.lax.rem(blk, 2), int(_bidx_np[l]),
                             ph] = current

                        @pl.when(ph == SB - 1)
                        def _flush_blk(l=l):
                            write_blk_dma(blk, l).start()
                else:
                    ring[pl.ds(off + jax.lax.rem(t, size), 1)] = \
                        current[None]
                if resident:
                    # the skip and res matmuls both consume `gated`: fuse
                    # them into ONE [B, D] x [D, S+R] dot against the
                    # lane-concatenated [skip | res] block — the step is
                    # issue-overhead-bound on ~90 small serial dots, and
                    # each output column touches exactly one of the two
                    # blocks so the f32 accumulation is bit-identical
                    sr = res_ref[l]                  # [sr_rows, S + R]
                    fused = jnp.dot(gated, sr[:D, :],
                                    preferred_element_type=jnp.float32,
                                    precision=prec) \
                        + sr[lay["off_res_bias"], :].astype(jnp.float32)
                    skip = skip + fused[:, :S]
                    current = (current.astype(jnp.float32)
                               + fused[:, S:S + R]).astype(act_dtype)
                else:
                    skip = skip + jnp.dot(
                        gated, a[r0 + lay["off_skip"]:
                                 r0 + lay["off_skip"] + D, :S],
                        preferred_element_type=jnp.float32,
                        precision=prec) \
                        + a[r0 + lay["off_skip_bias"], :S].astype(jnp.float32)
                    res = res_ref[pl.ds(l, 1)][0]            # [res_rows, R]
                    current = (current.astype(jnp.float32)
                               + jnp.dot(gated, res[:D, :],
                                         preferred_element_type=jnp.float32,
                                         precision=prec)
                               + res[lay["off_res_bias"], :].astype(
                                   jnp.float32)
                               ).astype(act_dtype)
            return current, skip

        if resident:
            # fully unrolled: every ring offset / weight row / res row is
            # a compile-time constant (no fori bookkeeping, no SMEM-driven
            # dynamic addressing).  Note: a two-phase schedule that hoists
            # every layer's off-chain (past/lc/bias/gc) dot ahead of the
            # serial chain measured SLOWER (34.8 vs 31.7 us/step) — Mosaic
            # schedules in order, so the extra pre_base VMEM round trips
            # cost more than the issue overhead they save.
            carry = (current, skip)
            for bl in range(NB):
                carry = block_body(bl, carry)
            current, skip = carry
        else:
            assert NB >= 4, "pallas generation needs >= 4 DMA blocks"
            current, skip = lax.fori_loop(0, NB, block_body,
                                          (current, skip))

        if hybrid:
            if SB == 1:
                @pl.when(i == length - 1)
                def _final_write_retire():  # no step i+1 waits for these
                    for l in _big_layers:
                        write_dma(i, l).wait()
            else:
                @pl.when(i == length - 1)
                def _final_flush_retire():
                    # blocks N-2 and N-1 have no block start b+2 to
                    # retire them (block b's flush is waited at the
                    # start of block b+2); the last block's own flush
                    # was issued above at ph == SB-1 this same step
                    for l in _big_layers:
                        if N_BLK >= 2:
                            write_blk_dma(blk - 1, l).wait()
                        write_blk_dma(blk, l).wait()

        net = jax.nn.relu(skip).astype(act_dtype)
        net = (jnp.dot(net, w_pp1[...], preferred_element_type=jnp.float32, precision=prec)
               + jnp.dot(lc_t, w_pp1_lc[...],
                         preferred_element_type=jnp.float32, precision=prec)
               + b_pp1[...]
               + g_pp1_ref[...].astype(jnp.float32))  # postprocess1 gc term
        net = jax.nn.relu(net).astype(act_dtype)
        logits = (jnp.dot(net, w_pp2[...],
                          preferred_element_type=jnp.float32, precision=prec)
                  + b_pp2[...])                                  # [B, Q] f32

        if mode == "sample":
            bits = pltpu.prng_random_bits((B, Q))
            u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
            gumbel = -jnp.log(-jnp.log(jnp.clip(u, 1e-9, 1.0 - 1e-9)))
            bins = jnp.argmax(logits + gumbel, axis=-1)
        else:
            bins = jnp.argmax(logits, axis=-1)

        prev[0, :] = _mu_law_decode_f32(bins, Q)
        # output blocks are (8, 128): 8 consecutive grid steps share a block
        out_ref[jax.lax.rem(i, 8), :] = jnp.pad(bins.astype(jnp.int32),
                                                (0, 128 - B))

    return kernel, lay


@functools.partial(jax.jit, static_argnames=("cfg", "lc_channels", "dtype"))
def _pack_jit(params, *, cfg: WavenetConfig, lc_channels: int, dtype):
    """Device-side packing, split from the launch so repeated generate()
    calls with the SAME params reuse the packed weights (measured 11.5 ms
    of device time per pack on the shipped model — pure per-call overhead
    for short clips).  Returns (a, res_raw, sr_fused, scales, small)."""
    a, res, scales, small = pack_gen_params(params, cfg, lc_channels, dtype)
    lay = _layout(cfg, lc_channels)
    S, R, D = cfg.skip_filters, cfg.residual_filters, cfg.dilation_filters
    # lane-concatenated [skip | res] block for the resident/hybrid modes
    sr = jnp.zeros((cfg.num_layers, lay["res_rows"], S + R), res.dtype)
    sr = sr.at[:, :D, :S].set(
        a[:, lay["off_skip"]:lay["off_skip"] + D, :S].astype(res.dtype))
    sr = sr.at[:, :D, S:].set(res[:, :D, :])
    sr = sr.at[:, lay["off_res_bias"], :S].set(
        a[:, lay["off_skip_bias"], :S].astype(res.dtype))
    sr = sr.at[:, lay["off_res_bias"], S:].set(res[:, lay["off_res_bias"], :])
    return a, res, sr, scales, small


# packed-weight cache: params-identity -> packed tree.  jax Arrays are
# immutable, so identity of the stacked layer kernel plus the static args
# is a sound key; weakref.finalize evicts when the params are collected
# (an id() can be reused after GC).
_PACK_CACHE: dict = {}


def _packed_for(params, cfg: WavenetConfig, lc_channels: int, dtype):
    import weakref
    anchor = params["layers"]["kernel"]
    key = (id(anchor), cfg, lc_channels, jnp.dtype(dtype).name)
    hit = _PACK_CACHE.get(key)
    if hit is not None:
        return hit
    packed = _pack_jit(params, cfg=cfg, lc_channels=lc_channels, dtype=dtype)
    if len(_PACK_CACHE) > 8:
        _PACK_CACHE.clear()
    _PACK_CACHE[key] = packed
    try:
        weakref.finalize(anchor, _PACK_CACHE.pop, key, None)
    except TypeError:
        pass   # non-weakrefable leaf (e.g. numpy under interpret tests)
    return packed


@functools.partial(jax.jit, static_argnames=("cfg", "lc_channels", "length",
                                             "mode", "dtype", "gate_order",
                                             "ring_mode"))
def _generate_pallas_jit(packed, params, local_condition, global_condition,
                         key, *,
                         cfg: WavenetConfig, lc_channels: int, length: int,
                         mode: str, dtype, gate_order: str = "tanh_first",
                         ring_mode=None):
    """Launch + decode under ONE jit (packing is cached separately in
    _packed_for): a generate() call costs a single dispatch.  (The
    packing/gc/seed/decode ops used to run eagerly per call — dozens of
    small dispatches through the TPU tunnel, tens of ms of per-call
    overhead that dwarfed the kernel itself on short clips.)"""
    from vqvae_wavenet_tpu.ops.mu_law import mu_law_decode
    b, t_cond, _ = local_condition.shape
    lc = jnp.transpose(local_condition, (1, 0, 2))      # [T_cond, B, C]
    a, res_raw, sr_fused, scales, small = packed

    L, D, S = cfg.num_layers, cfg.dilation_filters, cfg.skip_filters
    cdt = jnp.bfloat16 if dtype == jnp.int8 else dtype
    lp = params["layers"]
    if global_condition is not None and "gc_kernel" in lp:
        # gc is constant per clip: precompute its per-layer 1x1
        # contributions (+ biases) into a resident [L, B, 2D] block
        gvec = global_condition[:, 0, :].astype(jnp.float32)     # [B, C_gc]
        gcon = jnp.einsum("bc,lcd->lbd", gvec,
                          lp["gc_kernel"].astype(jnp.float32))
        if "gc_bias" in lp:
            gcon = gcon + lp["gc_bias"].astype(jnp.float32)[:, None, :]
        pp1 = params["postprocess1"]
        g_pp1 = jnp.zeros((b, S), jnp.float32)
        if "gc_kernel" in pp1:
            g_pp1 = gvec @ pp1["gc_kernel"].astype(jnp.float32)
            if "gc_bias" in pp1:
                g_pp1 = g_pp1 + pp1["gc_bias"].astype(jnp.float32)
        gcon, g_pp1 = gcon.astype(cdt), g_pp1.astype(cdt)
    else:
        gcon = jnp.zeros((L, b, 2 * D), cdt)
        g_pp1 = jnp.zeros((b, S), cdt)

    seed = jax.random.randint(key, (1,), 0, 2 ** 31 - 1, jnp.int32)
    batch = b
    offs, dils, sizes, total_p = _ring_tables(cfg)
    # Fully-resident mode: the packed weights live in VMEM for the whole
    # clip (v5e has ~128MB VMEM — measured, not the 16MB of older guides),
    # eliminating the per-step HBM weight stream entirely.  Hybrid mode
    # (round 3) keeps weights resident at large batch by moving the
    # B-proportional large-dilation rings to HBM.  Falls back to the
    # 4-slot DMA pipeline when neither fits (or for int8).
    lay = _layout(cfg, lc_channels)
    S, R, D = cfg.skip_filters, cfg.residual_filters, cfg.dilation_filters
    ring_mode = ring_mode or select_mode(cfg, lc_channels, batch, t_cond,
                                         dtype)
    resident = ring_mode in ("resident", "hybrid")
    hybrid = ring_mode == "hybrid"
    lc = lc.astype(cdt)   # the kernel consumes act dtype; halves lc VMEM
    # resident/hybrid issue ONE dot against the pre-fused [skip | res]
    # block (built once in _pack_jit); streaming keeps the raw res block
    res = sr_fused if resident else res_raw

    # group G layers per block: [L, rows, cols] -> [L/G, G*rows, cols]
    # (row-contiguous, so the reshape is layout-preserving).  Streaming
    # mode: fewer/larger DMAs; resident mode: static in-block row offsets
    # with a dynamic block index.
    G = _layers_per_dma(cfg, lc_channels, a.dtype.itemsize)
    a = a.reshape(cfg.num_layers // G, G * a.shape[1], a.shape[2])
    scales = scales.reshape(cfg.num_layers // G, G * scales.shape[1], 1)
    if hybrid:
        K = cfg.kernel_size
        R = cfg.residual_filters
        hyb_rows = _hybrid_threshold(cfg, lc_channels, batch, t_cond,
                                     dtype) or _HYBRID_VMEM_MAX_ROWS
        _, _, _, bidx, vmem_ring_rows, hbm_rows = _hybrid_tables(
            cfg, hyb_rows)
        nbig = int((bidx >= 0).sum())
        blk_S = _pick_block_S(cfg, lc_channels, batch, t_cond, dtype,
                              length, hyb_rows)
    else:
        hyb_rows = _HYBRID_VMEM_MAX_ROWS
        vmem_ring_rows = total_p
        blk_S = 1
    kernel, lay = _make_kernel(cfg, lc_channels, batch, length, t_cond,
                               mode, dtype, gate_order, G, resident,
                               hybrid, hyb_rows, blk_S)
    PK = cfg.preprocess_kernel_size
    act = jnp.bfloat16 if dtype == jnp.int8 else dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(length,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM if resident
                         else pltpu.ANY),           # packed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # res (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scales (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_pre
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_pre
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_ss
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_ss
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_pp1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_pp1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_pp1_lc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_pp2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_pp2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gcon [L, B, 2D]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # g_pp1 [B, S]
        ],
        out_specs=(
            (pl.BlockSpec((8, 128), lambda i, *_: (i // 8, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec(memory_space=pltpu.ANY))   # HBM ring
            if hybrid else
            pl.BlockSpec((8, 128), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM)),
        scratch_shapes=[
            # weight slots are only live in streaming mode
            pltpu.VMEM(((1, 8, 128) if resident else (4,) + a.shape[1:]),
                       a.dtype),
            # dequant staging is only live in int8 mode
            pltpu.VMEM(a.shape[1:] if dtype == jnp.int8 else (8, 128),
                       jnp.bfloat16 if dtype == jnp.int8 else a.dtype),
            pltpu.VMEM((vmem_ring_rows, batch, cfg.residual_filters), act),
            pltpu.VMEM((PK, batch), jnp.float32),
            pltpu.VMEM((1, batch), jnp.float32),
            # fused-dot input vector [B, K*R + C] (taps + lc columns)
            pltpu.VMEM((batch, lay["off_skip"]), act),
            pltpu.SemaphoreType.DMA((4, 4)),
        ] + ([
            # SB > 1 (#31): SB-deep tap/write staging per slot; the
            # SB == 1 shapes squeeze the unit axis out to match the
            # per-step DMA row granularity
            pltpu.VMEM((2, nbig, K - 1) + ((blk_S,) if blk_S > 1 else ())
                       + (batch, R), act),                 # taps_buf
            pltpu.VMEM((2, nbig) + ((blk_S,) if blk_S > 1 else ())
                       + (batch, R), act),                 # wcur
            pltpu.VMEM((_Z_CHUNK, batch, R), act),         # zbuf
            pltpu.SemaphoreType.DMA((2, nbig, K - 1)),     # rsem
            pltpu.SemaphoreType.DMA((2, nbig)),            # wsem
        ] if hybrid else []),
    )
    out_shape = jax.ShapeDtypeStruct((_round_up(length, 8), 128), jnp.int32)
    if hybrid:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((hbm_rows, batch, R), act))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the 4 G-layer weight slots + ring exceed Mosaic's default
            # 16MB scoped-vmem stack limit at large L
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(offs), jnp.asarray(dils), jnp.asarray(sizes), seed,
      a, res, scales, lc, small["w_pre"], small["b_pre"], small["w_ss"],
      small["b_ss"],
      small["w_pp1"], small["b_pp1"], small["w_pp1_lc"], small["w_pp2"],
      small["b_pp2"], gcon, g_pp1)
    bins = out[0] if hybrid else out
    bins = bins[:length, :batch]
    return mu_law_decode(bins.T, cfg.quantization_channels)


def generate_pallas(params, cfg: WavenetConfig, local_condition, *,
                    length: int, seed: int = 0, key=None,
                    mode: str = "sample", dtype=jnp.bfloat16,
                    gate_order: str = "tanh_first", global_condition=None,
                    ring_mode=None):
    """Whole-clip generation in one Pallas kernel.

    local_condition: [B, T_cond, C].  Returns float waveform [B, length].
    dtype: float32 (exact verification) | bfloat16 (default) | int8
    (per-row-quantized weight streaming: ~2x fewer HBM bytes per step,
    slightly lossy — opt-in for maximum throughput).
    key: jax PRNG key for 'sample' mode (preferred; `seed` is the
    back-compat scalar form used when key is None).
    global_condition: [B, 1, C_gc] or None.  gc is constant per clip, so
    its per-layer 1x1 contributions (+ biases) are precomputed into a
    resident [L, B, 2D] block added inside the layer loop — no extra
    per-step HBM traffic.
    """
    b, t_cond, c = local_condition.shape
    assert length % t_cond == 0
    if key is None:
        key = jax.random.PRNGKey(seed)
    packed = _packed_for(params, cfg, c, dtype)
    return _generate_pallas_jit(packed, params, local_condition,
                                global_condition,
                                key, cfg=cfg, lc_channels=c, length=length,
                                mode=mode, dtype=dtype,
                                gate_order=gate_order, ring_mode=ring_mode)
