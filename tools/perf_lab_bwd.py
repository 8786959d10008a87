#!/usr/bin/env python3
"""Backward-pass decomposition lab for the fused training kernel (TPU).

The fused forward (ops/train_pallas.py) leaves a custom-VJP backward that
is plain XLA; this lab times its pieces at the shipped shapes
(B=8, T=6656, L=30, K=3, R=256, D=256, S=512) to find where the ~40 ms
goes and which formulation of each grad is fastest:

  gate   dgated einsums + gate-derivative chain over saved activations
  dxconv dX contribution via linear_transpose of conv1d   (current)
  dxslice dX contribution via shifted-slice einsums
  dkconv dW (conv taps) via linear_transpose of conv1d    (current)
  dkslice dW via per-tap slice einsums [R,BT]x[BT,D2]
  wgrads skip/res weight grads + bias/lc reductions

Usage: python tools/perf_lab_bwd.py [--variants a,b,...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=2):
    """Amortized-fetch timing.

    On the axon remote backend jax.block_until_ready returns WITHOUT
    waiting for device execution — only a host fetch syncs (measured:
    0.36 ms "blocked" vs 58 ms fetched for the same program).  The
    device queue executes in order, so fetching one element of the LAST
    call's output forces all n calls to finish; one ~32 ms tunnel round
    trip amortizes over n=20 to ~1.6 ms, subtracted via a no-op probe.
    """
    import jax
    import numpy as np
    import jax.numpy as jnp

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(jnp.ravel(leaf)[0]))

    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    # tunnel round-trip probe: dispatch+fetch of an empty program
    noop = jax.jit(lambda: jnp.zeros(()))
    fetch(noop())
    t0 = time.perf_counter()
    fetch(noop())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    dt = time.perf_counter() - t0
    return max(dt - rtt, 1e-9) / n


def main():
    import jax
    import jax.numpy as jnp
    from vqvae_wavenet_tpu.config import WavenetConfig
    from vqvae_wavenet_tpu.ops.conv import conv1d

    cfg = WavenetConfig()
    L, K = cfg.num_layers, cfg.kernel_size
    R, D, S = (cfg.residual_filters, cfg.dilation_filters,
               cfg.skip_filters)
    D2 = 2 * D
    dils = tuple(cfg.dilation_rates)
    B, T = 8, 6656
    cdtype = jnp.bfloat16

    k0 = jax.random.PRNGKey(0)
    act = jax.random.uniform(k0, (L, B, T, D2), cdtype, 0.1, 0.9)
    xst = jax.random.normal(jax.random.PRNGKey(1), (L, B, T, R), cdtype)
    k16 = jax.random.normal(jax.random.PRNGKey(2), (L, K, R, D2),
                            cdtype) * 0.05
    skipw = jax.random.normal(jax.random.PRNGKey(3), (L, D, S),
                              cdtype) * 0.05
    resw = jax.random.normal(jax.random.PRNGKey(4), (L, D, R),
                             cdtype) * 0.05
    dskip = jax.random.normal(jax.random.PRNGKey(5), (B, T, S), cdtype)
    dpre_all = jax.random.normal(jax.random.PRNGKey(6), (L, B, T, D2),
                                 cdtype)

    results = {}
    want = sys.argv[sys.argv.index("--variants") + 1].split(",") \
        if "--variants" in sys.argv else None

    def sel(name):
        if want is None or name in want:
            print(f"[{time.strftime('%H:%M:%S')}] variant {name} ...",
                  flush=True)
            return True
        return False

    # ---- gate chain: dgated einsums + derivative products, all L layers
    if sel("gate"):
        @jax.jit
        def gate(act, dskip, resw, skipw):
            dX = jnp.zeros((B, T, R), cdtype)
            outs = []
            one = jnp.asarray(1.0, cdtype)
            for l in range(L):
                f16 = act[l, :, :, :D]
                g16 = act[l, :, :, D:]
                dgated = (jnp.einsum("btr,dr->btd", dX, resw[l],
                                     preferred_element_type=jnp.float32)
                          + jnp.einsum("bts,ds->btd", dskip, skipw[l],
                                       preferred_element_type=jnp.float32))
                dg16 = dgated.astype(cdtype)
                da = dg16 * g16 * (one - f16 * f16)
                db = dg16 * f16 * g16 * (one - g16)
                outs.append(jnp.concatenate([da, db], -1))
                dX = da[:, :, :R]  # keep the chain serial like the real bwd
            return jnp.stack(outs)
        results["gate_chain_L30"] = timeit(gate, act, dskip, resw, skipw)

    # ---- dX via linear_transpose conv (current formulation)
    if sel("dxconv"):
        @jax.jit
        def dxconv(dpre_all, k16):
            dX = jnp.zeros((B, T, R), jnp.float32)
            for l in range(L):
                d = dils[l]
                pad = [((K - 1) * d, 0)]
                dX_c, = jax.linear_transpose(
                    lambda t: conv1d(t, k16[l], None, padding=pad,
                                     dilation=d),
                    jax.ShapeDtypeStruct((B, T, R), cdtype))(dpre_all[l])
                dX = dX + dX_c.astype(jnp.float32)
            return dX
        results["dX_conv_T_L30"] = timeit(dxconv, dpre_all, k16)

    # ---- dX via shifted-slice einsums: dX[t] += dpre[t+o_j] @ W_j^T
    if sel("dxslice"):
        @jax.jit
        def dxslice(dpre_all, k16):
            dX = jnp.zeros((B, T, R), jnp.float32)
            for l in range(L):
                d = dils[l]
                for j in range(K):
                    o = (K - 1 - j) * d
                    seg = dpre_all[l, :, o:, :] if o else dpre_all[l]
                    c = jnp.einsum("btf,rf->btr", seg, k16[l, j],
                                   preferred_element_type=jnp.float32)
                    dX = dX.at[:, :T - o if o else T, :].add(c)
            return dX
        results["dX_slice_L30"] = timeit(dxslice, dpre_all, k16)

    # ---- dW taps via linear_transpose conv (current formulation)
    if sel("dkconv"):
        @jax.jit
        def dkconv(dpre_all, xst):
            outs = []
            for l in range(L):
                d = dils[l]
                pad = [((K - 1) * d, 0)]
                dk_l, = jax.linear_transpose(
                    lambda w: conv1d(xst[l], w, None, padding=pad,
                                     dilation=d),
                    jax.ShapeDtypeStruct((K, R, D2), cdtype))(dpre_all[l])
                outs.append(dk_l.astype(jnp.float32))
            return jnp.stack(outs)
        results["dW_conv_T_L30"] = timeit(dkconv, dpre_all, xst)

    # ---- dW taps via per-tap slice einsum: [R, B(T-o)] x [B(T-o), D2]
    if sel("dkslice"):
        @jax.jit
        def dkslice(dpre_all, xst):
            outs = []
            for l in range(L):
                d = dils[l]
                taps = []
                for j in range(K):
                    o = (K - 1 - j) * d
                    xs = xst[l, :, :T - o, :] if o else xst[l]
                    dp = dpre_all[l, :, o:, :] if o else dpre_all[l]
                    taps.append(jnp.einsum(
                        "btr,btf->rf", xs, dp,
                        preferred_element_type=jnp.float32))
                outs.append(jnp.stack(taps))
            return jnp.stack(outs)
        results["dW_slice_L30"] = timeit(dkslice, dpre_all, xst)

    # ---- fused Pallas backward chain kernel alone (PERF.md #22/#25)
    if sel("pbwd"):
        from vqvae_wavenet_tpu.ops import train_pallas
        bwd_call = train_pallas._make_bwd_kernel(
            L, K, R, D, S, dils, B, T, 64, "tanh_first", "bf16", False)
        assert bwd_call is not None
        k16 = jax.random.normal(jax.random.PRNGKey(7), (L, K, R, D2),
                                cdtype) * 0.05
        kcat = k16.transpose(0, 3, 1, 2).reshape(L, D2, K * R)
        rs_cat = jnp.concatenate(
            [resw.transpose(0, 2, 1), skipw.transpose(0, 2, 1)], axis=1)
        jcall = jax.jit(lambda a, ds, kc, rc: bwd_call(kc, rc, ds, a))
        results["pallas_bwd_chain"] = timeit(jcall, act, dskip, kcat,
                                             rs_cat)

    # ---- fused Pallas dW kernel alone (PERF.md #23/#26)
    if sel("pdk"):
        from vqvae_wavenet_tpu.ops import train_pallas
        dk_call = train_pallas._make_dk_kernel(
            L, K, R, D, S, dils, B, T, "bf16", False)
        assert dk_call is not None
        jdk = jax.jit(lambda dp, xi: dk_call(dp, xi))
        results["pallas_dk"] = timeit(jdk, dpre_all, xst)

    # ---- skip/res weight grads + bias reductions, all layers
    if sel("wgrads"):
        @jax.jit
        def wgrads(act, xst, dskip, dpre_all):
            gated = act[:, :, :, :D] * act[:, :, :, D:]
            dsk = jnp.einsum("lbtd,bts->lds", gated, dskip,
                             preferred_element_type=jnp.float32)
            drs = jnp.einsum("lbtd,btr->ldr", gated,
                             xst[:, :, :, :R].mean(0, keepdims=True)[0],
                             preferred_element_type=jnp.float32)
            dlc = dpre_all.astype(jnp.float32).reshape(
                L, B, T // 64, 64, D2).sum(3)
            return dsk, drs, dlc
        results["wgrads_L30"] = timeit(wgrads, act, xst, dskip, dpre_all)

    for k, v in results.items():
        print(f"{k:20s} {v * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
