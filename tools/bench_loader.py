#!/usr/bin/env python3
"""Input-pipeline throughput at real-VCTK file counts (round 4, VERDICT #7).

Measures the python prefetch pipeline and the native C++ loader feeding
(batch, max_len) crops from a --scale synthetic corpus (10k+ files), in
batches/s and files/s, against the rate the fused training step consumes
(23.6 steps/s x batch 8 = ~189 files/s).

Usage: python tools/bench_loader.py [DATA=/tmp/scale/data] [N_BATCHES=300]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(loader: str, data: str, n: int, batch=8, max_len=6656):
    from vqvae_wavenet_tpu.data.datasets import make_input_pipeline
    pipe = make_input_pipeline("VCTK", batch_size=batch, max_len=max_len,
                               relative_path=data, loader=loader)
    for _ in range(20):          # warm the prefetch queue / thread pool
        pipe.next()
    t0 = time.perf_counter()
    for _ in range(n):
        b = pipe.next()
    dt = time.perf_counter() - t0
    pipe.stop()
    assert b["x"].shape == (batch, max_len, 1)
    return n / dt, n * batch / dt


def main():
    data = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/data"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    nfiles = sum(1 for _ in open(os.path.join(data, "vctk_info",
                                              "vctk_train.txt")))
    print(f"corpus: {nfiles} files at {data}")
    for loader in ("python", "native"):
        bps, fps = run(loader, data, n)
        need = 23.6 * 8
        print(f"{loader:7s} {bps:8.1f} batches/s  {fps:9.1f} files/s  "
              f"({fps / need:.1f}x the fused train step's consumption)")


if __name__ == "__main__":
    main()
