"""Chip roofline probe: measured matmul/conv ceilings on this device.

Measures TFLOP/s for (a) large square matmuls in bf16 and f32(DEFAULT),
(b) representative UNet conv shapes (368x1216 frame, 32..256 channels)
in f32 and bf16, and (c) HBM copy bandwidth. Gives the denominator for
MFU claims in RESULTS_r02.md.

Usage: python scripts/bench_roofline.py [--iters 10]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

import numpy as np


def timeit(fn, args, iters):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out).ravel()[:1]  # force tunnel readback
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}")

    # --- matmul ceilings -------------------------------------------------
    for dt, n in (("bfloat16", 8192), ("float32", 8192)):
        a = jax.device_put(
            jnp.ones((n, n), dtype=dt), dev)
        f = jax.jit(lambda x: (x @ x).sum())
        dtm = timeit(f, (a,), args.iters)
        tflops = 2 * n**3 / dtm / 1e12
        print(f"matmul {n}x{n} {dt:9s}: {dtm*1e3:8.2f} ms  "
              f"{tflops:7.1f} TFLOP/s")

    # --- conv shapes from the UNet at the bench point --------------------
    # (H, W, Cin, Cout, k): encoder/decoder levels; Cout is the fused 2x.
    shapes = [
        (368, 1216, 32, 64, 3),    # full-res BasicConv (fused gate)
        (184, 608, 64, 128, 3),    # level-2
        (92, 304, 128, 256, 3),    # level-3
        (46, 152, 256, 512, 3),    # bottleneck
    ]
    for dt in ("float32", "bfloat16"):
        tot = 0.0
        for h, w, ci, co, k in shapes:
            x = jax.device_put(jnp.ones((1, h, w, ci), dtype=dt), dev)
            kern = jax.device_put(
                jnp.ones((k, k, ci, co), dtype=dt), dev)
            f = jax.jit(lambda x, k_: jax.lax.conv_general_dilated(
                x, k_, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")).sum())
            dtm = timeit(f, (x, kern), args.iters)
            fl = 2 * h * w * ci * co * k * k
            tot += dtm
            print(f"conv {h}x{w} {ci:3d}->{co:3d} k{k} {dt:9s}: "
                  f"{dtm*1e3:7.2f} ms  {fl/dtm/1e12:6.1f} TFLOP/s")
        print(f"  ({dt} 4-shape total {tot*1e3:.2f} ms)")

    # --- HBM bandwidth ---------------------------------------------------
    # scalar output: returning the full array would measure the host
    # tunnel's readback, not HBM (the first recorded run did exactly
    # that and printed 1 GB/s).
    n = 256 * 1024 * 1024 // 4  # 256 MB of f32
    x = jax.device_put(jnp.ones((n,), dtype=jnp.float32), dev)
    f = jax.jit(lambda x: (x * 1.0000001).sum())
    dtm = timeit(f, (x,), args.iters)
    gbs = 2 * n * 4 / dtm / 1e9
    print(f"HBM stream (256MB rw): {dtm*1e3:.2f} ms  {gbs:.0f} GB/s")


if __name__ == "__main__":
    main()
