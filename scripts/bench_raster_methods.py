"""Rasterizer kernel-choice benchmark: sort vs scatter (vs Pallas) at
1M / 10M points (VERDICT r1 weak #5/#6: record the evidence for the
sort-path choice and prove 10M-point scale).

Usage: python scripts/bench_raster_methods.py [--quick]
Prints a markdown table of ms/frame at the kitti6 operating point.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

import numpy as np


def bench(fn, args, iters=10):
    import jax
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[0, 0]) if hasattr(x, "shape")
                 and x.ndim >= 2 else None, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force through the tunnel
    np.asarray(out[0][0, 0, 0] if isinstance(out, (tuple, list))
               else out[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sizes", type=str, default="1000000,10000000")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    h, w = 368, 1216
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    total_m = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]
    dev = jax.devices()[0]
    tm = jax.device_put(jnp.asarray(total_m), dev)

    sizes = [int(s) for s in args.sizes.split(",")]
    iters = 3 if args.quick else 10
    # device warm-up: the tunneled chip's first timed kernel after
    # process start can read 3-10x slow (observed 78-286 ms for a sort
    # that times 18-25 ms warmed); burn a few dispatches first.
    warm = jax.jit(lambda p, m: R.rasterize_batch(p, m, 64, 64)[0])
    xw = jax.device_put(jnp.asarray(
        np.random.default_rng(1).uniform(-10, 10, (100_000, 3)),
        jnp.float32), dev)
    for _ in range(5):
        np.asarray(warm(xw, tm)[0, 0])
    rows = []
    for n in sizes:
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
        xyz[:, 2] -= 25.0
        xyz_d = jax.device_put(jnp.asarray(xyz), dev)
        for method in ("sort", "sort2", "sort1q", "scatter", "scatter1"):
            f = jax.jit(lambda p, m, meth=method: R.rasterize_batch(
                p, m, h, w, 0, meth))
            try:
                ms = bench(f, (xyz_d, tm), iters)
            except Exception as e:  # OOM etc.
                ms = float("nan")
                print(f"{method}@{n}: {type(e).__name__}: {e}")
            rows.append((n, method, ms))
            print(f"| {n:>9,} | {method:8s} | {ms:8.2f} ms |",
                  flush=True)
        if n <= 1_000_000:
            # Pallas scalar-RMW kernel (kept for the kernel-choice
            # table; known slower than sort — only timed at 1M)
            from read_tpu.ops import rasterize_pallas as RP
            # [None]: bench() reads out[0][0,0,0]; the pallas path is
            # single-view 2D, so add the batch axis
            f = jax.jit(lambda p, m: RP.rasterize_pallas(
                p, m[0], h, w)[0][None])
            try:
                ms = bench(f, (xyz_d, tm), max(1, iters // 3))
            except Exception as e:
                ms = float("nan")
                print(f"pallas@{n}: {type(e).__name__}: {e}")
            rows.append((n, "pallas", ms))
            print(f"| {n:>9,} | pallas   | {ms:8.2f} ms |", flush=True)
        # pooled 5-scale pyramid (the train/inference path)
        f = jax.jit(lambda p, m: R.rasterize_pyramid_pooled(
            p, m, (h, w), 5)[0])
        try:
            ms = bench(f, (xyz_d, tm), iters)
        except Exception as e:
            ms = float("nan")
            print(f"pyramid@{n}: {type(e).__name__}: {e}")
        rows.append((n, "pyramid5", ms))
        print(f"| {n:>9,} | pyramid5 | {ms:8.2f} ms |", flush=True)

    print("\n| points | method | ms/frame |")
    print("|---|---|---|")
    for n, method, ms in rows:
        print(f"| {n:,} | {method} | {ms:.2f} |")


if __name__ == "__main__":
    main()
