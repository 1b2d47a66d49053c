"""Microbench: Pallas fused gated conv vs the XLA BasicConv lowering.

Measures ms/call at the UNet's four level shapes (368x1216 frame) for
(a) XLA eval-mode BasicConv (conv + gate + BN), (b) the Pallas
gated_conv3x3 kernel, in f32 and bf16.

Usage: python scripts/bench_gated_conv.py [--iters 20]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

import numpy as np


def timeit(fn, args, iters):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile-h", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from read_tpu.models.unet import BasicConv
    import gated_conv_pallas_r2 as G  # superseded round-2 kernel, kept with its bench

    dev = jax.devices()[0]
    shapes = [
        (368, 1216, 32, 32),
        (184, 608, 64, 64),
        (92, 304, 128, 128),
        (46, 152, 256, 256),
    ]
    for dtname in ("float32", "bfloat16"):
        dt = jnp.dtype(dtname)
        tot_x, tot_p = 0.0, 0.0
        for h, w, cin, cout in shapes:
            key = jax.random.PRNGKey(0)
            x = jax.device_put(
                jax.random.normal(key, (1, h, w, cin), jnp.float32), dev)
            mod = BasicConv(cout, 3, relu=True, dtype=dt)
            variables = mod.init(jax.random.PRNGKey(1), x, train=False)
            variables = jax.device_put(variables, dev)
            fx = jax.jit(lambda v, x: mod.apply(v, x, train=False))
            ms_x = timeit(fx, (variables, x), args.iters) * 1e3

            bn = variables["params"]["norm"]
            stats = variables["batch_stats"]["norm"]
            scale = bn["scale"] * jax.lax.rsqrt(stats["var"] + 1e-5)
            offset = bn["bias"] - stats["mean"] * scale
            xk = jax.device_put(x[0].astype(dt), dev)
            wk = jax.device_put(
                variables["params"]["conv_fm"]["kernel"], dev)
            bk = jax.device_put(variables["params"]["conv_fm"]["bias"],
                                dev)
            fp = jax.jit(lambda x, w, b, s, o: G.gated_conv3x3(
                x, w, b, s, o, relu=True, tile_h=args.tile_h))
            ms_p = timeit(fp, (xk, wk, bk, scale, offset),
                          args.iters) * 1e3
            fl = 2 * h * w * cin * 2 * cout * 9
            print(f"{dtname:9s} {h:4d}x{w:<4d} {cin:3d}->{cout:3d}: "
                  f"xla {ms_x:6.2f} ms ({fl/ms_x/1e9:5.1f} TF/s)  "
                  f"pallas {ms_p:6.2f} ms ({fl/ms_p/1e9:5.1f} TF/s)  "
                  f"speedup {ms_x/ms_p:4.1f}x", flush=True)
            tot_x += ms_x
            tot_p += ms_p
        print(f"  {dtname} totals: xla {tot_x:.2f} ms, "
              f"pallas {tot_p:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
