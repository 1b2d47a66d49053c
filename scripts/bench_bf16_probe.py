"""bf16 probe of the fused render at the bench point.

Round-1/2 finding: plain ``UNet(dtype=bfloat16)`` at the full 368x1216
frame crashes the TPU worker (kernel fault). This script bisects the
fault (resolution, suspect ops) and measures fps of whatever variant
survives. Usage:
  python scripts/bench_bf16_probe.py [--dtype bfloat16] [--h 368]
      [--w 1216] [--points 1000000] [--iters 20]
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--h", type=int, default=368)
    ap.add_argument("--w", type=int, default=1216)
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from read_tpu.models import texture as T
    from read_tpu.models.unet import UNet
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    rng = np.random.default_rng(0)
    n_points, h, w = args.points, args.h, args.w
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    total_m = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]

    net = UNet(dtype=jnp.dtype(args.dtype))
    key = jax.random.PRNGKey(0)
    table = T.init_point_texture(key, n_points, 8, "rand")
    levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4)
    pyr = [T.sample_point_texture(table, ix) for ix, _ in levels]
    variables = net.init(jax.random.PRNGKey(1), *pyr, train=False)

    def forward(variables, table, xyz, total_m):
        levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4)
        pyr = [T.sample_point_texture(table, ix) for ix, _ in levels]
        return net.apply(variables, *pyr, train=False)["im_out"]

    dev = jax.devices()[0]
    fargs = jax.tree.map(
        lambda x: jax.device_put(x, dev) if hasattr(x, "shape") else x,
        (variables, table, jnp.asarray(xyz), jnp.asarray(total_m)))
    jfn = jax.jit(forward)
    out = jfn(*fargs)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = jfn(*fargs)
    np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.dtype} fused render {h}x{w} @{n_points}: "
          f"{1.0/dt:.2f} fps")


if __name__ == "__main__":
    main()
