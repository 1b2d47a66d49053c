"""Bisect the bf16 full-res UNet fault and measure surviving variants.

Round-2 finding: ``UNet(dtype=bfloat16)`` at 368x1216 crashed the TPU
worker. Each probe here runs ONE configuration (so a worker fault kills
only this process) selected by --variant:

  f32        : baseline f32 net (control)
  bf16       : plain bf16 net
  bf16-f32up : bf16 net but cross-scale resamples + bilinear-up in f32
  bf16-net   : bf16 net, f32 gather (pyr cast outside)

Run the sweep:  for v in f32 bf16 bf16-f32up; do
    timeout 600 python scripts/bench_bf16_bisect.py --variant $v \
        --h 368 --w 1216 || echo "$v FAILED"; done
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="bf16")
    ap.add_argument("--h", type=int, default=368)
    ap.add_argument("--w", type=int, default=1216)
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--unet-only", action="store_true")
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

    dt = jnp.float32 if args.variant == "f32" else jnp.bfloat16
    f32_resample = args.variant == "bf16-f32up"
    net = UNet(dtype=dt, f32_resample=f32_resample) \
        if hasattr(UNet, "f32_resample") else UNet(dtype=dt)
    key = jax.random.PRNGKey(0)
    table = T.init_point_texture(key, n_points, 8, "rand")
    levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4)
    pyr = [T.sample_point_texture(table, ix) for ix, _ in levels]
    variables = net.init(jax.random.PRNGKey(1), *pyr, train=False)

    if args.unet_only:
        def forward(variables, *pyr):
            return net.apply(variables, *pyr, train=False)["im_out"]
        fargs = (variables,) + tuple(pyr)
    else:
        def forward(variables, table, xyz, total_m):
            levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4)
            pyr = [T.sample_point_texture(table, ix) for ix, _ in levels]
            return net.apply(variables, *pyr, train=False)["im_out"]
        fargs = (variables, table, jnp.asarray(xyz), jnp.asarray(total_m))

    dev = jax.devices()[0]
    fargs = jax.tree.map(
        lambda x: jax.device_put(x, dev) if hasattr(x, "shape") else x,
        fargs)
    jfn = jax.jit(forward)
    t0 = time.perf_counter()
    out = jfn(*fargs)
    np.asarray(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = jfn(*fargs)
    np.asarray(out[0, 0, 0])
    dtm = (time.perf_counter() - t0) / args.iters
    print(f"{args.variant} {'unet-only' if args.unet_only else 'fused'} "
          f"{h}x{w} @{n_points}: {dtm*1e3:.1f} ms  {1.0/dtm:.2f} fps")


if __name__ == "__main__":
    main()
