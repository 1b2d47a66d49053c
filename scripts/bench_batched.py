"""Throughput vs batch: the fused render at B frames per call.

Offline trajectory rendering (baseline config 1) is throughput-bound,
not latency-bound; batching frames raises MXU occupancy of the 32-ch
convs. Prints frames/sec per chip for B in {1,2,4,8}.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv-impl", dest="conv_impl", default="xla",
                    choices=["xla", "im2col"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from read_tpu.models import texture as T
    from read_tpu.models.unet import UNet
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    rng = np.random.default_rng(0)
    n_points, h, w = 1_000_000, 368, 1216
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    net = UNet(conv_impl=args.conv_impl, dtype=dt)
    key = jax.random.PRNGKey(0)
    table = T.init_point_texture(key, n_points, 8, "rand")
    m1 = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]
    levels = R.rasterize_pyramid_pooled(xyz, m1, (h, w), 4)
    pyr = [T.sample_point_texture(table, ix) for ix, _ in levels]
    variables = net.init(jax.random.PRNGKey(1), *pyr, train=False)

    dev = jax.devices()[0]
    put = lambda x: jax.device_put(x, dev)
    xyz_d, table_d = put(jnp.asarray(xyz)), put(table)
    variables = jax.tree.map(put, variables)

    def forward(v, t, p, ms):
        lv = R.rasterize_pyramid_pooled(p, ms, (h, w), 4)
        pyr = [T.sample_point_texture(t, ix) for ix, _ in lv]
        return net.apply(v, *pyr, train=False)["im_out"]

    jfn = jax.jit(forward)
    for b in (1, 2, 4, 8):
        views = []
        for i in range(b):
            vm = np.eye(4)
            vm[0, 3] = 0.1 * i
            views.append(camera.total_matrix(P, vm))
        ms = put(jnp.asarray(np.stack(views).astype(np.float32)))
        out = jfn(variables, table_d, xyz_d, ms)
        np.asarray(out[0, 0, 0])
        iters = max(4, 16 // b)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(variables, table_d, xyz_d, ms)
        np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"B={b}: {b/dt:8.2f} frames/s  ({dt*1e3/b:.2f} ms/frame)",
              flush=True)


if __name__ == "__main__":
    main()
