"""End-to-end render variants at the bench point (368x1216, 1M pts).

Measures the fused frame and its stages across the round-2 perf work:
  - conv backend: XLA conv lowering vs im2col+matmul (models/unet.py)
  - dtype: f32 vs bf16 (bf16 via XLA convs crashes/does not compile on
    this toolchain; im2col has no conv op, so bf16 becomes usable)
  - descriptor table dtype for the gather (f32 vs bf16)

Usage: python scripts/bench_render_variants.py [--variants v1,v2,...]
  variants: f32-xla  f32-im2col  bf16-im2col  bf16-im2col-bf16tab
Each variant runs in-process sequentially; run one per process via
--variants if a variant is suspected of wedging the worker.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import argparse
import time

import numpy as np


def timeit(jfn, args, iters=20):
    out = jfn(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str,
                    default="f32-xla,f32-im2col,bf16-im2col,"
                            "bf16-im2col-bf16tab")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--points", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from read_tpu.models import texture as T
    from read_tpu.models.unet import UNet
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    rng = np.random.default_rng(0)
    n_points, h, w = args.points, 368, 1216
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    total_m = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]
    dev = jax.devices()[0]
    xyz_d = jax.device_put(jnp.asarray(xyz), dev)
    tm_d = jax.device_put(jnp.asarray(total_m), dev)

    table = T.init_point_texture(jax.random.PRNGKey(0), n_points, 8,
                                 "rand")
    levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4)
    pyr0 = [T.sample_point_texture(table, ix) for ix, _ in levels]

    for variant in args.variants.split(","):
        dt = jnp.bfloat16 if variant.startswith("bf16") else jnp.float32
        impl = "xla" if variant.endswith("-xla") else "im2col"
        tab_dt = jnp.bfloat16 if variant.endswith("bf16tab") \
            else jnp.float32
        net = UNet(dtype=dt, conv_impl=impl) if hasattr(
            UNet, "conv_impl") else UNet(dtype=dt)
        variables = net.init(jax.random.PRNGKey(1), *pyr0, train=False)
        tab = jax.device_put(table.astype(tab_dt), dev)
        var_d = jax.device_put(variables, dev)

        def forward(variables, table, xyz, total_m):
            levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4)
            pyr = [T.sample_point_texture(table, ix).astype(dt)
                   for ix, _ in levels]
            return net.apply(variables, *pyr, train=False)["im_out"]

        try:
            t0 = time.perf_counter()
            jfn = jax.jit(forward)
            ms = timeit(jfn, (var_d, tab, xyz_d, tm_d), args.iters)
            print(f"{variant:22s}: {ms:7.2f} ms/frame  "
                  f"{1e3/ms:6.2f} fps  "
                  f"(first+compile {time.perf_counter()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{variant:22s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
