"""Round-4 per-stage breakdown of the orchestrated production frame:
pyramids executable (pallas raster + pool + gather), encoder, decoder,
and a no-op dispatch to calibrate the tunnel's per-dispatch cost. Runs
each stage standalone AND chained N times inside one jit (CHAIN mode
removes dispatch cost from the measurement, round-3 methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np


def timeit(fn, args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from read_tpu.models import texture as T
    from read_tpu.models import unet_pallas as UP
    from read_tpu.models.unet import UNet
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    rng = np.random.default_rng(0)
    n_points, h, w = 1_000_000, 368, 1216
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    total_m = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]

    net = UNet()
    table = T.init_point_texture(jax.random.PRNGKey(0), n_points, 8,
                                 "rand")
    levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4)
    pyr0 = [T.sample_point_texture(ix, table) if False else
            T.sample_point_texture(table, ix) for ix, _ in levels]
    variables = net.init(jax.random.PRNGKey(1), *pyr0, train=False)

    dev = jax.devices()[0]
    put = lambda x: jax.device_put(jnp.asarray(x), dev)
    xyz_d, tm = put(xyz), put(total_m)
    table = jax.device_put(table, dev)
    variables = jax.device_put(variables, dev)
    pyr0 = [jax.device_put(x, dev) for x in pyr0]

    # 0) dispatch no-op: measures the tunnel's per-dispatch floor
    nop = jax.jit(lambda x: x + 1.0)
    one = put(np.ones((8, 128), np.float32))
    print(f"dispatch no-op: {timeit(nop, (one,), iters=50):.2f} ms")

    # 1) pyramids executable (raster + pool + gather), pallas raster
    @jax.jit
    def pyramids(table, xyz, total_m):
        lv = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4,
                                        method="pallas")
        return tuple(T.sample_point_texture(table, ix) for ix, _ in lv)

    print(f"pyramids (raster+pool+gather): "
          f"{timeit(pyramids, (table, xyz_d, tm)):.2f} ms")

    @jax.jit
    def raster_only(xyz, total_m):
        return R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4,
                                          method="pallas")[0][0]

    print(f"raster+pool only: {timeit(raster_only, (xyz_d, tm)):.2f} ms")

    # 2) encoder / decoder standalone (the production two-exe split)
    dtype_name = os.environ.get("READ_TPU_DTYPE", "bf16_mxu")
    print(f"dtype={dtype_name} conv3="
          f"{os.environ.get('READ_TPU_CONV3_IMPL', 'pack9')}")
    enc = lambda v, *pyr: UP._encoder_seg(v, *pyr, num_res=4,
                                          interpret=False,
                                          dtype_name=dtype_name, s2d=True)
    r1, r2, r3, z = enc(variables, *pyr0)
    print(f"encoder: {timeit(enc, (variables, *pyr0)):.2f} ms")

    dec = lambda v, a, b, c, d: UP._decoder_seg(
        v, a, b, c, d, num_res=4, interpret=False,
        dtype_name=dtype_name, s2d=True, frames=1)
    print(f"decoder: {timeit(dec, (variables, r1, r2, r3, z)):.2f} ms")

    # 3) gather alone (pyramids minus raster)
    ix0 = [jax.device_put(ix, dev)
           for ix, _ in R.rasterize_pyramid_pooled(xyz, total_m, (h, w),
                                                   4)]

    @jax.jit
    def gather(table, *ixs):
        return tuple(T.sample_point_texture(table, ix) for ix in ixs)

    print(f"gather 4 levels: {timeit(gather, (table, *ix0)):.2f} ms")


if __name__ == "__main__":
    main()
