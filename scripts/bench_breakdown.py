"""Stage breakdown of the fused render at the bench point:
raster-only, raster+gather, full pipeline (VERDICT r1 item 1a: report a
breakdown). Run on the real chip.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import time

import numpy as np


def timeit(jfn, args, iters=20):
    out = jfn(*args)
    np.asarray(jax_leaf(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    np.asarray(jax_leaf(out))
    return (time.perf_counter() - t0) / iters * 1e3


def jax_leaf(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    return x[(0,) * x.ndim]


def main():
    import jax
    import jax.numpy as jnp
    from read_tpu.models import texture as T
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
    key = jax.random.PRNGKey(0)
    table = T.init_point_texture(key, n_points, 8, "rand")
    levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4)
    pyr0 = [T.sample_point_texture(table, ix) for ix, _ in levels]
    variables = net.init(jax.random.PRNGKey(1), *pyr0, train=False)

    dev = jax.devices()[0]
    put = lambda x: jax.device_put(x, dev)
    xyz_d, tm = put(jnp.asarray(xyz)), put(jnp.asarray(total_m))
    table_d = put(table)
    variables = jax.tree.map(put, variables)
    pyr_d = [put(x) for x in pyr0]

    f_raster = jax.jit(
        lambda p, m: R.rasterize_pyramid_pooled(p, m, (h, w), 4)[0][0])
    f_gather = jax.jit(lambda p, m, t: [
        T.sample_point_texture(t, ix)
        for ix, _ in R.rasterize_pyramid_pooled(p, m, (h, w), 4)])
    f_unet = jax.jit(
        lambda v, pyr: net.apply(v, *pyr, train=False)["im_out"])
    f_full = jax.jit(lambda v, t, p, m: net.apply(
        v, *[T.sample_point_texture(t, ix) for ix, _ in
             R.rasterize_pyramid_pooled(p, m, (h, w), 4)],
        train=False)["im_out"])

    ms_r = timeit(f_raster, (xyz_d, tm))
    print(f"raster pyramid : {ms_r:7.2f} ms", flush=True)
    ms_g = timeit(f_gather, (xyz_d, tm, table_d))
    print(f"raster+gather  : {ms_g:7.2f} ms", flush=True)
    ms_u = timeit(f_unet, (variables, pyr_d))
    print(f"UNet alone     : {ms_u:7.2f} ms", flush=True)
    ms_f = timeit(f_full, (variables, table_d, xyz_d, tm))
    print(f"full fused     : {ms_f:7.2f} ms  ({1000.0/ms_f:.2f} fps)",
          flush=True)


if __name__ == "__main__":
    main()
