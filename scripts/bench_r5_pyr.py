"""Round-5 probe: where do the pyramids-executable's ~5 ms of overhead
go (16.3 ms fused vs 7.3 raster + 3.6 gather standalone)?

Variants, all timed same-window with a re-measured control:
  A fused pyramids (pallas raster)        -- production
  B fused pyramids (scatter1 raster)
  C split: raster exe -> gather exe       (2 dispatches)
  D fused, pools only (no gather)         -- isolates pool cost
  E fused, gather level0 only
  F fused + bf16 feature output
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


def control():
    import jax, jax.numpy as jnp
    a = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192),
                          jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    dt = timeit(f, (a,), iters=4, warmup=1)
    print(f"control: {dt:.2f} ms = {2*8192**3/dt/1e9:.1f} TFLOP/s")


def main():
    import jax
    import jax.numpy as jnp
    from read_tpu.models import texture as T
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    rng = np.random.default_rng(0)
    n_points, h, w = 1_000_000, 368, 1216
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    tm = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(jnp.asarray(x), dev)
    xyz_d, tm = put(xyz), put(tm)
    table = jax.device_put(
        T.init_point_texture(jax.random.PRNGKey(0), n_points, 8, "rand"),
        dev)

    control()

    def make_fused(method, gather_levels=4, out_dtype=None,
                   pools_only=False):
        @jax.jit
        def f(table, xyz, total_m):
            lv = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4,
                                            method=method)
            if pools_only:
                return tuple(ix for ix, _ in lv)
            out = tuple(T.sample_point_texture(table, ix)
                        for ix, _ in lv[:gather_levels])
            if out_dtype is not None:
                out = tuple(x.astype(out_dtype) for x in out)
            return out
        return f

    A = make_fused("pallas")
    print(f"A fused pallas 4-gather : {timeit(A, (table, xyz_d, tm)):.2f} ms")
    B = make_fused("scatter1")
    print(f"B fused scatter1        : {timeit(B, (table, xyz_d, tm)):.2f} ms")

    raster_all = jax.jit(lambda xyz, m: tuple(
        ix for ix, _ in R.rasterize_pyramid_pooled(xyz, m, (h, w), 4,
                                                   method="pallas")))
    gx = raster_all(xyz_d, tm)
    gather4 = jax.jit(lambda table, *ixs: tuple(
        T.sample_point_texture(table, ix) for ix in ixs))

    def split(table, xyz, m):
        ixs = raster_all(xyz, m)
        return gather4(table, *ixs)
    print(f"C split raster->gather  : {timeit(split, (table, xyz_d, tm)):.2f} ms")
    print(f"C1  raster_all exe      : {timeit(raster_all, (xyz_d, tm)):.2f} ms")
    print(f"C2  gather exe          : {timeit(gather4, (table, *gx)):.2f} ms")

    D = make_fused("pallas", pools_only=True)
    print(f"D fused pools no gather : {timeit(D, (table, xyz_d, tm)):.2f} ms")
    E = make_fused("pallas", gather_levels=1)
    print(f"E fused gather lvl0 only: {timeit(E, (table, xyz_d, tm)):.2f} ms")
    F = make_fused("pallas", out_dtype=jnp.bfloat16)
    print(f"F fused bf16 out        : {timeit(F, (table, xyz_d, tm)):.2f} ms")

    control()


if __name__ == "__main__" and os.environ.get("PYR_MODE") != "2":
    main()


def main2():
    """packed-pool A/B at the production operating point."""
    import jax
    import jax.numpy as jnp
    from read_tpu.models import texture as T
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    rng = np.random.default_rng(0)
    n_points, h, w = 1_000_000, 368, 1216
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    tm = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(jnp.asarray(x), dev)
    xyz_d, tm = put(xyz), put(tm)
    table = jax.device_put(
        T.init_point_texture(jax.random.PRNGKey(0), n_points, 8, "rand"),
        dev)
    control()
    for impl in ("exact", "packed"):
        @jax.jit
        def f(table, xyz, total_m, impl=impl):
            lv = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4,
                                            method="pallas",
                                            pool_impl=impl)
            return tuple(T.sample_point_texture(table, ix)
                         for ix, _ in lv)
        print(f"pyramids pool={impl}: {timeit(f, (table, xyz_d, tm)):.2f} ms")
    control()
if os.environ.get("PYR_MODE") == "2":
    main2()
