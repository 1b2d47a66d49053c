"""Round-3 consolidated same-window benchmark.

Runs EVERYTHING that needs same-window comparability in one process:
control op, UNet f32 backends (net-only), raster methods at 1M,
descriptor gather variants, and the fused end-to-end render per conv
backend. bf16 UNet variants are excluded — all three bf16 formulations
crash the TPU worker on this toolchain (RESULTS_r03.md); the chip runs
f32 matmuls at bf16 rate so f32 loses nothing on the MXU.

Methodology (docs/benchmarking.md + round-2 memory): warm-up dispatches
before the first timed row, np.asarray to force results through the
tunnel, control matmul re-measured between sections to catch window
drift.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip", default="",
                    help="comma list: unet,raster,gather,fused")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from read_tpu.models import texture as T
    from read_tpu.models import unet_pallas as UP
    from read_tpu.models.unet import UNet
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    dev = jax.devices()[0]
    put = lambda x: jax.device_put(x, dev)
    h, w = 368, 1216
    rng = np.random.default_rng(0)

    ctrl_x = put(jnp.ones((8192, 8192), jnp.bfloat16))
    ctrl_f = jax.jit(lambda a: a @ a)

    def time_fn(fn, fetch, iters=args.iters, warmup=3):
        for _ in range(warmup):
            out = fn()
        np.asarray(fetch(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(fetch(out))
        return (time.perf_counter() - t0) / iters * 1e3

    def control(tag):
        ms = time_fn(lambda: ctrl_f(ctrl_x), lambda o: o[0, 0], iters=5)
        print(f"[control@{tag}] 8192^3 bf16: {ms:.2f} ms "
              f"({1.0995e12 / (ms * 1e-3) / 1e12:.1f} TFLOP/s)",
              flush=True)

    def bench(name, fn, fetch):
        try:
            t0 = time.time()
            out0 = np.asarray(fetch(fn()))
            dt = time.time() - t0
            if dt > 5:
                print(f"{name}: compiled in {dt:.0f}s", flush=True)
            ms = time_fn(fn, fetch)
            print(f"{name}: {ms:.2f} ms ({1000.0 / ms:.2f} /s)",
                  flush=True)
            return ms, out0
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            return None, None

    control("start")

    # shared scene
    n_points = 1_000_000
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    total_m = put(jnp.asarray(
        camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]))
    xyz_d = put(jnp.asarray(xyz))
    table = put(T.init_point_texture(jax.random.PRNGKey(0), n_points, 8,
                                     "rand"))

    # ---- UNet net-only backends (f32) --------------------------------
    if "unet" not in skip:
        pyr32 = [put(jnp.asarray(rng.normal(
            size=(1, h // f, w // f, 8)).astype(np.float32)))
            for f in (1, 2, 4, 8)]
        net0 = UNet()
        variables = jax.tree.map(put, net0.init(
            jax.random.PRNGKey(1), *pyr32, train=False))

        def flax_variant(**kw):
            n = UNet(**kw)
            f = jax.jit(
                lambda v, p: n.apply(v, *p, train=False)["im_out"])
            return lambda: f(variables, pyr32)

        ref = None
        for name, fn in (
                ("unet/im2col_f32", flax_variant(conv_impl="im2col")),
                ("unet/pallas_f32", lambda: UP.unet_pallas_apply(
                    variables, *pyr32)["im_out"]),
                ("unet/xla_f32", flax_variant(conv_impl="xla"))):
            ms, out = bench(name, fn, lambda o: o[0, 0, 0])
            if out is not None:
                if ref is None:
                    ref = np.asarray(out)
                else:
                    print(f"  maxdiff vs im2col: "
                          f"{np.abs(np.asarray(out) - ref).max():.2e}",
                          flush=True)
            control(name)

    # ---- raster methods @1M ------------------------------------------
    if "raster" not in skip:
        for method in ("sort", "sort2", "sort1q", "scatter"):
            f = jax.jit(lambda m, meth=method: R.rasterize_batch(
                xyz_d, m, h, w, method=meth))
            bench(f"raster/{method}@1M", lambda f=f: f(total_m),
                  lambda o: o[0][0, 0, 0])
        for method in ("sort", "sort1q"):
            f = jax.jit(lambda m, meth=method: R.rasterize_pyramid_pooled(
                xyz_d, m, (h, w), 5, method=meth))
            bench(f"raster/pyramid5-{method}@1M", lambda f=f: f(total_m),
                  lambda o: o[0][0][0, 0, 0])
        control("raster")

    # ---- descriptor gather -------------------------------------------
    if "gather" not in skip:
        idxs = [put(jnp.asarray(rng.integers(
            0, n_points, size=(1, h // f, w // f)).astype(np.int32)))
            for f in (1, 2, 4, 8)]
        naive = jax.jit(lambda t, ix: jnp.concatenate(
            [t[i].reshape(1, -1, 8) for i in ix], axis=1))
        packed = jax.jit(lambda t, ix: jnp.concatenate(
            [T.gather_rows_packed(t, i).reshape(1, -1, 8) for i in ix],
            axis=1))
        tbl16 = table.astype(jnp.bfloat16)
        bench("gather/naive-f32", lambda: naive(table, idxs),
              lambda o: o[0, 0, 0])
        bench("gather/packed-f32", lambda: packed(table, idxs),
              lambda o: o[0, 0, 0])
        bench("gather/naive-bf16tbl", lambda: naive(tbl16, idxs),
              lambda o: o[0, 0, 0])
        bench("gather/packed-bf16tbl", lambda: packed(tbl16, idxs),
              lambda o: o[0, 0, 0])
        control("gather")

    # ---- fused end-to-end (bench.py operating point) -----------------
    if "fused" not in skip:
        net_x = UNet(conv_impl="xla")
        pyr0 = [jnp.zeros((1, h // f, w // f, 8), jnp.float32)
                for f in (1, 2, 4, 8)]
        variables = jax.tree.map(put, net_x.init(
            jax.random.PRNGKey(1), *pyr0, train=False))

        def fused(apply_fn, method):
            def f(v, t, p, m):
                lv = R.rasterize_pyramid_pooled(p, m, (h, w), 4,
                                                method=method)
                pyr = [T.sample_point_texture(t, ix) for ix, _ in lv]
                return apply_fn(v, pyr)
            jf = jax.jit(f)
            return lambda: jf(variables, table, xyz_d, total_m)

        xla_apply = lambda v, pyr: net_x.apply(v, *pyr,
                                               train=False)["im_out"]
        pal_apply = lambda v, pyr: UP.unet_pallas_apply(
            v, *pyr)["im_out"]
        for mname, meth in (("sort", "sort"), ("sort1q", "sort1q")):
            bench(f"fused/xla-{mname}", fused(xla_apply, meth),
                  lambda o: o[0, 0, 0])
            bench(f"fused/pallas-{mname}", fused(pal_apply, meth),
                  lambda o: o[0, 0, 0])
        control("fused")


if __name__ == "__main__":
    main()
