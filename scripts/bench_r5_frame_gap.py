"""Round-5 probe: the fused frame measures ~49 ms while its parts sum
to ~40 (pyramids 13.4 + unet seg 26.9, /tmp/w4 + q5 windows). Where do
the ~9 ms go? Same-window, one process:

  A frame as produced (pyramids exe -> encoder exe -> decoder exe)
  B parts standalone (re-measured): pyramids / encoder / decoder
  C pyramids+encoder fused into ONE executable (one fewer boundary;
    the round-3 Mosaic fault was the FULL graph with s2d — this tests
    whether the half-merge is safe and faster)
  D pyramids emitting bf16 feature maps (halves the inter-executable
    HBM handoff: 4 levels of [1,368,1216,8] f32 ~= 23 MB/frame)

Usage: python scripts/bench_r5_frame_gap.py  (needs the real chip)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("READ_TPU_CONV3_IMPL", "dot3")

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
    print(f"control: {dt:.2f} ms = {2*8192**3/dt/1e9:.1f} TFLOP/s",
          flush=True)


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
    dtype_name = os.environ.get("READ_TPU_DTYPE", "bf16_mxu")
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
    net = UNet()
    levels0 = R.rasterize_pyramid_pooled(np.asarray(xyz), tm, (h, w), 4)
    pyr0 = [T.sample_point_texture(table, ix) for ix, _ in levels0]
    variables = jax.device_put(
        net.init(jax.random.PRNGKey(1), *pyr0, train=False), dev)

    control()

    def make_pyramids(out_dtype=None):
        @jax.jit
        def pyramids(table, xyz, total_m):
            lv = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4,
                                            method="pallas",
                                            pool_impl="packed")
            out = tuple(T.sample_point_texture(table, ix)
                        for ix, _ in lv)
            if out_dtype is not None:
                out = tuple(x.astype(out_dtype) for x in out)
            return out
        return pyramids

    pyramids = make_pyramids()

    def frame(variables, table, xyz, total_m):
        pyr = pyramids(table, xyz, total_m)
        return UP.unet_pallas_apply_seg(variables, *pyr,
                                        dtype_name=dtype_name,
                                        interpret=False)["im_out"]

    print(f"A frame (3 exes, {dtype_name}): "
          f"{timeit(frame, (variables, table, xyz_d, tm)):.2f} ms",
          flush=True)

    pyr_d = jax.tree.map(lambda x: jax.device_put(x, dev),
                         pyramids(table, xyz_d, tm))
    print(f"B1 pyramids exe          : "
          f"{timeit(pyramids, (table, xyz_d, tm)):.2f} ms", flush=True)
    enc = lambda v, *p: UP._encoder_seg(v, *p, 4, False, dtype_name,
                                        True)
    rs = enc(variables, *pyr_d)
    print(f"B2 encoder exe           : "
          f"{timeit(enc, (variables, *pyr_d)):.2f} ms", flush=True)
    dec = lambda v, a, b, c, z: UP._decoder_seg(v, a, b, c, z, 4, False,
                                                dtype_name, True,
                                                frames=1)
    print(f"B3 decoder exe           : "
          f"{timeit(dec, (variables, *rs)):.2f} ms", flush=True)
    print(f"B sum: "
          f"{timeit(pyramids, (table, xyz_d, tm)) + timeit(enc, (variables, *pyr_d)) + timeit(dec, (variables, *rs)):.2f}",
          flush=True)

    # C: pyramids + encoder in ONE executable
    @jax.jit
    def pyr_enc(variables, table, xyz, total_m):
        lv = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4,
                                        method="pallas",
                                        pool_impl="packed")
        pyr = tuple(T.sample_point_texture(table, ix) for ix, _ in lv)
        return UP._encoder_seg.__wrapped__(variables, *pyr, 4, False,
                                           dtype_name, True)
    try:
        rs2 = pyr_enc(variables, table, xyz_d, tm)
        t_pe = timeit(pyr_enc, (variables, table, xyz_d, tm))
        print(f"C pyramids+encoder fused : {t_pe:.2f} ms", flush=True)

        def frame_c(variables, table, xyz, total_m):
            r = pyr_enc(variables, table, xyz, total_m)
            return dec(variables, *r)["im_out"]
        print(f"C frame (2 exes)         : "
              f"{timeit(frame_c, (variables, table, xyz_d, tm)):.2f} ms",
              flush=True)
    except Exception as e:
        print(f"C failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # D: bf16 handoff between pyramids and encoder
    pyr16 = make_pyramids(jnp.bfloat16)

    def frame_d(variables, table, xyz, total_m):
        pyr = pyr16(table, xyz, total_m)
        return UP.unet_pallas_apply_seg(variables, *pyr,
                                        dtype_name=dtype_name,
                                        interpret=False)["im_out"]
    try:
        print(f"D frame bf16 handoff     : "
              f"{timeit(frame_d, (variables, table, xyz_d, tm)):.2f} ms",
              flush=True)
    except Exception as e:
        print(f"D failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    control()


if __name__ == "__main__":
    main()
