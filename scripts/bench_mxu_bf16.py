"""Measure the bf16-MXU-operand fast path (dtype_name='bf16_mxu')
against float32 on the production encoder/decoder executables, and the
numeric divergence it introduces (max|diff| on im_out in [~-1, 1]).
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
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
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
    pyr0 = [T.sample_point_texture(table, ix) for ix, _ in levels]
    variables = net.init(jax.random.PRNGKey(1), *pyr0, train=False)

    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    pyr0 = [jax.device_put(x, dev) for x in pyr0]

    outs = {}
    for dt in ("float32", "bf16_mxu"):
        enc = lambda v, *pyr: UP._encoder_seg(
            v, *pyr, num_res=4, interpret=False, dtype_name=dt, s2d=True)
        r1, r2, r3, z = enc(variables, *pyr0)
        t_enc = timeit(enc, (variables, *pyr0))
        dec = lambda v, a, b, c, d: UP._decoder_seg(
            v, a, b, c, d, num_res=4, interpret=False, dtype_name=dt,
            s2d=True, frames=1)
        t_dec = timeit(dec, (variables, r1, r2, r3, z))
        outs[dt] = np.asarray(dec(variables, r1, r2, r3, z)["im_out"])
        print(f"{dt}: encoder {t_enc:.2f} ms, decoder {t_dec:.2f} ms")

    d = np.abs(outs["float32"] - outs["bf16_mxu"])
    print(f"im_out max|diff| {d.max():.5f}  mean|diff| {d.mean():.6f}  "
          f"f32 range [{outs['float32'].min():.3f}, "
          f"{outs['float32'].max():.3f}]")


if __name__ == "__main__":
    main()
