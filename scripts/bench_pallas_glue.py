"""Subtraction diagnostic: where do the pallas UNet's non-kernel ms go?

Times the full ``unet_pallas_apply`` against variants with one glue
stage at a time replaced by a cheaper stand-in (semantics change — the
DIFFERENCE in wall time is the stage's cost, outputs are discarded):

- ``nearest_up``: x4 bilinear decoder upsamples -> nearest repeats
- ``slice_stride``: k3s2/k4s2 strided transition convs -> 2x2 slice
  subsample + the same gated epilogue via the 1x1 pallas kernel
  (removes both the im2col matmul and the NHWC<->CHW transposes)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from read_tpu.models import unet_pallas as UP
    from read_tpu.models.unet import UNet
    from read_tpu.ops import gated_conv_pack as GP

    dev = jax.devices()[0]
    h, w = 368, 1216
    rng = np.random.default_rng(0)
    pyr = [jax.device_put(jnp.asarray(rng.normal(
        size=(1, h // f, w // f, 8)).astype(np.float32)), dev)
        for f in (1, 2, 4, 8)]
    net = UNet()
    variables = jax.device_put(
        net.init(jax.random.PRNGKey(0), *pyr, train=False), dev)

    def timeit(fn, iters=10, warmup=3):
        for _ in range(warmup):
            out = fn()
        np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[0, 0, 0])
        return (time.perf_counter() - t0) / iters * 1e3

    def run(tag):
        f = lambda: UP.unet_pallas_apply(variables, *pyr)["im_out"]
        ms = timeit(f)
        print(f"{tag}: {ms:.2f} ms", flush=True)
        UP.unet_pallas_apply.clear_cache()
        return ms

    base = run("full")

    # ---- nearest instead of bilinear up4 ------------------------------
    orig_up = UP._bilinear_up4
    UP._bilinear_up4 = lambda x: UP._nup(x, 4)
    up = run("nearest_up4")
    UP._bilinear_up4 = orig_up

    # ---- slice-subsample instead of strided im2col conv ---------------
    orig_conv = UP._Ctx.conv

    def conv_slice(self, name, x, relu, stride=1):
        if stride == 1:
            return orig_conv(self, name, x, relu, stride)
        p = UP._subtree(self.params, name)
        wk = p["conv_fm"]["kernel"]
        b = p["conv_fm"]["bias"]
        scale, offset = UP._fold_bn(p, UP._subtree(self.stats, name))
        cin, hh, ww = x.shape
        xs = x[:, ::stride, ::stride]
        w1 = jnp.mean(wk, axis=(0, 1))[None, None]  # [1,1,cin,c2]
        out = GP.gated_conv1x1_chw(
            xs.reshape(cin, -1), w1, b, scale, offset, relu=relu,
            interpret=self.interpret)
        return out.reshape(-1, xs.shape[1], xs.shape[2])

    UP._Ctx.conv = conv_slice
    st = run("slice_stride")
    UP._Ctx.conv = orig_conv

    print(f"bilinear_up4 cost ~ {base - up:.2f} ms; "
          f"strided-conv+transpose cost ~ {base - st:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
