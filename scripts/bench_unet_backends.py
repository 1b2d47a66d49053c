"""Same-window comparison of UNet inference backends at the kitti6
operating point (368x1216, 8-ch descriptor pyramid, batch 1).

Backends: xla f32 (round-2 default), im2col f32/bf16, pallas packed-lane
f32/bf16 (ops/gated_conv_pack.py). Methodology per
docs/benchmarking.md + memory: warm-up dispatches first, one process,
control op re-measured, np.asarray to force through the tunnel.

Usage: python scripts/bench_unet_backends.py [--skip xla_f32,...]
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
    # Both bf16 routes CRASH the TPU worker on this toolchain (round 3,
    # two independent windows): pallas_bf16 faults at run time (Mosaic
    # bf16 tiling), im2col_bf16 kills the worker during the full-res
    # compile (same signature as the round-2 bf16 XLA-conv crash — the
    # conv-free patch-matmul formulation does NOT dodge it). Re-enable
    # explicitly with --skip "" only in a window you can afford to lose
    # (~50 min worker recovery). Note this chip runs f32 matmuls at
    # bf16 rate (scripts/bench_roofline.py), so f32 loses no MXU rate.
    ap.add_argument("--skip", default="pallas_bf16,im2col_bf16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--h", type=int, default=368)
    ap.add_argument("--w", type=int, default=1216)
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from read_tpu.models.unet import UNet
    from read_tpu.models import unet_pallas as UP

    dev = jax.devices()[0]
    h, w = args.h, args.w
    rng = np.random.default_rng(0)
    pyr32 = [jax.device_put(jnp.asarray(
        rng.normal(size=(1, h // f, w // f, 8)).astype(np.float32)), dev)
        for f in (1, 2, 4, 8)]

    net = UNet()
    variables = jax.device_put(
        net.init(jax.random.PRNGKey(0), *pyr32, train=False), dev)

    # control op: catches tunnel-window drift between rows
    ctrl_x = jax.device_put(
        jnp.ones((4096, 4096), jnp.bfloat16), dev)
    ctrl = jax.jit(lambda a: a @ a)

    def time_fn(fn, fetch, iters=args.iters, warmup=3):
        for _ in range(warmup):
            out = fn()
        np.asarray(fetch(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(fetch(out))
        return (time.perf_counter() - t0) / iters * 1e3

    def control():
        ms = time_fn(lambda: ctrl(ctrl_x), lambda o: o[0, 0], iters=5)
        print(f"  [control 4096^3 bf16 matmul: {ms:.2f} ms]", flush=True)

    def flax_variant(**kw):
        n = UNet(**kw)
        f = jax.jit(lambda v, p: n.apply(v, *p, train=False)["im_out"])
        return lambda f=f: f(variables, pyr32)

    # Order = risk schedule: the headroom candidate (im2col bf16) runs
    # first while the window is known-healthy; the full-res XLA-conv
    # compile (crashed the worker twice in round 3) runs LAST.
    variants = {}
    if "im2col_bf16" not in skip:
        variants["im2col_bf16"] = flax_variant(conv_impl="im2col",
                                               dtype=jnp.bfloat16)
    if "im2col_f32" not in skip:
        variants["im2col_f32"] = flax_variant(conv_impl="im2col")
    if "pallas_f32" not in skip:
        variants["pallas_f32"] = lambda: UP.unet_pallas_apply(
            variables, *pyr32)["im_out"]
    if "pallas_seg" not in skip:
        # production path: encoder/decoder executables + s2d strided
        variants["pallas_seg"] = lambda: UP.unet_pallas_apply_seg(
            variables, *pyr32)["im_out"]
    if "pallas_bf16" not in skip:
        variants["pallas_bf16"] = lambda: UP.unet_pallas_apply(
            variables, *pyr32, dtype_name="bfloat16")["im_out"]
    if "xla_f32" not in skip:
        variants["xla_f32"] = flax_variant(conv_impl="xla")

    ref = None
    for name, fn in variants.items():
        try:
            t_c0 = time.time()
            out0 = np.asarray(fn())  # compile
            print(f"{name}: compiled in {time.time()-t_c0:.0f}s",
                  flush=True)
            if ref is None:
                ref = out0
            else:
                print(f"  maxdiff vs first: "
                      f"{np.abs(out0 - ref).max():.4f}", flush=True)
            ms = time_fn(fn, lambda o: o[0, 0, 0])
            print(f"{name}: {ms:.2f} ms  ({1000.0/ms:.2f} net-fps)",
                  flush=True)
            control()
        except Exception as e:  # keep the sweep alive on one failure
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
