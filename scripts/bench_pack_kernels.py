"""Microbench: packed-lane gated conv kernels (ops/gated_conv_pack) at
the UNet's four level shapes, f32, with a rows-per-grid-step sweep.

Answers: what TFLOP/s does one kernel reach standalone, and is the
default pick_rows() lane target the right one? (The full pallas UNet
runs 25.6 TFLOP/s effective — RESULTS_r03.md — against a ~63 TFLOP/s
M=64 MXU ceiling; this isolates kernel vs glue.)
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
    from read_tpu.ops import gated_conv_pack as GP

    dev = jax.devices()[0]
    shapes = [  # (h, w, cin, cout) — UNet level shapes at 368x1216
        (368, 1216, 32, 32),
        (184, 608, 64, 64),
        (92, 304, 128, 128),
        (46, 152, 256, 256),
    ]
    rng = np.random.default_rng(0)

    def timeit(fn, iters=20, warmup=3):
        for _ in range(warmup):
            out = fn()
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[0, 0])
        return (time.perf_counter() - t0) / iters

    # Per-dispatch tunnel overhead is ~1.8 ms — single-call timing is
    # dispatch-bound for these <1 ms kernels. Chain CHAIN applications
    # inside ONE jit (cout == cin at every UNet level shape, so the
    # output feeds back) and divide.
    CHAIN = 20

    for h, w, cin, cout in shapes:
        x = jax.device_put(jnp.asarray(rng.normal(
            size=(cin, h * w)).astype(np.float32)), dev)
        wk = jax.device_put(jnp.asarray(rng.normal(
            size=(3, 3, cin, 2 * cout)).astype(np.float32) * 0.05), dev)
        b = jax.device_put(jnp.zeros((2 * cout,), jnp.float32), dev)
        s = jax.device_put(jnp.ones((cout,), jnp.float32), dev)
        o = jax.device_put(jnp.zeros((cout,), jnp.float32), dev)
        flops = 2 * h * w * 9 * cin * 2 * cout
        base_nr = GP.pick_rows(w, cin)
        for mult in (0.5, 1, 2):
            nr = max(1, int(base_nr * mult))
            if (nr * w) % 128:
                continue  # Mosaic needs lane blocks %128 (h pads inside)
            try:
                @jax.jit
                def chain(x, nr=nr):
                    for _ in range(CHAIN):
                        x = GP.gated_conv3x3_chw(
                            x, wk, b, s, o, w_img=w, rows=nr)
                    return x
                dt = timeit(lambda: chain(x)) / CHAIN
                print(f"[{h}x{w} C{cin}] rows={nr:3d} "
                      f"(lanes {nr * w:6d}): {dt * 1e3:7.3f} ms  "
                      f"{flops / dt / 1e12:6.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"[{h}x{w} C{cin}] rows={nr}: FAILED "
                      f"{type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}", flush=True)
        # 1x1 kernel at this level for reference
        wk1 = jax.device_put(jnp.asarray(rng.normal(
            size=(1, 1, cin, 2 * cout)).astype(np.float32) * 0.05), dev)

        @jax.jit
        def chain1(x):
            for _ in range(CHAIN):
                x = GP.gated_conv1x1_chw(x, wk1, b, s, o)
            return x
        dt = timeit(lambda: chain1(x)) / CHAIN
        fl1 = 2 * h * w * cin * 2 * cout
        print(f"[{h}x{w} C{cin}] 1x1: {dt * 1e3:7.3f} ms  "
              f"{fl1 / dt / 1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
