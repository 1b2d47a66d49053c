"""Dissect the 3x3 packed-lane kernel: how much of a grid step is tap
packing (VPU) vs the MXU dot vs window assembly vs epilogue?

Builds stripped kernel variants sharing the production BlockSpec plan:
  full      — production kernel (pack 9 taps + dot + epilogue)
  nopack    — skip the 9-tap stores; dot contracts the (stale) tap9
              scratch (same MXU shape, no packing VPU work)
  packonly  — pack the 9 taps, skip the dot (epilogue on tap9 slice)
  nowin     — full minus the window assembly (taps read from xmid only)
The deltas bound each phase's cost. Run on the real chip.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from read_tpu.ops import gated_conv_pack as GP

    def variant_kernel(*refs, nt, hb, w_img, cin, mode):
        xprev_ref, xmid_ref, xnext_ref, w_ref, out_ref, win, tap9 = refs
        i = pl.program_id(0)
        n = pl.num_programs(0)
        wv = w_img
        col = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1) % wv
        not_left = (col != 0).astype(tap9.dtype)
        not_right = (col != wv - 1).astype(tap9.dtype)
        if mode != "nowin":
            win[:, 0:1] = jnp.zeros_like(win[:, 0:1])
            win[:, 1:1 + wv] = jnp.where(i != 0, xprev_ref[:, hb - wv:],
                                         0.0)
            win[:, 1 + wv:1 + wv + nt] = xmid_ref[:, :]
            win[:, 1 + wv + nt:1 + 2 * wv + nt] = jnp.where(
                i != n - 1, xnext_ref[:, :wv], 0.0)
            win[:, 1 + 2 * wv + nt:] = jnp.zeros_like(win[:, 0:1])
        if mode in ("full", "packonly", "nowin"):
            for t, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1)
                                         for dx in (-1, 0, 1)):
                if mode == "nowin":
                    tap = xmid_ref[:, :]
                else:
                    off = 1 + wv + dy * wv + dx
                    tap = win[:, off:off + nt]
                if dx == -1:
                    tap = tap * not_left
                elif dx == 1:
                    tap = tap * not_right
                tap9[t * cin:(t + 1) * cin, :] = tap
        if mode == "packonly":
            out_ref[:, :] = tap9[:out_ref.shape[0], :]
            return
        acc = jax.lax.dot_general(
            w_ref[:], tap9[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:, :] = acc

    def run(h, w_img, cin, mode, rows=0):
        c2 = 2 * cin
        nr = rows or GP.pick_rows(w_img, cin)
        hpad = (-h) % nr
        hh = h + hpad
        nt = nr * w_img
        grid = hh // nr
        import math
        hr = 128 // math.gcd(w_img, 128)
        if nr % hr:
            hr = nr
        hb = hr * w_img
        rpb = nr // hr
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((cin, hh * w_img),
                                            ).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((c2, 9 * cin)
                                            ).astype(np.float32))
        kern = functools.partial(variant_kernel, nt=nt, hb=hb,
                                 w_img=w_img, cin=cin, mode=mode)
        in_specs = [
            pl.BlockSpec((cin, hb),
                         lambda i: (0, jnp.maximum(i * rpb - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, nt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, hb),
                         lambda i: (0, jnp.minimum(
                             (i + 1) * rpb,
                             pl.num_programs(0) * rpb - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        fn = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((c2, nt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c2, hh * w_img),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((cin, nt + 2 * w_img + 2), jnp.float32),
                pltpu.VMEM((9 * cin, nt), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        jf = jax.jit(lambda x, w: fn(x, x, x, w))
        out = jf(x, w)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            out = jf(x, w)
        np.asarray(out[0, 0])
        return (time.perf_counter() - t0) / iters * 1e3

    shapes = [(368, 1216, 32), (184, 608, 64), (92, 304, 128),
              (46, 152, 256)]
    for h, w_img, cin in shapes:
        ts = {}
        for mode in ("full", "nopack", "packonly", "nowin"):
            try:
                ts[mode] = run(h, w_img, cin, mode)
            except Exception as e:
                ts[mode] = float("nan")
                print(f"  {mode} FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}")
        print(f"[{h}x{w_img} C{cin}] full {ts['full']:.3f}  "
              f"nopack {ts['nopack']:.3f}  packonly {ts['packonly']:.3f}"
              f"  nowin {ts['nowin']:.3f}  (ms)")


if __name__ == "__main__":
    main()
