"""Characterize the isolated-clean/full-graph-fault Mosaic class.

Both the s2d strided route and the concat-free 1x1 kernels are
bit-exact and run clean on the real TPU in isolation, yet fault the
worker inside the full UNet graph (RESULTS_r03, probe_pack_new).
Hypothesis under test: the axon runtime faults when ONE executable
chains too many DISTINCT Mosaic programs (the default net has ~18
distinct kernel shapes and runs; +1 s2d shape or +9 cat shapes fault).

Ramp A: one jit containing N DISTINCT tiny gated-conv programs (each a
unique (cin, w_img) so Mosaic compiles a separate binary), N rising —
first failing N is the threshold, found with a single worker crash.
Ramp B (if A is clean to 60): one program dispatched N times.

Usage: python scripts/probe_kernel_count.py [--max 60]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from read_tpu.ops import gated_conv_pack as GP

    max_n = 60
    if "--max" in sys.argv:
        max_n = int(sys.argv[sys.argv.index("--max") + 1])
    dispatch = "--dispatch" in sys.argv

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    h, wimg = 64, 128

    def chain(n):
        # n distinct programs: vary cin over 8..8+n so every call is a
        # unique Mosaic binary (ramp B: same cin, n dispatches)
        cins = [8 if dispatch else 8 + i for i in range(n)]
        ws = [jnp.asarray(rng.normal(size=(3, 3, c, 16))
                          .astype(np.float32) * 0.1) for c in cins]
        bs = jnp.zeros(16, jnp.float32)
        sc = jnp.ones(8, jnp.float32)
        of = jnp.zeros(8, jnp.float32)
        x0 = jax.device_put(jnp.asarray(rng.normal(
            size=(cins[0], h * wimg)).astype(np.float32)), dev)

        @jax.jit
        def f(x):
            outs = []
            for i, c in enumerate(cins):
                xi = jnp.tile(x[:1], (c, 1)) if c != x.shape[0] else x
                outs.append(GP.gated_conv3x3_chw(
                    xi, ws[i], bs, sc, of, w_img=wimg))
            return sum(o.sum() for o in outs)

        return f, x0

    n = 4
    while n <= max_n:
        t0 = time.time()
        f, x0 = chain(n)
        val = float(np.asarray(f(x0)))
        print(f"N={n}: ok ({time.time() - t0:.0f}s, sum={val:.3e})",
              flush=True)
        n += 4 if n < 16 else 8
    print("clean to max — distinct-program count is NOT the trigger",
          flush=True)


if __name__ == "__main__":
    main()
