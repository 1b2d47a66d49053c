"""Same-window gather comparison: naive table[idx] vs the packed-group
gather (models/texture.gather_rows_packed) at the render operating point
(4-scale pyramid worth of indices, 1M and 2M point tables).
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
    from read_tpu.models import texture as T

    dev = jax.devices()[0]
    h, w = 368, 1216
    rng = np.random.default_rng(0)

    def time_fn(fn, *a, iters=10, warmup=3):
        for _ in range(warmup):
            out = fn(*a)
        np.asarray(out[0][0, 0, 0] if isinstance(out, tuple)
                   else out[0 if out.ndim == 1 else (0, 0)]
                   if out.ndim <= 2 else out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        np.asarray(out.reshape(-1)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    for n in (1_000_000, 2_000_000):
        table = jax.device_put(jnp.asarray(
            rng.normal(size=(n, 8)).astype(np.float32)), dev)
        idxs = [jax.device_put(jnp.asarray(
            rng.integers(0, n, size=(1, h // f, w // f)).astype(
                np.int32)), dev) for f in (1, 2, 4, 8)]

        naive = jax.jit(lambda t, ix: jnp.concatenate(
            [t[i].reshape(1, -1, 8) for i in ix], axis=1))
        packed = jax.jit(lambda t, ix: jnp.concatenate(
            [T.gather_rows_packed(t, i).reshape(1, -1, 8) for i in ix],
            axis=1))

        a = np.asarray(naive(table, idxs))
        b = np.asarray(packed(table, idxs))
        print(f"n={n}: maxdiff {np.abs(a-b).max()}", flush=True)
        t_n = time_fn(naive, table, idxs)
        t_p = time_fn(packed, table, idxs)
        # bf16 table: halves the random-access HBM traffic (inference
        # tables can be stored bf16; descriptors are net inputs anyway)
        table16 = table.astype(jnp.bfloat16)
        t_n16 = time_fn(naive, table16, idxs)
        t_p16 = time_fn(packed, table16, idxs)
        print(f"n={n}: naive {t_n:.2f} ms   packed {t_p:.2f} ms   "
              f"naive-bf16 {t_n16:.2f} ms   packed-bf16 {t_p16:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
