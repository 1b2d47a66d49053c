"""Benchmark: fused inference frames/sec per chip at the kitti6 operating
point (1216x368, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the reference's viewer on a GTX 1080 Ti. The reference repo
publishes no FPS number (BASELINE.md); the paper claims real-time, and the
BASELINE.json target is >=3x a 1080 Ti per chip. We use 30 fps as the
assumed 1080 Ti reference rate for vs_baseline until a measured number
exists (documented in BASELINE.md: "baseline procedure").
"""

import json
import os
import time

import numpy as np

# Persistent compile cache: full-graph compiles through the tunnel's
# remote compile service can take minutes; the cache makes re-runs
# (and the driver's bench invocation) start instantly.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

ASSUMED_REFERENCE_FPS = 30.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from __graft_entry__ import entry_orchestrated

    # the orchestrated frame (raster | encoder | decoder executables)
    # is the production path: the segment split is what keeps the s2d
    # strided kernels crash-free (unet_pallas_apply_seg); for non-
    # pallas conv_impls it falls back to jit(entry()).
    jfn, args = entry_orchestrated()
    # Commit every argument to the device: `device_put` WITHOUT an
    # explicit device does not commit the buffer, and an uncommitted
    # ~180MB arg re-uploads through the tunnel on EVERY call (measured
    # 6.5x slowdown). Passing the device makes the placement sticky.
    dev = jax.devices()[0]
    args = jax.tree.map(
        lambda x: jax.device_put(x, dev) if hasattr(x, "shape") else x,
        args)
    out = jfn(*args)
    np.asarray(out)  # force through the tunnel (block_until_ready can
    # return early on the axon platform)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jfn(*args)
    np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "fused render fps/chip @1216x368, 1M pts",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / ASSUMED_REFERENCE_FPS, 3),
        # vs_baseline denominator: the reference publishes NO fps number
        # (BASELINE.md); 30 fps is the assumed 1080 Ti viewer rate.
        # Sensitivity: at 20/60 fps assumed, vs_baseline scales by
        # 1.5x / 0.5x respectively.
        "assumed_baseline_fps": ASSUMED_REFERENCE_FPS,
    }))


if __name__ == "__main__":
    main()
