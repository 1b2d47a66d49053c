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


def bench_train_steps():
    """Training throughput at the baseline config-2 operating point
    (256^2 crops, B=8, 1M pts, VGG perceptual loss on): fused jitted
    train step, steps/s. Reference anchor: the src train loop's
    per-iteration render+backward (``src/train.py:156-280``)."""
    import jax
    import jax.numpy as jnp

    from read_tpu.criterions import vgg as V
    from read_tpu.pipelines import texture_pipeline as TP
    from read_tpu.scene import camera

    rng = np.random.default_rng(0)
    n_points, hw, b = 1_000_000, 256, 8
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, hw / 2], [0, 720.0, hw / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (hw, hw), znear=0.1, zfar=1000.0)
    ms = []
    for i in range(b):
        view = np.eye(4)
        view[0, 3] = 0.05 * i
        ms.append(camera.total_matrix(P, view))
    batch = {
        "total_m": jnp.asarray(np.stack(ms).astype(np.float32)),
        "target": jnp.asarray(
            rng.uniform(size=(b, hw, hw, 3)).astype(np.float32)),
    }
    cfg = TP.PipelineConfig(crop_size=(hw, hw))
    vgg_params = V.random_vgg_params(0)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg,
                                 n_points=n_points)
    step = TP.make_train_step(net, cfg, vgg_params)
    xyz_j = jnp.asarray(xyz)
    state, _ = step(state, xyz_j, batch)  # compile
    np.asarray(state.texture[0, 0])
    n_iters = 6
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, _ = step(state, xyz_j, batch)
    np.asarray(state.texture[0, 0])
    dt = (time.perf_counter() - t0) / n_iters
    return 1.0 / dt


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
    for _ in range(3):  # post-compile warmup: the first dispatches of a
        out = jfn(*args)  # cache-loaded executable run slow (measured
    np.asarray(out[0, 0, 0])  # 22.1 vs 26.3 fps same-window, r5 probe)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jfn(*args)
    np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    def frame_line(train_sps=None):
        return json.dumps({
            "metric": "fused render fps/chip @1216x368, 1M pts",
            "value": round(fps, 2),
            "unit": "fps",
            "vs_baseline": round(fps / ASSUMED_REFERENCE_FPS, 3),
            # vs_baseline denominator: the reference publishes NO fps
            # number (BASELINE.md); 30 fps is the assumed 1080 Ti viewer
            # rate. Sensitivity: at 20/60 fps assumed, vs_baseline
            # scales by 1.5x / 0.5x respectively.
            "assumed_baseline_fps": ASSUMED_REFERENCE_FPS,
            "train_steps_per_s": round(train_sps, 3)
            if train_sps else None,
        })

    # frame line FIRST so the headline metric survives even if the
    # train probe below is killed mid-compile (its cold compile can
    # take ~15 min through the remote-compile tunnel)
    print(frame_line(), flush=True)

    if os.environ.get("READ_TPU_BENCH_TRAIN", "1") != "0":
        try:
            train_sps = bench_train_steps()
            print(json.dumps({
                "metric": "train steps/s @256^2 crops, B=8, 1M pts, VGG",
                "value": round(train_sps, 3),
                "unit": "steps/s",
                "vs_baseline": None,
            }), flush=True)
            # repeat the frame metric as the LAST json line (the driver
            # records the last line; the train metric rides along)
            print(frame_line(train_sps), flush=True)
        except Exception as e:  # never let the train probe eat the fps
            print(json.dumps({"train_bench_error": str(e)[:200]}))
            print(frame_line(), flush=True)


if __name__ == "__main__":
    main()
