"""Bisect the full-UNet space-to-depth fault (RESULTS_r03).

Isolated s2d conv shapes run clean (scripts/probe_s2d.py), but the full
UNet with all eligible s2d transitions faulted the worker 3/3 in a
degrading window. This runs the FULL net with progressively larger
layer combos (READ_TPU_PALLAS_S2D comma-list), each in its own
subprocess, checking output vs the non-s2d pallas oracle and timing.
Parent re-checks worker health (control matmul) after every child.

Usage: python scripts/bisect_s2d.py [--combos feat1 feat2 ...]
       python scripts/bisect_s2d.py --one feat1,feat2   # child
"""
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COMBOS = ["feat1", "feat2", "feat4", "feat1,feat2", "feat1,feat4",
          "feat2,feat4", "feat1,feat2,feat4"]


def child(combo: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from read_tpu.models.unet import UNet
    from read_tpu.models import unet_pallas as UP

    dev = jax.devices()[0]
    h, w = 368, 1216
    rng = np.random.default_rng(0)
    pyr = [jax.device_put(jnp.asarray(
        rng.normal(size=(1, h // f, w // f, 8)).astype(np.float32)), dev)
        for f in (1, 2, 4, 8)]
    net = UNet()
    variables = jax.device_put(
        net.init(jax.random.PRNGKey(0), *pyr, train=False), dev)

    # oracle: pallas backend with s2d OFF
    os.environ["READ_TPU_PALLAS_S2D"] = "0"
    ref = np.asarray(UP.unet_pallas_apply(variables, *pyr)["im_out"])

    os.environ["READ_TPU_PALLAS_S2D"] = combo
    # the env var is read at trace time; drop the cached no-s2d trace
    # or the combo call silently reuses it (maxdiff would be 0.0)
    UP.unet_pallas_apply.clear_cache()
    f = lambda: UP.unet_pallas_apply(variables, *pyr)["im_out"]
    t0 = time.time()
    out = np.asarray(f())
    print(f"  compiled+ran in {time.time() - t0:.0f}s; "
          f"maxdiff vs no-s2d: {np.abs(out - ref).max():.2e}", flush=True)
    for _ in range(3):
        o = f()
    np.asarray(o[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        o = f()
    np.asarray(o[0, 0, 0])
    print(f"  net {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms/frame",
          flush=True)


def main():
    if "--one" in sys.argv:
        child(sys.argv[sys.argv.index("--one") + 1])
        return
    combos = COMBOS
    if "--combos" in sys.argv:
        combos = sys.argv[sys.argv.index("--combos") + 1:]
    for combo in combos:
        print(f"s2d={combo}:", flush=True)
        r = subprocess.run(
            [sys.executable, __file__, "--one", combo],
            capture_output=True, text=True, timeout=1200)
        for ln in (r.stdout + r.stderr).splitlines():
            if ln.strip() and "WARN" not in ln:
                print("   ", ln[:200], flush=True)
        if r.returncode != 0:
            print(f"  -> FAILED rc={r.returncode}; stopping (check "
                  f"worker health before further probes)", flush=True)
            break
        # worker-health gate between children
        h = subprocess.run(
            [sys.executable, "-c",
             "import os;"
             "os.environ['JAX_COMPILATION_CACHE_DIR']='/tmp/jax_cache_tpu';"
             "import numpy as np, jax, jax.numpy as jnp, time;"
             "a=jnp.ones((4096,4096),jnp.bfloat16);"
             "f=jax.jit(lambda a:a@a);o=f(a);np.asarray(o[0,0]);"
             "t0=time.perf_counter();"
             "o=[f(a) for _ in range(5)][-1];np.asarray(o[0,0]);"
             "print(f'control {(time.perf_counter()-t0)/5*1e3:.2f} ms')"],
            capture_output=True, text=True, timeout=600)
        print("   ", (h.stdout.strip() or h.stderr.strip()[-200:]),
              flush=True)
        if h.returncode != 0:
            print("  -> worker unhealthy after this combo; stopping",
                  flush=True)
            break


if __name__ == "__main__":
    main()
