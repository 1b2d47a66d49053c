"""Isolate which round-3 packed-lane kernel change faults the TPU.

The full pallas UNet ran clean with minimal-halo + fused-residual
kernels (bisect_s2d oracle run), then crashed after the multi-input
(k-loop) kernel refactor + the new concat-free 1x1 kernel landed. This
probes each piece in its own subprocess at the real kitti6 shapes,
with a parent worker-health gate (control matmul) after every child.

Probes (in crash-risk order — safest first so the default bench path
is validated even if a later probe kills the worker):
  full_default  full net, default env (minhalo + resfuse, no cat11)
  minhalo       single 3x3 at full res (C=32, 368x1216)
  resfuse       same + fused residual
  cat11_convs2  concat-free 1x1, Convs2 shape (32+32 -> 32, full res)
  cat11_aff0    concat-free 1x1, AFF0 shape (32+64+128+256 -> 32)
  full_cat      full net with READ_TPU_PALLAS_CAT11=1

Usage: python scripts/probe_pack_new.py [--probes a b ...]
       python scripts/probe_pack_new.py --one minhalo   # child
"""
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PROBES = ["full_default", "minhalo", "resfuse", "cat11_convs2",
          "cat11_aff0", "full_cat"]
H, W = 368, 1216


def _time(f, iters=10):
    import numpy as np
    o = f()
    np.asarray(jax_leaf(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(jax_leaf(o))
    return (time.perf_counter() - t0) / iters * 1e3


def jax_leaf(o):
    import jax
    return jax.tree.leaves(o)[0].ravel()[0]


def _kernel_probe(name: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from read_tpu.ops import gated_conv_pack as GP

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    if name in ("minhalo", "resfuse"):
        cin = cout = 32
        x = jax.device_put(jnp.asarray(rng.normal(
            size=(cin, H * W)).astype(np.float32)), dev)
        w = jnp.asarray(rng.normal(
            size=(3, 3, cin, 2 * cout)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=2 * cout).astype(np.float32))
        s = jnp.ones(cout, jnp.float32)
        o = jnp.zeros(cout, jnp.float32)
        res = (jax.device_put(jnp.asarray(rng.normal(
            size=(cout, H * W)).astype(np.float32)), dev)
            if name == "resfuse" else None)
        f = lambda: GP.gated_conv3x3_chw(x, w, b, s, o, res, w_img=W)
        ref = np.asarray(GP.gated_conv3x3_chw(
            x, w, b, s, o, res, w_img=W, rows=GP.pick_rows(W, cin),
            interpret=True))
    else:
        cins = (32, 32) if name == "cat11_convs2" else (32, 64, 128, 256)
        cout = 32
        ctot = sum(cins)
        xs = tuple(jax.device_put(jnp.asarray(rng.normal(
            size=(c, H * W)).astype(np.float32)), dev) for c in cins)
        w = jnp.asarray(rng.normal(
            size=(1, 1, ctot, 2 * cout)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=2 * cout).astype(np.float32))
        s = jnp.ones(cout, jnp.float32)
        o = jnp.zeros(cout, jnp.float32)
        f = lambda: GP.gated_conv1x1_cat_chw(xs, w, b, s, o)
        ref = np.asarray(GP.gated_conv1x1_cat_chw(
            xs, w, b, s, o, interpret=True))
    out = np.asarray(f())
    print(f"  maxdiff vs interpret: {np.abs(out - ref).max():.2e}",
          flush=True)
    print(f"  {_time(f):.3f} ms", flush=True)


def _full_probe(cat: bool, eager: str = ""):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from read_tpu.models.unet import UNet
    from read_tpu.models import unet_pallas as UP

    if cat:
        os.environ["READ_TPU_PALLAS_CAT11"] = "1"
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    pyr = [jax.device_put(jnp.asarray(
        rng.normal(size=(1, H // f, W // f, 8)).astype(np.float32)), dev)
        for f in (1, 2, 4, 8)]
    net = UNet()
    variables = jax.device_put(
        net.init(jax.random.PRNGKey(0), *pyr, train=False), dev)
    ref = np.asarray(net.apply(variables, *pyr, train=False)["im_out"])
    if eager == "eager":
        # per-kernel dispatches, no whole-graph executable: attributes
        # whole-graph compilation (layout/fusion) vs the kernels
        f = lambda: UP._decoder_seg.__wrapped__(
            variables, *UP._encoder_seg.__wrapped__(
                variables, *pyr, 4, False, "float32"),
            4, False, "float32")["im_out"]
    elif eager == "seg2":
        f = lambda: UP.unet_pallas_apply_seg(variables, *pyr)["im_out"]
    else:
        f = lambda: UP.unet_pallas_apply(variables, *pyr)["im_out"]
    out = np.asarray(f())
    print(f"  maxdiff vs flax: {np.abs(out - ref).max():.2e}", flush=True)
    print(f"  net {_time(f):.2f} ms/frame", flush=True)


def child(name: str):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if name == "full_default":
        _full_probe(cat=False)
    elif name == "full_cat":
        _full_probe(cat=True)
    elif name == "full_cat_eager":
        _full_probe(cat=True, eager="eager")
    elif name == "full_s2d_eager":
        os.environ["READ_TPU_PALLAS_S2D"] = "1"
        _full_probe(cat=False, eager="eager")
    elif name == "full_cat_seg2":
        _full_probe(cat=True, eager="seg2")
    elif name == "full_s2d_seg2":
        os.environ["READ_TPU_PALLAS_S2D"] = "1"
        _full_probe(cat=False, eager="seg2")
    elif name == "full_all_seg2":
        os.environ["READ_TPU_PALLAS_S2D"] = "1"
        _full_probe(cat=True, eager="seg2")
    else:
        _kernel_probe(name)


def main():
    if "--one" in sys.argv:
        child(sys.argv[sys.argv.index("--one") + 1])
        return
    probes = PROBES
    if "--probes" in sys.argv:
        probes = sys.argv[sys.argv.index("--probes") + 1:]
    for name in probes:
        print(f"{name}:", flush=True)
        r = subprocess.run(
            [sys.executable, __file__, "--one", name],
            capture_output=True, text=True, timeout=1800)
        for ln in (r.stdout + r.stderr).splitlines():
            if ln.strip() and "WARN" not in ln:
                print("   ", ln[:200], flush=True)
        if r.returncode != 0:
            print(f"  -> FAILED rc={r.returncode}; stopping (worker "
                  f"likely recovering ~25-50 min)", flush=True)
            break
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
            print("  -> worker unhealthy after this probe; stopping",
                  flush=True)
            break


if __name__ == "__main__":
    main()
