"""Round-4 perf probes: batched production-path throughput + raster
variants, same-window methodology (control matmul re-measured between
rows; np.asarray to force results through the tunnel).

Usage:
  python scripts/bench_r4_probe.py raster     # raster variants B=1/8
  python scripts/bench_r4_probe.py pallaszb   # zbuffer_pallas chunk sweep
  python scripts/bench_r4_probe.py unet B     # unet seg path, batch B (vmap)
  python scripts/bench_r4_probe.py frame B    # full orchestrated frame, batch B

Each mode is a separate process so a worker fault only kills one probe
(round-3 lesson: subprocess-isolate risky configs).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np


def _control():
    import jax
    import jax.numpy as jnp
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (8192, 8192), jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    np.asarray(f(a)[0, 0])
    t0 = time.perf_counter()
    for _ in range(4):
        out = f(a)
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / 4
    tf = 2 * 8192**3 / dt / 1e12
    print(f"control 8192^3 bf16 matmul: {dt*1e3:.2f} ms = {tf:.1f} TFLOP/s")
    return tf


def _timeit(fn, args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[0] if hasattr(x, "ravel")
                                      else x), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[0] if hasattr(x, "ravel")
                                      else x), out)
    return (time.perf_counter() - t0) / iters


def _scene(n_points=1_000_000, b=1):
    from read_tpu.scene import camera
    rng = np.random.default_rng(0)
    h, w = 368, 1216
    xyz = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    ms = []
    for i in range(b):
        view = np.eye(4)
        view[0, 3] = 0.05 * i
        ms.append(camera.total_matrix(P, view))
    return xyz, np.stack(ms).astype(np.float32), h, w


def probe_raster():
    import jax
    import jax.numpy as jnp
    from read_tpu.ops import rasterize as R
    _control()
    xyz1, m1, h, w = _scene(b=1)
    xyz8, m8, _, _ = _scene(b=8)
    xyz1, m1, m8 = map(jnp.asarray, (xyz1, m1, m8))
    for name, fn, args, b in [
        ("scatter1 B=1", jax.jit(lambda x, m: R.rasterize_batch(
            x, m, h, w, method="scatter1")), (xyz1, m1), 1),
        ("sort     B=1", jax.jit(lambda x, m: R.rasterize_batch(
            x, m, h, w, method="sort")), (xyz1, m1), 1),
        ("scatter1 B=8 (vmap)", jax.jit(lambda x, m: R.rasterize_batch(
            x, m, h, w, method="scatter1")), (xyz1, m8), 8),
        ("sort     B=8 (one sort)", jax.jit(lambda x, m: R.rasterize_batch(
            x, m, h, w, method="sort")), (xyz1, m8), 8),
        ("pyramid scatter1 B=1", jax.jit(lambda x, m: tuple(
            ix for ix, _ in R.rasterize_pyramid_pooled(
                x, m, (h, w), 4, method="scatter1"))), (xyz1, m1), 1),
        ("pyramid scatter1 B=8", jax.jit(lambda x, m: tuple(
            ix for ix, _ in R.rasterize_pyramid_pooled(
                x, m, (h, w), 4, method="scatter1"))), (xyz1, m8), 8),
    ]:
        dt = _timeit(fn, args)
        print(f"{name}: {dt*1e3:.2f} ms total, {dt*1e3/b:.2f} ms/frame")
    _control()


def probe_pallaszb():
    import jax
    import jax.numpy as jnp
    from read_tpu.ops import rasterize as R
    from read_tpu.ops import rasterize_pallas as RP
    _control()
    xyz, m, h, w = _scene(b=1)
    xyz, m = jnp.asarray(xyz), jnp.asarray(m)
    dt = _timeit(jax.jit(lambda x, mm: R.rasterize_batch(
        x, mm, h, w, method="scatter1")), (xyz, m))
    print(f"scatter1 reference: {dt*1e3:.2f} ms")
    for chunk, unroll in ((8192, 8), (16384, 16), (16384, 4)):
        fn = jax.jit(lambda x, mm, c=chunk, u=unroll: R.rasterize_batch(
            x, mm, h, w, method="pallas"))
        if (chunk, unroll) != (8192, 8):
            # re-dispatch with explicit params through the low-level API
            def fn_low(x, mm, c=chunk, u=unroll):
                ndc, valid = R.project_points(x, mm[0])
                uu = jnp.floor(w * (ndc[:, 0] + 1) * .5).astype(jnp.int32)
                vv = jnp.floor(h * (1 - ndc[:, 1]) * .5).astype(jnp.int32)
                d = (ndc[:, 2] + 1) * .5
                inside = valid & (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
                pix = jnp.where(inside, vv * w + uu, h * w)
                d = jnp.where(inside, d, 2.0)
                ids = jax.lax.broadcasted_iota(jnp.int32,
                                               (x.shape[0], 1), 0)[:, 0]
                key, idb = RP.pack_keys(pix, d, ids, h * w, x.shape[0])
                buf = RP.zbuffer_pallas2(pix, key, h * w, chunk=c,
                                         unroll=u)
                return buf
            fn = jax.jit(fn_low)
        dt = _timeit(fn, (xyz, m))
        print(f"pallas2 chunk={chunk} unroll={unroll}: {dt*1e3:.2f} ms")
    _control()


def probe_pzb2():
    """Second-stage sweep: chunk sizes, tile-aligned v3, compaction."""
    import jax
    import jax.numpy as jnp
    from read_tpu.ops import rasterize as R
    from read_tpu.ops import rasterize_pallas as RP
    _control()
    xyz, m, h, w = _scene(b=1)
    xyz, m = jnp.asarray(xyz), jnp.asarray(m)
    n = xyz.shape[0]

    def prep(x, mm):
        ndc, valid = R.project_points(x, mm[0])
        uu = jnp.floor(w * (ndc[:, 0] + 1) * .5).astype(jnp.int32)
        vv = jnp.floor(h * (1 - ndc[:, 1]) * .5).astype(jnp.int32)
        d = (ndc[:, 2] + 1) * .5
        inside = valid & (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        pix = jnp.where(inside, vv * w + uu, h * w)
        d = jnp.where(inside, d, 2.0)
        ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        key, idb = RP.pack_keys(pix, d, ids, h * w, n)
        return pix, key, inside

    for zb, label, kw in [
        (RP.zbuffer_pallas2, "v2 c=32768 u=4", dict(chunk=32768,
                                                    unroll=4)),
        (RP.zbuffer_pallas2, "v2 c=32768 u=8", dict(chunk=32768,
                                                    unroll=8)),
        (RP.zbuffer_pallas2, "v2 c=65536 u=4", dict(chunk=65536,
                                                    unroll=4)),
        (RP.zbuffer_pallas2, "v2 c=65536 u=8", dict(chunk=65536,
                                                    unroll=8)),
        (RP.zbuffer_pallas2, "v2 c=16384 u=2", dict(chunk=16384,
                                                    unroll=2)),
        (RP.zbuffer_pallas3, "v3 c=16384 u=4", dict(chunk=16384,
                                                    unroll=4)),
        (RP.zbuffer_pallas3, "v3 c=32768 u=4", dict(chunk=32768,
                                                    unroll=4)),
    ]:
        def fn(x, mm, zb=zb, kw=kw):
            pix, key, _ = prep(x, mm)
            return zb(pix, key, h * w, **kw)
        try:
            dt = _timeit(jax.jit(fn), (xyz, m))
            print(f"pallas {label}: {dt*1e3:.2f} ms")
        except Exception as e:
            print(f"pallas {label}: FAILED {type(e).__name__}: {e}")

    # compaction prepass: sort valid-first (key already INT_MAX for
    # invalid), kernel skips full-invalid tail chunks for free? measure
    # the XLA compaction cost alone first.
    def compact(x, mm):
        pix, key, inside = prep(x, mm)
        pos = jnp.cumsum(inside.astype(jnp.int32)) - 1
        tgt = jnp.where(inside, pos, n - 1)
        cp = jnp.full((n,), h * w, jnp.int32).at[tgt].set(
            jnp.where(inside, pix, h * w), mode="drop")
        ck = jnp.full((n,), 2**31 - 1, jnp.int32).at[tgt].set(
            jnp.where(inside, key, 2**31 - 1), mode="drop")
        return cp, ck, jnp.sum(inside.astype(jnp.int32))
    dt = _timeit(jax.jit(compact), (xyz, m))
    print(f"compaction prepass alone: {dt*1e3:.2f} ms")
    _control()


def _pyr(b):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    h, w = 368, 1216
    return tuple(jnp.asarray(rng.normal(size=(b, h // s, w // s, 8))
                             .astype(np.float32)) for s in (1, 2, 4, 8))


def probe_unet(b):
    import jax
    from read_tpu.models import unet_pallas as UP
    from read_tpu.models.unet import UNet
    _control()
    net = UNet()
    pyr1 = _pyr(1)
    variables = net.init(jax.random.PRNGKey(1), *pyr1, train=False)
    pyr = _pyr(b)
    dtype_name = os.environ.get("READ_TPU_UNET_DTYPE", "float32")
    print(f"impl={os.environ.get('READ_TPU_CONV3_IMPL', 'pack9')} "
          f"dtype={dtype_name}")
    if b == 1:
        fn = lambda *p: UP.unet_pallas_apply_seg(
            variables, *p, dtype_name=dtype_name)["im_out"]
    else:
        # vmap over the batch: each pallas kernel gains a leading grid dim
        one = lambda *p: UP.unet_pallas_apply_seg(
            variables, *[x[None] for x in p])["im_out"][0]
        inner = jax.vmap(one)
        fn = lambda *p: inner(*p)
    dt = _timeit(fn, pyr, iters=10 if b <= 2 else 5)
    print(f"unet seg B={b}: {dt*1e3:.2f} ms total, {dt*1e3/b:.2f} ms/frame")
    _control()


def probe_frame(b):
    import jax
    import jax.numpy as jnp
    from read_tpu.models import texture as T
    from read_tpu.models import unet_pallas as UP
    from read_tpu.models.unet import UNet
    from read_tpu.ops import rasterize as R
    _control()
    xyz, total_m, h, w = _scene(b=b)
    net = UNet()
    table = T.init_point_texture(jax.random.PRNGKey(0), xyz.shape[0], 8,
                                 "rand")
    pyr1 = _pyr(1)
    variables = net.init(jax.random.PRNGKey(1), *pyr1, train=False)

    raster = os.environ.get("READ_TPU_RASTER", "pallas")
    dtype_name = os.environ.get("READ_TPU_UNET_DTYPE", "float32")
    print(f"impl={os.environ.get('READ_TPU_CONV3_IMPL', 'pack9')} "
          f"dtype={dtype_name} raster={raster}")

    @jax.jit
    def pyramids(table, xyz, total_m):
        levels = R.rasterize_pyramid_pooled(xyz, total_m, (h, w), 4,
                                            method=raster)
        return tuple(T.sample_point_texture(table, ix)
                     for ix, _ in levels)

    if b == 1:
        def frame(table, xyz, total_m):
            pyr = pyramids(table, xyz, total_m)
            return UP.unet_pallas_apply_seg(
                variables, *pyr, dtype_name=dtype_name)["im_out"]
    elif os.environ.get("READ_TPU_BATCH_MODE", "stack") == "loop":
        # batched raster+gather (ONE executable for all B frames), then
        # the per-frame unet kernels in a dispatch loop — vmap over the
        # pallas kernels measured SLOWER per frame (40.5 vs 33.7 ms at
        # B=2), so the batch win comes from the raster side only.
        def frame(table, xyz, total_m):
            pyr = pyramids(table, xyz, total_m)
            outs = [UP.unet_pallas_apply_seg(
                variables, *[x[i:i + 1] for x in pyr])["im_out"]
                for i in range(b)]
            return jnp.concatenate(outs)
    else:
        # natively-batched: frames stack along H in the channel-major
        # layout, ONE kernel grid per conv for the whole batch (no vmap,
        # no dispatch loop)
        def frame(table, xyz, total_m):
            pyr = pyramids(table, xyz, total_m)
            return UP.unet_pallas_apply_seg(
                variables, *pyr, dtype_name=dtype_name)["im_out"]

    args = (table, jnp.asarray(xyz), jnp.asarray(total_m))
    dt = _timeit(frame, args, iters=10 if b <= 2 else 5)
    print(f"frame B={b}: {dt*1e3:.2f} ms total, {dt*1e3/b:.2f} ms/frame "
          f"= {b/dt:.2f} fps/chip")
    _control()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "raster":
        probe_raster()
    elif mode == "pallaszb":
        probe_pallaszb()
    elif mode == "pzb2":
        probe_pzb2()
    elif mode == "unet":
        probe_unet(int(sys.argv[2]))
    elif mode == "frame":
        probe_frame(int(sys.argv[2]))
