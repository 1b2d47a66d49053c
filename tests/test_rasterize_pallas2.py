"""v2 packed Pallas z-buffer: bit-parity with the XLA scatter1 path
(interpret mode on CPU; the TPU timing lives in scripts/bench_r4_probe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.ops import rasterize as R
from read_tpu.ops import rasterize_pallas as RP
from read_tpu.scene import camera


def _random_case(rng, n, h, w):
    pix = rng.integers(0, h * w + 1, n).astype(np.int32)
    depth = rng.uniform(0, 1, n).astype(np.float32)
    ids = np.arange(n, dtype=np.int32)
    return (jnp.asarray(pix), jnp.asarray(depth), jnp.asarray(ids))


@pytest.mark.parametrize("n,h,w", [(5000, 24, 40), (1024, 8, 16)])
def test_pallas2_matches_scatter1(rng, n, h, w):
    pix, depth, ids = _random_case(rng, n, h, w)
    i1, d1 = R._zbuffer_scatter1(pix, depth, ids, h * w, depth, n)
    i2, d2 = RP.zbuffer_scatter1_pallas(pix, depth, ids, h * w, depth, n,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_pallas2_far_plane_pow2(rng):
    """Power-of-two id count + far-plane depths must not read empty
    (the scatter1 sentinel-collision fix is shared via pack_keys)."""
    n, h, w = 1024, 8, 8
    pix = jnp.zeros((n,), jnp.int32)
    depth = jnp.full((n,), 1.0)
    ids = jnp.arange(n, dtype=jnp.int32)
    i2, d2 = RP.zbuffer_scatter1_pallas(pix, depth, ids, h * w, depth, n,
                                        interpret=True)
    assert int(i2[0]) >= 0
    assert float(d2[0]) == 1.0


def test_pallas2_under_vmap(rng):
    """Batched via vmap (leading grid dim): must equal per-view calls."""
    n, h, w = 3000, 24, 40
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), 0.1, 50.0)
    views = []
    for i in range(2):
        v = np.eye(4)
        v[0, 3] = 0.3 * i
        views.append(camera.total_matrix(P, v))
    ms = jnp.asarray(np.stack(views).astype(np.float32))

    def one(m):
        ndc, valid = R.project_points(jnp.asarray(xyz), m)
        u = jnp.floor(w * (ndc[:, 0] + 1) * .5).astype(jnp.int32)
        v = jnp.floor(h * (1 - ndc[:, 1]) * .5).astype(jnp.int32)
        d = (ndc[:, 2] + 1) * .5
        inside = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        pix = jnp.where(inside, v * w + u, h * w)
        d = jnp.where(inside, d, 2.0)
        ids = jnp.arange(n, dtype=jnp.int32)
        dbyid = jnp.where(valid, (ndc[:, 2] + 1) * .5, 0.0)
        return RP.zbuffer_scatter1_pallas(pix, d, ids, h * w, dbyid, n,
                                          interpret=True)
    iv, dv = jax.vmap(one)(ms)
    ia, da = R.rasterize_batch(jnp.asarray(xyz), ms, h, w,
                               method="scatter1")
    np.testing.assert_array_equal(np.asarray(ia).reshape(2, -1),
                                  np.asarray(iv))
    np.testing.assert_array_equal(np.asarray(da).reshape(2, -1),
                                  np.asarray(dv))


def test_method_pallas_cpu_fallback(rng):
    """rasterize(method='pallas') on a non-TPU backend routes to the
    bit-identical XLA scatter1 (production dispatch guard)."""
    n, h, w = 2000, 16, 24
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), 0.1, 50.0)
    m = jnp.asarray(camera.total_matrix(P, np.eye(4)).astype(np.float32))
    i1, d1 = R.rasterize(jnp.asarray(xyz), m, h, w, method="scatter1")
    i2, d2 = R.rasterize(jnp.asarray(xyz), m, h, w, method="pallas")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


@pytest.mark.parametrize("kw", [
    dict(point_radius=1),
    dict(point_radius=1, point_sizes=True),
    dict(point_radius=2, relative_size=True, point_sizes=True,
         min_point_size=1.0),
])
def test_batched_splat_pallas_matches_scatter1(rng, monkeypatch, kw):
    """The natively-batched splat expansion (rasterize_batch method=
    'pallas' with radius>0 / per-point sizes) is bit-identical to the
    vmapped XLA scatter1 path. Regression: vmapping the single-view
    kernel fails Mosaic's SMEM block-batching rule."""
    import functools
    from read_tpu.ops import rasterize as RR
    n, h, w = 3000, 24, 40
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), 0.1, 50.0)
    m1 = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    v2 = np.eye(4)
    v2[0, 3] = 0.3
    m2 = camera.total_matrix(P, v2).astype(np.float32)
    ms = jnp.asarray(np.stack([m1, m2]))
    kw = dict(kw)
    if kw.pop("point_sizes", False):
        kw["point_sizes"] = jnp.where(jnp.arange(n) % 3 == 0, 3.0, 1.0)
    isc, dsc = R.rasterize_batch(jnp.asarray(xyz), ms, h, w,
                                 method="scatter1", **kw)
    monkeypatch.setattr(RP, "zbuffer_pallas2",
                        functools.partial(RP.zbuffer_pallas2,
                                          interpret=True))
    ipl, dpl = RR._rasterize_batch_pallas_splat(
        jnp.asarray(xyz), ms, h, w, kw.pop("point_radius"), None,
        kw.get("point_sizes"), kw.get("relative_size", False),
        kw.get("min_point_size", 1.0))
    np.testing.assert_array_equal(np.asarray(isc), np.asarray(ipl))
    np.testing.assert_array_equal(np.asarray(dsc), np.asarray(dpl))
