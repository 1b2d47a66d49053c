"""Rasterizer correctness: XLA z-buffer vs the sequential numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.ops import rasterize as R
from read_tpu.scene import camera


def _random_scene(rng, n=500, w=64, h=48):
    xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 5.0  # in front of a GL camera at origin looking down -z
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=100.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    return xyz, m


def test_zbuffer_matches_oracle_exactly(rng):
    # Share the (f32, device) projection between both sides so this checks
    # the scatter-min winner logic bit-exactly, with no boundary rounding
    # ambiguity between f32 and f64 projection.
    w, h = 64, 48
    xyz, m = _random_scene(rng, 800, w, h)
    ndc, valid = jax.jit(R.project_points)(xyz, m)
    idx_ref, dep_ref = R.zbuffer_reference(np.asarray(ndc),
                                           np.asarray(valid), h, w)
    idx, dep = jax.jit(R.rasterize, static_argnums=(2, 3))(xyz, m, h, w)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    np.testing.assert_allclose(np.asarray(dep), dep_ref, atol=1e-6)


def test_end_to_end_close_to_f64_oracle(rng):
    # f64 oracle vs f32 device projection: only pixel-boundary-straddling
    # points may disagree; require near-total agreement.
    w, h = 64, 48
    xyz, m = _random_scene(rng, 800, w, h)
    idx_ref, _ = R.rasterize_reference(xyz, m, h, w)
    idx, _ = jax.jit(R.rasterize, static_argnums=(2, 3))(xyz, m, h, w)
    agree = (np.asarray(idx) == idx_ref).mean()
    assert agree > 0.97, agree


def test_empty_pixels_are_minus_one(rng):
    xyz, m = _random_scene(rng, 3, 32, 32)
    idx, dep = R.rasterize(xyz, m, 32, 32)
    idx = np.asarray(idx)
    assert (idx == -1).sum() >= 32 * 32 - 3
    assert np.asarray(dep)[idx == -1].max() == 0.0


def test_occlusion_nearest_wins():
    # Two points projecting to the same pixel; the nearer one must win.
    xyz = np.array([[0, 0, -10.0], [0, 0, -5.0]], np.float32)
    K = np.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1]])
    P = camera.gl_projection(K, (32, 32), znear=0.1, zfar=100.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    idx, dep = R.rasterize(xyz, m, 32, 32)
    winners = np.asarray(idx)[np.asarray(idx) >= 0]
    assert list(winners) == [1]


def test_tie_break_smallest_index():
    xyz = np.array([[0, 0, -5.0], [0, 0, -5.0], [0, 0, -5.0]], np.float32)
    K = np.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1]])
    P = camera.gl_projection(K, (32, 32), znear=0.1, zfar=100.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    idx, _ = R.rasterize(xyz, m, 32, 32)
    winners = np.asarray(idx)[np.asarray(idx) >= 0]
    assert list(winners) == [0]


def test_behind_camera_rejected():
    xyz = np.array([[0, 0, 5.0]], np.float32)  # behind (GL forward is -z)
    K = np.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1]])
    P = camera.gl_projection(K, (32, 32), znear=0.1, zfar=100.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    idx, _ = R.rasterize(xyz, m, 32, 32)
    assert (np.asarray(idx) == -1).all()


def test_batch_matches_loop(rng):
    w, h = 40, 32
    xyz, _ = _random_scene(rng, 300, w, h)
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=100.0)
    views = []
    for eye in ([0, 0, 0], [0.5, 0, 0], [0, 0.5, 0.2]):
        v = np.eye(4)
        v[:3, 3] = eye
        views.append(camera.total_matrix(P, v))
    ms = np.stack(views).astype(np.float32)
    idx_b, dep_b = R.rasterize_batch(xyz, ms, h, w)
    for b in range(3):
        ndc, valid = jax.jit(R.project_points)(xyz, ms[b])
        idx_ref, dep_ref = R.zbuffer_reference(np.asarray(ndc),
                                               np.asarray(valid), h, w)
        np.testing.assert_array_equal(np.asarray(idx_b[b]), idx_ref)
        np.testing.assert_allclose(np.asarray(dep_b[b]), dep_ref, atol=1e-6)


def test_pyramid_shapes(rng):
    xyz, m = _random_scene(rng, 200, 64, 32)
    levels = R.rasterize_pyramid(xyz, m[None], (32, 64), num_scales=5)
    shapes = [tuple(ix.shape) for ix, _ in levels]
    assert shapes == [(1, 32, 64), (1, 16, 32), (1, 8, 16), (1, 4, 8),
                      (1, 2, 4)]


def test_splat_radius_covers_square():
    xyz = np.array([[0, 0, -5.0]], np.float32)
    K = np.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1]])
    P = camera.gl_projection(K, (32, 32), znear=0.1, zfar=100.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    idx1, _ = R.rasterize(xyz, m, 32, 32, point_radius=0)
    idx3, _ = R.rasterize(xyz, m, 32, 32, point_radius=1)
    assert (np.asarray(idx1) >= 0).sum() == 1
    assert (np.asarray(idx3) >= 0).sum() == 9


def test_sort_method_matches_scatter(rng):
    w, h = 64, 48
    xyz, m = _random_scene(rng, 800, w, h)
    i_sc, d_sc = jax.jit(R.rasterize, static_argnums=(2, 3, 4, 5))(
        xyz, m, h, w, 0, "scatter")
    i_so, d_so = jax.jit(R.rasterize, static_argnums=(2, 3, 4, 5))(
        xyz, m, h, w, 0, "sort")
    np.testing.assert_array_equal(np.asarray(i_so), np.asarray(i_sc))
    np.testing.assert_allclose(np.asarray(d_so), np.asarray(d_sc),
                               atol=1e-7)


def test_sort_method_splat_matches_scatter(rng):
    w, h = 32, 32
    xyz, m = _random_scene(rng, 200, w, h)
    i_sc, _ = R.rasterize(xyz, m, h, w, point_radius=1, method="scatter")
    i_so, _ = R.rasterize(xyz, m, h, w, point_radius=1, method="sort")
    np.testing.assert_array_equal(np.asarray(i_so), np.asarray(i_sc))


def test_pooled_pyramid_matches_per_scale(rng):
    w, h = 64, 32
    xyz, m = _random_scene(rng, 500, w, h)
    per_scale = R.rasterize_pyramid(xyz, m[None], (h, w), num_scales=4)
    pooled = R.rasterize_pyramid_pooled(xyz, m[None], (h, w), num_scales=4)
    for lvl, ((i1, d1), (i2, d2)) in enumerate(zip(per_scale, pooled)):
        np.testing.assert_array_equal(
            np.asarray(i1), np.asarray(i2), err_msg=f"level {lvl}")
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   atol=1e-7, err_msg=f"level {lvl}")


def test_jit_under_vmap_grad_free(rng):
    # The rasterizer must be traceable under jit+vmap with static shapes.
    xyz, m = _random_scene(rng, 100, 16, 16)
    f = jax.jit(lambda p, mm: R.rasterize_batch(p, mm, 16, 16))
    idx, dep = f(xyz, np.stack([m, m]))
    assert idx.shape == (2, 16, 16) and dep.dtype == jnp.float32


def _splat_oracle(ndc, valid, rad, h, w):
    """Sequential oracle with per-point float radii: point i covers
    offsets with max(|dx|,|dy|) <= rad[i]; min depth, smallest id ties."""
    index = np.full((h, w), -1, np.int32)
    depth = np.full((h, w), np.inf, np.float64)
    for i in range(ndc.shape[0]):
        if not valid[i]:
            continue
        x, y, z = ndc[i]
        u = int(np.floor(w * (x + 1) * 0.5))
        v = int(np.floor(h * (1 - y) * 0.5))
        d = (z + 1) * 0.5
        r = int(np.floor(rad[i] + 1e-4))
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                uu, vv = u + dx, v + dy
                if not (0 <= uu < w and 0 <= vv < h):
                    continue
                if d < depth[vv, uu] or (d == depth[vv, uu]
                                         and i < index[vv, uu]):
                    index[vv, uu] = i
                    depth[vv, uu] = d
    depth[index < 0] = 0.0
    return index, depth.astype(np.float32)


def test_per_point_sizes_match_oracle(rng):
    """Mixed per-point sizes (the manifest ``point_sizes`` buffer,
    ``READ/gl/programs.py:183-186``): size 1/3/5 points in one scene."""
    w, h = 48, 48
    xyz, m = _random_scene(rng, 120, w, h)
    sizes = rng.choice([1.0, 3.0, 5.0], size=120).astype(np.float32)
    idx, dep = R.rasterize(xyz, m, h, w, point_radius=2,
                           point_sizes=sizes)
    ndc, valid = jax.jit(R.project_points)(xyz, m)
    rad = (sizes - 1.0) * 0.5
    idx_ref, dep_ref = _splat_oracle(np.asarray(ndc), np.asarray(valid),
                                     rad, h, w)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    np.testing.assert_allclose(np.asarray(dep), dep_ref, atol=1e-6)


def test_relative_point_size_scales_with_depth(rng):
    """'ps' mode: a near point must cover more pixels than a far point of
    the same base size (``programs.py:188-192``)."""
    K = np.array([[60.0, 0, 16.0], [0, 60.0, 16.0], [0, 0, 1]])
    P = camera.gl_projection(K, (32, 32), znear=0.1, zfar=100.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    near = np.array([[0, 0, -1.2]], np.float32)
    far = np.array([[0, 0, -50.0]], np.float32)
    sizes = np.array([4.0], np.float32)
    i_near, _ = R.rasterize(near, m, 32, 32, point_radius=3,
                            point_sizes=sizes, relative_size=True)
    i_far, _ = R.rasterize(far, m, 32, 32, point_radius=3,
                           point_sizes=sizes, relative_size=True)
    n_near = int((np.asarray(i_near) >= 0).sum())
    n_far = int((np.asarray(i_far) >= 0).sum())
    assert n_near > n_far
    assert n_far >= 1  # min_point_size floor keeps at least the center


def test_relative_size_min_floor(rng):
    """min_point_size must floor the z-scaled size (far points never
    vanish)."""
    K = np.array([[60.0, 0, 16.0], [0, 60.0, 16.0], [0, 0, 1]])
    P = camera.gl_projection(K, (32, 32), znear=0.1, zfar=100.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    far = np.array([[0, 0, -90.0]], np.float32)
    i_f, _ = R.rasterize(far, m, 32, 32, point_radius=3,
                         point_sizes=np.array([2.0], np.float32),
                         relative_size=True, min_point_size=5.0)
    # floored size 5 -> 5x5 square
    assert int((np.asarray(i_f) >= 0).sum()) == 25


def test_batch_per_point_sizes(rng):
    """rasterize_batch must accept per-point sizes (vmap fallback)."""
    w, h = 32, 32
    xyz, m = _random_scene(rng, 100, w, h)
    sizes = rng.choice([1.0, 3.0], size=100).astype(np.float32)
    idx, dep = R.rasterize_batch(xyz, np.stack([m, m]), h, w,
                                 point_radius=1, point_sizes=sizes)
    assert idx.shape == (2, h, w)
    np.testing.assert_array_equal(np.asarray(idx[0]), np.asarray(idx[1]))


def test_sort1q_matches_sort_up_to_depth_quantization(rng):
    w, h = 64, 48
    xyz, m = _random_scene(rng, 800, w, h)
    i_so, d_so = jax.jit(R.rasterize, static_argnums=(2, 3, 4, 5))(
        xyz, m, h, w, 0, "sort")
    i_q, d_q = jax.jit(R.rasterize, static_argnums=(2, 3, 4, 5))(
        xyz, m, h, w, 0, "sort1q")
    i_so, d_so = np.asarray(i_so), np.asarray(d_so)
    i_q, d_q = np.asarray(i_q), np.asarray(d_q)
    # same pixels covered
    np.testing.assert_array_equal(i_q < 0, i_so < 0)
    # winner depth within one quantization bin of the true minimum;
    # with >= 12 depth bits that is 2^-12 of the [0, 1] depth range
    assert np.all(np.abs(d_q - d_so) <= 1.0 / (1 << 12) + 1e-7)
    # where depths are NOT within a bin of each other the winner index
    # must agree exactly (quantization only reorders near-ties)
    exact = np.abs(d_q - d_so) < 1e-7
    assert np.mean(exact) > 0.95
    np.testing.assert_array_equal(i_q[exact & (i_q >= 0)],
                                  i_so[exact & (i_q >= 0)])

def test_scatter1_matches_sort_up_to_depth_quantization(rng):
    w, h = 64, 48
    xyz, m = _random_scene(rng, 800, w, h)
    i_so, d_so = jax.jit(R.rasterize, static_argnums=(2, 3, 4, 5))(
        xyz, m, h, w, 0, "sort")
    i_s1, d_s1 = jax.jit(R.rasterize, static_argnums=(2, 3, 4, 5))(
        xyz, m, h, w, 0, "scatter1")
    i_so, d_so = np.asarray(i_so), np.asarray(d_so)
    i_s1, d_s1 = np.asarray(i_s1), np.asarray(d_s1)
    # same pixels covered
    np.testing.assert_array_equal(i_s1 < 0, i_so < 0)
    # 800 ids -> idb=10 -> 21 depth bits; the winner's (exact,
    # re-gathered) depth is within one bin of the true minimum
    assert np.all(np.abs(d_s1 - d_so) <= 1.0 / (1 << 21) + 1e-7)
    # where no quantization tie occurred the winner agrees exactly
    exact = np.abs(d_s1 - d_so) < 1e-9
    assert np.mean(exact) > 0.99
    np.testing.assert_array_equal(i_s1[exact & (i_s1 >= 0)],
                                  i_so[exact & (i_s1 >= 0)])


def test_scatter1_exact_when_depths_separated(rng):
    # distinct well-separated depths (>> one bin) -> bit-exact parity
    # with the exact scatter z-buffer, including empties and ties
    w, h = 32, 24
    n = 500
    xyz, m = _random_scene(rng, n, w, h)
    i_sc, d_sc = jax.jit(R.rasterize, static_argnums=(2, 3, 4, 5))(
        xyz, m, h, w, 0, "scatter")
    i_s1, d_s1 = jax.jit(R.rasterize, static_argnums=(2, 3, 4, 5))(
        xyz, m, h, w, 0, "scatter1")
    # _random_scene draws continuous depths; at n=500 the bin is 2^-22
    # of [0,1] so collisions are measure-zero at f32 resolution
    np.testing.assert_array_equal(np.asarray(i_s1), np.asarray(i_sc))
    np.testing.assert_allclose(np.asarray(d_s1), np.asarray(d_sc),
                               atol=1e-7)


def test_scatter1_splat_matches_sort(rng):
    w, h = 32, 32
    xyz, m = _random_scene(rng, 200, w, h)
    i_so, d_so = R.rasterize(xyz, m, h, w, point_radius=1, method="sort")
    i_s1, d_s1 = R.rasterize(xyz, m, h, w, point_radius=1,
                             method="scatter1")
    np.testing.assert_array_equal(np.asarray(i_so), np.asarray(i_s1))
    np.testing.assert_allclose(np.asarray(d_so), np.asarray(d_s1),
                               atol=1e-7)


def test_scatter1_raises_without_depth_bits():
    import pytest as _pytest
    pix = jnp.zeros((1 << 24,), jnp.int32)
    depth = jnp.zeros((1 << 24,), jnp.float32)
    ids = jnp.zeros((1 << 24,), jnp.int32)
    with _pytest.raises(ValueError, match="scatter1"):
        R._zbuffer_scatter1(pix, depth, ids, 16, depth, 1 << 24)


def test_scatter1_pooled_pyramid(rng):
    w, h = 64, 32
    xyz, m = _random_scene(rng, 500, w, h)
    pooled_so = R.rasterize_pyramid_pooled(xyz, m[None], (h, w),
                                           num_scales=4, method="sort")
    pooled_s1 = R.rasterize_pyramid_pooled(xyz, m[None], (h, w),
                                           num_scales=4,
                                           method="scatter1")
    for lvl, ((i1, d1), (i2, d2)) in enumerate(zip(pooled_so, pooled_s1)):
        np.testing.assert_array_equal(
            np.asarray(i1), np.asarray(i2), err_msg=f"level {lvl}")
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   atol=1e-7, err_msg=f"level {lvl}")


def test_packed_pool_matches_exact(rng):
    """pool_impl='packed' must agree with the exact pair pool wherever
    the winner is decided by more than one depth-quantization bin, and
    its coarse depths must be within one bin of exact."""
    import jax.numpy as jnp
    from read_tpu.scene import camera

    n, h, w = 4096, 64, 64
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]

    exact = R.rasterize_pyramid_pooled(jnp.asarray(xyz), jnp.asarray(m),
                                       (h, w), 4, method="scatter1")
    packed = R.rasterize_pyramid_pooled(jnp.asarray(xyz), jnp.asarray(m),
                                        (h, w), 4, method="scatter1",
                                        pool_impl="packed")
    idb = max(1, (n - 1).bit_length())
    bin_w = 1.0 / ((1 << (31 - idb)) - 1)
    # level 0 is the raster itself: identical
    np.testing.assert_array_equal(np.asarray(exact[0][0]),
                                  np.asarray(packed[0][0]))
    for lvl in range(1, 4):
        ie, de = map(np.asarray, exact[lvl])
        ip, dp = map(np.asarray, packed[lvl])
        diff = ie != ip
        if diff.any():
            # disagreements only where exact depths sit within one bin
            assert np.abs(de[diff] - dp[diff]).max() <= 2 * bin_w, (
                lvl, np.abs(de[diff] - dp[diff]).max())
        agree = (ie == ip) & (ie >= 0)
        assert np.abs(de[agree] - dp[agree]).max() <= bin_w
        # empties agree exactly
        np.testing.assert_array_equal(ie < 0, ip < 0)
