"""Render modes, scene tools, trackball, and augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.ops import augment as A
from read_tpu.ops import rasterize as R
from read_tpu.ops import render_modes as RM
from read_tpu.scene import camera, tools
from read_tpu.scene.trackball import Trackball


def _setup(rng, n=500, h=32, w=32):
    xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 5.0
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)
    idx, dep = R.rasterize(xyz, m, h, w)
    return xyz, m, idx, dep


def test_render_mode_colors(rng):
    xyz, m, idx, dep = _setup(rng)
    rgb = rng.uniform(size=(500, 3)).astype(np.float32)
    pc = {"rgb": rgb}
    out = RM.render_mode("colors", idx, dep, pc)
    idx_np = np.asarray(idx)
    ys, xs = np.where(idx_np >= 0)
    np.testing.assert_allclose(np.asarray(out)[ys[0], xs[0]],
                               rgb[idx_np[ys[0], xs[0]]], atol=1e-6)
    # empty pixels are zero
    ye, xe = np.where(idx_np < 0)
    assert np.asarray(out)[ye[0], xe[0]].sum() == 0


def test_render_mode_normals_all_submodes(rng):
    xyz, m, idx, dep = _setup(rng)
    normals = rng.normal(size=(500, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pc = {"normals": normals, "xyz": xyz}
    for mode in ("normals_m", "normals_l", "normals_r", "normals_d"):
        out = RM.render_mode(mode, idx, dep, pc,
                             view_matrix=np.eye(4))
        assert out.shape == (32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_render_mode_depth_uv1d(rng):
    xyz, m, idx, dep = _setup(rng)
    out = RM.render_mode("depth", idx, dep, {})
    np.testing.assert_allclose(np.asarray(out)[..., 0], np.asarray(dep))
    uv = RM.render_mode("uv_1d", idx, dep, {})
    np.testing.assert_allclose(np.asarray(uv)[..., 0],
                               np.asarray(idx).astype(np.float32))


def test_stitch_scenes(rng):
    xyz1 = rng.normal(size=(10, 3)).astype(np.float32)
    xyz2 = rng.normal(size=(20, 3)).astype(np.float32)
    t1 = rng.normal(size=(10, 8)).astype(np.float32)
    t2 = rng.normal(size=(20, 8)).astype(np.float32)
    shift = np.eye(4)
    shift[:3, 3] = [10, 0, 0]
    xyz, tex, ids = tools.stitch_scenes([(xyz1, t1, None),
                                         (xyz2, t2, shift)])
    assert xyz.shape == (30, 3) and tex.shape == (30, 8)
    np.testing.assert_allclose(xyz[10:], xyz2 + [10, 0, 0], atol=1e-5)
    assert (ids[:10] == 0).all() and (ids[10:] == 1).all()
    np.testing.assert_allclose(tex[:10], t1)


def test_edit_points(rng):
    xyz = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    tex = rng.normal(size=(100, 8)).astype(np.float32)
    mask = tools.select_bbox(xyz, [-1, -1, -1], [0, 1, 1])
    assert mask.sum() > 0
    moved = tools.transform_points(xyz, mask, np.diag([1, 1, 1, 1.0]))
    np.testing.assert_allclose(moved, xyz)  # identity transform
    xyz2, tex2 = tools.delete_points(xyz, tex, mask)
    assert xyz2.shape[0] == 100 - mask.sum()
    xyz3, tex3 = tools.duplicate_points(xyz, tex, mask, np.eye(4))
    assert xyz3.shape[0] == 100 + mask.sum()
    np.testing.assert_allclose(tex3[100:], tex[mask])


def test_sphere_select(rng):
    xyz = np.array([[0, 0, 0], [5, 0, 0]], np.float32)
    m = tools.select_sphere(xyz, [0, 0, 0], 1.0)
    assert m.tolist() == [True, False]


def test_panorama_cameras():
    m = np.eye(4)
    cams = tools.panorama_cameras(m, n_views=3, yaw_step_deg=30)
    assert len(cams) == 3
    np.testing.assert_allclose(cams[1], m, atol=1e-12)  # center = input
    # rotations preserve position
    for c in cams:
        np.testing.assert_allclose(c[:3, 3], m[:3, 3], atol=1e-12)
    # outer views look 30 degrees apart in yaw
    f0, f2 = -cams[0][:3, 2], -cams[2][:3, 2]
    ang = np.degrees(np.arccos(np.clip(np.dot(f0, f2), -1, 1)))
    assert abs(ang - 60) < 1e-6


def test_trackball_basic():
    tb = Trackball(np.eye(4))
    p0 = tb.position.copy()
    tb.fly(forward=1.0)
    np.testing.assert_allclose(tb.position - p0,
                               [0, 0, -0.5], atol=1e-12)  # fly_speed 0.5
    tb.pan(1.0, 0.0)
    tb.zoom(1.0)
    tb.rotate_local(10, 5)
    R_ = tb.m[:3, :3]
    np.testing.assert_allclose(R_ @ R_.T, np.eye(3), atol=1e-9)  # SO(3)
    tb.turn(yaw=np.pi / 2)
    np.testing.assert_allclose(
        tb.m[:3, :3] @ tb.m[:3, :3].T, np.eye(3), atol=1e-9)


def test_trackball_orbit_preserves_pivot_distance():
    view = camera.look_at([0, 2.0, 5.0], [0, 0, 0], up=[0, 1, 0])
    tb = Trackball(view, ground_normal=(0, 1, 0))
    pivot = tb._pivot()
    d0 = np.linalg.norm(tb.position - pivot)
    tb.rotate(50.0, 10.0)
    d1 = np.linalg.norm(tb.position - pivot)
    assert abs(d0 - d1) < 1e-6


def test_drop_points(rng):
    xyz = jnp.asarray(rng.normal(size=(1000, 3)), jnp.float32)
    out = A.drop_points(jax.random.PRNGKey(0), xyz, 0.3)
    moved = np.asarray((out == 1e9).all(axis=1))
    assert 0.2 < moved.mean() < 0.4
    kept = ~moved
    np.testing.assert_allclose(np.asarray(out)[kept],
                               np.asarray(xyz)[kept])
    # rate 0 is identity
    np.testing.assert_allclose(
        np.asarray(A.drop_points(jax.random.PRNGKey(0), xyz, 0.0)),
        np.asarray(xyz))


def test_perturb_pixels(rng):
    ndc = jnp.asarray(rng.uniform(-1, 1, size=(100, 3)), jnp.float32)
    out = A.perturb_pixels(jax.random.PRNGKey(1), ndc, 2.0, 64, 64)
    d = np.abs(np.asarray(out[:, :2]) - np.asarray(ndc[:, :2]))
    assert d.max() <= 2.0 * (2.0 / 64) / 2 + 1e-6  # <= amount/2 pixels
    np.testing.assert_allclose(np.asarray(out[:, 2]),
                               np.asarray(ndc[:, 2]))


def test_rasterize_with_jitter_changes_pixels(rng):
    xyz, m, idx, dep = _setup(rng, n=300)
    jit = A.pixel_jitter_offsets(jax.random.PRNGKey(2), 300, 3.0, 32, 32)
    idx2, _ = R.rasterize(xyz, m, 32, 32, ndc_jitter=jit)
    assert (np.asarray(idx2) != np.asarray(idx)).any()
    # zero jitter is a no-op
    idx3, _ = R.rasterize(xyz, m, 32, 32,
                          ndc_jitter=jnp.zeros((300, 2), jnp.float32))
    np.testing.assert_array_equal(np.asarray(idx3), np.asarray(idx))
    # batch path accepts jitter too
    idx4, _ = R.rasterize_batch(xyz, jnp.asarray(m)[None], 32, 32,
                                ndc_jitter=jit)
    np.testing.assert_array_equal(np.asarray(idx4[0]), np.asarray(idx2))


def test_pca_color(rng):
    from read_tpu.render import pca_color
    desc = rng.normal(size=(1000, 8)).astype(np.float32)
    c = pca_color(desc, sample=500)
    assert c.shape == (1000, 3)
    assert c.min() >= 0 and c.max() <= 1


def test_nearest_train():
    from read_tpu.render import nearest_train
    views = []
    for i in range(5):
        m = np.eye(4)
        m[:3, 3] = [i, 0, 0]
        views.append(m)
    q = np.eye(4)
    q[:3, 3] = [2.2, 0, 0]
    assert nearest_train(views, q) == 2
