"""Triangle rasterizer correctness vs the sequential CPU oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from read_tpu.ops import rasterize_mesh as RM
from read_tpu.scene import camera


def _cam(w=48, h=48):
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=100.0)
    return camera.total_matrix(P, np.eye(4)).astype(np.float32)


def _random_mesh(rng, n_tri=40):
    """Small random triangles in front of the camera (screen bboxes well
    under the sample grid so coverage is exact)."""
    centers = rng.uniform(-1.5, 1.5, size=(n_tri, 3)).astype(np.float32)
    centers[:, 2] = -rng.uniform(3.0, 8.0, size=n_tri)
    offs = rng.uniform(-0.25, 0.25, size=(n_tri, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    faces = np.arange(n_tri * 3, dtype=np.int32).reshape(n_tri, 3)
    return verts, faces


def test_mesh_raster_matches_oracle(rng):
    w = h = 48
    m = _cam(w, h)
    verts, faces = _random_mesh(rng)
    idx, dep = jax.jit(RM.rasterize_mesh, static_argnums=(3, 4, 5))(
        verts, faces, m, h, w, 8)
    idx_ref, dep_ref = RM.rasterize_mesh_reference(verts, faces, m, h, w)
    idx, dep = np.asarray(idx), np.asarray(dep)
    # f32 vs f64 projection can flip pixels whose centers graze an edge;
    # demand near-total agreement
    agree = (idx == idx_ref).mean()
    assert agree > 0.995, f"only {agree:.4f} agreement"
    both = (idx == idx_ref) & (idx >= 0)
    np.testing.assert_allclose(dep[both], dep_ref[both], atol=1e-5)


def test_mesh_raster_occlusion(rng):
    """A nearer triangle must win the overlapping pixels."""
    w = h = 32
    m = _cam(w, h)
    verts = np.array([
        # far big triangle
        [-1.0, -1.0, -6.0], [1.0, -1.0, -6.0], [0.0, 1.2, -6.0],
        # near small triangle, centered
        [-0.3, -0.3, -3.0], [0.3, -0.3, -3.0], [0.0, 0.4, -3.0],
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    idx, _ = RM.rasterize_mesh(verts, faces, m, h, w, samples=32)
    idx = np.asarray(idx)
    assert (idx == 1).any() and (idx == 0).any()
    # center pixel belongs to the near triangle
    assert idx[h // 2, w // 2] == 1


def test_mesh_uv_interpolation(rng):
    """uv varies smoothly across a textured quad: the uv map at interior
    pixels must match the analytic bilinear mapping."""
    w = h = 64
    m = _cam(w, h)
    z = -5.0
    verts = np.array([[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]],
                     np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    idx, _ = RM.rasterize_mesh(verts, faces, m, h, w, samples=64)
    uv_map = RM.interpolate_uv(verts, faces, uv, m, idx)
    idx, uv_map = np.asarray(idx), np.asarray(uv_map)
    assert (idx >= 0).sum() > 100
    ndc, _, _ = RM.project_vertices(jnp.asarray(verts), jnp.asarray(m))
    ndc = np.asarray(ndc)
    sx = w * (ndc[:, 0] + 1) * 0.5
    sy = h * (1 - ndc[:, 1]) * 0.5
    ys, xs = np.nonzero(idx >= 0)
    for yy, xx in list(zip(ys, xs))[:: max(1, len(ys) // 50)]:
        # constant-z quad: uv is affine in screen space
        fx = (xx + 0.5 - sx[0]) / (sx[1] - sx[0])
        fy = (yy + 0.5 - sy[0]) / (sy[3] - sy[0])
        np.testing.assert_allclose(uv_map[yy, xx], [fx, fy], atol=2e-3)


def test_mesh_batch_shape(rng):
    w = h = 32
    m = _cam(w, h)
    verts, faces = _random_mesh(rng, 10)
    idx, dep = RM.rasterize_mesh_batch(verts, faces,
                                       np.stack([m, m]), h, w)
    assert idx.shape == (2, h, w)
    np.testing.assert_array_equal(np.asarray(idx[0]), np.asarray(idx[1]))
