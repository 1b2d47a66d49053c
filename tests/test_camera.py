"""Projection-convention parity tests (reference: READ/gl/utils.py)."""

import numpy as np

from read_tpu.scene import camera


def _ref_get_proj_matrix(K, image_size, znear=0.01, zfar=1000.0):
    """Independent re-derivation of the reference formula (utils.py:123-150)
    in its original pre-transpose layout."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    width, height = image_size
    m = np.zeros((4, 4))
    m[0][0] = 2.0 * fx / width
    m[1][1] = 2.0 * fy / height
    m[2][0] = 1.0 - 2.0 * cx / width
    m[2][1] = 2.0 * cy / height - 1.0
    m[2][2] = (zfar + znear) / (znear - zfar)
    m[2][3] = -1.0
    m[3][2] = 2.0 * zfar * znear / (znear - zfar)
    return m.T


def test_gl_projection_matches_reference_formula():
    K = np.array([[720.0, 0, 610.0], [0, 720.0, 180.0], [0, 0, 1]])
    P = camera.gl_projection(K, (1216, 368))
    P_ref = _ref_get_proj_matrix(K, (1216, 368))
    np.testing.assert_allclose(P, P_ref, rtol=0, atol=1e-12)


def test_projection_center_point():
    # A point straight ahead at the principal axis projects to the image
    # center when cx,cy are at the center.
    w, h = 640, 480
    K = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h))
    view = np.eye(4)  # camera at origin, GL looks down -z
    m = camera.total_matrix(P, view)
    p = np.array([0.0, 0.0, -10.0, 1.0])
    clip = m @ p
    ndc = clip[:3] / clip[3]
    assert abs(ndc[0]) < 1e-9 and abs(ndc[1]) < 1e-9
    assert -1 <= ndc[2] <= 1
    uv = camera.pixel_grid_mapping(ndc[None, :2], w, h)[0]
    np.testing.assert_allclose(uv, [w / 2, h / 2], atol=1e-6)


def test_projection_pixel_roundtrip():
    # Project a known 3D point, check its pixel position equals the pinhole
    # model's u = fx * x / (-z) + cx (with the GL y flip).
    w, h = 320, 240
    fx, fy, cx, cy = 260.0, 250.0, 165.0, 125.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h))
    m = camera.total_matrix(P, np.eye(4))
    pt = np.array([0.7, -0.3, -5.0])
    clip = m @ np.append(pt, 1.0)
    ndc = clip[:3] / clip[3]
    u, v = camera.pixel_grid_mapping(ndc[None, :2], w, h)[0]
    # Expanding P (utils.py:123-150) through the NDC->pixel map
    # (point_render.cu:141-142) gives the plain pinhole model with a
    # y flip: u = fx*x/(-z) + cx, v = cy - fy*y/(-z).
    x_over_mz = pt[0] / -pt[2]
    y_over_mz = pt[1] / -pt[2]
    u_expect = fx * x_over_mz + cx
    v_expect = cy - fy * y_over_mz
    np.testing.assert_allclose([u, v], [u_expect, v_expect], atol=1e-9)


def test_rescale_and_crop_K():
    K = np.array([[700.0, 0, 300.0], [0, 710.0, 200.0], [0, 0, 1]])
    K2 = camera.rescale_K(K, 0.5, 0.5)
    np.testing.assert_allclose(np.diag(K2), [350, 355, 1])
    np.testing.assert_allclose([K2[0, 2], K2[1, 2]], [150, 100])
    K3 = camera.rescale_K(K, 0.5, 0.5, keep_fov=False)
    np.testing.assert_allclose(np.diag(K3), [700, 710, 1])
    K4 = camera.crop_K(K, (600, 400), (300, 100))
    np.testing.assert_allclose([K4[0, 2], K4[1, 2]], [150, 50])


def test_rewrite_near_far():
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
    P = camera.gl_projection(K, (640, 480), znear=0.1, zfar=10.0)
    P2 = camera.rewrite_near_far(P, znear=0.01, zfar=1000.0)
    P3 = camera.gl_projection(K, (640, 480), znear=0.01, zfar=1000.0)
    np.testing.assert_allclose(P2, P3, atol=1e-12)


def test_look_at_points_camera_at_target():
    view = camera.look_at([5.0, 0, 0], [0, 0, 0], up=[0, 0, 1])
    # Camera-to-world: the -z axis (forward) should point toward origin.
    fwd_world = view[:3, :3] @ np.array([0, 0, -1.0])
    np.testing.assert_allclose(fwd_world, [-1, 0, 0], atol=1e-12)
    # A point at the origin should be on the optical axis.
    K = np.array([[100.0, 0, 50.0], [0, 100.0, 50.0], [0, 0, 1]])
    P = camera.gl_projection(K, (100, 100))
    m = camera.total_matrix(P, view)
    clip = m @ np.array([0, 0, 0, 1.0])
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-12)


def test_trajectory_interpolation(tmp_path):
    """Keyframe record / smooth sample / save-load round trip
    (reference viewer trajectory editing, viewer.py:381-458)."""
    from read_tpu.scene.trajectory import Trajectory, quat_to_mat, \
        mat_to_quat, slerp
    t = Trajectory()
    p0, p1 = np.eye(4), np.eye(4)
    p1[:3, 3] = [2.0, 0.0, 0.0]
    c, s = np.cos(0.5), np.sin(0.5)
    p1[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    t.add(p0)
    t.add(p1)
    assert len(t) == 2
    # endpoints exact
    np.testing.assert_allclose(t.sample(0.0), p0, atol=1e-9)
    np.testing.assert_allclose(t.sample(1.0), p1, atol=1e-9)
    # midpoint: halfway translation, halfway rotation, orthonormal
    mid = t.sample(0.5)
    np.testing.assert_allclose(mid[:3, 3], [1.0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(mid[:3, :3] @ mid[:3, :3].T, np.eye(3),
                               atol=1e-9)
    ch, sh = np.cos(0.25), np.sin(0.25)
    np.testing.assert_allclose(
        mid[:3, :3], [[ch, 0, sh], [0, 1, 0], [-sh, 0, ch]], atol=1e-9)
    # save / load round trip
    fn = str(tmp_path / "traj.txt")
    t.save(fn)
    t2 = Trajectory.load(fn)
    assert len(t2) == 2
    np.testing.assert_allclose(t2.keyframes[1], p1, atol=1e-12)
    # quat round trip
    q = mat_to_quat(p1[:3, :3])
    np.testing.assert_allclose(quat_to_mat(q), p1[:3, :3], atol=1e-9)
    np.testing.assert_allclose(slerp(q, q, 0.3), q, atol=1e-12)
