"""Visual verification scene (verify skill recipe 1, extended).

Renders to /tmp/verify_*.png on the real chip:
  1. checkerboard floor + occluding walls via the POINT rasterizer with
     mixed per-point sizes (near wall big splats, floor size-1);
  2. the same scene with 'ps' z-relative sizing;
  3. a textured two-triangle quad via the MESH rasterizer with a
     checker pattern sampled at interpolated uv (interiors must be
     gap-free, unlike vertex splatting).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from read_tpu.ops import rasterize as R
    from read_tpu.ops import rasterize_mesh as RMesh
    from read_tpu.scene import camera

    h, w = 240, 320
    rng = np.random.default_rng(0)

    # floor points (checker), red wall z=-6, blue wall z=-12
    fx, fz = np.meshgrid(np.linspace(-6, 6, 300),
                         np.linspace(-14, 2, 300))
    floor = np.stack([fx.ravel(), np.full(fx.size, -1.0), fz.ravel()],
                     axis=1)
    checker = ((np.floor(floor[:, 0]) + np.floor(floor[:, 2])) % 2)
    floor_rgb = np.stack([checker] * 3, axis=1) * 0.8 + 0.1

    wx, wy = np.meshgrid(np.linspace(-2, 2, 200),
                         np.linspace(-1, 2, 150))
    red = np.stack([wx.ravel(), wy.ravel(),
                    np.full(wx.size, -6.0)], axis=1)
    blue = np.stack([wx.ravel() + 1.0, wy.ravel(),
                     np.full(wx.size, -12.0)], axis=1)
    xyz = np.concatenate([floor, red, blue]).astype(np.float32)
    rgb = np.concatenate([
        floor_rgb, np.tile([0.9, 0.1, 0.1], (red.shape[0], 1)),
        np.tile([0.1, 0.2, 0.9], (blue.shape[0], 1))]).astype(np.float32)
    sizes = np.concatenate([
        np.ones(floor.shape[0]), np.full(red.shape[0], 3.0),
        np.full(blue.shape[0], 3.0)]).astype(np.float32)

    K = np.array([[260.0, 0, w / 2], [0, 260.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=100.0)
    view = camera.look_at([0, 0.5, 2], [0, 0, -10], up=[0, 1, 0])
    m = camera.total_matrix(P, view).astype(np.float32)

    # 1: per-point fixed sizes
    idx, _ = R.rasterize(xyz, m, h, w, point_radius=1,
                         point_sizes=sizes)
    img = np.zeros((h, w, 3), np.float32)
    ii = np.asarray(idx)
    img[ii >= 0] = rgb[ii[ii >= 0]]
    imageio.imwrite("/tmp/verify_points.png",
                    (img * 255).astype(np.uint8))

    # 2: z-relative splats
    idx, _ = R.rasterize(xyz, m, h, w, point_radius=2,
                         point_sizes=np.full(xyz.shape[0], 8.0,
                                             np.float32),
                         relative_size=True, min_point_size=1.0)
    img = np.zeros((h, w, 3), np.float32)
    ii = np.asarray(idx)
    img[ii >= 0] = rgb[ii[ii >= 0]]
    imageio.imwrite("/tmp/verify_ps.png", (img * 255).astype(np.uint8))

    # 3: mesh quad with checker texture via interpolated uv
    zq = -5.0
    verts = np.array([[-2, -1, zq], [2, -1, zq], [2, 1.5, zq - 3],
                      [-2, 1.5, zq - 3]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    fidx, _ = RMesh.rasterize_mesh(verts, faces, m, h, w, samples=256)
    uv_map = RMesh.interpolate_uv(verts, faces, uv, m, fidx)
    uvm = np.asarray(uv_map)
    fi = np.asarray(fidx)
    tex = ((np.floor(uvm[..., 0] * 8) + np.floor(uvm[..., 1] * 8)) % 2)
    img = np.stack([tex * 0.9, tex * 0.7, 0.2 + 0.6 * tex], axis=-1)
    img[fi < 0] = 0.0
    imageio.imwrite("/tmp/verify_mesh.png",
                    (img * 255).astype(np.uint8))
    n_int = int((fi >= 0).sum())
    print(f"wrote /tmp/verify_points.png /tmp/verify_ps.png "
          f"/tmp/verify_mesh.png  (mesh covers {n_int} px)")


if __name__ == "__main__":
    main()
