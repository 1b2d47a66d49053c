"""Triangle-mesh rasterization, TPU-native.

The reference's GL tree draws indexed ``GL_TRIANGLES`` with interpolated
attributes (``READ/gl/render.py:69-73``; uv varyings in the shaders,
``READ/gl/programs.py:253-255``) so ``MeshTexture`` can be sampled at
smoothly-interpolated uv coordinates. The round-1 TPU build splatted
vertices only (triangle interiors missing). This module closes the gap
with a deterministic, sort-based triangle rasterizer:

1. project the vertices (same clip math as the point rasterizer);
2. for each face, emit a STATIC ``samples x samples`` pixel-candidate
   grid anchored at its screen bbox corner — each candidate is tested for
   triangle containment via 2D screen-space barycentrics, and its depth
   is the barycentric-interpolated NDC z (exactly GL's non-perspective
   depth interpolation for gl_FragCoord.z);
3. all candidates z-buffer through the same lexicographic sort +
   unique-winner scatter as the point path (deterministic: min depth,
   then smallest face id);
4. per winning pixel, barycentrics are *recomputed* from the face's
   vertices (a gather + small math), giving perspective-CORRECT attribute
   interpolation weights (``bary_i / w_i`` renormalized — GL's default
   for varyings).

Coverage is exact for faces whose screen bbox fits in ``samples``^2
pixels (the common case for photogrammetry meshes at render resolution);
larger faces are covered on a subgrid (documented cap — raise ``samples``
or pre-subdivide the mesh for gigantic triangles).

All shapes are static; jit/vmap-friendly; no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["project_vertices", "rasterize_mesh", "rasterize_mesh_batch",
           "interpolate_uv", "rasterize_mesh_reference"]

_FAR = jnp.float32(2.0)


def project_vertices(verts: jax.Array, total_m: jax.Array):
    """Project mesh vertices to NDC keeping the clip w (needed for
    perspective-correct interpolation).

    Returns ``(ndc [N,3], w_clip [N], valid [N])``; ``valid`` is the
    behind-eye test only — triangles are clipped per candidate pixel, so
    partially-off-screen faces still draw their visible part."""
    v = verts.astype(jnp.float32)
    m = total_m.astype(jnp.float32)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    clip = jnp.stack(
        [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3]
         for i in range(3)], axis=-1)
    w = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3]
    ndc = clip / w[:, None]
    return ndc, w, w > 1e-9


def _screen_xy(ndc: jax.Array, h: int, w: int):
    """NDC -> continuous screen coords whose integer pixel (u,v) is the
    floor (same mapping as the point path)."""
    sx = w * (ndc[..., 0] + 1.0) * 0.5
    sy = h * (1.0 - ndc[..., 1]) * 0.5
    return sx, sy


def _edge(ax, ay, bx, by, px, py):
    """Signed area (edge function)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def rasterize_mesh(verts: jax.Array, faces: jax.Array,
                   total_m: jax.Array, h: int, w: int,
                   samples: int = 8
                   ) -> Tuple[jax.Array, jax.Array]:
    """Rasterize one view of an indexed triangle mesh.

    Args:
      verts: ``[N, 3]`` float32 positions.
      faces: ``[T, 3]`` int32 vertex indices.
      total_m: ``[4, 4]`` world->clip matrix.
      samples: static per-face coverage grid side (faces with screen
        bboxes larger than ``samples`` px are subsampled).

    Returns:
      ``(face_idx [h,w] int32, depth [h,w] f32)`` with -1 for empty
      pixels (same conventions as ``ops.rasterize``).
    """
    ndc, w_clip, vvalid = project_vertices(verts, total_m)
    t = faces.shape[0]
    tri = ndc[faces]                      # [T,3,3]
    tvalid = jnp.all(vvalid[faces], axis=1)
    sx, sy = _screen_xy(tri, h, w)        # [T,3] each

    x0 = jnp.floor(jnp.min(sx, axis=1)).astype(jnp.int32)
    y0 = jnp.floor(jnp.min(sy, axis=1)).astype(jnp.int32)
    # candidate pixel lattice anchored at the bbox corner
    ii = jax.lax.broadcasted_iota(jnp.int32, (samples, samples), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (samples, samples), 1)
    px = x0[:, None, None] + jj[None]     # [T,S,S]
    py = y0[:, None, None] + ii[None]
    cx = px.astype(jnp.float32) + 0.5     # pixel centers
    cy = py.astype(jnp.float32) + 0.5

    ax, ay = sx[:, 0, None, None], sy[:, 0, None, None]
    bx, by = sx[:, 1, None, None], sy[:, 1, None, None]
    gx, gy = sx[:, 2, None, None], sy[:, 2, None, None]
    area = _edge(ax, ay, bx, by, gx, gy)   # [T,1,1]
    e0 = _edge(bx, by, gx, gy, cx, cy)
    e1 = _edge(gx, gy, ax, ay, cx, cy)
    e2 = _edge(ax, ay, bx, by, cx, cy)
    # inside regardless of winding (GL culling off by default in
    # OffscreenRender unless cull_face, render.py:60-63)
    s = jnp.sign(area)
    inside = (e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0) \
        & (jnp.abs(area) > 1e-12)
    b0 = e0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    b1 = e1 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    b2 = 1.0 - b0 - b1
    z = (b0 * tri[:, 0, 2, None, None] + b1 * tri[:, 1, 2, None, None]
         + b2 * tri[:, 2, 2, None, None])
    depth = (z + 1.0) * 0.5
    onscreen = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    ok = inside & onscreen & tvalid[:, None, None] \
        & (jnp.abs(z) <= 1.0) & (depth >= 0.0)

    pix = jnp.where(ok, py * w + px, h * w).reshape(-1)
    dep = jnp.where(ok, depth, _FAR).reshape(-1)
    ids = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (t, 1, 1), 0),
        (t, samples, samples)).reshape(-1)

    spix, sdep, sid = jax.lax.sort((pix, dep, ids), num_keys=3)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), spix[1:] != spix[:-1]])
    win = first & (spix < h * w)
    tgt = jnp.where(win, spix, h * w)
    ibuf = jnp.full((h * w,), -1, jnp.int32).at[tgt].set(
        sid, mode="drop", unique_indices=True)
    dbuf = jnp.zeros((h * w,), jnp.float32).at[tgt].set(
        sdep, mode="drop", unique_indices=True)
    return ibuf.reshape(h, w), dbuf.reshape(h, w)


def rasterize_mesh_batch(verts, faces, total_m, h: int, w: int,
                         samples: int = 8):
    """Batch of views: ``total_m [B,4,4]``."""
    f = functools.partial(rasterize_mesh, h=h, w=w, samples=samples)
    return jax.vmap(lambda m: f(verts, faces, m))(total_m)


def interpolate_uv(verts: jax.Array, faces: jax.Array, uv: jax.Array,
                   total_m: jax.Array, face_idx: jax.Array
                   ) -> jax.Array:
    """Perspective-correct uv interpolation at winning pixels.

    Recomputes screen barycentrics for each pixel's winning face, weights
    them by ``1/w_clip`` and renormalizes (GL's default perspective
    correction for varyings), then blends the three vertices' uv.

    Args:
      face_idx: ``[h, w]`` winner map from :func:`rasterize_mesh`.

    Returns ``[h, w, 2]`` uv map (0 where empty).
    """
    h, w = face_idx.shape
    ndc, w_clip, _ = project_vertices(verts, total_m)
    fid = jnp.clip(face_idx, 0, faces.shape[0] - 1)
    f = faces[fid]                          # [h,w,3]
    tri = ndc[f]                            # [h,w,3,3]
    wc = w_clip[f]                          # [h,w,3]
    sx, sy = _screen_xy(tri, h, w)          # [h,w,3]
    cx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
          .astype(jnp.float32) + 0.5)
    cy = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
          .astype(jnp.float32) + 0.5)
    ax, ay = sx[..., 0], sy[..., 0]
    bx, by = sx[..., 1], sy[..., 1]
    gx, gy = sx[..., 2], sy[..., 2]
    area = _edge(ax, ay, bx, by, gx, gy)
    area = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    b0 = _edge(bx, by, gx, gy, cx, cy) / area
    b1 = _edge(gx, gy, ax, ay, cx, cy) / area
    b2 = 1.0 - b0 - b1
    bary = jnp.stack([b0, b1, b2], axis=-1)          # [h,w,3]
    pw = bary / jnp.maximum(wc, 1e-9)
    pw = pw / jnp.maximum(jnp.sum(pw, axis=-1, keepdims=True), 1e-12)
    uv_tri = uv[f]                                   # [h,w,3,2]
    out = jnp.sum(pw[..., None] * uv_tri, axis=-2)
    return out * (face_idx >= 0)[..., None].astype(out.dtype)


def rasterize_mesh_reference(verts: np.ndarray, faces: np.ndarray,
                             total_m: np.ndarray, h: int, w: int):
    """Sequential CPU oracle: per-face bbox scan, screen barycentric
    containment, min-depth / smallest-face-id win (f64)."""
    verts = np.asarray(verts, np.float64)
    m = np.asarray(total_m, np.float64)
    n = verts.shape[0]
    hom = np.concatenate([verts, np.ones((n, 1))], axis=1)
    clip = hom @ m.T
    wc = clip[:, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        ndc = clip[:, :3] / wc[:, None]
    sx = w * (ndc[:, 0] + 1.0) * 0.5
    sy = h * (1.0 - ndc[:, 1]) * 0.5
    index = np.full((h, w), -1, np.int32)
    depth = np.full((h, w), np.inf, np.float64)
    for ti, (i0, i1, i2) in enumerate(np.asarray(faces)):
        if min(wc[i0], wc[i1], wc[i2]) <= 1e-9:
            continue
        axs, ays = sx[i0], sy[i0]
        bxs, bys = sx[i1], sy[i1]
        gxs, gys = sx[i2], sy[i2]
        area = (bxs - axs) * (gys - ays) - (bys - ays) * (gxs - axs)
        if abs(area) < 1e-12:
            continue
        x_lo = max(0, int(np.floor(min(axs, bxs, gxs))))
        x_hi = min(w - 1, int(np.floor(max(axs, bxs, gxs))))
        y_lo = max(0, int(np.floor(min(ays, bys, gys))))
        y_hi = min(h - 1, int(np.floor(max(ays, bys, gys))))
        sgn = np.sign(area)
        for pyy in range(y_lo, y_hi + 1):
            for pxx in range(x_lo, x_hi + 1):
                cx, cy = pxx + 0.5, pyy + 0.5
                e0 = (gxs - bxs) * (cy - bys) - (gys - bys) * (cx - bxs)
                e1 = (axs - gxs) * (cy - gys) - (ays - gys) * (cx - gxs)
                e2 = (bxs - axs) * (cy - ays) - (bys - ays) * (cx - axs)
                if e0 * sgn < 0 or e1 * sgn < 0 or e2 * sgn < 0:
                    continue
                b0, b1 = e0 / area, e1 / area
                b2 = 1.0 - b0 - b1
                z = (b0 * ndc[i0, 2] + b1 * ndc[i1, 2] + b2 * ndc[i2, 2])
                if abs(z) > 1.0:
                    continue
                d = (z + 1.0) * 0.5
                if d < depth[pyy, pxx] or (d == depth[pyy, pxx]
                                           and ti < index[pyy, pxx]):
                    index[pyy, pxx] = ti
                    depth[pyy, pxx] = d
    depth[index < 0] = 0.0
    return index, depth.astype(np.float32)
