"""Camera and projection math (pure numpy, host side).

Behavioral parity targets (reference: /root/reference):
- OpenGL-style projection from a pinhole K: ``READ/gl/utils.py:123-150``
  (``get_proj_matrix``).
- Near/far plane rewrite: ``READ/gl/utils.py:109-120``.
- Intrinsics rescale / crop: ``READ/gl/utils.py:153-167``.
- Projection-matrix crop: ``READ/gl/utils.py:94-106``.
- Metashape XML intrinsics/extrinsics with the cv->gl column sign flip:
  ``READ/gl/utils.py:170-208``.
- The composed point transform used by the headless rasterizer:
  ``total_m = proj @ inv(view)`` (``src/READ/gl/myrender.py:30``), applied
  row-major with a perspective divide (``MyRender/CloudProjection/
  point_render.cu:108-122``).

All matrices are row-major numpy ``float64``/``float32`` 4x4 arrays; clip
position of a world point ``p`` is ``total_m @ [p, 1]`` followed by divide
by its ``w`` component.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "gl_projection",
    "rewrite_near_far",
    "crop_proj_matrix",
    "rescale_K",
    "crop_K",
    "total_matrix",
    "pixel_grid_mapping",
    "pan_K",
    "look_at",
]


def gl_projection(K: np.ndarray, image_size, znear: float = 0.01,
                  zfar: float = 1000.0) -> np.ndarray:
    """OpenGL clip projection from a pinhole intrinsic matrix.

    ``image_size`` is ``(width, height)``. Returns a row-major 4x4 ``P``
    such that ``clip = P @ cam`` for a camera-space point ``cam`` (GL
    convention: camera looks down -z). Matches the reference's
    ``get_proj_matrix`` (``READ/gl/utils.py:123-150``), including its
    flipped principal-point offsets.
    """
    K = np.asarray(K, dtype=np.float64)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    width, height = image_size
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 2.0 * fx / width
    P[0, 2] = 1.0 - 2.0 * cx / width
    P[1, 1] = 2.0 * fy / height
    P[1, 2] = 2.0 * cy / height - 1.0
    P[2, 2] = (zfar + znear) / (znear - zfar)
    P[2, 3] = 2.0 * zfar * znear / (znear - zfar)
    P[3, 2] = -1.0
    return P


def rewrite_near_far(P: np.ndarray, znear: float = 0.01,
                     zfar: float = 1000.0) -> np.ndarray:
    """Override the near/far rows of an existing projection matrix.

    Parity: ``recalc_proj_matrix_planes`` (``READ/gl/utils.py:109-120``).
    """
    depth = float(zfar - znear)
    out = np.array(P, dtype=np.float64, copy=True)
    out[2, 2] = -(zfar + znear) / depth
    out[2, 3] = -2.0 * zfar * znear / depth
    return out


def crop_proj_matrix(P: np.ndarray, old_size, new_size) -> np.ndarray:
    """Adjust a projection matrix for a central viewport crop.

    Parity: ``crop_proj_matrix`` (``READ/gl/utils.py:94-106``) — the
    reference itself notes this is approximate.
    """
    old_w, old_h = old_size
    new_w, new_h = new_size
    old_cx, old_cy = old_w / 2, old_h / 2
    new_cx, new_cy = new_w / 2, new_h / 2
    out = np.array(P, dtype=np.float64, copy=True)
    out[0, 0] = P[0, 0] * old_w / new_w
    out[0, 2] = (P[0, 2] - 1) * old_w * new_cx / old_cx / new_w + 1
    out[1, 1] = P[1, 1] * old_h / new_h
    out[1, 2] = (P[0, 2] + 1) * old_h * new_cy / old_cy / new_h - 1
    return out


def rescale_K(K: np.ndarray, sx: float, sy: float,
              keep_fov: bool = True) -> np.ndarray:
    """Scale intrinsics for a resized image (``READ/gl/utils.py:153-160``)."""
    out = np.array(K, dtype=np.float64, copy=True)
    out[0, 2] *= sx
    out[1, 2] *= sy
    if keep_fov:
        out[0, 0] *= sx
        out[1, 1] *= sy
    return out


def crop_K(K: np.ndarray, old_size, new_size) -> np.ndarray:
    """Rescale the principal point only (``READ/gl/utils.py:163-167``)."""
    out = np.array(K, dtype=np.float64, copy=True)
    out[0, 2] = new_size[0] * K[0, 2] / old_size[0]
    out[1, 2] = new_size[1] * K[1, 2] / old_size[1]
    return out


def pan_K(K: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Shift the principal point (panorama / intrinsics-jitter helper)."""
    out = np.array(K, dtype=np.float64, copy=True)
    out[0, 2] += dx
    out[1, 2] += dy
    return out


def total_matrix(proj: np.ndarray, view: np.ndarray) -> np.ndarray:
    """World->clip transform: ``proj @ inv(view)``.

    ``view`` is the camera-to-world matrix (GL convention after the
    Metashape sign flip). Parity: ``src/READ/gl/myrender.py:30``.
    """
    return np.asarray(proj, dtype=np.float64) @ np.linalg.inv(
        np.asarray(view, dtype=np.float64))


def pixel_grid_mapping(ndc_xy: np.ndarray, w: int, h: int) -> np.ndarray:
    """NDC [-1,1]^2 -> pixel coords; y flipped so v=0 is the top row.

    Parity: ``point_render.cu:141-142`` (``u=w(x+1)/2, v=h(1-y)/2``).
    """
    u = w * (ndc_xy[..., 0] + 1.0) * 0.5
    v = h * (1.0 - ndc_xy[..., 1]) * 0.5
    return np.stack([u, v], axis=-1)


def look_at(eye, center, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Camera-to-world matrix for a GL camera at ``eye`` looking at
    ``center``. Convenience for synthetic scenes and tests (not in the
    reference, which reads poses from files)."""
    eye = np.asarray(eye, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    view = np.eye(4)
    # GL camera looks down -z in its own frame; columns are world-frame axes.
    view[:3, 0] = right
    view[:3, 1] = true_up
    view[:3, 2] = -fwd
    view[:3, 3] = eye
    return view
