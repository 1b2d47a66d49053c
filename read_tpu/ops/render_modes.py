"""Non-neural render modes: attribute maps from index/depth buffers.

The GL tree renders COLOR/NORMALS/DEPTH/UV/XYZ/LABEL modalities with
submodes in its fragment/vertex shaders (``READ/gl/programs.py:61-72,
136-181``). On TPU these come free once the z-buffer index map exists:
render indices once, gather per-point attributes per mode.

Submode parity (``programs.py:136-178``):
- ``normals_m`` (model): model-space normals as colors ``n*0.5+0.5``.
- ``normals_l`` (local): view-space normals (rotated by view^-1).
- ``normals_r`` (reflection): reflect(view_dir, normal), as colors.
- ``normals_d`` (direction): normalized camera->point direction.
- ``xyz``: bbox-normalized positions (``get_xyz_colors``,
  ``gl/utils.py:424-428``).
- ``depth``: the clip-space depth buffer (``programs.py:159-163``).
- ``labels``: per-point integer labels (``programs.py:176-178`` reads
  them from a normal-channel hack; here they're an explicit attribute).
- ``uv_1d``: the raw point-index map itself; ``uv_2d``: gathered 2D uvs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["gather_attribute", "render_mode"]


def gather_attribute(attr: jax.Array, index_map: jax.Array,
                     fill: float = 0.0) -> jax.Array:
    """Gather per-point attributes through an index map (-1 -> fill)."""
    n = attr.shape[0]
    idx = jnp.clip(index_map, 0, n - 1)
    out = attr[idx]
    mask = (index_map >= 0)[..., None]
    return jnp.where(mask, out, fill)


def render_mode(mode: str, index_map: jax.Array, depth_map: jax.Array,
                pointcloud: Dict, view_matrix: Optional[jax.Array] = None
                ) -> jax.Array:
    """Produce one modality map ``[..., C]`` from a rasterized view.

    Args:
      mode: a ``RenderSpec.mode`` string.
      index_map / depth_map: ``[..., H, W]`` buffers from the rasterizer.
      pointcloud: scene dict with xyz / rgb / normals / uv2d / labels.
      view_matrix: ``[4,4]`` camera-to-world (needed by normals_l/r/d).
    """
    if mode == "uv_1d":
        return index_map[..., None].astype(jnp.float32)
    if mode == "depth":
        return depth_map[..., None]
    if mode == "colors":
        rgb = jnp.asarray(pointcloud["rgb"], jnp.float32)
        return gather_attribute(rgb, index_map)
    if mode == "xyz":
        xyz_c = jnp.asarray(pointcloud["xyz_c"], jnp.float32)
        return gather_attribute(xyz_c, index_map)
    if mode == "uv_2d":
        uv = jnp.asarray(pointcloud["uv2d"], jnp.float32)
        return gather_attribute(uv, index_map)
    if mode == "labels":
        lab = pointcloud.get("labels")
        if lab is None:
            return jnp.zeros(index_map.shape + (1,), jnp.float32)
        lab = jnp.asarray(lab, jnp.float32).reshape(-1, 1)
        return gather_attribute(lab, index_map)
    if mode.startswith("normals"):
        normals = pointcloud.get("normals")
        if normals is None:
            return jnp.zeros(index_map.shape + (3,), jnp.float32)
        normals = jnp.asarray(normals, jnp.float32)
        sub = mode.split("_")[1]
        if sub == "m":  # model space as colors
            return gather_attribute(normals * 0.5 + 0.5, index_map)
        assert view_matrix is not None, f"{mode} needs a view matrix"
        vm = jnp.asarray(view_matrix, jnp.float32)
        rot = jnp.linalg.inv(vm)[:3, :3]
        xyz = jnp.asarray(pointcloud["xyz"], jnp.float32)
        cam_pos = vm[:3, 3]
        if sub == "l":  # view-space normals
            n_view = normals @ rot.T
            return gather_attribute(n_view * 0.5 + 0.5, index_map)
        view_dir = xyz - cam_pos
        view_dir = view_dir / jnp.maximum(
            jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-9)
        if sub == "d":  # camera->point direction
            return gather_attribute(view_dir * 0.5 + 0.5, index_map)
        if sub == "r":  # reflection of the view dir about the normal
            dotp = jnp.sum(view_dir * normals, axis=-1, keepdims=True)
            refl = view_dir - 2.0 * dotp * normals
            return gather_attribute(refl * 0.5 + 0.5, index_map)
    raise ValueError(f"unknown render mode {mode!r}")
