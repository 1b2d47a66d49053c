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
- ``lit``: Blinn-Phong shading (``programs.py:228-246``) — per-point
  view-space lighting with the shader's constants (ambient 0.1, diffuse
  0.75, specular 1.0, shininess 128, gamma 2.2), composited exactly as
  the live fragment code does: ``mix(light, gray(0.5), 0.65)``
  (``programs.py:262-266`` — the base-color mix is commented out there).
- ``texture2d``: GL 2D-texture sampling submode (``programs.py:253-255``)
  — bilinear sample of the scene's texture image at per-point
  ``(u, 1-v)``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["gather_attribute", "render_mode", "blinn_phong_colors",
           "sample_texture2d_colors"]

# the reference's default light + material constants
# (programs.py:208-214,274)
DEFAULT_LIGHT_POSITION = (4.07625, 1.00545, 5.90386)
_AMBIENT = 0.1
_DIFFUSE = 0.75
_SPECULAR = 1.0
_SHININESS = 128.0
_GAMMA = 2.2


def blinn_phong_colors(xyz: jax.Array, normals: jax.Array,
                       view_matrix: jax.Array,
                       light_position=DEFAULT_LIGHT_POSITION
                       ) -> jax.Array:
    """Per-point Blinn-Phong shading in view space (``programs.py:
    228-246``). ``view_matrix`` is camera-to-world; the GL modelview is
    its inverse. ``light_position`` is a view-space position, exactly
    like the reference's uniform. Returns ``[N, 3]`` colors composited
    per the live fragment code: ``0.35*light + 0.65*0.5``."""
    vm = jnp.linalg.inv(jnp.asarray(view_matrix, jnp.float32))
    rot = vm[:3, :3]
    pv = xyz @ rot.T + vm[:3, 3]
    nv = normals @ rot.T
    nv = nv / jnp.maximum(jnp.linalg.norm(nv, axis=-1, keepdims=True),
                          1e-9)
    light = jnp.asarray(light_position, jnp.float32)
    ldir = light - pv
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir, axis=-1,
                                              keepdims=True), 1e-9)
    lamb = jnp.maximum(jnp.sum(ldir * nv, axis=-1, keepdims=True), 0.0)
    vdir = -pv
    vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir, axis=-1,
                                              keepdims=True), 1e-9)
    half = ldir + vdir
    half = half / jnp.maximum(jnp.linalg.norm(half, axis=-1,
                                              keepdims=True), 1e-9)
    spec_angle = jnp.maximum(jnp.sum(half * nv, axis=-1, keepdims=True),
                             0.0)
    spec = jnp.where(lamb > 0.0, spec_angle ** _SHININESS, 0.0)
    linear = _AMBIENT + lamb * _DIFFUSE + spec * _SPECULAR
    light_rgb = jnp.broadcast_to(linear ** (1.0 / _GAMMA),
                                 (xyz.shape[0], 3))
    # live shader: out = mix(vec4(light,1), vec4(0.5), 0.65)
    return light_rgb * 0.35 + 0.5 * 0.65


def sample_texture2d_colors(texture_image: jax.Array,
                            uv2d: jax.Array) -> jax.Array:
    """Bilinear sample of a ``[Ht, Wt, 3]`` texture at per-point uvs in
    [0, 1], with the GL v-flip (``texture2D(texture, (u, 1-v))``,
    ``programs.py:253-255``); clamp-to-edge addressing."""
    tex = jnp.asarray(texture_image, jnp.float32)
    ht, wt = tex.shape[0], tex.shape[1]
    u = jnp.clip(uv2d[..., 0], 0.0, 1.0)
    v = 1.0 - jnp.clip(uv2d[..., 1], 0.0, 1.0)
    x = u * wt - 0.5
    y = v * ht - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def at(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, ht - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, wt - 1)
        return tex[yy, xx]

    c00 = at(y0, x0)
    c01 = at(y0, x0 + 1)
    c10 = at(y0 + 1, x0)
    c11 = at(y0 + 1, x0 + 1)
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


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
    if mode == "lit":
        normals = pointcloud.get("normals")
        if normals is None:
            return jnp.zeros(index_map.shape + (3,), jnp.float32)
        assert view_matrix is not None, "lit mode needs a view matrix"
        cols = blinn_phong_colors(
            jnp.asarray(pointcloud["xyz"], jnp.float32),
            jnp.asarray(normals, jnp.float32), view_matrix,
            pointcloud.get("light_position", DEFAULT_LIGHT_POSITION))
        return gather_attribute(cols, index_map)
    if mode == "texture2d":
        tex = pointcloud.get("texture_image")
        if tex is None:
            raise ValueError("texture2d mode needs a scene texture "
                             "image ('texture' key in the manifest)")
        uv = jnp.asarray(pointcloud["uv2d"], jnp.float32)
        cols = sample_texture2d_colors(tex, uv)
        return gather_attribute(cols, index_map)
    if mode.startswith("normals"):
        normals = pointcloud.get("normals")
        if normals is None:
            return jnp.zeros(index_map.shape + (3,), jnp.float32)
        normals = jnp.asarray(normals, jnp.float32)
        if mode == "normals_m":  # model space as colors
            return gather_attribute(normals * 0.5 + 0.5, index_map)
        assert view_matrix is not None, f"{mode} needs a view matrix"
        cols = view_dependent_colors(
            mode, jnp.asarray(pointcloud["xyz"], jnp.float32), normals,
            view_matrix)
        return gather_attribute(cols, index_map)
    raise ValueError(f"unknown render mode {mode!r}")


def view_dependent_colors(mode: str, xyz: jax.Array, normals: jax.Array,
                          view_matrix: jax.Array) -> jax.Array:
    """Per-point colors for the view-dependent normal modes ``[N, 3]``.

    The per-point half of ``normals_l/r/d`` (reference shader programs
    ``READ/gl/programs.py:136-158``), shared by :func:`render_mode` and
    the training-input path (``texture_pipeline._extra_maps`` /
    ``sharded.sharded_extra_maps``), which vmaps it over per-item view
    matrices.
    """
    vm = jnp.asarray(view_matrix, jnp.float32)
    rot = jnp.linalg.inv(vm)[:3, :3]
    cam_pos = vm[:3, 3]
    sub = mode.split("_")[1]
    if sub == "l":  # view-space normals
        return normals @ rot.T * 0.5 + 0.5
    view_dir = xyz - cam_pos
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-9)
    if sub == "d":  # camera->point direction
        return view_dir * 0.5 + 0.5
    if sub == "r":  # reflection of the view dir about the normal
        dotp = jnp.sum(view_dir * normals, axis=-1, keepdims=True)
        refl = view_dir - 2.0 * dotp * normals
        return refl * 0.5 + 0.5
    raise ValueError(f"unknown view-dependent mode {mode!r}")
