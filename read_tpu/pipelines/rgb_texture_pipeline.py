"""RGBTexturePipeline: classic RGB texture fitting (no network).

Parity target: ``READ/pipelines/ogl.py:199-227`` + ``RGBTexture``
(``READ/models/compose.py:216-234``): a multi-level ``MeshTexture``
(3-channel, sigmoid) sampled at rendered uv_2d coordinates, optimized
with RMSprop against the target photos.

The reference rasterizes mesh uv coordinates with GL (indexed
``GL_TRIANGLES``, ``READ/gl/render.py:69-73``); here uv maps come either
from the triangle rasterizer (``ops.rasterize_mesh`` — full interiors
with perspective-correct uv interpolation; pass ``faces``) or, for raw
point clouds, from the point rasterizer + per-vertex uv gather.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from read_tpu.models import texture as T
from read_tpu.ops import rasterize as R
from read_tpu.ops import render_modes as RM
from read_tpu.pipelines import texture_pipeline as TP

__all__ = ["create_rgb_texture_state", "make_rgb_texture_step",
           "rgb_texture_forward"]


def rgb_texture_forward(tables, uv_map: jax.Array,
                        mask: jax.Array) -> jax.Array:
    """Sample the RGB mesh texture at a rendered uv map
    (``compose.py:216-234``: sigmoid activation)."""
    out = T.sample_mesh_texture(tables, uv_map, activation="sigmoid")
    return out * mask


def create_rgb_texture_state(key: jax.Array, texture_size: int,
                             levels: int = 4, lr: float = 1e-1):
    tables = T.init_mesh_texture(key, texture_size, n_channels=3,
                                 levels=levels, init_method="0.5")
    opt = optax.rmsprop(lr, decay=0.99, eps=1e-8)
    return {"step": jnp.zeros((), jnp.int32), "tables": tables,
            "opt": opt.init(tables),
            "lr_scale": jnp.ones((), jnp.float32)}, opt


def make_rgb_texture_step(opt, pointcloud: Dict, h: int, w: int,
                          reg_weight: float = 0.0,
                          grad_clip: float = 1e3,
                          faces=None, mesh_samples: int = 8):
    """``faces [T,3]`` switches uv-map generation from vertex splats to
    the triangle rasterizer (full interiors, ``ops.rasterize_mesh``)."""
    uv2d = jnp.asarray(np.asarray(pointcloud["uv2d"], np.float32))
    faces_j = None if faces is None else jnp.asarray(
        np.asarray(faces, np.int32))

    def _uv_and_mask(xyz, total_m):
        if faces_j is None:
            idx, _ = R.rasterize_batch(xyz, total_m, h, w)
            uv_map = RM.gather_attribute(uv2d, idx)
        else:
            from read_tpu.ops import rasterize_mesh as RMesh
            idx, _ = RMesh.rasterize_mesh_batch(
                xyz, faces_j, total_m, h, w, samples=mesh_samples)
            uv_map = jax.vmap(
                lambda fi, m: RMesh.interpolate_uv(xyz, faces_j, uv2d,
                                                   m, fi))(idx, total_m)
        mask = (idx >= 0)[..., None].astype(jnp.float32)
        return uv_map, mask

    @jax.jit
    def step(state, xyz, batch):
        def loss_fn(tables):
            uv_map, mask = _uv_and_mask(xyz, batch["total_m"])
            pred = rgb_texture_forward(tables, uv_map, mask)
            loss = TP.L.huber_loss(pred, batch["target"] * mask)
            if reg_weight:
                loss = loss + T.mesh_texture_reg_loss(tables, reg_weight)
            return loss, pred

        (loss, pred), g = jax.value_and_grad(
            loss_fn, has_aux=True)(state["tables"])
        g = jax.tree.map(
            functools.partial(TP._guard_grad, clip=grad_clip), g)
        updates, new_opt = opt.update(g, state["opt"], state["tables"])
        # plateau decay rides lr_scale (ReduceLROnPlateau parity with the
        # main loop; the optimizer's base lr stays fixed)
        updates = jax.tree.map(lambda u: u * state["lr_scale"], updates)
        tables = optax.apply_updates(state["tables"], updates)
        return ({"step": state["step"] + 1, "tables": tables,
                 "opt": new_opt, "lr_scale": state["lr_scale"]},
                {"loss": loss, "psnr": TP.L.psnr(pred, batch["target"])})

    return step
