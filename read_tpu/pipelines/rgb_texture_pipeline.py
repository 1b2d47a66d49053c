"""RGBTexturePipeline: classic RGB texture fitting (no network).

Parity target: ``READ/pipelines/ogl.py:199-227`` + ``RGBTexture``
(``READ/models/compose.py:216-234``): a multi-level ``MeshTexture``
(3-channel, sigmoid) sampled at rendered uv_2d coordinates, optimized
with RMSprop against the target photos.

The reference rasterizes mesh uv coordinates with GL; here uv maps come
from the point rasterizer + per-vertex uv gather (``ops.render_modes``)
— exact for dense vertex sets; triangle interiors are TODO alongside the
mesh triangle rasterizer.
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
            "opt": opt.init(tables)}, opt


def make_rgb_texture_step(opt, pointcloud: Dict, h: int, w: int,
                          reg_weight: float = 0.0,
                          grad_clip: float = 1e3):
    uv2d = jnp.asarray(np.asarray(pointcloud["uv2d"], np.float32))

    @jax.jit
    def step(state, xyz, batch):
        def loss_fn(tables):
            idx, dep = R.rasterize_batch(xyz, batch["total_m"], h, w)
            uv_map = RM.gather_attribute(uv2d, idx)
            mask = (idx >= 0)[..., None].astype(jnp.float32)
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
        tables = optax.apply_updates(state["tables"], updates)
        return ({"step": state["step"] + 1, "tables": tables,
                 "opt": new_opt},
                {"loss": loss, "psnr": TP.L.psnr(pred, batch["target"])})

    return step
