"""Pix2PixPipeline: train the refinement net on raw rendered modalities
(no learnable point texture).

Parity target: ``READ/pipelines/ogl.py:157-196`` + ``MultiscaleNet``
(``READ/models/compose.py:184-213``): the input pyramid is built from
non-neural render modes (e.g. ``colors``), modalities grouped in chunks
of ``input_modality`` and channel-concatenated per scale; Adam on the net
only.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from read_tpu.models.unet import UNet
from read_tpu.ops import rasterize as R
from read_tpu.ops import render_modes as RM
from read_tpu.pipelines import texture_pipeline as TP

__all__ = ["Pix2PixConfig", "create_pix2pix_state", "make_pix2pix_step",
           "multiscale_inputs"]


class Pix2PixConfig(TP.PipelineConfig):
    pass


def multiscale_inputs(modes: List[str], levels, pointcloud: Dict,
                      view_matrix=None, input_modality: int = 1):
    """Build the net's input pyramid from raw render modes.

    ``modes`` has one entry per rendered map; consecutive groups of
    ``input_modality`` maps are channel-concatenated and assigned to
    successive scales (``compose.py:190-204`` grouping)."""
    maps = []
    for mode, (ix, dep) in zip(modes, levels):
        maps.append(RM.render_mode(mode, ix, dep, pointcloud,
                                   view_matrix))
    pyr = []
    for i in range(0, len(maps), input_modality):
        group = maps[i:i + input_modality]
        pyr.append(jnp.concatenate(group, axis=-1))
    return pyr


def create_pix2pix_state(key: jax.Array, cfg: TP.PipelineConfig,
                         in_channels: int = 3):
    net = UNet(num_input_channels=in_channels,
               num_classes=cfg.num_classes, dtype=cfg.dtype,
               conv_impl=cfg.conv_impl)
    h, w = cfg.crop_size
    pyr = [jnp.zeros((1, h // s, w // s, in_channels), jnp.float32)
           for s in (1, 2, 4, 8)]
    variables = net.init(key, *pyr, train=False)
    opt = optax.adam(cfg.lr)
    state = {
        "step": jnp.zeros((), jnp.int32),
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt": opt.init(variables["params"]),
        "lr_scale": jnp.ones((), jnp.float32),
    }
    return state, net, opt


def make_pix2pix_step(net: UNet, cfg: TP.PipelineConfig, opt,
                      vgg_params, pointcloud: Dict,
                      mode: str = "colors"):
    """Fused step: rasterize -> raw-mode maps -> UNet -> losses -> Adam."""
    h, w = cfg.crop_size
    rgb = jnp.asarray(np.asarray(pointcloud["rgb"], np.float32))
    pc = {"rgb": rgb}

    @jax.jit
    def step(state, xyz, batch):
        def loss_fn(params):
            levels = R.rasterize_pyramid_pooled(
                xyz, batch["total_m"], (h, w), cfg.num_scales)
            pyr = [RM.render_mode(mode, ix, dep, pc) for ix, dep in
                   levels]
            out, mutated = net.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                *pyr, train=True, mutable=["batch_stats"])
            loss, metrics = TP._losses(cfg, vgg_params, out, batch)
            return loss, (metrics, mutated["batch_stats"])

        (loss, (metrics, new_bs)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        g = jax.tree.map(
            functools.partial(TP._guard_grad, clip=cfg.grad_clip), g)
        updates, new_opt = opt.update(g, state["opt"], state["params"])
        # plateau decay rides lr_scale (ReduceLROnPlateau parity)
        updates = jax.tree.map(lambda u: u * state["lr_scale"], updates)
        params = optax.apply_updates(state["params"], updates)
        metrics["loss"] = loss
        return {"step": state["step"] + 1, "params": params,
                "batch_stats": new_bs, "opt": new_opt,
                "lr_scale": state["lr_scale"]}, metrics

    return step
