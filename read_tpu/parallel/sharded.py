"""Multi-chip SPMD: sharded rasterization, sharded descriptor tables,
data-parallel training.

The reference's only parallelism is single-process ``nn.DataParallel``
(``train.py:138-139``) plus host-swapped per-scene textures
(``compose.py:96-116``); it has NO distributed backend (SURVEY.md 2.9).
This module is the TPU-native scaling story:

- mesh axes ``('data', 'points')``: batch rows shard over ``data``
  (the DataParallel analogue), the point cloud AND its descriptor table
  shard over ``points`` (the "long-context" analogue — scene scale is
  what outgrows one chip, SURVEY.md 5.7).
- rasterization: each ``points`` shard z-buffers its local points with
  global ids, then shards lexicographically min-reduce (depth, id) over
  ICI — the deterministic z-merge replacing the reference kernel's
  per-pixel spinlock (``point_render.cu:148-166``).
- descriptor gather: each shard gathers only the rows it owns; a psum
  assembles full feature maps. Its transpose automatically routes
  scatter-add gradients back to the owning shard.
- gradients: pmean over ``data`` (grad all-reduce over ICI), texture
  grads stay sharded over ``points`` (sharded optimizer state).

Everything is a single jitted shard_map step: no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from read_tpu.models import texture as T
from read_tpu.ops import rasterize as R
from read_tpu.pipelines import texture_pipeline as TP

__all__ = ["make_mesh", "sharded_rasterize_pyramid", "sharded_gather",
           "sharded_extra_maps", "make_sharded_train_step",
           "shard_scene", "shard_state", "shard_points",
           "shard_pointcloud_attrs", "prepare_scene_state",
           "unshard_state"]

_INT_MAX = jnp.iinfo(jnp.int32).max


def make_mesh(n_data: int, n_points: int,
              devices=None) -> Mesh:
    """Build a ``('data', 'points')`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    assert n_data * n_points <= len(devices), (
        f"need {n_data * n_points} devices, have {len(devices)}")
    dev = np.asarray(devices[:n_data * n_points]).reshape(
        n_data, n_points)
    return Mesh(dev, ("data", "points"))


def _local_raster_merge(xyz_local: jax.Array, id_offset: jax.Array,
                        total_m: jax.Array, h: int, w: int,
                        point_radius: int, axis: str,
                        method: str = "sort"):
    """Local z-buffer with global ids + cross-shard lexicographic merge.

    Tie-break parity with the single-chip path: min depth first, then the
    smallest global point id. ``method`` selects the per-shard z-buffer
    algorithm (the config's ``raster_method``; the cross-shard merge is
    algorithm-independent).
    """
    idx_l, dep_l = R.rasterize_batch(xyz_local, total_m, h, w,
                                     point_radius, method=method)
    idx_g = jnp.where(idx_l >= 0, idx_l + id_offset, -1)
    dep_inf = jnp.where(idx_l >= 0, dep_l, jnp.float32(np.inf))
    dep_min = jax.lax.pmin(dep_inf, axis)
    cand = jnp.where((dep_inf == dep_min) & (idx_g >= 0), idx_g, _INT_MAX)
    idx_win = jax.lax.pmin(cand, axis)
    index = jnp.where(idx_win == _INT_MAX, -1, idx_win)
    depth = jnp.where(index < 0, 0.0, dep_min)
    return index, depth


def sharded_rasterize_pyramid(xyz_local: jax.Array, id_offset: jax.Array,
                              total_m: jax.Array, target_shape,
                              num_scales: int = 4, point_radius: int = 0,
                              axis: str = "points", method: str = "sort"):
    """shard_map body: merged full-res buffer + exact 2x2 pooled pyramid
    (one ICI merge total — coarse scales pool the merged buffer)."""
    h0, w0 = target_shape
    idx, dep = _local_raster_merge(xyz_local, id_offset, total_m, h0, w0,
                                   point_radius, axis, method)
    out = [(idx, dep)]
    for _ in range(1, num_scales):
        idx, dep = R._pool2x2_zbuffer(idx, dep)
        out.append((idx, dep))
    return out


def sharded_gather(table_local: jax.Array, id_offset: jax.Array,
                   index_map: jax.Array, activation: str = "none",
                   axis: str = "points") -> jax.Array:
    """Gather descriptors from a row-sharded table: each shard serves the
    ids it owns; psum assembles the map. The psum transpose broadcasts
    cotangents so each shard's scatter-add receives exactly its rows'
    gradients."""
    n_local = table_local.shape[0]
    local_ids = index_map - id_offset
    owned = (local_ids >= 0) & (local_ids < n_local)
    local_ids = jnp.where(owned, local_ids, 0)
    sample = table_local[local_ids] * owned[..., None].astype(
        table_local.dtype)
    sample = jax.lax.psum(sample, axis)
    if activation == "sigmoid":
        sample = jax.nn.sigmoid(sample)
    elif activation == "tanh":
        sample = jnp.tanh(sample)
    return sample


def sharded_extra_maps(cfg, modes, ix, dep, pc_local: Dict,
                       id_offset: jax.Array, gt_label=None,
                       axis: str = "points", view_m=None):
    """Extra (non-neural) modality maps with points-sharded attributes.

    Mirrors ``texture_pipeline._extra_maps`` (reference grouping
    ``compose.py:136-176``) inside the shard_map body: per-point
    attribute tables (rgb / xyz / uv2d / labels / normals_m) are sharded
    over the ``points`` axis, so each gather serves only the rows the
    shard owns and a psum assembles the map — same owned-row scheme as
    :func:`sharded_gather`. View-dependent modes (``normals_l/r/d``,
    reference ``READ/gl/programs.py:136-158``) compute per-point colors
    from the shard's LOCAL xyz/normals rows and the per-item ``view_m``
    [B,4,4] (sharded P('data') like the batch), then gather through the
    same owned-row psum — the cross-shard view matrices never move.
    """
    attr_keys = {"colors": "rgb", "xyz": "xyz_c", "uv_2d": "uv2d",
                 "labels": "labels", "normals_m": "normals"}
    maps = []
    for mode in modes:
        if mode in ("normals_l", "normals_r", "normals_d"):
            from read_tpu.ops import render_modes as _RM
            if view_m is None:
                raise ValueError(
                    f"view-dependent extra mode {mode!r} needs per-item "
                    "view matrices: pass batch['view_matrix'] [B,4,4]")
            normals = pc_local.get("normals")
            xyz_l = pc_local.get("xyz")
            if normals is None:
                maps.append(jnp.zeros(ix.shape + (3,), jnp.float32))
                continue
            if xyz_l is None:
                raise KeyError(
                    f"extra mode {mode!r} needs the sharded 'xyz' table")

            def _one(ix_b, vm, _mode=mode):
                cols = _RM.view_dependent_colors(
                    _mode, jnp.asarray(xyz_l, jnp.float32),
                    jnp.asarray(normals, jnp.float32), vm)
                return sharded_gather(cols, id_offset, ix_b[None],
                                      "none", axis)[0]

            maps.append(jax.vmap(_one)(ix, view_m))
            continue
        if mode == "uv_1d":
            maps.append(ix[..., None].astype(jnp.float32))
            continue
        if mode == "depth":
            maps.append(dep[..., None])
            continue
        key = attr_keys[mode]
        attr = pc_local.get(key)
        if attr is None:
            # match single-chip render_mode semantics exactly: only a
            # missing 'labels' table zero-fills (render_modes.py:66-68);
            # other missing attributes are a scene-data error there and
            # must not silently change the net input width here.
            if mode != "labels":
                raise KeyError(
                    f"extra mode {mode!r} needs point attribute "
                    f"{key!r}, absent from the sharded pointcloud")
            maps.append(jnp.zeros(ix.shape + (1,), jnp.float32))
            continue
        attr = jnp.asarray(attr, jnp.float32)
        if attr.ndim == 1:
            attr = attr[:, None]
        if mode == "normals_m":
            attr = attr * 0.5 + 0.5
        rendered = sharded_gather(attr, id_offset, ix, "none", axis)
        if mode == "labels" and cfg.label_in_input and gt_label is not None:
            occ = (rendered[..., 0] > 1e-9).astype(jnp.float32)
            f = gt_label.shape[1] // ix.shape[1]
            lab = gt_label[:, ::f, ::f].astype(jnp.float32)
            rendered = (lab * occ)[..., None]
        maps.append(rendered)
    return maps


def shard_scene(mesh: Mesh, xyz: np.ndarray, texture: jax.Array):
    """Place a scene's points+texture sharded over the ``points`` axis
    (padding N to a multiple of the axis size with far-away dummy
    points)."""
    n_shards = mesh.shape["points"]
    n = xyz.shape[0]
    pad = (-n) % n_shards
    if pad:
        # dummy points far behind any camera; never win the z-test
        xyz = np.concatenate(
            [np.asarray(xyz), np.full((pad, 3), 1e9, np.float32)])
        texture = jnp.concatenate(
            [texture, jnp.zeros((pad, texture.shape[1]),
                                texture.dtype)])
    xyz_s = jax.device_put(
        jnp.asarray(xyz, jnp.float32),
        NamedSharding(mesh, P("points", None)))
    tex_s = jax.device_put(texture, NamedSharding(mesh, P("points", None)))
    return xyz_s, tex_s


def shard_state(mesh: Mesh, state: TP.TrainState) -> TP.TrainState:
    """Replicate net params/opt, shard texture (+ its RMSprop state).

    Mesh textures (tuple of fixed-size 2D tables) replicate like net
    params — they don't scale with the point count, which is the whole
    argument for sharding; their uv2d attribute shards instead
    (:func:`shard_pointcloud_attrs`)."""
    repl = NamedSharding(mesh, P())
    if isinstance(state.texture, (tuple, list)):
        put_repl = functools.partial(jax.tree.map,
                                     lambda x: jax.device_put(x, repl))
        return TP.TrainState(
            step=jax.device_put(state.step, repl),
            params=put_repl(state.params),
            batch_stats=put_repl(state.batch_stats),
            texture=put_repl(state.texture),
            net_opt=put_repl(state.net_opt),
            tex_opt=put_repl(state.tex_opt),
            lr_scale=jax.device_put(state.lr_scale, repl),
        )
    tex_sh = NamedSharding(mesh, P("points", None))

    def put_tex_tree(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, tex_sh)
            if getattr(x, "ndim", 0) == 2 and
            x.shape == state.texture.shape else jax.device_put(x, repl),
            tree)

    return TP.TrainState(
        step=jax.device_put(state.step, repl),
        params=jax.tree.map(lambda x: jax.device_put(x, repl),
                            state.params),
        batch_stats=jax.tree.map(lambda x: jax.device_put(x, repl),
                                 state.batch_stats),
        texture=jax.device_put(state.texture, tex_sh),
        net_opt=jax.tree.map(lambda x: jax.device_put(x, repl),
                             state.net_opt),
        tex_opt=put_tex_tree(state.tex_opt),
        lr_scale=jax.device_put(state.lr_scale, repl),
    )


def shard_pointcloud_attrs(mesh: Mesh, pc: Dict) -> Dict:
    """Shard a pointcloud attribute dict (rgb / xyz_c / uv2d / labels /
    normals) over the ``points`` axis, padding rows like
    :func:`shard_points` (pad attributes are zeros — pad points are
    unhittable, so the rows are never gathered)."""
    n_shards = mesh.shape["points"]
    out = {}
    for key, attr in pc.items():
        if attr is None:
            continue
        a = np.asarray(attr, np.float32)
        if a.ndim == 1:
            a = a[:, None]
        pad = (-a.shape[0]) % n_shards
        if pad:
            a = np.concatenate(
                [a, np.zeros((pad,) + a.shape[1:], np.float32)])
        out[key] = jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P("points", None)))
    return out


def shard_points(mesh: Mesh, xyz: np.ndarray) -> jax.Array:
    """Place a point cloud sharded over the ``points`` axis, padding N
    to a multiple of the axis size with far-away dummy points."""
    n_shards = mesh.shape["points"]
    pad = (-xyz.shape[0]) % n_shards
    if pad:
        xyz = np.concatenate(
            [np.asarray(xyz), np.full((pad, 3), 1e9, np.float32)])
    return jax.device_put(jnp.asarray(xyz, jnp.float32),
                          NamedSharding(mesh, P("points", None)))


def _pad_rows(x, pad):
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


def prepare_scene_state(mesh: Mesh, state: TP.TrainState) -> TP.TrainState:
    """Pad the texture table (and its optimizer state) to the points-axis
    size and shard the whole state for ``make_sharded_train_step``.

    The train CLI's ``--mesh`` entry point: takes the unsharded state
    ``create_state`` built (or a resumed one) and returns its
    mesh-resident version."""
    if isinstance(state.texture, (tuple, list)):
        return shard_state(mesh, state)  # replicated; nothing to pad
    n_shards = mesh.shape["points"]
    n = state.texture.shape[0]
    pad = (-n) % n_shards
    if pad:
        tex_shape = state.texture.shape
        state = state.replace(
            texture=_pad_rows(state.texture, pad),
            tex_opt=jax.tree.map(
                lambda x: _pad_rows(x, pad)
                if getattr(x, "shape", None) == tex_shape else x,
                state.tex_opt))
    return shard_state(mesh, state)


def unshard_state(state: TP.TrainState, n_points: int) -> TP.TrainState:
    """Gather a mesh-sharded state to host and strip the texture padding
    — the inverse of ``prepare_scene_state`` (for eval / checkpoints /
    the single-chip viewer)."""
    state = jax.device_get(state)
    if isinstance(state.texture, (tuple, list)):
        return jax.tree.map(jnp.asarray, state)  # replicated, unpadded
    tex_shape = state.texture.shape

    def strip(x):
        if getattr(x, "shape", None) == tex_shape:
            return jnp.asarray(x[:n_points])
        return jnp.asarray(x)

    return TP.TrainState(
        step=jnp.asarray(state.step),
        params=jax.tree.map(jnp.asarray, state.params),
        batch_stats=jax.tree.map(jnp.asarray, state.batch_stats),
        texture=jnp.asarray(state.texture[:n_points]),
        net_opt=jax.tree.map(jnp.asarray, state.net_opt),
        tex_opt=jax.tree.map(strip, state.tex_opt),
        lr_scale=jnp.asarray(state.lr_scale),
    )


def make_sharded_train_step(net, cfg: TP.PipelineConfig, vgg_params,
                            mesh: Mesh, unet: str = "split"):
    """Fused SPMD train step over the ('data','points') mesh.

    batch: ``total_m [B,4,4]`` / ``target [B,h,w,3]`` (+mask/label)
    sharded P('data'); texture sharded P('points'); params replicated.

    ``unet`` selects where the UNet+loss forward/backward runs:

    - ``'split'`` (default): only raster + gather run inside the
      shard_map (they are what actually needs the ``points`` axis); the
      psum-assembled pyramid — identical on every points-shard — is then
      re-sharded so its batch rows spread over BOTH mesh axes and the
      UNet+VGG forward/backward runs under plain GSPMD data parallelism
      across all devices (XLA inserts the grad all-reduce). Per-chip
      UNet FLOPs ≈ total / n_devices.
    - ``'replicated'``: the round-4 behavior — the whole loss graph runs
      inside the shard_map per points-shard, so a (d, p) mesh does p×
      redundant UNet work per batch row. Kept for A/B and regression
      tests.

    Numerics note: under ``'split'`` the train-mode BatchNorm statistics
    are computed over the GLOBAL batch (GSPMD reduces across shards),
    while ``'replicated'`` normalizes per data-shard (torch DataParallel
    semantics). With n_data == 1 the two match exactly; with n_data > 1
    they differ exactly as sync-BN differs from per-replica BN.
    """
    net_opt, tex_opt = TP._make_optimizers(cfg)
    h, w = cfg.crop_size
    if unet == "split":
        return _make_split_train_step(net, cfg, vgg_params, mesh,
                                      net_opt, tex_opt)
    if cfg.use_mesh:
        raise ValueError(
            "use_mesh is only supported with unet='split' (the 2D "
            "tables are replicated and sampled in stage 2)")

    def _loss_local(params, batch_stats, tex_local, xyz_local, id_offset,
                    batch, pc_local):
        levels = sharded_rasterize_pyramid(
            xyz_local, id_offset, batch["total_m"], (h, w),
            cfg.num_scales, cfg.point_radius,
            method=cfg.raster_method)
        pyr = []
        for lvl, (ix, dep) in enumerate(levels):
            x = sharded_gather(tex_local, id_offset, ix,
                               cfg.texture_activation)
            if cfg.extra_modes:
                ex = sharded_extra_maps(cfg, cfg.extra_modes[lvl], ix,
                                        dep, pc_local, id_offset,
                                        batch.get("label"),
                                        view_m=batch.get("view_matrix"))
                x = jnp.concatenate(list(ex) + [x], axis=-1)
            pyr.append(x)
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = net.apply(variables, *pyr, train=True,
                                 mutable=["batch_stats"])
        loss, metrics = TP._losses(cfg, vgg_params, out, batch)
        if cfg.reg_weight:
            # local-shard contribution; summed below via psum of grads
            loss = loss + T.point_texture_reg_loss(tex_local,
                                                   cfg.reg_weight)
        return loss, (metrics, mutated["batch_stats"])

    def step_body(params, batch_stats, tex_local, xyz_local, batch,
                  net_opt_state, tex_opt_state, lr_scale, step,
                  pc_local):
        n_local = xyz_local.shape[0]
        id_offset = (jax.lax.axis_index("points") * n_local).astype(
            jnp.int32)
        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            _loss_local, argnums=(0, 2), has_aux=True)(
                params, batch_stats, tex_local, xyz_local, id_offset,
                batch, pc_local)
        g_net, g_tex = jax.tree.map(
            functools.partial(TP._guard_grad, clip=cfg.grad_clip), grads)
        # DataParallel grad mean over the data axis (ogl/train parity:
        # DataParallel averages replica losses).
        g_net = jax.lax.pmean(g_net, "data")
        g_tex = jax.lax.pmean(g_tex, "data")
        new_bs = jax.lax.pmean(new_bs, "data")
        metrics = jax.lax.pmean(metrics, "data")
        metrics["loss"] = jax.lax.pmean(loss, "data")

        up_net, net_opt_state = net_opt.update(g_net, net_opt_state,
                                               params)
        up_tex, tex_opt_state = tex_opt.update(g_tex, tex_opt_state,
                                               tex_local)
        params = jax.tree.map(
            lambda p, u: p + cfg.lr * lr_scale * u, params, up_net)
        tex_local = tex_local + cfg.texture_lr * lr_scale * up_tex
        return (params, new_bs, tex_local, net_opt_state, tex_opt_state,
                step + 1, metrics)

    from jax import shard_map

    body = shard_map(
        step_body, mesh=mesh,
        in_specs=(P(), P(), P("points", None), P("points", None),
                  P("data"), P(), P("points", None), P(), P(),
                  P("points", None)),
        out_specs=(P(), P(), P("points", None), P(), P("points", None),
                   P(), P()),
        check_vma=False)

    @jax.jit
    def train_step(state: TP.TrainState, xyz_sharded: jax.Array,
                   batch: Dict, pc_sharded: Dict = None):
        (params, new_bs, texture, net_opt_state, tex_opt_state, step,
         metrics) = body(state.params, state.batch_stats, state.texture,
                         xyz_sharded, batch, state.net_opt,
                         state.tex_opt, state.lr_scale, state.step,
                         pc_sharded or {})
        new_state = state.replace(
            step=step, params=params, batch_stats=new_bs, texture=texture,
            net_opt=net_opt_state, tex_opt=tex_opt_state)
        return new_state, metrics

    return train_step


def _make_split_train_step(net, cfg: TP.PipelineConfig, vgg_params,
                           mesh: Mesh, net_opt, tex_opt):
    """The ``unet='split'`` body of :func:`make_sharded_train_step`.

    Stage 1 (shard_map): per points-shard z-buffer + cross-shard
    lexicographic merge + owned-row descriptor gather — the only work
    that is *about* the points axis. Its output pyramid is replicated
    over 'points' by construction (the gather psums), so the out_spec
    drops that axis and hands the outer jit a P('data')-sharded array.

    Stage 2 (plain GSPMD): the pyramid batch is re-sharded over
    ``('data', 'points')`` flattened — every device owns ≈ B/n_devices
    rows — and the UNet + losses run as ordinary jit code. XLA inserts
    the parameter-grad all-reduce and reshards the stage-1 cotangent
    back to replicated-over-points, which is exactly the all-gather the
    shard_map transpose needs to scatter texture gradients to their
    owning shards. This removes the round-4 p× UNet replication: the
    points axis now buys raster/gather/table memory AND keeps the
    chips' matmul FLOPs (VERDICT r4 weak #4).
    """
    from jax import shard_map

    h, w = cfg.crop_size

    def _pyr_body(tex_local, xyz_local, batch, pc_local):
        n_local = xyz_local.shape[0]
        id_offset = (jax.lax.axis_index("points") * n_local).astype(
            jnp.int32)
        levels = sharded_rasterize_pyramid(
            xyz_local, id_offset, batch["total_m"], (h, w),
            cfg.num_scales, cfg.point_radius, method=cfg.raster_method)
        pyr = []
        for lvl, (ix, dep) in enumerate(levels):
            if cfg.use_mesh:
                # mesh-texture path (point-splat uv variant,
                # texture_pipeline._build_pyramid:386-397): only the
                # per-point uv2d attribute is sharded; the 2D texture
                # tables are fixed-size and replicated, so the sample
                # itself runs in stage 2 where the batch rows are
                # spread over the whole mesh. Emit (extras, uv, mask)
                # per level; zeros at empty/unowned pixels match
                # gather_attribute's ix<0 handling exactly.
                uv = sharded_gather(pc_local["uv2d"], id_offset, ix,
                                    "none")
                mask = (ix >= 0).astype(jnp.float32)
                x = (uv, mask)
            else:
                x = sharded_gather(tex_local, id_offset, ix,
                                   cfg.texture_activation)
            if cfg.extra_modes:
                ex = sharded_extra_maps(cfg, cfg.extra_modes[lvl], ix,
                                        dep, pc_local, id_offset,
                                        batch.get("label"),
                                        view_m=batch.get("view_matrix"))
                if cfg.use_mesh:
                    ex = jnp.concatenate(list(ex), axis=-1) if ex else \
                        jnp.zeros(ix.shape + (0,), jnp.float32)
                    x = (ex,) + x
                else:
                    x = jnp.concatenate(list(ex) + [x], axis=-1)
            elif cfg.use_mesh:
                x = (jnp.zeros(ix.shape + (0,), jnp.float32),) + x
            pyr.append(x)
        return tuple(pyr)

    if cfg.use_mesh:
        # the replicated texture tables never enter the shard_map:
        # stage 1 is raster + uv/extras gather only
        pyr_sm = shard_map(
            lambda xyz_local, batch, pc_local: _pyr_body(
                None, xyz_local, batch, pc_local),
            mesh=mesh,
            in_specs=(P("points", None), P("data"), P("points", None)),
            out_specs=P("data"),
            check_vma=False)
    else:
        pyr_sm = shard_map(
            _pyr_body, mesh=mesh,
            in_specs=(P("points", None), P("points", None), P("data"),
                      P("points", None)),
            out_specs=P("data"),
            check_vma=False)

    # With check_vma=False, the transpose of an out_spec that drops the
    # 'points' axis divides the incoming cotangent by the axis size
    # (the unreplicate boundary takes a mean rather than picking one
    # replica), so texture gradients inside the shard_map arrive /p.
    # Pre-scaling the cotangent at the boundary (identity forward)
    # restores the exact gradients; the reg-loss term differentiates
    # outside the shard_map and must NOT be scaled, which is why the
    # correction lives here and not on g_tex.
    n_points_shards = mesh.shape["points"]

    @jax.custom_vjp
    def _unreplicate_fix(x):
        return x

    _unreplicate_fix.defvjp(
        lambda x: (x, None),
        lambda _, g: (jax.tree.map(
            lambda t: t * n_points_shards, g),))

    batch_sh = NamedSharding(mesh, P(("data", "points")))

    def _loss_fn(params, texture, batch_stats, xyz_sharded, batch, pc):
        if cfg.use_mesh:
            stage1 = _unreplicate_fix(pyr_sm(xyz_sharded, batch, pc))
            stage1 = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sh),
                stage1)
            # stage 2: sample the replicated 2D tables at the assembled
            # uv maps (bilinear, MXU-friendly) — XLA all-reduces the
            # table gradients across the whole mesh like net params
            pyr = []
            for ex, uv, mask in stage1:
                x = T.sample_mesh_texture(list(texture), uv,
                                          cfg.texture_activation)
                x = x * mask[..., None]
                pyr.append(jnp.concatenate([ex, x], axis=-1)
                           if ex.shape[-1] else x)
            pyr = tuple(pyr)
        else:
            pyr = _unreplicate_fix(pyr_sm(texture, xyz_sharded, batch,
                                          pc))
            # spread batch rows over the WHOLE mesh for the UNet
            pyr = tuple(jax.lax.with_sharding_constraint(x, batch_sh)
                        for x in pyr)
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = net.apply(variables, *pyr, train=True,
                                 mutable=["batch_stats"])
        loss, metrics = TP._losses(cfg, vgg_params, out, batch)
        if cfg.reg_weight:
            loss = loss + (
                T.mesh_texture_reg_loss(list(texture), cfg.reg_weight)
                if cfg.use_mesh else
                T.point_texture_reg_loss(texture, cfg.reg_weight))
        return loss, (metrics, mutated["batch_stats"])

    @jax.jit
    def train_step(state: TP.TrainState, xyz_sharded: jax.Array,
                   batch: Dict, pc_sharded: Dict = None):
        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            _loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.texture, state.batch_stats,
                xyz_sharded, batch, pc_sharded or {})
        g_net, g_tex = jax.tree.map(
            functools.partial(TP._guard_grad, clip=cfg.grad_clip), grads)
        up_net, net_opt_state = net_opt.update(g_net, state.net_opt,
                                               state.params)
        up_tex, tex_opt_state = tex_opt.update(g_tex, state.tex_opt,
                                               state.texture)
        params = jax.tree.map(
            lambda p, u: p + cfg.lr * state.lr_scale * u,
            state.params, up_net)
        # texture is [N,C] (point table) or a tuple of 2D tables (mesh)
        texture = jax.tree.map(
            lambda t, u: t + cfg.texture_lr * state.lr_scale * u,
            state.texture, up_tex)
        metrics["loss"] = loss
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_bs,
            texture=texture, net_opt=net_opt_state,
            tex_opt=tex_opt_state)
        return new_state, metrics

    return train_step
