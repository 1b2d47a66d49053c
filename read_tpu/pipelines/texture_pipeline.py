"""TexturePipeline: joint net + per-scene neural-texture training.

Parity target: ``READ/pipelines/ogl.py:58-154`` + the train-loop math of
``src/train.py:156-280``:

- Adam(net, lr=1e-4) + RMSprop(textures, lr=1e-1) (``ogl.py:16,97-102``;
  torch RMSprop defaults alpha=0.99, eps=1e-8).
- The texture LR tracks the net scheduler's plateau decay
  (``ogl.py:129-144``) — here both optimizers consume one ``lr_scale``
  factor driven by a host-side ReduceLROnPlateau.
- Loss = VGG perceptual + huber * 1e4 (``src/train.py:219-221``)
  [+ seg CE * 3e2 when labels are present] [+ masked background term and
  mask renormalization, ``train.py:183-197``] + texture L2 reg
  (``texture.py:39-40``).
- One fused jitted step: rasterize -> gather -> UNet -> losses -> grads ->
  updates. The reference's host round-trip per iteration
  (``point_render.cu:196-197`` -> ``myrender.py:38-41`` -> ``to_device``)
  does not exist here.

The step treats the point cloud and camera matrices as inputs, the
descriptor table as a trained parameter alongside the net. Index maps are
integer outputs of the rasterizer, so no gradient flows into projection —
same as the reference (forward-only rasterizer).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from read_tpu.criterions import losses as L
from read_tpu.criterions import vgg as V
from read_tpu.models import texture as T
from read_tpu.models.unet import UNet
from read_tpu.ops import rasterize as R

__all__ = ["PipelineConfig", "TrainState", "create_state", "make_train_step",
           "make_eval_step", "ReduceLROnPlateau"]


@struct.dataclass
class PipelineConfig:
    """Static experiment hyperparameters (jit-static)."""
    crop_size: Tuple[int, int] = (256, 256)      # (h, w)
    descriptor_size: int = 8
    num_scales: int = 4           # net consumes 4 scales (unet.py:209-212)
    supersampling: int = 1
    lr: float = 1e-4
    texture_lr: float = 1e-1
    huber_ratio: float = 1e4      # src/train.py:549-550
    seg_ratio: float = 3e2        # src/train.py:548
    vgg_ratio: float = 1.0
    vgg_partialconv: bool = False  # masked VGG (vgg_loss.py:58-62,93-96)
    # perceptual-loss normalization backend (vgg_loss.py:26-48,87-88):
    # 'caffe' (reference default; BGR-mean quirk), 'pytorch'
    # (--criterion vgg_pytorch), or 'mix' (VGGLossMix, vgg_loss.py:114-122
    # — a 0.5/0.5 blend of both normalizations; --criterion vgg_mix).
    vgg_backend: str = "caffe"
    # K>0: average the VGG loss over K seeded-random weight sets
    # (--criterion vgg_ens; criterions/vgg.vgg_loss_ens — variance
    # reduction for the no-pretrained-weights environment)
    vgg_ensemble: int = 0
    reg_weight: float = 0.0
    texture_activation: str = "none"
    use_mask: bool = False
    masked_background: bool = False
    num_classes: Optional[int] = None
    point_radius: int = 0
    relative_point_size: bool = False  # 'ps' z-scaled splats
    min_point_size: float = 1.0        # programs.py:188-192 floor
    grad_clip: float = 1e3   # elementwise bound + NaN/inf guard
    use_mesh: bool = False   # MeshTexture sampled at uv2d (ogl.py:41-44)
    texture_size: int = 512  # mesh-texture resolution (per level /2^i)
    # average each item's input pyramid with the previous item's
    # (compose.py:167-171; batched shift-average, see _forward)
    temporal_average: bool = False
    drop_points: float = 0.0  # per-step point dropout (dynamic.py:235-236)
    perturb_points: float = 0.0  # screen-space jitter, pixels
    # extra (non-neural) input modalities interleaved with the descriptor
    # pyramid, one tuple of render-mode names per scale — the reference's
    # mixed-input grouping (``compose.py:136-176``: non-uv keys between
    # uv keys concat BEFORE the texture sample). Same modes required at
    # every scale (one UNet num_input_channels).
    extra_modes: Tuple[Tuple[str, ...], ...] = ()
    # replace rendered 'labels' maps with the ground-truth label image
    # masked by rendered-label occupancy (``dynamic.py:243-249``)
    label_in_input: bool = False
    dtype: Any = jnp.float32
    # UNet conv formulation: 'xla' (native conv lowering) or 'im2col'
    # (explicit patch-matmul — the bf16-compilable route; see
    # models/unet.py:_im2col_conv). Threaded through the CLI, the
    # checkpoint config, and NeuralRenderer.
    conv_impl: str = "xla"
    # z-buffer algorithm (ops/rasterize.py): 'sort' (3-key lexicographic
    # sort; exact reference tie semantics — min depth, smallest id) or
    # 'scatter1' (ONE packed scatter-min; ~25% faster at 1M points;
    # ties within one depth-quantization bin break by id — the bin is
    # 2^-(31 - ceil(log2 N)) of the [0,1] NDC depth range, e.g. 2^-11
    # at ~1M points, finer at smaller N; >2^23 points raises). Training
    # defaults to 'sort'; 'scatter1' is the inference production path
    # (bench.py) and is quality-validated in RESULTS_r03.md.
    raster_method: str = "sort"
    # remat UNet encoder/decoder blocks in the train step (HBM for
    # recompute; the 10M-at-native-res fit needs it)
    remat: bool = False

    @property
    def net_in_channels(self) -> int:
        """UNet input channels = descriptors + extra modality channels."""
        extra = 0
        if self.extra_modes:
            extra = sum(
                1 if m in ("depth", "labels", "uv_1d") else 3
                for m in self.extra_modes[0])
        return self.descriptor_size + extra


def parse_format_geometry(input_format: str):
    """Derive (point_radius, relative_point_size, extra_modes) from the
    input-format DSL string (``gl/dataset.py:39-82``). Shared by the
    train CLI and checkpoint-driven inference so both reconstruct the
    exact same raster geometry."""
    from read_tpu.scene.formats import parse_input_format
    specs = parse_input_format(input_format)
    relative_ps = any(sp.splat_mode for sp in specs)
    point_radius = 0
    for sp in specs:
        point_radius = max(point_radius,
                           sp.point_size if sp.splat_mode
                           else (sp.point_size - 1) // 2)
    # each uv_1d token anchors a scale; following non-uv tokens are the
    # extra modalities concatenated before the texture sample
    # (``compose.py:146-156`` grouping)
    groups = []
    for sp in specs:
        if sp.mode == "uv_1d":
            groups.append([])
        elif groups:
            groups[-1].append(sp.mode)
    extra_modes = ()
    if any(groups):
        if len(set(map(tuple, groups))) != 1:
            raise ValueError(
                "input_format: every scale must carry the SAME extra "
                f"modalities (one UNet input width); got {groups}")
        extra_modes = tuple(tuple(g) for g in groups)
    return point_radius, relative_ps, extra_modes


def config_from_dict(d: dict, crop_size=None,
                     train_dataset_args: Optional[dict] = None
                     ) -> PipelineConfig:
    """Build a :class:`PipelineConfig` from an args-style dict — either
    the train CLI's ``vars(args)`` or a checkpoint's embedded config
    (the reference's ``load_pipeline`` property, ``pipeline.py:34-56``:
    a checkpoint reconstructs the exact training pipeline)."""
    tda = train_dataset_args or {}
    criterion = d.get("criterion", "vgg")
    known_criteria = ("vgg", "vgg_pytorch", "vgg_mix", "vgg_partial",
                      "vgg_ens", "huber_only")
    if criterion not in known_criteria:
        raise ValueError(f"unknown criterion {criterion!r}; expected one "
                         f"of {known_criteria}")
    raster_method = d.get("raster_method", "sort") or "sort"
    R._check_method(raster_method)  # config files bypass argparse choices
    point_radius, relative_ps, extra_modes = parse_format_geometry(
        d.get("input_format",
              "uv_1d_p1, uv_1d_p1_ds1, uv_1d_p1_ds2, uv_1d_p1_ds3, "
              "uv_1d_p1_ds4"))
    if crop_size is None:
        crop_size = d.get("crop_size", (256, 256))
        if isinstance(crop_size, str):
            w, h = crop_size.lower().split("x")
            crop_size = (int(h), int(w))
        else:
            crop_size = tuple(int(x) for x in crop_size)
    return PipelineConfig(
        crop_size=tuple(crop_size),
        point_radius=point_radius,
        relative_point_size=relative_ps,
        extra_modes=extra_modes,
        label_in_input=bool(tda.get("label_in_input", False)),
        drop_points=float(tda.get("drop_points", 0.0)),
        perturb_points=float(tda.get("perturb_points", 0.0)),
        descriptor_size=int(d.get("descriptor_size", 8)),
        supersampling=int(d.get("supersampling", 1) or 1),
        lr=float(d.get("lr", 1e-4)),
        texture_lr=float(d.get("texture_lr", 1e-1)),
        vgg_ratio=0.0 if criterion == "huber_only" else 1.0,
        vgg_partialconv=criterion == "vgg_partial",
        vgg_backend={"vgg_pytorch": "pytorch",
                     "vgg_mix": "mix"}.get(criterion, "caffe"),
        vgg_ensemble=int(d.get("vgg_ens_k", 3)) if criterion == "vgg_ens"
        else 0,
        huber_ratio=1e4 if criterion != "huber_only" else 1.0,
        reg_weight=float(d.get("reg_weight", 0.0) or 0.0),
        texture_activation=d.get("texture_activation", "none"),
        use_mask=bool(d.get("use_mask", False)
                      or d.get("masked_background", False)),
        masked_background=bool(d.get("masked_background", False)),
        use_mesh=bool(d.get("use_mesh", False)),
        texture_size=int(d.get("texture_size", 512) or 512),
        temporal_average=bool(d.get("temporal_average", False)),
        num_classes=d.get("num_classes"),
        dtype=jnp.bfloat16 if d.get("dtype") == "bfloat16"
        else jnp.float32,
        conv_impl=d.get("conv_impl", "xla") or "xla",
        raster_method=raster_method,
        remat=bool(d.get("remat", False)),
    )


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any                   # net params
    batch_stats: Any              # BatchNorm running stats
    texture: jax.Array            # [N, C] descriptor table (active scene)
    net_opt: Any
    tex_opt: Any
    lr_scale: jax.Array           # plateau-decay factor, applied to both


def _guard_grad(g: jax.Array, clip: float) -> jax.Array:
    """Elementwise NaN->0 / inf->±clip / bound guard. Keeps training alive
    through pathological batches (e.g. a crop with zero visible points
    makes inputs constant and BN backward overflows; the reference skips
    empty-mask batches instead, ``train.py:152-154``)."""
    g = jnp.nan_to_num(g, nan=0.0, posinf=clip, neginf=-clip)
    return jnp.clip(g, -clip, clip)


def _make_optimizers(cfg: PipelineConfig):
    # inject lr_scale by scaling gradients' learning rate each step via
    # optax.scale_by_schedule is awkward; instead both transforms output
    # unit-lr updates and the step multiplies by (base_lr * lr_scale).
    net_opt = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-1.0),
    )
    # torch RMSprop parity: alpha (decay) 0.99, eps 1e-8 outside sqrt-free
    tex_opt = optax.chain(
        optax.scale_by_rms(decay=0.99, eps=1e-8),
        optax.scale(-1.0),
    )
    return net_opt, tex_opt


def create_state(key: jax.Array, cfg: PipelineConfig, n_points: int,
                 texture_init: str = "rand",
                 net: Optional[UNet] = None) -> Tuple[TrainState, UNet]:
    """Initialize net params, descriptor table, and optimizer states.

    ``texture_init`` default is 'rand' (a reference-supported init,
    ``texture.py:26-28``) rather than the reference's 'zeros': a constant
    (zero) descriptor table makes every feature map spatially constant, so
    train-mode BatchNorm's backward multiplies cotangents by
    ``rsqrt(eps) ~= 316`` per layer — ~40 gated-conv layers deep this
    overflows f32 to inf and the gradient NaNs. torch's reference build
    sits just under the overflow by luck of weight scale; 'rand' breaks
    the constancy and is numerically sound. 'zeros' remains available and
    is additionally protected by the gradient guard in the train step.
    """
    if net is None:
        # 'pallas' is an inference-only dispatch (models/unet_pallas.py)
        # over the SAME parameter tree; the flax net trains via 'xla'.
        impl = "xla" if cfg.conv_impl == "pallas" else cfg.conv_impl
        net = UNet(num_input_channels=cfg.net_in_channels,
                   num_classes=cfg.num_classes, dtype=cfg.dtype,
                   conv_impl=impl, remat=cfg.remat)
    h, w = cfg.crop_size
    k_tex, k_net = jax.random.split(key)
    dummy_pyr = [jnp.zeros((1, h // s, w // s, cfg.net_in_channels),
                           jnp.float32) for s in (1, 2, 4, 8)]
    variables = net.init(k_net, *dummy_pyr, train=False)
    if cfg.use_mesh:
        # mesh path: multi-level MeshTexture instead of the point table
        # (TexturePipeline --use_mesh, reference ogl.py:41-44)
        texture = tuple(T.init_mesh_texture(
            k_tex, cfg.texture_size, cfg.descriptor_size,
            init_method="rand" if texture_init == "rand" else "zeros"))
    else:
        texture = T.init_point_texture(k_tex, n_points,
                                       cfg.descriptor_size, texture_init)
    net_opt, tex_opt = _make_optimizers(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        texture=texture,
        net_opt=net_opt.init(variables["params"]),
        tex_opt=tex_opt.init(texture),
        lr_scale=jnp.ones((), jnp.float32),
    )
    return state, net


def _extra_maps(cfg: PipelineConfig, modes, ix, dep, pointcloud,
                gt_label=None, view_m=None):
    """Non-neural modality maps interleaved with the descriptor pyramid
    (``compose.py:146-156``: extra inputs concat BEFORE the texture
    sample). With ``label_in_input``, rendered 'labels' maps are replaced
    by the ground-truth label image masked by rendered-label occupancy
    (``dynamic.py:243-249``).

    View-dependent modes (``normals_l/r/d``, reference shader inputs
    ``READ/gl/programs.py:136-158`` fed through the input-string DSL,
    ``datasets/dynamic.py:66-99``) need ``view_m [B,4,4]`` camera-to-world
    per batch item; the per-point colors are vmapped over the batch."""
    from read_tpu.ops import render_modes as _RM
    maps = []
    for mode in modes:
        if mode in ("normals_l", "normals_r", "normals_d"):
            if view_m is None:
                raise ValueError(
                    f"view-dependent extra mode {mode!r} needs per-item "
                    "view matrices: pass batch['view_matrix'] [B,4,4]")
            pc = pointcloud or {}
            normals = pc.get("normals")
            if normals is None:
                maps.append(jnp.zeros(ix.shape + (3,), jnp.float32))
                continue
            cols = jax.vmap(
                lambda vm: _RM.view_dependent_colors(
                    mode, jnp.asarray(pc["xyz"], jnp.float32),
                    jnp.asarray(normals, jnp.float32), vm))(view_m)
            # batched gather: per-item color table [B,N,3] + index [B,H,W]
            rendered = jax.vmap(_RM.gather_attribute)(cols, ix)
            maps.append(rendered)
            continue
        rendered = _RM.render_mode(mode, ix, dep, pointcloud or {})
        if mode == "labels" and cfg.label_in_input and gt_label is not None:
            occ = (rendered[..., 0] > 1e-9).astype(jnp.float32)
            f = gt_label.shape[1] // ix.shape[1]
            lab = gt_label[:, ::f, ::f].astype(jnp.float32)
            rendered = (lab * occ)[..., None]
        maps.append(rendered)
    return maps


def _build_pyramid(cfg: PipelineConfig, texture, xyz, total_m,
                   shape=None, uv2d=None, ndc_jitter=None,
                   point_sizes=None, faces=None, pointcloud=None,
                   gt_label=None, view_m=None):
    """Rasterize the multi-scale pyramid and gather descriptors.

    ``shape`` overrides the render size (eval renders full frames at the
    /16-aligned viewport, ``src:139-143``, while training renders
    crops). ``point_sizes`` is the scene manifest's optional per-point
    size buffer (``gl/utils.py:330-336``). ``faces`` (with ``use_mesh``)
    renders uv maps with the triangle rasterizer — full interiors, GL
    parity (``gl/render.py:69-73``) — instead of vertex splats.
    """
    h, w = shape or cfg.crop_size
    ss = cfg.supersampling
    if cfg.use_mesh and faces is not None:
        # per-scale triangle rasterization: interpolated uv needs the
        # render resolution at raster time, so coarse levels rasterize
        # directly rather than pooling the full-res winners
        from read_tpu.ops import rasterize_mesh as _RMesh
        pyr = []
        for i in range(cfg.num_scales):
            hi, wi = (h * ss) // (2 ** i), (w * ss) // (2 ** i)
            fi, _dep = _RMesh.rasterize_mesh_batch(xyz, faces, total_m,
                                                   hi, wi)
            uv_map = jax.vmap(
                lambda f, m: _RMesh.interpolate_uv(xyz, faces, uv2d,
                                                   m, f))(fi, total_m)
            x = T.sample_mesh_texture(list(texture), uv_map,
                                      cfg.texture_activation)
            x = x * (fi >= 0)[..., None].astype(x.dtype)
            if ss > 1:
                b, hh, ww, c = x.shape
                x = jax.image.resize(x, (b, hh // ss, ww // ss, c),
                                     "bilinear")
            pyr.append(x)
        return pyr
    levels = R.rasterize_pyramid_pooled(
        xyz, total_m, (h * ss, w * ss), num_scales=cfg.num_scales,
        point_radius=cfg.point_radius, method=cfg.raster_method,
        ndc_jitter=ndc_jitter,
        point_sizes=point_sizes,
        relative_size=cfg.relative_point_size,
        min_point_size=cfg.min_point_size)
    pyr = []
    for lvl, (ix, _depth) in enumerate(levels):
        if cfg.use_mesh:
            # uv2d attribute map -> MeshTexture sample (grid_sample
            # equivalent), zeros at empty pixels
            from read_tpu.ops import render_modes as _RM
            assert uv2d is not None, "mesh path needs per-vertex uv2d"
            uv_map = _RM.gather_attribute(uv2d, ix)
            x = T.sample_mesh_texture(list(texture), uv_map,
                                      cfg.texture_activation)
            x = x * (ix >= 0)[..., None].astype(x.dtype)
        elif cfg.point_radius == 0:
            # fast backward: unique per-image scatter-add
            x = T.sample_point_texture_unique(texture, ix,
                                              cfg.texture_activation)
        else:
            x = T.sample_point_texture(texture, ix,
                                       cfg.texture_activation)
        if cfg.extra_modes:
            ex = _extra_maps(cfg, cfg.extra_modes[lvl], ix, _depth,
                             pointcloud, gt_label, view_m=view_m)
            x = jnp.concatenate(list(ex) + [x], axis=-1)
        if ss > 1:
            b, hh, ww, c = x.shape
            x = jax.image.resize(x, (b, hh // ss, ww // ss, c), "bilinear")
        pyr.append(x)
    return pyr


def _forward(net: UNet, cfg: PipelineConfig, params, batch_stats, texture,
             xyz, total_m, train: bool, shape=None, uv2d=None,
             ndc_jitter=None, point_sizes=None, faces=None,
             pointcloud=None, gt_label=None, view_m=None):
    """Build the pyramid (:func:`_build_pyramid`) and run the net.

    Mirrors ``NetAndTexture.forward`` (``src/READ/models/compose.py:
    134-192``) without its per-item python loop: the whole batch renders
    and runs in one program.
    """
    pyr = _build_pyramid(cfg, texture, xyz, total_m, shape=shape,
                         uv2d=uv2d, ndc_jitter=ndc_jitter,
                         point_sizes=point_sizes, faces=faces,
                         pointcloud=pointcloud, gt_label=gt_label,
                         view_m=view_m)
    if cfg.temporal_average:
        # reference semantics (``compose.py:167-171``): each item's
        # input pyramid averages with the PREVIOUS item's (the torch
        # build loops items sequentially, carrying ``last_input``).
        # Batched equivalent: shift-average along the batch axis; the
        # first row keeps itself (batch-boundary approximation of the
        # carried state). Inference-side exact carry lives in
        # ``render.NeuralRenderer.temporal_average``.
        pyr = [(x + jnp.concatenate([x[:1], x[:-1]], 0)) * 0.5
               for x in pyr]
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = net.apply(variables, *pyr, train=True,
                                 mutable=["batch_stats"])
        return out, mutated["batch_stats"], pyr
    out = net.apply(variables, *pyr, train=False)
    return out, batch_stats, pyr


def _losses(cfg: PipelineConfig, vgg_params, out: Dict, batch: Dict,
            per_item: bool = False):
    """Assemble the src-tree loss dict (``src/train.py:219-238``).

    ``per_item=True`` returns ``[B]`` vectors instead of batch means so
    batched validation can drop tail-padding rows before averaging
    (the val loop pads the last batch to a fixed compiled shape)."""
    im = out["im_out"]
    target = batch["target"]
    mask = batch.get("mask")
    metrics = {}
    if cfg.use_mask and mask is not None:
        im_l = im * mask
    else:
        im_l = im
    hub = L.huber_loss(im_l, target, per_item=per_item)
    loss = cfg.huber_ratio * hub
    metrics["huber_loss"] = hub
    if vgg_params is not None and cfg.vgg_ratio:
        # remat: VGG activations (13 taps x pred+target) dominate HBM in
        # the backward; recomputing them costs ~one extra VGG forward and
        # saves ~4GB at B=8 crops of 256^2.
        if cfg.vgg_backend == "mix":
            # VGGLossMix (vgg_loss.py:114-122): 0.5/0.5 blend of the two
            # normalizations. With one weight set available the same
            # params serve both branches (the reference loads separate
            # pytorch/caffe weight files; pass a (pytorch, caffe) tuple
            # of param lists as vgg_params to reproduce that exactly).
            pp, pc = (vgg_params if isinstance(vgg_params, tuple)
                      else (vgg_params, vgg_params))
            vgg = jax.checkpoint(
                lambda p, t: V.vgg_loss_mix(
                    pp, pc, p, t, per_item=per_item))(im_l, target)
        elif cfg.vgg_ensemble:
            vgg = jax.checkpoint(
                lambda p, t: V.vgg_loss_ens(
                    vgg_params, p, t, backend=cfg.vgg_backend,
                    partialconv=cfg.vgg_partialconv,
                    per_item=per_item))(im_l, target)
        else:
            vgg = jax.checkpoint(
                lambda p, t: V.vgg_loss(
                    vgg_params, p, t, backend=cfg.vgg_backend,
                    partialconv=cfg.vgg_partialconv,
                    per_item=per_item))(im_l, target)
        loss = loss + cfg.vgg_ratio * vgg
        metrics["vgg_loss"] = vgg
    if cfg.num_classes is not None and "seg_out" in out \
            and batch.get("label") is not None:
        seg = L.cross_entropy_ignore0(out["seg_out"], batch["label"])
        if per_item:
            seg = jnp.broadcast_to(seg, loss.shape)
        loss = loss + cfg.seg_ratio * seg
        metrics["seg_loss"] = seg
    if cfg.masked_background and mask is not None:
        # main loss renormalized by mask mean + background pull
        # (train.py:183-197)
        if per_item:
            mmean = jnp.mean(mask.reshape(mask.shape[0], -1), axis=1)
            off = jnp.abs(im * (1.0 - mask))
            bkg = 500.0 * jnp.mean(off.reshape(off.shape[0], -1), axis=1)
            loss = loss / jnp.maximum(mmean, 1e-6) + bkg
        else:
            loss = loss / jnp.maximum(jnp.mean(mask), 1e-6)
            loss = loss + L.masked_background_loss(im, mask)
    metrics["psnr"] = L.psnr(im, target, per_item=per_item)
    return loss, metrics


def make_train_step(net: UNet, cfg: PipelineConfig, vgg_params,
                    donate: bool = False, freeze_net: bool = False,
                    return_images: bool = False):
    """Build the fused jitted train step.

    batch: ``{'total_m': [B,4,4], 'target': [B,h,w,3]`` (+ optional
    ``'mask': [B,h,w,1]``, ``'label': [B,h,w]`` int32)``}``;
    ``xyz [N,3]`` rides as an argument so one compiled step serves any
    same-sized scene.

    ``donate=True`` donates the input ``state`` buffers to the output
    state (halves peak HBM for the big texture/optimizer tables — the
    train CLI uses it). The caller must then never touch the passed-in
    state again; the default is safe-but-copying.

    ``return_images=True`` appends the predicted image to the step's
    returns — ``(state, metrics, im_out [B,h,w,3])`` — feeding the
    per-iteration train composite dumps (``src/train.py:206-217``).

    ``freeze_net=True`` is the texture-only fitting mode (reference
    ``train.py:515-527``: freeze the net after a checkpoint load and fit
    a NEW scene's descriptors against it — the precondition for
    stitching independently fitted scenes). Gradients are computed for
    the texture only (the net backward is never built), and the net is
    frozen INCLUDING BatchNorm running stats: the forward runs in eval
    mode so the texture optimizes exactly what inference renders. (The
    reference keeps train-mode BN while frozen, which lets a new scene's
    statistics drift a net other scenes share — deviation by design.)
    """
    net_opt, tex_opt = _make_optimizers(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, xyz: jax.Array, batch: Dict):
        ndc_jitter = None
        if cfg.drop_points > 0 or cfg.perturb_points > 0:
            from read_tpu.ops import augment as _A
            key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            kd, kp = jax.random.split(key)
            if cfg.drop_points > 0:
                xyz = _A.drop_points(kd, xyz, cfg.drop_points)
            if cfg.perturb_points > 0:
                h, w = cfg.crop_size
                ndc_jitter = _A.pixel_jitter_offsets(
                    kp, xyz.shape[0], cfg.perturb_points, h, w)

        def loss_fn(params, texture):
            out, new_bs, _ = _forward(net, cfg, params, state.batch_stats,
                                      texture, xyz, batch["total_m"],
                                      train=not freeze_net,
                                      uv2d=batch.get("uv2d"),
                                      ndc_jitter=ndc_jitter,
                                      point_sizes=batch.get("point_sizes"),
                                      faces=batch.get("faces"),
                                      pointcloud=batch.get("pointcloud"),
                                      gt_label=batch.get("label"),
                                      view_m=batch.get("view_matrix"))
            loss, metrics = _losses(cfg, vgg_params, out, batch)
            if cfg.reg_weight:
                # mesh textures use the per-level weighted L2
                # (texture.py:105); point tables the flat L2
                loss = loss + (
                    T.mesh_texture_reg_loss(list(texture), cfg.reg_weight)
                    if cfg.use_mesh else
                    T.point_texture_reg_loss(texture, cfg.reg_weight))
            # im_out rides the aux; XLA dead-code-eliminates it when the
            # caller drops it (return_images=False)
            return loss, (metrics, new_bs, out["im_out"])

        if freeze_net:
            (loss, (metrics, _bs, im)), g_tex = jax.value_and_grad(
                lambda t: loss_fn(state.params, t), has_aux=True)(
                    state.texture)
            g_tex = jax.tree.map(
                functools.partial(_guard_grad, clip=cfg.grad_clip), g_tex)
            up_tex, tex_opt_state = tex_opt.update(g_tex, state.tex_opt,
                                                   state.texture)
            lr_tex = cfg.texture_lr * state.lr_scale
            texture = jax.tree.map(lambda t, u: t + lr_tex * u,
                                   state.texture, up_tex)
            metrics["loss"] = loss
            new_state = state.replace(step=state.step + 1, texture=texture,
                                      tex_opt=tex_opt_state)
            if return_images:
                return new_state, metrics, im
            return new_state, metrics

        (loss, (metrics, new_bs, im)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.texture)
        g_net, g_tex = jax.tree.map(
            functools.partial(_guard_grad, clip=cfg.grad_clip), grads)
        up_net, net_opt_state = net_opt.update(g_net, state.net_opt,
                                               state.params)
        up_tex, tex_opt_state = tex_opt.update(g_tex, state.tex_opt,
                                               state.texture)
        # lr_scale implements ReduceLROnPlateau for net AND the
        # texture-LR-tracks-scheduler behavior (ogl.py:129-144).
        lr_net = cfg.lr * state.lr_scale
        lr_tex = cfg.texture_lr * state.lr_scale
        params = jax.tree.map(lambda p, u: p + lr_net * u,
                              state.params, up_net)
        texture = jax.tree.map(lambda t, u: t + lr_tex * u,
                               state.texture, up_tex)
        metrics["loss"] = loss
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_bs,
            texture=texture, net_opt=net_opt_state, tex_opt=tex_opt_state)
        if return_images:
            return new_state, metrics, im
        return new_state, metrics

    return train_step


def make_eval_step(net: UNet, cfg: PipelineConfig, vgg_params):
    """Jitted eval step: forward + PER-ITEM metrics ``[B]`` (loss, PSNR,
    SSIM) so batched validation can drop tail-padding rows before
    averaging (val loss invariant to ``--batch-size-val``)."""

    @jax.jit
    def eval_step(state: TrainState, xyz: jax.Array, batch: Dict):
        shape = tuple(batch["target"].shape[1:3])
        out, _, _ = _forward(net, cfg, state.params, state.batch_stats,
                             state.texture, xyz, batch["total_m"],
                             train=False, shape=shape,
                             uv2d=batch.get("uv2d"),
                             point_sizes=batch.get("point_sizes"),
                             faces=batch.get("faces"),
                             pointcloud=batch.get("pointcloud"),
                             gt_label=batch.get("label"),
                             view_m=batch.get("view_matrix"))
        loss, metrics = _losses(cfg, vgg_params, out, batch,
                                per_item=True)
        metrics["loss"] = loss
        metrics["ssim"] = L.ssim(jnp.clip(out["im_out"], 0, 1),
                                 batch["target"], per_item=True)
        return out["im_out"], metrics

    return eval_step


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics: factor 0.5, patience
    as configured; ``train.py:513``, src patience 5)."""

    def __init__(self, factor: float = 0.5, patience: int = 3,
                 min_scale: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale
