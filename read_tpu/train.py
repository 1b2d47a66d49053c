"""Training orchestrator CLI.

Usage:
  python -m read_tpu.train --config configs/train_example.yaml \
      [--pipeline texture] [--crop-size 256x256] [--epochs 100] ...

Parity targets (reference: ``train.py`` / ``src/train.py``):
- Two-tier config: YAML experiment config provides defaults, CLI
  overrides (``train.py:383-396``); splitter/criterion chosen by
  registry name instead of eval'd module paths (``arguments.py:108-153``).
- Experiment dir with args dump, Tee'd log.txt, train/val split lists
  saved (``train.py:428-437,490-498,533-537``).
- Epoch loop: train -> val, ReduceLROnPlateau(0.5) on val loss
  (``train.py:513,554-555``); texture LR tracks the decay
  (``ogl.py:129-144`` — via the shared lr_scale).
- Per-scene texture tables; batches grouped per scene (static shapes
  under jit; the reference's myrender also groups by scene id,
  ``myrender.py:36-40``).
- Checkpoints: rotating latest-3 + best on val improvement
  (``src/train.py:619-653``), config embedded (``pipeline.py:34-56``),
  optimizer state + step carried (upgrade over the reference).
- tensorboardX scalars + image dumps per log_freq
  (``train.py:296-345``); console AccumDict lines.
- ``--eval``: run validation only, dumping predictions
  (``train.py:283-293``).

The fused jitted step does rasterize->gather->UNet->losses->grads->
updates on device; the host only loads/warps images (SURVEY.md §7
stage 3/4 design).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from typing import Dict, List, Optional

import numpy as np
import yaml


def parse_size(s) -> tuple:
    if isinstance(s, (list, tuple)):
        return tuple(int(x) for x in s)
    if isinstance(s, (int, float)):
        return (int(s), int(s))
    w, h = s.lower().split("x")
    return (int(h), int(w))  # (h, w); CLI order WxH like the reference


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", type=str, default=None,
                   help="experiment YAML; CLI flags override it")
    p.add_argument("--pipeline", type=str, default="texture",
                   choices=["texture", "pix2pix", "rgb_texture"])
    p.add_argument("--paths-file", dest="paths_file", type=str)
    p.add_argument("--dataset-names", dest="dataset_names", nargs="*",
                   default=None)
    p.add_argument("--exclude-datasets", dest="exclude_datasets",
                   nargs="*", default=None)
    p.add_argument("--crop-size", dest="crop_size", type=str,
                   default="256x256")
    p.add_argument("--batch-size", dest="batch_size", type=int, default=2)
    p.add_argument("--batch-size-val", dest="batch_size_val", type=int,
                   default=1)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--texture-lr", dest="texture_lr", type=float,
                   default=1e-1)
    p.add_argument("--descriptor-size", dest="descriptor_size", type=int,
                   default=8)
    p.add_argument("--supersampling", type=int, default=1)
    p.add_argument("--input-format", dest="input_format", type=str,
                   default="uv_1d_p1, uv_1d_p1_ds1, uv_1d_p1_ds2, "
                           "uv_1d_p1_ds3, uv_1d_p1_ds4")
    p.add_argument("--splitter", type=str, default="split_by_step")
    p.add_argument("--criterion", type=str, default="vgg",
                   choices=["vgg", "vgg_pytorch", "vgg_mix",
                            "vgg_partial", "vgg_ens", "huber_only"],
                   help="vgg = caffe-normalized VGG loss (reference "
                        "default); vgg_pytorch switches the input "
                        "normalization to torchvision semantics "
                        "(vgg_loss.py:26-30,87-88); vgg_mix = VGGLossMix "
                        "0.5/0.5 blend (vgg_loss.py:114-122); "
                        "vgg_partial = VGGLoss(partialconv=True): the "
                        "masked perceptual loss (vgg_loss.py:58-62); "
                        "vgg_ens = mean over 3 seeded-random VGG weight "
                        "sets (variance reduction when no pretrained "
                        "weights are available; no reference "
                        "counterpart)")
    p.add_argument("--vgg-weights", dest="vgg_weights", type=str,
                   default=None)
    p.add_argument("--use-mask", dest="use_mask", action="store_true")
    p.add_argument("--num-classes", dest="num_classes", type=int,
                   default=None)
    p.add_argument("--texture-activation", dest="texture_activation",
                   type=str, default="none")
    p.add_argument("--texture-init", dest="texture_init", type=str,
                   default="rand", choices=["rand", "zeros"])
    p.add_argument("--reg-weight", dest="reg_weight", type=float,
                   default=0.0)
    p.add_argument("--save-dir", dest="save_dir", type=str,
                   default="data/logs")
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--save-freq", dest="save_freq", type=int, default=1)
    p.add_argument("--log-freq", dest="log_freq", type=int, default=50)
    p.add_argument("--log-num-images", dest="log_num_images", type=int,
                   default=4)
    p.add_argument("--net-ckpt", dest="net_ckpt", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume from (full state)")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval-all", dest="eval_all", action="store_true")
    p.add_argument("--eval-dir", dest="eval_dir", type=str, default=None)
    p.add_argument("--freeze-net", dest="freeze_net", action="store_true",
                   help="texture-only fitting: freeze the (loaded) net "
                        "and train only the scene descriptors — the "
                        "workflow for fitting NEW scenes against a "
                        "shared pretrained net before stitching "
                        "(reference train.py:515-527). Checkpoints "
                        "still embed the frozen net so render.py stays "
                        "self-configuring (the reference skips the net "
                        "file instead, src pipeline.py:63-64).")
    p.add_argument("--plateau-patience", dest="plateau_patience",
                   type=int, default=5)
    p.add_argument("--plateau-factor", dest="plateau_factor", type=float,
                   default=0.5)
    p.add_argument("--plateau-metric", dest="plateau_metric", type=str,
                   default="loss", choices=["loss", "psnr"],
                   help="metric driving ReduceLROnPlateau: 'loss' "
                        "(reference behavior, train.py:554-555) or "
                        "'psnr' (robust when the perceptual term is "
                        "noisy, e.g. the no-pretrained-VGG fallback)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize UNet blocks in the backward "
                   "pass (fits the 10M-point native-res train step)")
    p.add_argument("--conv-impl", dest="conv_impl", type=str,
                   default="xla", choices=["xla", "im2col"],
                   help="UNet conv formulation: 'xla' native lowering or "
                        "'im2col' patch-matmul (the bf16-compilable "
                        "route; models/unet.py). Recorded in checkpoints "
                        "and restored at inference.")
    p.add_argument("--raster-method", dest="raster_method", type=str,
                   default="sort",
                   choices=["sort", "scatter1", "scatter", "sort1q",
                            "pallas"],
                   help="z-buffer algorithm (ops/rasterize.py): 'sort' "
                        "exact reference tie semantics; 'scatter1' one "
                        "packed scatter-min; 'pallas' the same "
                        "semantics via the sequential-grid Pallas "
                        "kernel (8.6 vs 16.0 ms at 1M pts on TPU, the "
                        "bench.py inference path; falls back to "
                        "scatter1 off-TPU). Recorded in checkpoints "
                        "and restored at inference.")
    p.add_argument("--max-steps-per-epoch", dest="max_steps_per_epoch",
                   type=int, default=None)
    p.add_argument("--max-scenes-hbm", dest="max_scenes_hbm", type=int,
                   default=None,
                   help="cap on HBM-resident scene texture tables: the "
                        "active working set trains in contiguous chunks "
                        "of this many scenes while the rest live in host "
                        "RAM (the reference's max_ds texture swap, "
                        "compose.py:96-116 + train.py:229-261). Default: "
                        "all scenes resident.")
    p.add_argument("--headless-platform", dest="headless_platform",
                   type=str, default=None,
                   help="force a jax platform (e.g. cpu for smoke runs)")
    p.add_argument("--mesh", type=str, default=None,
                   help="multi-chip mesh 'DATAxPOINTS' (e.g. 2x4): "
                        "batch shards over the data axis, point cloud + "
                        "descriptor table over the points axis "
                        "(SURVEY.md 2.9). batch_size*inner_batch must "
                        "divide by DATA.")
    p.add_argument("--masked-background", dest="masked_background",
                   action="store_true",
                   help="renormalize loss by mask mean + pull background "
                        "to black (reference train.py:183-197)")
    p.add_argument("--use-mesh", dest="use_mesh", action="store_true",
                   help="MeshTexture sampled at uv2d instead of the "
                        "point table (reference ogl.py:41-44)")
    p.add_argument("--texture-size", dest="texture_size", type=int,
                   default=512)
    p.add_argument("--temporal-average", dest="temporal_average",
                   action="store_true",
                   help="average each item's input pyramid with the "
                        "previous item's (compose.py:167-171)")
    return p


def load_args(argv=None):
    """Two-stage parse: YAML config sets defaults, CLI overrides
    (reference ``train.py:383-396`` shape)."""
    parser = build_argparser()
    args, _ = parser.parse_known_args(argv)
    if args.config:
        with open(args.config) as f:
            config = yaml.safe_load(f) or {}
        known = {a.dest for a in parser._actions}
        defaults = {k: v for k, v in config.items() if k in known}
        unknown = {k: v for k, v in config.items() if k not in known}
        parser.set_defaults(**defaults)
        args = parser.parse_args(argv)
        args.extra_config = unknown
    else:
        args = parser.parse_args(argv)
        args.extra_config = {}
    # dataset args blocks straight from yaml (not CLI-exposed)
    args.train_dataset_args = args.extra_config.pop(
        "train_dataset_args", {})
    args.val_dataset_args = args.extra_config.pop("val_dataset_args", {})
    args.splitter_args = args.extra_config.pop("splitter_args",
                                               {"val_step": 10})
    return args


def setup_experiment(args) -> str:
    name = args.name or (os.path.splitext(os.path.basename(
        args.config))[0] if args.config else "experiment")
    exp_dir = os.path.join(args.save_dir,
                           f"{name}_{time.strftime('%m%d_%H%M%S')}")
    os.makedirs(os.path.join(exp_dir, "checkpoints"), exist_ok=True)
    with open(os.path.join(exp_dir, "args.yaml"), "w") as f:
        yaml.safe_dump({k: v for k, v in vars(args).items()
                        if not k.startswith("_")}, f, default_flow_style=False)
    from read_tpu.utils.perform import Tee
    sys.stdout = Tee(os.path.join(exp_dir, "log.txt"), sys.__stdout__)
    sys.stderr = Tee(os.path.join(exp_dir, "log.txt"), sys.__stderr__)
    return exp_dir


def config_dict(args) -> dict:
    return {k: v for k, v in vars(args).items()
            if isinstance(v, (str, int, float, bool, list, tuple,
                              type(None)))}


class SceneStateStore:
    """Per-scene TrainState dict with texture host-offload.

    The reference trains tens/hundreds of scenes on one GPU by keeping
    every texture on CPU and swapping the active ``max_ds`` chunk to the
    device (``READ/models/compose.py:96-116``, ``train.py:229-261``).
    TPU-style equivalent: at most ``budget`` scenes' texture + RMSprop
    tables are HBM-resident; the rest live in host RAM as numpy and are
    ``device_put`` on :meth:`activate` with LRU eviction. The shared net
    portion (params/batch_stats/net_opt) always stays on device — only
    the per-scene big tables swap. ``budget=None`` disables offload
    (every scene resident, the single/few-scene fast path).
    """

    def __init__(self, budget: Optional[int] = None):
        self._states: Dict[int, object] = {}
        self.budget = budget
        self._lru: List[int] = []  # most-recent last, device-resident ids

    def __getitem__(self, sid):
        return self._states[sid]

    def __setitem__(self, sid, state):
        self._states[sid] = state
        # track only device-resident textures in the LRU (net-portion
        # rebinds on offloaded states must not count against the budget)
        if self.budget is not None and sid not in self._lru \
                and not isinstance(state.texture, np.ndarray):
            self._lru.append(sid)
            self._evict()

    def __contains__(self, sid):
        return sid in self._states

    def __iter__(self):
        return iter(self._states)

    def keys(self):
        return self._states.keys()

    def is_offloaded(self, sid) -> bool:
        return isinstance(self._states[sid].texture, np.ndarray)

    @property
    def resident_ids(self):
        return tuple(self._lru)

    def _offload(self, sid):
        import jax
        st = self._states[sid]
        if isinstance(st.texture, np.ndarray):
            return
        self._states[sid] = st.replace(
            texture=jax.device_get(st.texture),
            tex_opt=jax.tree.map(jax.device_get, st.tex_opt))

    def _evict(self):
        while self.budget is not None and len(self._lru) > self.budget:
            victim = self._lru.pop(0)
            self._offload(victim)

    def activate(self, sid):
        """Return the state with its texture tables device-resident,
        evicting the least-recently-used scene beyond the budget."""
        import jax
        st = self._states[sid]
        if self.budget is None:
            return st
        if sid in self._lru:
            self._lru.remove(sid)
        self._lru.append(sid)
        if isinstance(st.texture, np.ndarray):
            import jax.numpy as jnp
            st = st.replace(
                texture=jnp.asarray(st.texture),
                tex_opt=jax.tree.map(
                    lambda x: jnp.asarray(x) if isinstance(x, np.ndarray)
                    else x, st.tex_opt))
            self._states[sid] = st
        self._evict()
        return st


def run_alt_pipeline(args, cfg, ds_train, ds_val, writer, exp_dir,
                     vgg_params):
    """Training loops for the non-texture pipelines.

    - ``pix2pix``: the refinement net alone on raw rendered colors
      (``READ/pipelines/ogl.py:157-196`` + ``MultiscaleNet``).
    - ``rgb_texture``: classic RGB MeshTexture fit, RMSprop, no net
      (``ogl.py:199-227`` + ``RGBTexture``).
    """
    import jax
    import jax.numpy as jnp

    from read_tpu.data.dataset import BatchIterator, PrefetchIterator
    from read_tpu.utils import ckpt as CK
    from read_tpu.utils.perform import AccumDict
    from read_tpu.criterions import losses as L

    key = jax.random.PRNGKey(args.seed)
    ckpt_root = os.path.join(exp_dir, "checkpoints")
    scene_pc = {ds.id: ds.scene_data["pointcloud"] for ds in ds_train}
    xyz_dev = {ds.id: jnp.asarray(np.asarray(pc["xyz"], np.float32))
               for ds, pc in ((d, scene_pc[d.id]) for d in ds_train)}

    if args.pipeline == "pix2pix":
        from read_tpu.pipelines import pix2pix_pipeline as P2P
        state, net, opt = P2P.create_pix2pix_state(key, cfg,
                                                   in_channels=3)
        steps = {ds.id: P2P.make_pix2pix_step(
            net, cfg, opt, vgg_params, scene_pc[ds.id], mode="colors")
            for ds in ds_train}

        from read_tpu.ops import rasterize as R
        from read_tpu.ops import render_modes as RM
        import functools as _ft

        @_ft.partial(jax.jit, static_argnames=("shape",))
        def eval_fwd(params, batch_stats, rgb, xyz, total_m, shape):
            levels = R.rasterize_pyramid_pooled(xyz, total_m, shape,
                                                cfg.num_scales)
            pyr = [RM.gather_attribute(rgb, ix) for ix, _ in levels]
            out = net.apply({"params": params,
                             "batch_stats": batch_stats},
                            *pyr, train=False)
            return out["im_out"]

        def eval_image(sid, total_m, shape):
            rgb = jnp.asarray(np.asarray(scene_pc[sid]["rgb"],
                                         np.float32))
            return eval_fwd(state["params"], state["batch_stats"], rgb,
                            xyz_dev[sid], total_m, shape)
    else:  # rgb_texture
        from read_tpu.pipelines import rgb_texture_pipeline as RGB
        from read_tpu.ops import rasterize as R
        from read_tpu.ops import render_modes as RM
        import functools as _ft
        h, w = cfg.crop_size
        rgb_states, steps, scene_faces = {}, {}, {}
        for ds in ds_train:
            key, sub = jax.random.split(key)
            st, opt = RGB.create_rgb_texture_state(
                sub, args.texture_size, lr=args.texture_lr)
            rgb_states[ds.id] = st
            # --use-mesh + faces: triangle-rasterized uv maps
            # (GL_TRIANGLES parity, gl/render.py:69-73)
            faces = scene_pc[ds.id].get("faces")
            faces = np.asarray(faces, np.int64).reshape(-1, 3).astype(
                np.int32) if args.use_mesh and faces is not None else None
            scene_faces[ds.id] = faces
            steps[ds.id] = RGB.make_rgb_texture_step(
                opt, scene_pc[ds.id], h, w,
                reg_weight=args.reg_weight, faces=faces)

        @_ft.partial(jax.jit, static_argnames=("shape", "sid"))
        def eval_fwd_rgb(tables, uv2d, xyz, total_m, shape, sid):
            faces = scene_faces[sid]
            if faces is None:
                idx, _ = R.rasterize_batch(xyz, total_m, *shape)
                uv_map = RM.gather_attribute(uv2d, idx)
            else:
                from read_tpu.ops import rasterize_mesh as RMesh
                fj = jnp.asarray(faces)
                idx, _ = RMesh.rasterize_mesh_batch(xyz, fj, total_m,
                                                    *shape)
                uv_map = jax.vmap(
                    lambda fi, m: RMesh.interpolate_uv(xyz, fj, uv2d,
                                                       m, fi))(
                    idx, total_m)
            mask = (idx >= 0)[..., None].astype(jnp.float32)
            return RGB.rgb_texture_forward(tables, uv_map, mask)

        def eval_image(sid, total_m, shape):
            uv2d = jnp.asarray(np.asarray(scene_pc[sid]["uv2d"],
                                          np.float32))
            return eval_fwd_rgb(rgb_states[sid]["tables"], uv2d,
                                xyz_dev[sid], total_m, shape, sid)

    from read_tpu.pipelines import texture_pipeline as _TP
    if args.resume:
        # full-state resume parity with the main loop (SURVEY.md 5.4)
        for ds in ds_train:
            tmpl = state if args.pipeline == "pix2pix" \
                else rgb_states[ds.id]
            cand = args.resume
            if not os.path.exists(os.path.join(cand, "state.npz")):
                cand = CK.latest_checkpoint(
                    args.resume, f"ckpt_{args.pipeline}_{ds.name}") or \
                    os.path.join(args.resume,
                                 f"best_{args.pipeline}_{ds.name}")
            restored, _meta = CK.load_checkpoint(cand, template=tmpl)
            if args.pipeline == "pix2pix":
                state = restored
            else:
                rgb_states[ds.id] = restored
            print(f"resumed {ds.name} from {cand} "
                  f"(step {int(restored['step'])})")
            if args.pipeline == "pix2pix":
                break  # one shared state

    sched = _TP.ReduceLROnPlateau(factor=args.plateau_factor,
                                  patience=args.plateau_patience)
    best_val = float("inf")
    for epoch in range(args.epochs):
        acc = AccumDict()
        step_count = 0
        for ds in ds_train:
            it = PrefetchIterator(BatchIterator(
                ds, args.batch_size, shuffle=True,
                seed=args.seed + epoch), depth=2)
            for batch in it:
                dev_batch = {
                    "total_m": jnp.asarray(batch["total_m"]),
                    "target": jnp.asarray(batch["target"]),
                }
                if args.pipeline == "pix2pix":
                    state, metrics = steps[ds.id](state, xyz_dev[ds.id],
                                                  dev_batch)
                else:
                    rgb_states[ds.id], metrics = steps[ds.id](
                        rgb_states[ds.id], xyz_dev[ds.id], dev_batch)
                acc.update({k: float(v) for k, v in metrics.items()})
                step_count += 1
                if step_count % args.log_freq == 0:
                    print(f"epoch {epoch} it {step_count}: {acc}")
                if args.max_steps_per_epoch and \
                        step_count >= args.max_steps_per_epoch:
                    break
        # val: full-frame PSNR
        vacc = AccumDict()
        for ds in ds_val:
            if not len(ds.view_list):
                continue
            for i in range(len(ds.view_list)):
                item = ds[i]
                shape = tuple(item["target"].shape[:2])
                img = eval_image(ds.id, jnp.asarray(
                    item["total_m"][None]), shape)
                psnr = float(L.psnr(img[0], jnp.asarray(item["target"])))
                vacc.update({"psnr": psnr})
        val_psnr = vacc.mean("psnr") if vacc["psnr"] else 0.0
        val_loss = -val_psnr
        scale = sched.step(val_loss)
        if args.pipeline == "pix2pix":
            state["lr_scale"] = jnp.asarray(scale, jnp.float32)
        else:
            for sid in rgb_states:
                rgb_states[sid]["lr_scale"] = jnp.asarray(
                    scale, jnp.float32)
        print(f"epoch {epoch}: train {acc.mean('loss'):.5f} "
              f"val psnr {val_psnr:.2f} lr_scale {scale:.4f}")
        if writer:
            writer.add_scalar("train/loss", acc.mean("loss"), epoch)
            writer.add_scalar("val/psnr", val_psnr, epoch)
            writer.add_scalar("lr_scale", scale, epoch)
        if val_loss < best_val or epoch % args.save_freq == 0:
            for ds in ds_train:
                obj = state if args.pipeline == "pix2pix" \
                    else rgb_states[ds.id]
                CK.save_checkpoint(
                    os.path.join(ckpt_root,
                                 f"ckpt_{args.pipeline}_{ds.name}_"
                                 f"{epoch}"),
                    obj, config=config_dict(args),
                    extra={"epoch": epoch, "val_psnr": val_psnr})
                CK.rotate_checkpoints(
                    ckpt_root, f"ckpt_{args.pipeline}_{ds.name}", keep=3)
                if val_loss < best_val:
                    CK.save_checkpoint(
                        os.path.join(
                            ckpt_root,
                            f"best_{args.pipeline}_{ds.name}"),
                        obj, config=config_dict(args),
                        extra={"epoch": epoch, "val_psnr": val_psnr})
            best_val = min(best_val, val_loss)
    print(f"done; best val psnr {-best_val:.2f}")
    return 0


def main(argv=None):
    args = load_args(argv)

    import jax
    if args.headless_platform:
        jax.config.update("jax_platforms", args.headless_platform)
    import jax.numpy as jnp

    from read_tpu.criterions import vgg as V
    from read_tpu.data.dataset import BatchIterator, PrefetchIterator
    from read_tpu.data.scenes import get_datasets
    from read_tpu.pipelines import texture_pipeline as TP
    from read_tpu.utils import ckpt as CK
    from read_tpu.utils.perform import AccumDict

    exp_dir = setup_experiment(args)
    print(f"experiment dir: {exp_dir}")
    print(f"devices: {jax.devices()}")

    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(exp_dir, flush_secs=10)
    except Exception:
        writer = None

    # splat radius / 'ps' z-scaled sizes / extra modalities all derive
    # from the input-format DSL; the SAME builder reconstructs the config
    # from a checkpoint at inference (TP.config_from_dict).
    h, w = parse_size(args.crop_size)
    try:
        cfg = TP.config_from_dict(
            vars(args), crop_size=(h, w),
            train_dataset_args=args.train_dataset_args)
    except ValueError as e:
        raise SystemExit(str(e))

    mesh = None
    if args.mesh:
        from read_tpu.parallel import sharded as SH
        n_data, n_pts_axis = (int(x) for x in args.mesh.lower().split("x"))
        mesh = SH.make_mesh(n_data, n_pts_axis)
        print(f"mesh: data={n_data} x points={n_pts_axis} over "
              f"{n_data * n_pts_axis} devices")
        if cfg.use_mesh:
            # mesh-texture tables are fixed-size: they replicate (like
            # net params) while their per-vertex uv2d shards over
            # 'points'. Only the point-splat uv variant runs sharded —
            # triangle-face rasterization needs cross-shard vertices
            # and falls back to splats (a warning prints per scene).
            print("mesh + use_mesh: replicated 2D tables, sharded uv2d "
                  "(point-splat uv variant; triangle faces ignored)")

    ds_train, ds_val, texture_ckpts = get_datasets(args)
    for tr, va in zip(ds_train, ds_val):
        print(f"scene {tr.name}: {tr.n_points} points, "
              f"{len(tr.view_list)} train views, "
              f"{len(va.view_list)} val views")
    # split lists saved for reproducibility (train.py:533-537)
    with open(os.path.join(exp_dir, "splits.json"), "w") as f:
        json.dump({tr.name: {"train": tr.target_list,
                             "val": va.target_list}
                   for tr, va in zip(ds_train, ds_val)}, f, indent=1)

    vgg_params = None
    if cfg.vgg_ratio:
        if cfg.vgg_ensemble and not args.vgg_weights:
            vgg_params = [V.random_vgg_params(seed)
                          for seed in range(cfg.vgg_ensemble)]
            print(f"criterion vgg_ens: averaging {cfg.vgg_ensemble} "
                  "seeded-random VGG feature sets")
        else:
            vgg_params = V.get_vgg_params(args.vgg_weights)
            if cfg.vgg_ensemble:
                # real weights given: vgg_ens degrades to a 1-ensemble
                vgg_params = [vgg_params]
            if args.vgg_weights is None:
                print("WARNING: no --vgg-weights; using seeded random "
                      "VGG features (see read_tpu/criterions/vgg.py)")

    if args.pipeline != "texture":
        # Pix2Pix / RGBTexture dispatch (reference wires all three
        # pipelines through one CLI, ``READ/pipelines/ogl.py:157-227``)
        return run_alt_pipeline(args, cfg, ds_train, ds_val, writer,
                                exp_dir, vgg_params)

    # per-scene states sharing one net (NetAndTexture parity: one net,
    # per-scene textures, compose.py:84-116); with --max-scenes-hbm only
    # that many scenes' texture tables stay device-resident
    if args.max_scenes_hbm is not None and args.mesh:
        raise SystemExit("--max-scenes-hbm is not supported with --mesh "
                         "(sharded tables are already the large-scene "
                         "path); drop one of the flags")
    key = jax.random.PRNGKey(args.seed)
    states = SceneStateStore(budget=args.max_scenes_hbm)
    net = None
    for tr, tex_ckpt in zip(ds_train, texture_ckpts):
        key, sub = jax.random.split(key)
        st, net = TP.create_state(sub, cfg, n_points=tr.n_points,
                                  texture_init=args.texture_init, net=net)
        if tex_ckpt:
            flat, _ = CK.load_checkpoint(tex_ckpt)
            st = st.replace(texture=jnp.asarray(flat["texture"]))
        states[tr.id] = st
    # share net params across scenes: all states start from scene-0's net
    shared = states[ds_train[0].id]
    for sid in states:
        if sid != ds_train[0].id:
            states[sid] = states[sid].replace(
                params=shared.params, batch_stats=shared.batch_stats,
                net_opt=shared.net_opt)
    if args.net_ckpt:
        flat, meta = CK.load_checkpoint(args.net_ckpt)
        params = CK._unflatten(shared.params,
                               {k.split("params/", 1)[1]: v
                                for k, v in flat.items()
                                if k.startswith("params/")})
        bs = CK._unflatten(shared.batch_stats,
                           {k.split("batch_stats/", 1)[1]: v
                            for k, v in flat.items()
                            if k.startswith("batch_stats/")})
        for sid in states:
            states[sid] = states[sid].replace(params=params,
                                              batch_stats=bs)
        print(f"loaded net ckpt {args.net_ckpt}")

    if args.resume:
        # full-state resume: params + textures + optimizer states + step
        # (upgrade over the reference, which only re-inits optimizers;
        # SURVEY.md 5.4). One ckpt dir per scene: --resume may point at a
        # single scene's dir or at the checkpoints/ root.
        for ds in ds_train:
            cand = args.resume
            if not os.path.exists(os.path.join(cand, "state.npz")):
                cand = CK.latest_checkpoint(args.resume,
                                            f"ckpt_{ds.name}") or \
                    os.path.join(args.resume, f"best_{ds.name}")
            restored, meta = CK.load_checkpoint(cand,
                                                template=states[ds.id])
            states[ds.id] = restored
            print(f"resumed {ds.name} from {cand} "
                  f"(step {int(restored.step)})")

    if args.freeze_net and not (args.net_ckpt or args.resume):
        print("WARNING: --freeze-net without --net-ckpt/--resume freezes "
              "RANDOM net weights; the reference freezes after a "
              "checkpoint load (train.py:515-527)")
    if mesh is not None:
        from read_tpu.parallel import sharded as SH
        if args.freeze_net:
            raise SystemExit("--freeze-net is not supported with --mesh "
                             "(texture-only fitting is a single-chip "
                             "workflow; drop one of the flags)")
        # shard every scene state + point cloud over the mesh; the
        # texture (+ its RMSprop state) pads N to the points-axis size
        for ds in ds_train:
            states[ds.id] = SH.prepare_scene_state(mesh, states[ds.id])
        train_step = SH.make_sharded_train_step(net, cfg, vgg_params,
                                                mesh)
    else:
        # donate=True: the loop never reuses a state it has passed in
        # (it rebinds `st` every step and carries the net portion across
        # scene switches), so donating the big texture/optimizer buffers
        # halves peak HBM.
        train_step = TP.make_train_step(net, cfg, vgg_params, donate=True,
                                        freeze_net=args.freeze_net,
                                        return_images=True)
    eval_step = TP.make_eval_step(net, cfg, vgg_params)
    sched = TP.ReduceLROnPlateau(factor=args.plateau_factor,
                                 patience=args.plateau_patience)

    scene_by_id = {ds.id: ds for ds in ds_train}
    _uv2d_cache: Dict[int, "jnp.ndarray"] = {}

    def uv2d_cache(sid: int) -> "jnp.ndarray":
        if sid not in _uv2d_cache:
            _uv2d_cache[sid] = jnp.asarray(np.asarray(
                scene_by_id[sid].scene_data["pointcloud"]["uv2d"],
                np.float32))
        return _uv2d_cache[sid]

    _pc_cache: Dict[int, dict] = {}

    def pc_cache(sid: int) -> dict:
        """Device-resident point attributes needed by extra_modes
        (points-axis sharded when training on a mesh)."""
        if sid not in _pc_cache:
            need = {m for g in cfg.extra_modes for m in g}
            if cfg.use_mesh and mesh is not None:
                # sharded mesh-texture path: uv2d rides the sharded
                # pointcloud dict (the replicated tables sample in
                # stage 2, parallel/sharded._make_split_train_step)
                need = need | {"uv_2d"}
            attr_of = {"colors": "rgb", "labels": "labels",
                       "xyz": "xyz_c", "normals_m": "normals",
                       "uv_2d": "uv2d"}
            pc = scene_by_id[sid].scene_data["pointcloud"]
            out = {}
            for mode in need:
                a = attr_of.get(mode)
                if a and pc.get(a) is not None:
                    out[a] = np.asarray(pc[a], np.float32)
                if mode in ("normals_l", "normals_r", "normals_d"):
                    # view-dependent: per-point world xyz + normals
                    for a in ("xyz", "normals"):
                        if pc.get(a) is not None:
                            out[a] = np.asarray(pc[a], np.float32)
            if mesh is not None:
                from read_tpu.parallel import sharded as SH
                out = SH.shard_pointcloud_attrs(mesh, out)
            else:
                out = {k: jnp.asarray(v) for k, v in out.items()}
            _pc_cache[sid] = out
        return _pc_cache[sid]

    _psize_cache: Dict[int, Optional["jnp.ndarray"]] = {}

    def psize_cache(sid: int):
        """Per-point sizes from the scene manifest (``point_sizes`` key,
        reference ``gl/utils.py:330-336``); None when absent. Not
        supported together with --mesh sharding (sizes would need the
        points-axis padding too)."""
        if sid not in _psize_cache:
            ps = scene_by_id[sid].scene_data.get("point_sizes")
            _psize_cache[sid] = None if ps is None or mesh is not None \
                else jnp.asarray(np.asarray(ps, np.float32).reshape(-1))
        return _psize_cache[sid]

    _faces_cache: Dict[int, Optional["jnp.ndarray"]] = {}

    def faces_cache(sid: int):
        """Triangle index buffer ``[T,3] int32`` for --use-mesh scenes
        (reference draws indexed GL_TRIANGLES, ``gl/render.py:69-73``);
        None when the scene has no faces (vertex-splat fallback)."""
        if sid not in _faces_cache:
            f = scene_by_id[sid].scene_data["pointcloud"].get("faces")
            if f is not None and cfg.use_mesh and mesh is not None:
                print(f"scene {sid}: triangle faces ignored under "
                      "--mesh (sharded path uses the point-splat uv "
                      "variant)")
                f = None
            _faces_cache[sid] = None if f is None or not cfg.use_mesh \
                else jnp.asarray(np.asarray(f, np.int64).reshape(-1, 3)
                                 .astype(np.int32))
        return _faces_cache[sid]

    def scene_xyz(ds) -> "jnp.ndarray":
        xyz = np.asarray(ds.scene_data["pointcloud"]["xyz"], np.float32)
        if mesh is not None:
            from read_tpu.parallel import sharded as SH
            return SH.shard_points(mesh, xyz)
        return jnp.asarray(xyz)

    # per-iteration train composite dumps (src/train.py:206-217): grids
    # of out | target | depth (viridis) stacked vertically, rotating
    # `log_num_images` files, written every `log_freq` steps (the
    # reference writes every iteration; through the dev tunnel one
    # [B,h,w,3] download per iter would dominate the step).
    _depth_fn = {}

    def dump_train_composite(k: int, sid, im, batch, dev_batch, xyz):
        import imageio.v2 as imageio
        from read_tpu.utils.colorize import colorize, label_to_color
        from read_tpu.ops import rasterize as R
        shape = tuple(im.shape[1:3])
        if shape not in _depth_fn:
            _depth_fn[shape] = jax.jit(functools.partial(
                lambda xyz, m, h, w: R.rasterize_batch(
                    xyz, m, h, w, method=cfg.raster_method)[1],
                h=shape[0], w=shape[1]))
        depth = np.asarray(_depth_fn[shape](xyz, dev_batch["total_m"]))

        def grid(rows):  # nrow=4 make_grid parity
            rows = [np.asarray(r) for r in rows[:4]]
            return np.concatenate(rows, axis=1)

        out_g = grid(np.clip(np.asarray(im), 0, 1))
        tgt_g = grid(batch["target"])
        dep_g = grid(colorize(depth))
        comp = [out_g, tgt_g, dep_g]
        if args.num_classes and batch.get("label") is not None:
            comp.append(grid(
                label_to_color(batch["label"]).astype(np.float32) / 255.))
        comp = np.concatenate(comp, axis=0)
        d = os.path.join(exp_dir, "train_imgs")
        os.makedirs(d, exist_ok=True)
        imageio.imwrite(
            os.path.join(d, f"comp_{k % args.log_num_images}.png"),
            (np.clip(comp, 0, 1) * 255).astype(np.uint8))

    def eval_state(sid: int) -> TP.TrainState:
        """State usable by the unsharded eval step (gathers + strips the
        texture padding when training on a mesh; re-activates the texture
        tables when host-offloaded)."""
        if mesh is None:
            return states.activate(sid)
        from read_tpu.parallel import sharded as SH
        return SH.unshard_state(states[sid], scene_by_id[sid].n_points)

    def carry_net(dst_sid: int, src_sid: int):
        """Rebind the shared net portion (params/stats/opt/lr) of
        dst's state to src's — reference semantics: ONE net shared by
        all scenes (``compose.py:84-116``). O(1): array rebind only."""
        if dst_sid == src_sid:
            return
        s = states[src_sid]
        states[dst_sid] = states[dst_sid].replace(
            params=s.params, batch_stats=s.batch_stats,
            net_opt=s.net_opt, lr_scale=s.lr_scale)

    def run_train_epoch(epoch: int) -> float:
        """Interleaved multi-scene epoch: per-scene batch streams are
        shuffled together (reference shuffles a chunked ConcatDataset,
        ``train.py:229-248``) so the shared net + BatchNorm stats never
        see one long single-scene run. With ``--max-scenes-hbm`` the
        scene set is partitioned into working-set chunks of that size
        (reference ``max_ds`` chunking, ``train.py:229-238``): batches
        interleave within a chunk, chunks run sequentially, so texture
        tables swap host<->HBM once per chunk instead of per batch."""
        acc = AccumDict()
        ep_rng = np.random.default_rng(args.seed + 13 * epoch)

        def batches():
            its = {ds.id: iter(BatchIterator(
                ds, args.batch_size, shuffle=True,
                seed=args.seed + epoch)) for ds in ds_train}
            scene_ids = [ds.id for ds in ds_train]
            ep_rng.shuffle(scene_ids)
            chunk = args.max_scenes_hbm or len(scene_ids)
            n_slots = {ds.id: len(BatchIterator(ds, args.batch_size))
                       for ds in ds_train}
            for c0 in range(0, len(scene_ids), chunk):
                group = scene_ids[c0:c0 + chunk]
                slots = [sid for sid in group
                         for _ in range(n_slots[sid])]
                ep_rng.shuffle(slots)
                for sid in slots:
                    try:
                        yield sid, next(its[sid])
                    except StopIteration:
                        continue

        it = PrefetchIterator(batches(), depth=2)
        xyz_cache = {}
        step_count = 0
        last_sid = None
        gstep = 0
        for sid, batch in it:
            if sid not in xyz_cache:
                xyz_cache[sid] = scene_xyz(scene_by_id[sid])
                if args.max_scenes_hbm is not None:
                    # point clouds follow the texture working set
                    keep = set(states.resident_ids) | {sid}
                    for k in [k for k in xyz_cache if k not in keep]:
                        del xyz_cache[k]
            if last_sid is not None:
                carry_net(sid, last_sid)
            dev_batch = {
                "total_m": jnp.asarray(batch["total_m"]),
                "target": jnp.asarray(batch["target"]),
            }
            if cfg.use_mask:
                dev_batch["mask"] = jnp.asarray(batch["mask"])
            if args.num_classes:
                dev_batch["label"] = jnp.asarray(batch["label"])
            if cfg.use_mesh:
                dev_batch["uv2d"] = uv2d_cache(sid)
                if faces_cache(sid) is not None:
                    dev_batch["faces"] = faces_cache(sid)
            if psize_cache(sid) is not None:
                dev_batch["point_sizes"] = psize_cache(sid)
            if cfg.extra_modes:
                dev_batch["pointcloud"] = pc_cache(sid)
                if cfg.label_in_input:
                    dev_batch["label"] = jnp.asarray(batch["label"])
                if any(m in ("normals_l", "normals_r", "normals_d")
                       for g in cfg.extra_modes for m in g):
                    dev_batch["view_matrix"] = jnp.asarray(
                        batch["view_matrix"])
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                pc_sharded = dev_batch.pop("pointcloud", None)
                if cfg.use_mesh:
                    # uv2d is a per-POINT attribute: it shards over
                    # 'points' inside pc_sharded, never over 'data'
                    dev_batch.pop("uv2d", None)
                    dev_batch.pop("faces", None)
                    pc_sharded = pc_cache(sid)
                dsh = NamedSharding(mesh, PartitionSpec("data"))
                dev_batch = {k: jax.device_put(v, dsh)
                             for k, v in dev_batch.items()}
                st, metrics = train_step(states[sid], xyz_cache[sid],
                                         dev_batch, pc_sharded)
                im = None
            else:
                st, metrics, im = train_step(states.activate(sid),
                                             xyz_cache[sid], dev_batch)
            states[sid] = st
            last_sid = sid
            acc.update({k: float(v) for k, v in metrics.items()})
            step_count += 1
            gstep = int(st.step)
            if step_count % args.log_freq == 0:
                print(f"epoch {epoch} it {step_count}: {acc}")
                if writer:
                    for k, v in acc.means().items():
                        writer.add_scalar(f"train/{k}", v, gstep)
                if im is not None and args.log_num_images:
                    try:
                        dump_train_composite(
                            step_count // args.log_freq - 1, sid, im,
                            batch, dev_batch, xyz_cache[sid])
                    except Exception as e:  # never kill training on a dump
                        print(f"train composite dump failed: {e}")
            if args.max_steps_per_epoch and \
                    step_count >= args.max_steps_per_epoch:
                break
        # propagate the final net to every scene state
        if last_sid is not None:
            for ds in ds_train:
                carry_net(ds.id, last_sid)
        return acc.mean("loss") if acc["loss"] else float("inf")

    def run_val_epoch(epoch: int, dump_dir: Optional[str] = None) -> float:
        """Validation epoch. Scalability (vs the reference's per-view
        python loop, ``train.py:354-363`` round 1): views are batched
        (``--batch-size-val``) at the fixed /16 full-frame shape so ONE
        compiled program serves every view of a scene, metric scalars
        stay on device until the end of the epoch (no per-item sync),
        and host item prep overlaps device compute via prefetch."""
        acc = AccumDict()
        n_dumped = 0
        pending = []  # (scene_name, device metric dicts) - sync at end
        for ds in ds_val:
            if not len(ds.view_list):
                continue
            xyz = scene_xyz(ds) if mesh is None else jnp.asarray(
                np.asarray(ds.scene_data["pointcloud"]["xyz"],
                           np.float32))
            st = eval_state(ds.id)
            bs = max(1, args.batch_size_val)

            def val_batches(ds=ds, bs=bs):
                n = len(ds.view_list)
                for i0 in range(0, n, bs):
                    items = [ds[i] for i in range(i0, min(i0 + bs, n))]
                    # pad the tail so every batch compiles to one shape
                    npad = bs - len(items)
                    b = {k: np.stack([it[k] for it in items] +
                                     [items[-1][k]] * npad)
                         for k in ("total_m", "target", "mask",
                                   "view_matrix")}
                    b["n_valid"] = len(items)
                    b["filenames"] = [it["target_filename"]
                                      for it in items]
                    yield b

            for batch in PrefetchIterator(val_batches(), depth=2):
                n_valid = batch.pop("n_valid")
                names = batch.pop("filenames")
                dev_batch = {
                    "total_m": jnp.asarray(batch["total_m"]),
                    "target": jnp.asarray(batch["target"]),
                }
                if cfg.use_mask:
                    dev_batch["mask"] = jnp.asarray(batch["mask"])
                if cfg.use_mesh:
                    dev_batch["uv2d"] = uv2d_cache(ds.id)
                    if faces_cache(ds.id) is not None:
                        dev_batch["faces"] = faces_cache(ds.id)
                if psize_cache(ds.id) is not None:
                    dev_batch["point_sizes"] = psize_cache(ds.id)
                if cfg.extra_modes:
                    dev_batch["pointcloud"] = pc_cache(ds.id)
                    if any(m in ("normals_l", "normals_r", "normals_d")
                           for g in cfg.extra_modes for m in g):
                        dev_batch["view_matrix"] = jnp.asarray(
                            batch["view_matrix"])
                img, metrics = eval_step(st, xyz, dev_batch)
                # metrics are per-item [B] vectors; only the first
                # n_valid rows are real views (the tail is padding and
                # is dropped at accumulation).
                pending.append((n_valid, metrics))
                if writer and n_dumped == 0:
                    grid = np.concatenate(
                        [np.clip(np.asarray(img[0]), 0, 1),
                         np.asarray(batch["target"][0])], axis=1)
                    writer.add_image(f"val/{ds.name}",
                                     grid.transpose(2, 0, 1), epoch)
                if dump_dir and n_dumped < args.log_num_images * 8:
                    import imageio.v2 as imageio
                    os.makedirs(dump_dir, exist_ok=True)
                    for j in range(min(n_valid,
                                       args.log_num_images * 8
                                       - n_dumped)):
                        base = os.path.splitext(
                            os.path.basename(names[j]))[0]
                        out = np.clip(np.asarray(img[j]), 0, 1)
                        imageio.imwrite(
                            os.path.join(dump_dir,
                                         f"{ds.name}_{base}.png"),
                            (out * 255).astype(np.uint8))
                        n_dumped += 1
        # single host sync for the whole epoch's metrics
        pending = jax.device_get(pending)
        for n_valid, metrics in pending:
            for j in range(n_valid):
                acc.update({k: float(np.asarray(v).reshape(-1)[j])
                            for k, v in metrics.items()})
        return acc.mean("loss") if acc["loss"] else float("inf"), acc

    ckpt_root = os.path.join(exp_dir, "checkpoints")

    if args.eval:
        dump = args.eval_dir or os.path.join(exp_dir, "eval")
        val_loss, acc = run_val_epoch(0, dump_dir=dump)
        print(f"VAL LOSS {val_loss:.5f}  {acc}")
        return 0

    best_val = float("inf")
    for epoch in range(args.epochs):
        t0 = time.time()
        train_loss = run_train_epoch(epoch)
        val_loss, vacc = run_val_epoch(
            epoch, dump_dir=os.path.join(exp_dir, "val_imgs")
            if epoch % args.save_freq == 0 else None)
        sched_metric = val_loss if args.plateau_metric == "loss" \
            else -vacc.mean("psnr")
        scale = sched.step(sched_metric)
        for sid in states:
            states[sid] = states[sid].replace(
                lr_scale=jnp.asarray(scale, jnp.float32))
        print(f"epoch {epoch}: train {train_loss:.5f} val {val_loss:.5f} "
              f"lr_scale {scale:.4f} ({time.time()-t0:.0f}s)  {vacc}")
        if writer:
            writer.add_scalar("val/loss", val_loss, epoch)
            for k, v in vacc.means().items():
                writer.add_scalar(f"val/{k}", v, epoch)
            writer.add_scalar("lr_scale", scale, epoch)

        if epoch % args.save_freq == 0 or sched_metric < best_val:
            for ds in ds_train:
                # checkpoints are always saved unsharded/unpadded so a
                # single-chip run (or viewer) can load them directly
                CK.save_checkpoint(
                    os.path.join(ckpt_root,
                                 f"ckpt_{ds.name}_{epoch}"),
                    eval_state(ds.id), config=config_dict(args),
                    extra={"epoch": epoch, "val_loss": val_loss})
                CK.rotate_checkpoints(ckpt_root, f"ckpt_{ds.name}",
                                      keep=3)
            if sched_metric < best_val:
                best_val = sched_metric
                for ds in ds_train:
                    CK.save_checkpoint(
                        os.path.join(ckpt_root, f"best_{ds.name}"),
                        eval_state(ds.id), config=config_dict(args),
                        extra={"epoch": epoch, "val_loss": val_loss,
                               "val_psnr": vacc.mean("psnr")})
    print(f"done; best val loss {best_val:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
