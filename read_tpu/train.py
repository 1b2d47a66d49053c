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
                   choices=["vgg", "vgg_pytorch", "huber_only"])
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
    p.add_argument("--freeze-net", dest="freeze_net", action="store_true")
    p.add_argument("--plateau-patience", dest="plateau_patience",
                   type=int, default=5)
    p.add_argument("--plateau-factor", dest="plateau_factor", type=float,
                   default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--max-steps-per-epoch", dest="max_steps_per_epoch",
                   type=int, default=None)
    p.add_argument("--headless-platform", dest="headless_platform",
                   type=str, default=None,
                   help="force a jax platform (e.g. cpu for smoke runs)")
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

    # derive splat radius from the input-format DSL (e.g. uv_1d_p3 ->
    # 3x3 splats; p1 = single pixel)
    from read_tpu.scene.formats import parse_input_format
    specs = parse_input_format(args.input_format)
    point_radius = max((sp.point_size - 1) // 2 for sp in specs) \
        if specs else 0

    h, w = parse_size(args.crop_size)
    cfg = TP.PipelineConfig(
        crop_size=(h, w),
        point_radius=point_radius,
        # device-side augmentations (the reference applies these via GL
        # vertex buffers in workers; here they live in the jitted step)
        drop_points=float(args.train_dataset_args.get("drop_points", 0.0)),
        perturb_points=float(
            args.train_dataset_args.get("perturb_points", 0.0)),
        descriptor_size=args.descriptor_size,
        supersampling=args.supersampling,
        lr=args.lr, texture_lr=args.texture_lr,
        vgg_ratio=0.0 if args.criterion == "huber_only" else 1.0,
        huber_ratio=1e4 if args.criterion != "huber_only" else 1.0,
        reg_weight=args.reg_weight,
        texture_activation=args.texture_activation,
        use_mask=args.use_mask,
        num_classes=args.num_classes,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )

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
        vgg_params = V.get_vgg_params(args.vgg_weights)
        if args.vgg_weights is None:
            print("WARNING: no --vgg-weights; using seeded random VGG "
                  "features (see read_tpu/criterions/vgg.py)")

    # per-scene states sharing one net (NetAndTexture parity: one net,
    # per-scene textures, compose.py:84-116)
    key = jax.random.PRNGKey(args.seed)
    states: Dict[int, TP.TrainState] = {}
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

    train_step = TP.make_train_step(net, cfg, vgg_params)
    eval_step = TP.make_eval_step(net, cfg, vgg_params)
    sched = TP.ReduceLROnPlateau(factor=args.plateau_factor,
                                 patience=args.plateau_patience)

    def sync_shared_net(src_id: int):
        """Propagate the shared net (params/stats/opt) updated while
        training scene src_id to all other scene states."""
        s = states[src_id]
        for sid in states:
            if sid != src_id:
                states[sid] = states[sid].replace(
                    params=s.params, batch_stats=s.batch_stats,
                    net_opt=s.net_opt, lr_scale=s.lr_scale)

    def run_train_epoch(epoch: int) -> float:
        acc = AccumDict()
        step_count = 0
        for ds in ds_train:
            it = PrefetchIterator(
                BatchIterator(ds, args.batch_size, shuffle=True,
                              seed=args.seed + epoch), depth=2)
            xyz = jnp.asarray(
                np.asarray(ds.scene_data["pointcloud"]["xyz"],
                           np.float32))
            st = states[ds.id]
            for batch in it:
                dev_batch = {
                    "total_m": jnp.asarray(batch["total_m"]),
                    "target": jnp.asarray(batch["target"]),
                }
                if args.use_mask:
                    dev_batch["mask"] = jnp.asarray(batch["mask"])
                if args.num_classes:
                    dev_batch["label"] = jnp.asarray(batch["label"])
                st, metrics = train_step(st, xyz, dev_batch)
                acc.update({k: float(v) for k, v in metrics.items()})
                step_count += 1
                gstep = int(st.step)
                if step_count % args.log_freq == 0:
                    print(f"epoch {epoch} it {step_count}: {acc}")
                    if writer:
                        for k, v in acc.means().items():
                            writer.add_scalar(f"train/{k}", v, gstep)
                if args.max_steps_per_epoch and \
                        step_count >= args.max_steps_per_epoch:
                    break
            states[ds.id] = st
            sync_shared_net(ds.id)
        return acc.mean("loss") if acc["loss"] else float("inf")

    def run_val_epoch(epoch: int, dump_dir: Optional[str] = None) -> float:
        acc = AccumDict()
        n_dumped = 0
        for ds in ds_val:
            if not len(ds.view_list):
                continue
            xyz = jnp.asarray(
                np.asarray(ds.scene_data["pointcloud"]["xyz"],
                           np.float32))
            st = states[ds.id]
            for i in range(len(ds.view_list)):
                item = ds[i]
                batch = {
                    "total_m": jnp.asarray(item["total_m"][None]),
                    "target": jnp.asarray(item["target"][None]),
                }
                if args.use_mask:
                    batch["mask"] = jnp.asarray(item["mask"][None])
                img, metrics = eval_step(st, xyz, batch)
                acc.update({k: float(v) for k, v in metrics.items()})
                if writer and i == 0 and n_dumped == 0:
                    # side-by-side prediction|target grid per scene
                    # (reference tensorboard image logging,
                    # train.py:308-329)
                    grid = np.concatenate(
                        [np.clip(np.asarray(img[0]), 0, 1),
                         np.asarray(batch["target"][0])], axis=1)
                    writer.add_image(f"val/{ds.name}",
                                     grid.transpose(2, 0, 1), epoch)
                if dump_dir and n_dumped < args.log_num_images * 8:
                    import imageio.v2 as imageio
                    os.makedirs(dump_dir, exist_ok=True)
                    base = os.path.splitext(os.path.basename(
                        item["target_filename"]))[0]
                    out = np.clip(np.asarray(img[0]), 0, 1)
                    imageio.imwrite(
                        os.path.join(dump_dir, f"{ds.name}_{base}.png"),
                        (out * 255).astype(np.uint8))
                    n_dumped += 1
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
        scale = sched.step(val_loss)
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

        if epoch % args.save_freq == 0 or val_loss < best_val:
            for ds in ds_train:
                CK.save_checkpoint(
                    os.path.join(ckpt_root,
                                 f"ckpt_{ds.name}_{epoch}"),
                    states[ds.id], config=config_dict(args),
                    extra={"epoch": epoch, "val_loss": val_loss})
                CK.rotate_checkpoints(ckpt_root, f"ckpt_{ds.name}",
                                      keep=3)
            if val_loss < best_val:
                best_val = val_loss
                for ds in ds_train:
                    CK.save_checkpoint(
                        os.path.join(ckpt_root, f"best_{ds.name}"),
                        states[ds.id], config=config_dict(args),
                        extra={"epoch": epoch, "val_loss": val_loss})
    print(f"done; best val loss {best_val:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
