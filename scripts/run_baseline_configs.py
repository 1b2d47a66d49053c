"""Baseline workload configs 1/4/5 (BASELINE.md) against a fitted
checkpoint:

1. kitti6-style trajectory render of the fitted scene (fps + per-frame
   PSNR/SSIM vs ground truth on the val frames).
4. Scene stitching: split the fitted scene's points+descriptors in two
   halves, re-stitch with ``scene.tools.stitch_scenes``, render — must
   reproduce the unsplit render (exactness PSNR) at full fps.
5. Scene editing (delete a box of points + duplicate another, shifted)
   and panorama render via modified intrinsics
   (``tools.panorama_cameras``).

Usage:
  python scripts/run_baseline_configs.py --scene data/demo_scene/scene.yaml \
      --ckpt <exp>/checkpoints/best_demo_drive --out /tmp/cfgs
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="/tmp/baseline_cfgs")
    ap.add_argument("--conv-impl", dest="conv_impl", default=None)
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--val-step", type=int, default=10)
    args = ap.parse_args()

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp
    if os.environ.get("READ_TPU_PLATFORM"):
        # the axon site hook pins JAX_PLATFORMS; this is the
        # post-import override that actually takes effect
        jax.config.update("jax_platforms",
                          os.environ["READ_TPU_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from read_tpu.criterions import losses as L
    from read_tpu.render import NeuralRenderer
    from read_tpu.scene import tools as ST

    os.makedirs(args.out, exist_ok=True)
    results = {}

    r = NeuralRenderer(args.scene, args.ckpt, conv_impl=args.conv_impl,
                       dtype=args.dtype)
    views = [np.asarray(v) for v in r.scene_data["view_matrix"]]
    scene_dir = os.path.dirname(os.path.abspath(args.scene))

    # ---- config 1: trajectory render + quality on val frames ----------
    # Device rate: dispatch the whole trajectory back-to-back and sync
    # once — per-frame host downloads through the dev tunnel cost
    # seconds each and measure the tunnel, not the chip (production
    # serving streams frames out-of-band).
    out_dev = r.infer_device(views[0])  # compile + warm
    np.asarray(out_dev[0, 0, 0])
    t0 = time.perf_counter()
    for pose in views:
        out_dev = r.infer_device(pose)
    np.asarray(out_dev[0, 0, 0])
    dt_device = (time.perf_counter() - t0) / len(views)

    psnrs, ssims, t_host = [], [], []
    val_ids = list(range(0, len(views), args.val_step))
    for i, pose in enumerate(views):
        t0 = time.perf_counter()
        img = r.infer(pose)
        t_host.append(time.perf_counter() - t0)
        if i in val_ids:
            tgt_path = os.path.join(scene_dir, "images", f"{i:06}.png")
            if os.path.exists(tgt_path):
                tgt = np.asarray(imageio.imread(tgt_path),
                                 np.float32) / 255.0
                ps = float(L.psnr(jnp.asarray(img), jnp.asarray(tgt)))
                ss = float(L.ssim(jnp.asarray(img)[None],
                                  jnp.asarray(tgt)[None]))
                psnrs.append(ps)
                ssims.append(ss)
            imageio.imwrite(os.path.join(args.out, f"cfg1_{i:06}.png"),
                            (np.clip(img, 0, 1) * 255).astype(np.uint8))
    results["config1_trajectory"] = {
        "frames": len(views),
        "fps_device": round(1.0 / dt_device, 2),
        "fps_with_host_download": round(
            1.0 / float(np.mean(t_host[1:])), 2),
        "val_psnr_mean": round(float(np.mean(psnrs)), 2) if psnrs else None,
        "val_ssim_mean": round(float(np.mean(ssims)), 3) if ssims else None,
        "n_val": len(psnrs),
    }
    print("config1:", results["config1_trajectory"], flush=True)

    # ---- config 4: stitching ------------------------------------------
    xyz = np.asarray(r.xyz)
    tex = np.asarray(r.texture)
    zmid = np.median(xyz[:, 2])
    half_a = xyz[:, 2] <= zmid
    sx, stex, _sids = ST.stitch_scenes([
        (xyz[half_a], tex[half_a], np.eye(4)),
        (xyz[~half_a], tex[~half_a], np.eye(4)),
    ])
    ref_img = r.infer(views[0])
    r.xyz = jnp.asarray(sx)
    r.state = r.state.replace(texture=jnp.asarray(stex))
    r.texture = r.state.texture
    stitched_img = r.infer(views[0])  # compile (new N) + quality image
    o = r.infer_device(views[0])
    np.asarray(o[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(8):
        o = r.infer_device(views[0])
    np.asarray(o[0, 0, 0])
    t_stitch = (time.perf_counter() - t0) / 8
    exact = float(L.psnr(jnp.asarray(stitched_img),
                         jnp.asarray(ref_img)))
    results["config4_stitching"] = {
        "exactness_psnr_vs_unsplit": round(exact, 2),
        "fps_device": round(1.0 / t_stitch, 2),
    }
    imageio.imwrite(os.path.join(args.out, "cfg4_stitched.png"),
                    (np.clip(stitched_img, 0, 1) * 255).astype(np.uint8))
    print("config4:", results["config4_stitching"], flush=True)

    # ---- config 5: editing + panorama ---------------------------------
    # delete a car-sized box near the road, duplicate another shifted
    sel = ST.select_bbox(sx, [-4.5, -0.5, 20.0], [-2.0, 2.5, 28.0])
    ex, etex = ST.delete_points(sx, stex, sel)
    sel2 = ST.select_bbox(ex, [2.0, -0.5, 30.0], [4.5, 2.5, 38.0])
    shift = np.eye(4)
    shift[0, 3] = -6.0
    ex, etex = ST.duplicate_points(ex, etex, sel2, shift)
    r.xyz = jnp.asarray(ex)
    r.state = r.state.replace(texture=jnp.asarray(etex))
    r.texture = r.state.texture
    edited = r.infer(views[0])
    o = r.infer_device(views[0])
    np.asarray(o[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(8):
        o = r.infer_device(views[0])
    np.asarray(o[0, 0, 0])
    t_edit = (time.perf_counter() - t0) / 8
    imageio.imwrite(os.path.join(args.out, "cfg5_edited.png"),
                    (np.clip(edited, 0, 1) * 255).astype(np.uint8))

    pano_views = ST.panorama_cameras(views[len(views) // 2],
                                     n_views=3, yaw_step_deg=40.0)
    pano = []
    for pv in pano_views:
        pano.append(r.infer(np.asarray(pv)))
    pano_img = np.concatenate(pano, axis=1)
    imageio.imwrite(os.path.join(args.out, "cfg5_panorama.png"),
                    (np.clip(pano_img, 0, 1) * 255).astype(np.uint8))
    results["config5_edit_panorama"] = {
        "edited_fps_device": round(1.0 / t_edit, 2),
        "panorama_views": len(pano_views),
        "panorama_px": list(pano_img.shape[:2]),
    }
    print("config5:", results["config5_edit_panorama"], flush=True)

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
