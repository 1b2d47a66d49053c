"""Real scene-stitching workflow (BASELINE.md config 4, the reference's
headline composition feature, `README.md` "Scene Stitching"):

1. scene A fitted end-to-end (net + texture),
2. scene B's texture fitted against A's FROZEN net
   (`--freeze-net --net-ckpt`, reference `train.py:515-527`),
3. the two independently fitted scenes stitched into one world with
   `scene.tools.stitch_scenes` (B translated behind A along the road)
   and rendered by the single shared net.

Quality check: each scene's `split_by_step` val frames are rendered
FROM THE STITCHED CLOUD (B's cameras mapped by its world transform) and
scored against that scene's own ground truth — the stitched render must
match each source fit, and a seam-crossing trajectory is written out.

Usage:
  python scripts/stitch_freeze_demo.py \
      --scene1 data/demo_scene/scene.yaml  --ckpt1 <expA>/checkpoints/best_... \
      --scene2 data/demo_scene2/scene.yaml --ckpt2 <expB>/checkpoints/best_... \
      --out /tmp/stitch_demo
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
    ap.add_argument("--scene1", required=True)
    ap.add_argument("--ckpt1", required=True)
    ap.add_argument("--scene2", required=True)
    ap.add_argument("--ckpt2", required=True)
    ap.add_argument("--out", default="/tmp/stitch_demo")
    ap.add_argument("--z-offset", type=float, default=130.0,
                    help="world translation of scene B along the road "
                         "(scene worlds span z in [0,120])")
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

    r1 = NeuralRenderer(args.scene1, args.ckpt1)
    r2 = NeuralRenderer(args.scene2, args.ckpt2)
    views1 = [np.asarray(v) for v in r1.scene_data["view_matrix"]]
    views2 = [np.asarray(v) for v in r2.scene_data["view_matrix"]]
    dir1 = os.path.dirname(os.path.abspath(args.scene1))
    dir2 = os.path.dirname(os.path.abspath(args.scene2))

    tf = np.eye(4)
    tf[2, 3] = args.z_offset
    sx, stex, sids = ST.stitch_scenes([
        (np.asarray(r1.xyz), np.asarray(r1.texture), None),
        (np.asarray(r2.xyz), np.asarray(r2.texture), tf),
    ])
    # render the joint world through scene A's renderer (shared net)
    r1.xyz = jnp.asarray(sx)
    r1.state = r1.state.replace(texture=jnp.asarray(stex))
    r1.texture = r1.state.texture

    def score(views, gt_dir, cam_tf, tag):
        psnrs, ssims = [], []
        for i in range(0, len(views), args.val_step):
            pose = views[i] if cam_tf is None else cam_tf @ views[i]
            img = r1.infer(pose)
            tgt_path = os.path.join(gt_dir, "images", f"{i:06}.png")
            tgt = np.asarray(imageio.imread(tgt_path), np.float32) / 255.
            psnrs.append(float(L.psnr(jnp.asarray(img),
                                      jnp.asarray(tgt))))
            ssims.append(float(L.ssim(jnp.asarray(img)[None],
                                      jnp.asarray(tgt)[None])))
            imageio.imwrite(
                os.path.join(args.out, f"{tag}_{i:06}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8))
        return (round(float(np.mean(psnrs)), 2),
                round(float(np.mean(ssims)), 3), len(psnrs))

    p1, s1, n1 = score(views1, dir1, None, "sceneA")
    p2, s2, n2 = score(views2, dir2, tf, "sceneB")

    # seam-crossing trajectory: continue scene A's last pose along +z
    # through the seam into scene B's start.
    seam = []
    base = views1[-1].copy()
    for k in range(12):
        pose = base.copy()
        pose[2, 3] += 2.0 * k  # advance the camera along the road
        seam.append(pose)
    t0 = time.perf_counter()
    for k, pose in enumerate(seam):
        img = r1.infer(pose)
        imageio.imwrite(os.path.join(args.out, f"seam_{k:03}.png"),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))
    dt = (time.perf_counter() - t0) / len(seam)

    results = {
        "n_points_stitched": int(sx.shape[0]),
        "sceneA_val_psnr": p1, "sceneA_val_ssim": s1, "n_valA": n1,
        "sceneB_val_psnr": p2, "sceneB_val_ssim": s2, "n_valB": n2,
        "seam_frames": len(seam),
        "seam_fps_with_host_download": round(1.0 / dt, 2),
    }
    print(json.dumps(results), flush=True)
    with open(os.path.join(args.out, "stitch_results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
