"""Inference: fused full-frame rendering, offline trajectory renders,
and an (optional) interactive viewer backend.

Parity targets:
- ``OGL`` wrapper (``READ/gl/nn.py:76-129``): load a checkpoint (config
  embedded), build the render pipeline at a /16-aligned viewport, expose
  ``infer(view_matrix) -> rgb``; supersampling override; temporal
  averaging (``compose.py:167-171``).
- ``viewer.py``: trajectory replay (``:311-316,472-475``), render-mode
  switches neural/colors/normals/depth/xyz/labels (``:323-356``),
  PCA descriptor visualization (``:202-209``; ``pca_color`` at
  ``gl/utils.py:74-91``), nearest-train-image lookup (``:492-506``;
  ``nearest_train`` at ``gl/utils.py:487-503``), screenshots.

The whole neural path (project -> z-buffer -> descriptor gather -> UNet)
is ONE jit; the only host traffic is the final frame readback for
display/encoding (the reference bounces frames through CUDA-GL interop
instead, ``render.py:103-171``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Optional

import numpy as np


def pca_color(descriptors: np.ndarray, sample: int = 100_000,
              seed: int = 0) -> np.ndarray:
    """Project 8-d descriptors to RGB via PCA (``gl/utils.py:74-91``
    behavior, full-batch instead of IncrementalPCA)."""
    rng = np.random.default_rng(seed)
    d = descriptors.astype(np.float64)
    idx = rng.permutation(len(d))[:sample]
    sub = d[idx]
    mu = sub.mean(0)
    _, _, vt = np.linalg.svd(sub - mu, full_matrices=False)
    proj = (d - mu) @ vt[:3].T
    lo, hi = np.percentile(proj[idx], [2, 98], axis=0)
    return np.clip((proj - lo) / np.maximum(hi - lo, 1e-9), 0, 1).astype(
        np.float32)


def nearest_train(view_matrices, query_m: np.ndarray) -> int:
    """Index of the training pose closest to ``query_m``
    (``gl/utils.py:487-503`` behavior: position + orientation distance)."""
    best, best_d = 0, np.inf
    q_pos = query_m[:3, 3]
    q_fwd = -query_m[:3, 2]
    for i, m in enumerate(view_matrices):
        m = np.asarray(m)
        d = np.linalg.norm(m[:3, 3] - q_pos) \
            + np.linalg.norm(-m[:3, 2] - q_fwd)
        if d < best_d:
            best, best_d = i, d
    return best


class NeuralRenderer:
    """Checkpoint-driven fused renderer (the ``OGL`` equivalent).

    The checkpoint's embedded config reconstructs the EXACT training
    pipeline (the reference's ``load_pipeline`` property,
    ``pipeline.py:34-56``): splat radius / ``ps`` z-scaled sizes from the
    input format, extra input modalities, per-point manifest sizes,
    mesh-texture path (+ triangle faces), seg head, dtype, and the UNet
    conv formulation (``conv_impl``) are all restored — a model trained
    with any feature combination renders identically at inference.
    """

    def __init__(self, scene_path: str, ckpt_path: str,
                 viewport: Optional[tuple] = None,
                 supersampling: Optional[int] = None,
                 temporal_average: bool = False,
                 dtype: Optional[str] = None,
                 conv_impl: Optional[str] = None,
                 raster_method: Optional[str] = None):
        import jax
        import jax.numpy as jnp

        from read_tpu.ops import rasterize as R
        from read_tpu.pipelines import texture_pipeline as TP
        from read_tpu.scene import camera
        from read_tpu.scene.io import load_scene_data
        from read_tpu.utils import ckpt as CK

        self.jax, self.jnp = jax, jnp
        self.scene_data = load_scene_data(scene_path)
        flat, meta = CK.load_checkpoint(ckpt_path)
        self.config = dict(meta.get("config", {}))
        if dtype is not None:          # explicit overrides only
            self.config["dtype"] = dtype
        if conv_impl is not None:
            self.config["conv_impl"] = conv_impl
        if raster_method is not None:
            self.config["raster_method"] = raster_method
        if supersampling is not None:
            self.config["supersampling"] = supersampling

        pc = self.scene_data["pointcloud"]
        self.xyz = jnp.asarray(np.asarray(pc["xyz"], np.float32))

        # viewport must be /16 (reference gl/nn.py:107-109); round down.
        vw, vh = viewport or self.scene_data["config"]["viewport_size"]
        self.vw, self.vh = (vw // 16) * 16, (vh // 16) * 16
        cfg = TP.config_from_dict(self.config,
                                  crop_size=(self.vh, self.vw))
        self.cfg = cfg
        self.ss = cfg.supersampling
        self.temporal_average = temporal_average
        self._last_pyr = None

        K = self.scene_data["intrinsic_matrix"]
        K = camera.rescale_K(np.asarray(K, np.float64),
                             self.vw / vw, self.vh / vh)
        self.K = K
        self.proj = camera.gl_projection(K, (self.vw, self.vh),
                                         znear=0.1, zfar=1000.0)

        # rebuild the train-time state (template-driven: handles point
        # AND mesh textures, seg heads, any conv_impl) and load weights
        n_points = self.xyz.shape[0]
        tmpl_cfg = cfg.replace(crop_size=(32, 32))  # cheap net.init
        state, net = TP.create_state(jax.random.PRNGKey(0), tmpl_cfg,
                                     n_points=n_points)
        state, _ = CK.load_checkpoint(ckpt_path, template=state)
        self.net, self.state = net, state
        self.texture = state.texture
        if not cfg.use_mesh:
            assert state.texture.shape[0] == n_points, (
                f"texture rows {state.texture.shape[0]} != points "
                f"{n_points}")

        # scene-side inputs the training step received from the batch
        self.uv2d = None
        self.faces = None
        if cfg.use_mesh:
            self.uv2d = jnp.asarray(np.asarray(pc["uv2d"], np.float32))
            f = pc.get("faces")
            if f is not None:
                self.faces = jnp.asarray(
                    np.asarray(f, np.int64).reshape(-1, 3).astype(
                        np.int32))
        self.point_sizes = None
        ps = self.scene_data.get("point_sizes")
        if ps is not None:
            self.point_sizes = jnp.asarray(
                np.asarray(ps, np.float32).reshape(-1))
        self.pc_attrs = None
        self._needs_view = False
        if cfg.extra_modes:
            need = {m for g in cfg.extra_modes for m in g}
            attr_of = {"colors": "rgb", "labels": "labels",
                       "xyz": "xyz_c", "normals_m": "normals",
                       "uv_2d": "uv2d"}
            self.pc_attrs = {}
            for mode in need:
                a = attr_of.get(mode)
                if a and pc.get(a) is not None:
                    self.pc_attrs[a] = jnp.asarray(
                        np.asarray(pc[a], np.float32))
                if mode in ("normals_l", "normals_r", "normals_d"):
                    self._needs_view = True
                    for a in ("xyz", "normals"):
                        if pc.get(a) is not None:
                            self.pc_attrs[a] = jnp.asarray(
                                np.asarray(pc[a], np.float32))

        self._build_fns()

    def _build_fns(self):
        """(Re)build the jitted render functions from ``self.cfg``.

        Called from ``__init__`` and again whenever a raster-geometry
        knob changes live (the viewer's point-size ± keys,
        :meth:`set_point_radius` — reference ``viewer.py:351-354``
        KEY_PLUS/MINUS adjust the GL point size per frame)."""
        import jax
        import jax.numpy as jnp

        from read_tpu.ops import rasterize as R
        from read_tpu.pipelines import texture_pipeline as TP

        cfg = self.cfg
        net = self.net
        h, w = self.vh, self.vw
        use_pallas_net = cfg.conv_impl == "pallas"
        dtype_name = "bfloat16" if cfg.dtype == jnp.bfloat16 \
            else "float32"

        # Mosaic kernels need a TPU; elsewhere (CPU tests) interpret
        pallas_interpret = jax.default_backend() != "tpu"

        def _apply_net(state, pyr):
            out = net.apply({"params": state.params,
                             "batch_stats": state.batch_stats},
                            *pyr, train=False)
            return out["im_out"]

        def _pyramids(state, xyz, total_m, view_m=None):
            return tuple(TP._build_pyramid(
                cfg, state.texture, xyz, total_m, shape=(h, w),
                uv2d=self.uv2d, point_sizes=self.point_sizes,
                faces=self.faces, pointcloud=self.pc_attrs,
                view_m=view_m))

        def _infer(state, xyz, total_m, view_m=None):
            return _apply_net(state, _pyramids(state, xyz, total_m,
                                               view_m))

        self._pyr_fn = jax.jit(_pyramids)
        if use_pallas_net:
            # Packed-lane Pallas inference over the same variables
            # (models/unet_pallas.py), dispatched as raster/encoder/
            # decoder executables: the two-segment split is what keeps
            # the s2d strided kernels crash-free on the TPU runtime
            # (see unet_pallas_apply_seg) — do NOT re-wrap in jit.
            from read_tpu.models import unet_pallas as UP

            def _net_seg(state, pyr):
                out = UP.unet_pallas_apply_seg(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, *pyr,
                    dtype_name=dtype_name,
                    interpret=pallas_interpret)
                return out["im_out"]

            self._net_fn = _net_seg
            self._infer_fn = lambda state, xyz, total_m, view_m=None: \
                _net_seg(state, self._pyr_fn(state, xyz, total_m, view_m))
        else:
            self._net_fn = jax.jit(_apply_net)
            self._infer_fn = jax.jit(_infer)
        # raw render-mode raster follows the same z-buffer algorithm as
        # the neural pyramid (--raster-method override / ckpt config)
        self._raster = jax.jit(
            lambda xyz, m: R.rasterize_batch(xyz, m, h, w,
                                             method=cfg.raster_method))

    def set_point_radius(self, radius: int):
        """Change the splat radius live and recompile the render fns
        (viewer ±; reference ``viewer.py:351-354``). Clamped at 0."""
        radius = max(0, int(radius))
        if radius == self.cfg.point_radius:
            return
        self.cfg = self.cfg.replace(point_radius=radius)
        self._last_pyr = None
        self._build_fns()

    def _view_arg(self, view_matrix: np.ndarray):
        """``[1,4,4]`` view matrix for view-dependent extra modes, or
        None so XLA sees an empty pytree when no mode needs it."""
        if not self._needs_view:
            return None
        return self.jnp.asarray(
            np.asarray(view_matrix, np.float32)[None])

    def total_matrix(self, view_matrix: np.ndarray,
                     K: Optional[np.ndarray] = None) -> np.ndarray:
        from read_tpu.scene import camera
        proj = self.proj if K is None else camera.gl_projection(
            K, (self.vw, self.vh), 0.1, 1000.0)
        return camera.total_matrix(proj, view_matrix).astype(np.float32)

    def infer_device(self, view_matrix: np.ndarray,
                     K: Optional[np.ndarray] = None):
        """Dispatch one neural frame and return the ON-DEVICE ``[1,h,w,3]``
        array without a host transfer. Lets trajectory renders pipeline
        dispatches and fetch asynchronously (on the tunneled dev chip a
        per-frame host download costs seconds and says nothing about
        device rate; real deployments stream frames out-of-band)."""
        m = self.total_matrix(view_matrix, K)[None]
        return self._infer_fn(self.state, self.xyz, self.jnp.asarray(m),
                              self._view_arg(view_matrix))

    def infer(self, view_matrix: np.ndarray,
              K: Optional[np.ndarray] = None) -> np.ndarray:
        """Render one neural frame; returns ``[h, w, 3]`` float in [0,1]."""
        m = self.total_matrix(view_matrix, K)[None]
        if not self.temporal_average:
            img = self._infer_fn(self.state, self.xyz,
                                 self.jnp.asarray(m),
                                 self._view_arg(view_matrix))
            return np.clip(np.asarray(img)[0], 0.0, 1.0)
        # temporal averaging of the net INPUT pyramid with the previous
        # frame's (compose.py:167-171; last_input stores the averaged
        # pyramid, as the reference does).
        pyr = self._pyr_fn(self.state, self.xyz, self.jnp.asarray(m),
                           self._view_arg(view_matrix))
        if self._last_pyr is not None:
            pyr = tuple((a + b) * 0.5
                        for a, b in zip(pyr, self._last_pyr))
        self._last_pyr = pyr
        img = self._net_fn(self.state, pyr)
        return np.clip(np.asarray(img)[0], 0.0, 1.0)

    def render_mode(self, mode: str, view_matrix: np.ndarray,
                    K: Optional[np.ndarray] = None) -> np.ndarray:
        """Raw (non-neural) modes incl. 'pca' descriptors."""
        from read_tpu.ops import render_modes as RM
        m = self.total_matrix(view_matrix, K)[None]
        idx, dep = self._raster(self.xyz, self.jnp.asarray(m))
        if mode == "pca":
            if self.cfg.use_mesh:
                raise ValueError(
                    "pca descriptor view needs a point texture "
                    "(checkpoint was trained with --use-mesh)")
            colors = pca_color(np.asarray(self.texture))
            out = RM.gather_attribute(self.jnp.asarray(colors), idx)
            return np.asarray(out)[0]
        if mode == "depth":
            d = np.asarray(dep)[0]
            filled = d > 0
            if filled.any():
                lo, hi = d[filled].min(), d[filled].max()
                d = np.where(filled, (d - lo) / max(hi - lo, 1e-9), 0)
            return np.repeat(d[..., None], 3, -1).astype(np.float32)
        pc = dict(self.scene_data["pointcloud"])
        if self.scene_data.get("texture") is not None:
            # scene texture image for the GL 2D-sampling submode
            pc["texture_image"] = np.asarray(
                self.scene_data["texture"], np.float32) / 255.0
        out = RM.render_mode(mode, idx, dep, pc,
                             view_matrix=np.asarray(view_matrix))
        out = np.asarray(out)[0]
        if out.shape[-1] == 1:
            out = np.repeat(out, 3, -1)
        return np.clip(out.astype(np.float32), 0, 1)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Offline trajectory renderer (viewer.py equivalent "
                    "for headless runs)")
    p.add_argument("--scene", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default="renders")
    p.add_argument("--trajectory", default=None,
                   help="flat txt of 4x4 camera-to-world poses; default: "
                        "the scene's own view matrices")
    p.add_argument("--mode", default="neural",
                   help="neural | colors | normals_m/l/r/d | depth | xyz "
                        "| labels | pca | lit (Blinn-Phong) | texture2d")
    p.add_argument("--viewport", default=None, help="WxH override")
    p.add_argument("--supersampling", type=int, default=None)
    p.add_argument("--conv-impl", dest="conv_impl", default=None,
                   choices=["xla", "im2col", "pallas"],
                   help="override the checkpoint's UNet conv backend "
                        "('pallas' = packed-lane fused kernels, "
                        "inference-only)")
    p.add_argument("--dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="override the checkpoint's compute dtype")
    p.add_argument("--raster-method", "--raster", dest="raster_method",
                   default=None,
                   choices=["sort", "scatter1", "scatter", "sort1q",
                            "pallas"],
                   help="override the checkpoint's z-buffer algorithm "
                        "for the neural pyramid AND raw render modes "
                        "('scatter1' = one packed scatter-min, ~25%% "
                        "faster raster; quality delta recorded in "
                        "RESULTS_r03.md). Flag name matches train.py; "
                        "--raster kept as an alias.")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--fps-report", action="store_true")
    args = p.parse_args(argv)

    import imageio.v2 as imageio

    viewport = None
    if args.viewport:
        w, h = args.viewport.lower().split("x")
        viewport = (int(w), int(h))
    r = NeuralRenderer(args.scene, args.ckpt, viewport=viewport,
                       supersampling=args.supersampling,
                       conv_impl=args.conv_impl, dtype=args.dtype,
                       raster_method=args.raster_method)

    if args.trajectory:
        poses = np.loadtxt(args.trajectory).reshape(-1, 4, 4)
    else:
        poses = np.stack(r.scene_data["view_matrix"])
    if args.max_frames:
        poses = poses[:args.max_frames]

    os.makedirs(args.out, exist_ok=True)
    times = []
    for i, pose in enumerate(poses):
        t0 = time.perf_counter()
        if args.mode == "neural":
            img = r.infer(pose)
        else:
            img = r.render_mode(args.mode, pose)
        times.append(time.perf_counter() - t0)
        imageio.imwrite(os.path.join(args.out, f"{i:06}.png"),
                        (img * 255).astype(np.uint8))
    if args.fps_report and len(times) > 1:
        steady = times[1:]
        print(json.dumps({
            "frames": len(times),
            "fps": round(1.0 / float(np.mean(steady)), 2),
            "ms_per_frame": round(float(np.mean(steady)) * 1e3, 2),
        }))
    print(f"wrote {len(poses)} frames to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
