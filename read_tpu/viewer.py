"""Interactive viewer.

Parity target: ``viewer.py`` (root tree, 553 LoC glumpy/GLFW app). The
TPU build renders frames with the fused jit (``read_tpu.render``) and
displays via an OpenCV window — no OpenGL context, no CUDA-GL interop
(the reference's display path, ``viewer.py:184-189,477-478``, existed to
move GPU frames to the screen; here the frame is copied host-side once).

Key bindings (reference ``viewer.py:323-380,460-468``):
  w/a/s/d/q/e  fly forward/left/back/right/down/up
  1/2/3/4      turn left/right/up/down
  z/x          roll
  n            neural mode          c   colors mode
  m            cycle normals modes  v   depth mode
  b            xyz mode             l   labels mode
  p            PCA descriptor mode  h   Blinn-Phong lit mode
  u            2D-texture sampling mode
  t            toggle temporal averaging
  +/-          splat point radius up/down (live recompile)
  g            snap to nearest training pose
  o            print current pose
  s+ctrl / F12 screenshot (also 'i')
  ESC          quit

Trajectory editing (reference key-G mode, ``viewer.py:381-458``):
  k            add current pose as a trajectory keyframe
  j            remove last keyframe
  r            toggle smooth replay of the recorded trajectory
  u            save trajectory to trajectory.txt
  y            load trajectory.txt

Mouse (reference ``viewer.py:516-545``):
  left-drag    orbit (ground-plane pivot); +shift = local rotate
  right-drag   pan
  middle-drag  roll (horizontal) / zoom (vertical)
  wheel        zoom

Run headless with ``--offscreen N`` to render N frames along the scene
trajectory without a window (CI smoke path).
"""

from __future__ import annotations

import argparse

import sys
import time

import numpy as np

_MODES = ["neural", "colors", "depth", "xyz", "labels", "pca",
          "normals_m", "normals_l", "normals_r", "normals_d"]


class ViewerApp:
    def __init__(self, scene_path: str, ckpt_path: str,
                 viewport=None, supersampling=None, gt_pattern=None):
        from read_tpu.render import NeuralRenderer, nearest_train
        from read_tpu.scene.trackball import Trackball

        from read_tpu.scene.trajectory import Trajectory

        self.r = NeuralRenderer(scene_path, ckpt_path, viewport=viewport,
                                supersampling=supersampling)
        views = self.r.scene_data["view_matrix"]
        init = np.asarray(views[0]) if views else np.eye(4)
        self.tb = Trackball(init)
        self.mode = "neural"
        self._normals_cycle = 0
        self._nearest = nearest_train
        self.frame_times = []
        self.trajectory = Trajectory()
        self.replaying = False
        self._replay_t = 0.0
        self.replay_speed = 1.0 / 180  # path fraction per frame
        self.gt_pattern = gt_pattern
        self._last_gt_path = None

    def nearest_gt_image(self):
        """(path, image) of the training photo whose pose is nearest to
        the current camera (reference ``viewer.py:492-506``
        ``--nearest_train``: show the closest GT frame in a side
        window). Returns (None, None) without a --gt pattern; the image
        is cached per path so replays don't re-read the file."""
        if not self.gt_pattern:
            return None, None
        import os
        views = self.r.scene_data["view_matrix"]
        if not views:
            return None, None
        i = self._nearest(views, self.tb.view_matrix())
        labels = self.r.scene_data.get("camera_labels")
        label = labels[i] if labels else i
        # '*' substitutes the camera label; integer labels also try the
        # dataset convention's zero-padded form ('{label:06d}.png')
        cands = [self.gt_pattern.replace("*", str(label))]
        try:
            cands.append(self.gt_pattern.replace("*", f"{int(label):06d}"))
        except (TypeError, ValueError):
            pass
        path = next((p for p in cands if os.path.exists(p)), None)
        if path is None:
            print(f"{cands[0]} NOT FOUND!")
            return cands[0], None
        if path != self._last_gt_path:
            import imageio.v2 as imageio
            self._last_gt_path = path
            self._last_gt_img = np.asarray(imageio.imread(path))
        return path, self._last_gt_img

    def render(self) -> np.ndarray:
        t0 = time.perf_counter()
        if self.replaying and len(self.trajectory) >= 2:
            self.tb.m = self.trajectory.sample(self._replay_t)
            self._replay_t += self.replay_speed
            if self._replay_t > 1.0:
                self._replay_t = 0.0
        pose = self.tb.view_matrix()
        if self.mode == "neural":
            img = self.r.infer(pose)
        else:
            img = self.r.render_mode(self.mode, pose)
        self.frame_times.append(time.perf_counter() - t0)
        return img

    def handle_key(self, key: str) -> bool:
        """Returns False to quit."""
        tb = self.tb
        fly = {"w": (1, 0, 0), "s": (-1, 0, 0), "a": (0, -1, 0),
               "d": (0, 1, 0), "q": (0, 0, -1), "e": (0, 0, 1)}
        if key in fly:
            tb.fly(*fly[key])
        elif key == "1":
            tb.turn(yaw=np.deg2rad(5))
        elif key == "2":
            tb.turn(yaw=np.deg2rad(-5))
        elif key == "3":
            tb.turn(pitch=np.deg2rad(5))
        elif key == "4":
            tb.turn(pitch=np.deg2rad(-5))
        elif key == "z":
            tb.roll(np.deg2rad(5))
        elif key == "x":
            tb.roll(np.deg2rad(-5))
        elif key == "n":
            self.mode = "neural"
        elif key == "c":
            self.mode = "colors"
        elif key == "v":
            self.mode = "depth"
        elif key == "b":
            self.mode = "xyz"
        elif key == "l":
            self.mode = "labels"
        elif key == "p":
            self.mode = "pca"
        elif key == "m":
            self._normals_cycle = (self._normals_cycle + 1) % 4
            self.mode = ["normals_m", "normals_l", "normals_r",
                         "normals_d"][self._normals_cycle]
        elif key == "h":
            # Blinn-Phong lit mode (reference use_light toggle,
            # programs.py:228-246)
            self.mode = "lit"
        elif key == "u":
            # GL 2D-texture sampling submode (programs.py:253-255)
            self.mode = "texture2d"
        elif key in ("+", "="):
            # live splat-size adjust (reference viewer.py:351-354
            # KEY_PLUS/KEY_MINUS on the GL point size)
            self.r.set_point_radius(self.r.cfg.point_radius + 1)
            print(f"point radius {self.r.cfg.point_radius}")
        elif key == "-":
            self.r.set_point_radius(self.r.cfg.point_radius - 1)
            print(f"point radius {self.r.cfg.point_radius}")
        elif key == "t":
            self.r.temporal_average = not self.r.temporal_average
            self.r._last_pyr = None
        elif key == "g":
            views = self.r.scene_data["view_matrix"]
            if views:
                i = self._nearest(views, tb.view_matrix())
                tb.m = np.asarray(views[i], np.float64).copy()
                print(f"snapped to training pose {i}")
        elif key == "o":
            print("pose:\n", tb.view_matrix())
        elif key == "i":
            img = self.render()
            import imageio.v2 as imageio
            fn = f"screenshot_{int(time.time())}.png"
            imageio.imwrite(fn, (np.clip(img, 0, 1) * 255).astype(
                np.uint8))
            np.savetxt(fn + ".pose.txt", tb.view_matrix())
            print(f"saved {fn} (+pose)")
        elif key == "k":
            i = self.trajectory.add(tb.view_matrix())
            print(f"keyframe {i} recorded")
        elif key == "j":
            self.trajectory.remove_last()
            print(f"{len(self.trajectory)} keyframes")
        elif key == "r":
            self.replaying = not self.replaying
            self._replay_t = 0.0
            print(f"replay {'on' if self.replaying else 'off'} "
                  f"({len(self.trajectory)} keyframes)")
        elif key == "u":
            if len(self.trajectory):
                self.trajectory.save("trajectory.txt")
                print(f"saved trajectory.txt "
                      f"({len(self.trajectory)} keyframes)")
        elif key == "y":
            from read_tpu.scene.trajectory import Trajectory
            try:
                self.trajectory = Trajectory.load("trajectory.txt")
                print(f"loaded trajectory.txt "
                      f"({len(self.trajectory)} keyframes)")
            except OSError as e:
                print(f"no trajectory.txt: {e}")
        elif key == "\x1b":  # ESC
            return False
        return True

    # -- mouse (reference viewer.py:516-545) ---------------------------
    def handle_mouse(self, event: int, x: int, y: int, flags: int):
        """cv2 mouse callback body: drag states -> trackball ops."""
        import cv2
        if event == cv2.EVENT_LBUTTONDOWN or \
                event == cv2.EVENT_RBUTTONDOWN or \
                event == cv2.EVENT_MBUTTONDOWN:
            self._drag = (x, y)
        elif event == cv2.EVENT_MOUSEMOVE and getattr(
                self, "_drag", None) is not None:
            dx, dy = x - self._drag[0], y - self._drag[1]
            self._drag = (x, y)
            if flags & cv2.EVENT_FLAG_LBUTTON:
                if flags & cv2.EVENT_FLAG_SHIFTKEY:
                    self.tb.rotate_local(dx * 0.005, dy * 0.005)
                else:
                    self.tb.rotate(dx * 0.005, dy * 0.005)
            elif flags & cv2.EVENT_FLAG_RBUTTON:
                self.tb.pan(-dx * 0.01, dy * 0.01)
            elif flags & cv2.EVENT_FLAG_MBUTTON:
                if abs(dx) >= abs(dy):
                    self.tb.roll(dx * 0.005)
                else:
                    self.tb.zoom(-dy * 0.05)
        elif event in (cv2.EVENT_LBUTTONUP, cv2.EVENT_RBUTTONUP,
                       cv2.EVENT_MBUTTONUP):
            self._drag = None
        elif event == cv2.EVENT_MOUSEWHEEL:
            self.tb.zoom(0.5 if flags > 0 else -0.5)

    @property
    def fps(self) -> float:
        if len(self.frame_times) < 2:
            return 0.0
        return 1.0 / float(np.mean(self.frame_times[-20:]))


def main(argv=None):
    p = argparse.ArgumentParser(description="Interactive neural viewer")
    p.add_argument("--scene", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--viewport", default=None, help="WxH")
    p.add_argument("--supersampling", type=int, default=None)
    p.add_argument("--offscreen", type=int, default=0,
                   help="render N trajectory frames headless and exit")
    p.add_argument("--nearest-train", action="store_true",
                   help="show the nearest training photo alongside "
                        "(reference viewer.py --nearest_train)")
    p.add_argument("--gt", default=None,
                   help="GT image path pattern, '*' replaced by the "
                        "camera label (e.g. images/*.png)")
    args = p.parse_args(argv)
    if args.nearest_train and not args.gt:
        p.error("--nearest-train needs --gt (path to gt images)")

    viewport = None
    if args.viewport:
        w, h = args.viewport.lower().split("x")
        viewport = (int(w), int(h))
    app = ViewerApp(args.scene, args.ckpt, viewport=viewport,
                    supersampling=args.supersampling,
                    gt_pattern=args.gt)

    if args.offscreen:
        views = app.r.scene_data["view_matrix"]
        for i in range(min(args.offscreen, len(views))):
            app.tb.m = np.asarray(views[i], np.float64).copy()
            img = app.render()
        # drive a few key events headless as a smoke of the bindings
        for k in "wd1nmcvp":
            app.handle_key(k)
            app.render()
        # trajectory record + replay smoke
        app.handle_key("k")
        app.handle_key("w")
        app.handle_key("k")
        app.handle_key("r")
        for _ in range(3):
            app.render()
        if args.nearest_train:
            path, gt = app.nearest_gt_image()
            print(f"nearest-train: {path} "
                  f"{'loaded ' + str(gt.shape) if gt is not None else 'missing'}")
        print(f"offscreen ok: {len(app.frame_times)} frames, "
              f"fps {app.fps:.2f}, mode {app.mode}, "
              f"traj {len(app.trajectory)} kf")
        return 0

    import cv2
    win = "read_tpu viewer (ESC quits)"
    cv2.namedWindow(win, cv2.WINDOW_AUTOSIZE)
    cv2.setMouseCallback(
        win, lambda ev, x, y, flags, _p: app.handle_mouse(ev, x, y,
                                                          flags))
    running = True
    while running:
        img = app.render()
        bgr = (np.clip(img, 0, 1)[..., ::-1] * 255).astype(np.uint8)
        cv2.putText(bgr, f"{app.fps:5.1f} fps  [{app.mode}]", (8, 18),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
        cv2.imshow(win, bgr)
        if args.nearest_train:
            _, gt = app.nearest_gt_image()
            if gt is not None:
                s = 1024 / max(gt.shape[:2])
                gt_bgr = cv2.resize(gt[..., :3][..., ::-1], None,
                                    None, s, s)
                cv2.imshow("nearest train", gt_bgr)
        k = cv2.waitKey(1) & 0xFF
        if k != 255:
            running = app.handle_key(chr(k))
    cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())
