"""Checkpoint -> inference round trip (the reference's ``load_pipeline``
property, ``READ/pipelines/pipeline.py:34-56``): a model trained with any
non-default feature combination must render IDENTICALLY through
``NeuralRenderer`` (checkpoint-config-driven) and through the training
eval step (VERDICT r2 item 3).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from read_tpu.ops import rasterize as R
from read_tpu.scene import camera, io as IO


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("rt_scene")
    rng = np.random.default_rng(1)
    n, h, w = 3000, 64, 64
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    IO.write_ply(str(root / "pc.ply"), xyz, colors)
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
    np.savetxt(root / "cam.txt", np.vstack([[w, h, 0], K]))
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    views = []
    os.makedirs(root / "images", exist_ok=True)
    for i in range(3):
        view = np.eye(4)
        view[0, 3] = 0.2 * i
        views.append(view)
        m = camera.total_matrix(P, view)
        idx, _ = R.rasterize_reference(xyz, m, h, w)
        img = np.zeros((h, w, 3), np.float32)
        img[idx >= 0] = colors[idx[idx >= 0]]
        imageio.imwrite(str(root / "images" / f"{i:06}.png"),
                        (img * 255).astype(np.uint8))
    np.savetxt(root / "poses.dat", np.stack(views).reshape(-1, 4))
    with open(root / "scene.yaml", "w") as f:
        f.write("viewport_size: [64, 64]\npointcloud: pc.ply\n"
                "intrinsic_matrix: cam.txt\nview_matrix: poses.dat\n")
    with open(root / "paths.yaml", "w") as f:
        f.write("datasets:\n  toy:\n"
                f"    scene_path: {root/'scene.yaml'}\n"
                f"    target_path: {root/'images'}\n"
                "    target_name: '{label:06d}.png'\n")
    return root


CASES = {
    "splats_p3": ["--input-format",
                  "uv_1d_p3, uv_1d_p3_ds1, uv_1d_p3_ds2, uv_1d_p3_ds3, "
                  "uv_1d_p3_ds4"],
    "ps_splats": ["--input-format",
                  "uv_1d_ps2, uv_1d_ps2_ds1, uv_1d_ps2_ds2, "
                  "uv_1d_ps2_ds3, uv_1d_ps2_ds4"],
    "extra_colors": ["--input-format",
                     "uv_1d_p1, colors, uv_1d_p1_ds1, colors_ds1, "
                     "uv_1d_p1_ds2, colors_ds2, uv_1d_p1_ds3, "
                     "colors_ds3, uv_1d_p1_ds4, colors_ds4"],
    "im2col": ["--conv-impl", "im2col"],
    "use_mesh": ["--use-mesh", "--texture-size", "32"],
    "scatter1": ["--raster-method", "scatter1"],
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_roundtrip(scene_dir, tmp_path, case):
    from read_tpu import train as TR
    from read_tpu.render import NeuralRenderer

    save = tmp_path / f"logs_{case}"
    rc = TR.main([
        "--paths-file", str(scene_dir / "paths.yaml"),
        "--crop-size", "32x32",
        "--batch-size", "1",
        "--epochs", "1",
        "--criterion", "huber_only",
        "--save-dir", str(save),
        "--max-steps-per-epoch", "2",
        "--log-freq", "1",
        "--headless-platform", "cpu",
        "--name", case,
        "--eval-all",
    ] + CASES[case])
    assert rc == 0
    exp = save / os.listdir(save)[0]
    ckpt = exp / "checkpoints" / "best_toy"
    assert ckpt.exists()

    r = NeuralRenderer(str(scene_dir / "scene.yaml"), str(ckpt))
    # config reconstruction must round-trip the train-time settings
    if case == "splats_p3":
        assert r.cfg.point_radius == 1
    if case == "ps_splats":
        assert r.cfg.relative_point_size
    if case == "extra_colors":
        assert r.cfg.extra_modes and \
            r.cfg.extra_modes[0] == ("colors",)
    if case == "im2col":
        assert r.cfg.conv_impl == "im2col"
        assert r.net.conv_impl == "im2col"
    if case == "use_mesh":
        assert r.cfg.use_mesh
    if case == "scatter1":
        assert r.cfg.raster_method == "scatter1"

    pose = np.eye(4)
    img = r.infer(pose)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()

    # must equal the training-side eval step bit-for-bit (same program)
    import jax
    import jax.numpy as jnp
    from read_tpu.pipelines import texture_pipeline as TP
    from read_tpu.utils import ckpt as CK

    cfg = r.cfg
    state, net = TP.create_state(jax.random.PRNGKey(0),
                                 cfg.replace(crop_size=(32, 32)),
                                 n_points=r.xyz.shape[0])
    state, _ = CK.load_checkpoint(str(ckpt), template=state)
    eval_step = TP.make_eval_step(net, cfg, vgg_params=None)
    batch = {
        "total_m": jnp.asarray(r.total_matrix(pose)[None]),
        "target": jnp.zeros((1, 64, 64, 3), jnp.float32),
    }
    if cfg.use_mesh:
        batch["uv2d"] = r.uv2d
        if r.faces is not None:
            batch["faces"] = r.faces
    if cfg.extra_modes:
        batch["pointcloud"] = r.pc_attrs
    if r.point_sizes is not None:
        batch["point_sizes"] = r.point_sizes
    ref_img, _ = eval_step(state, r.xyz, batch)
    ref_img = np.clip(np.asarray(ref_img)[0], 0, 1)
    assert np.max(np.abs(ref_img - img)) < 1e-5, case


def test_roundtrip_pallas_override(scene_dir, tmp_path):
    """--conv-impl pallas at inference must agree with the flax eval
    forward on the same checkpoint (kernels in interpret mode on CPU)."""
    from read_tpu import train as TR
    from read_tpu.render import NeuralRenderer

    save = tmp_path / "logs_pallas"
    rc = TR.main([
        "--paths-file", str(scene_dir / "paths.yaml"),
        "--crop-size", "32x32", "--batch-size", "1", "--epochs", "1",
        "--criterion", "huber_only", "--save-dir", str(save),
        "--max-steps-per-epoch", "2", "--log-freq", "1",
        "--headless-platform", "cpu", "--name", "pal", "--eval-all",
    ])
    assert rc == 0
    ckpt = save / os.listdir(save)[0] / "checkpoints" / "best_toy"
    r_ref = NeuralRenderer(str(scene_dir / "scene.yaml"), str(ckpt))
    r_pal = NeuralRenderer(str(scene_dir / "scene.yaml"), str(ckpt),
                           conv_impl="pallas")
    pose = np.eye(4)
    a = r_ref.infer(pose)
    b = r_pal.infer(pose)
    assert np.max(np.abs(a - b)) < 1e-3


def test_viewer_offscreen_smoke(scene_dir, tmp_path, capsys):
    """ViewerApp --offscreen: trajectory record+replay, mode cycling,
    nearest-train lookup — the windowed cv2 path needs a display this
    CI lacks (README "environment notes"), so the offscreen smoke is
    the viewer's CI gate."""
    from read_tpu import train as TR
    from read_tpu import viewer as VW

    save = tmp_path / "logs_viewer"
    rc = TR.main([
        "--paths-file", str(scene_dir / "paths.yaml"),
        "--crop-size", "32x32", "--batch-size", "1", "--epochs", "1",
        "--criterion", "huber_only", "--save-dir", str(save),
        "--max-steps-per-epoch", "2", "--log-freq", "1",
        "--headless-platform", "cpu", "--name", "vsmoke",
    ])
    assert rc == 0
    exp = save / os.listdir(save)[0]
    ckpt = exp / "checkpoints" / "best_toy"

    # train.main's Tee rebinds sys.stdout to the experiment log, so
    # drive the app object directly rather than asserting on prints
    app = VW.ViewerApp(str(scene_dir / "scene.yaml"), str(ckpt),
                       gt_pattern=str(scene_dir / "images" / "*.png"))
    views = app.r.scene_data["view_matrix"]
    for v in views[:3]:
        app.tb.m = np.asarray(v, np.float64).copy()
        app.handle_key("k")          # record trajectory keyframes
    app.handle_key("r")              # replay
    frames = [app.render() for _ in range(3)]
    for f in frames:
        assert f.shape[-1] == 3 and np.isfinite(f).all()
    assert app.fps > 0 and len(app.trajectory) == 3
    for k in "cvn":                  # mode cycling stays renderable
        app.handle_key(k)
        assert app.render() is not None
    app.handle_key("+")              # live splat-size recompile
    assert app.r.cfg.point_radius == 1
    assert np.isfinite(app.render()).all()
    path, gt = app.nearest_gt_image()
    assert gt is not None and gt.shape[-1] in (3, 4), path
