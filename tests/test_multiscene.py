"""Multi-scene training: per-scene textures + shared net through the CLI
(the reference's max_ds texture-swap behavior, train.py:229-261)."""

import os

import numpy as np
import pytest

from read_tpu.ops import rasterize as R
from read_tpu.scene import camera, io as IO


@pytest.fixture(scope="module")
def two_scene_dir(tmp_path_factory):
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("scenes")
    rng = np.random.default_rng(0)
    h = w = 64
    entries = []
    for s, n in (("a", 1500), ("b", 2500)):  # different point counts!
        d = root / s
        os.makedirs(d / "images", exist_ok=True)
        xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
        xyz[:, 2] -= 6.0
        colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        IO.write_ply(str(d / "pc.ply"), xyz, colors)
        K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
        np.savetxt(d / "cam.txt", np.vstack([[w, h, 0], K]))
        P = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
        views = []
        for i in range(4):
            v = np.eye(4)
            v[0, 3] = 0.2 * i
            views.append(v)
            m = camera.total_matrix(P, v)
            idx, _ = R.rasterize_reference(xyz, m, h, w)
            img = np.zeros((h, w, 3), np.float32)
            img[idx >= 0] = colors[idx[idx >= 0]]
            imageio.imwrite(str(d / "images" / f"{i:06}.png"),
                            (img * 255).astype(np.uint8))
        np.savetxt(d / "poses.dat", np.stack(views).reshape(-1, 4))
        with open(d / "scene.yaml", "w") as f:
            f.write("viewport_size: [64, 64]\npointcloud: pc.ply\n"
                    "intrinsic_matrix: cam.txt\nview_matrix: poses.dat\n")
        entries.append((s, d))
    with open(root / "paths.yaml", "w") as f:
        f.write("datasets:\n")
        for s, d in entries:
            f.write(f"  scene_{s}:\n"
                    f"    scene_path: {d/'scene.yaml'}\n"
                    f"    target_path: {d/'images'}\n"
                    "    target_name: '{label:06d}.png'\n")
    return root


@pytest.mark.slow
def test_two_scene_training(two_scene_dir, tmp_path):
    from read_tpu import train as TR
    rc = TR.main([
        "--paths-file", str(two_scene_dir / "paths.yaml"),
        "--crop-size", "32x32",
        "--batch-size", "1",
        "--epochs", "1",
        "--criterion", "huber_only",
        "--splitter", "split_by_step",
        "--save-dir", str(tmp_path / "logs"),
        "--max-steps-per-epoch", "2",
        "--log-freq", "99",
        "--headless-platform", "cpu",
        "--name", "duo",
    ])
    assert rc == 0
    exp = tmp_path / "logs" / os.listdir(tmp_path / "logs")[0]
    ckpts = os.listdir(exp / "checkpoints")
    # one ckpt family per scene (per-scene textures saved separately,
    # reference pipeline.py:59-71)
    assert any("scene_a" in c for c in ckpts)
    assert any("scene_b" in c for c in ckpts)

    # the two scenes' checkpoints share net params but have
    # different-sized textures
    from read_tpu.utils import ckpt as CK
    fa, _ = CK.load_checkpoint(str(exp / "checkpoints" /
                                   sorted(c for c in ckpts
                                          if "best_scene_a" in c)[0]))
    fb, _ = CK.load_checkpoint(str(exp / "checkpoints" /
                                   sorted(c for c in ckpts
                                          if "best_scene_b" in c)[0]))
    assert fa["texture"].shape == (1500, 8)
    assert fb["texture"].shape == (2500, 8)
    # shared net: scene b trained after scene a within the epoch and the
    # sync propagated the same final params into both checkpoints
    np.testing.assert_allclose(fa["params/feat0/conv_fm/kernel"],
                               fb["params/feat0/conv_fm/kernel"])
