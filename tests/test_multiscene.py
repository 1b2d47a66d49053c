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


def test_scene_state_store_offload():
    """SceneStateStore: beyond-budget scenes' textures live as host numpy;
    activate() re-uploads and evicts LRU (the max_ds swap analogue)."""
    import jax
    import jax.numpy as jnp
    from read_tpu.pipelines import texture_pipeline as TP
    from read_tpu.train import SceneStateStore

    cfg = TP.PipelineConfig(crop_size=(16, 16), vgg_ratio=0.0)
    store = SceneStateStore(budget=1)
    for sid, n in ((0, 64), (1, 96), (2, 128)):
        st, _ = TP.create_state(jax.random.PRNGKey(sid), cfg, n_points=n)
        store[sid] = st
    # only the most recent stays device-resident
    assert store.resident_ids == (2,)
    assert store.is_offloaded(0) and store.is_offloaded(1)
    assert not store.is_offloaded(2)
    st0 = store.activate(0)
    assert isinstance(st0.texture, jax.Array)
    assert store.resident_ids == (0,)
    assert store.is_offloaded(2)  # evicted
    # the round-trip is lossless
    st2 = store.activate(2)
    st_fresh, _ = TP.create_state(jax.random.PRNGKey(2), cfg, n_points=128)
    np.testing.assert_array_equal(np.asarray(st2.texture),
                                  np.asarray(st_fresh.texture))


@pytest.mark.slow
def test_offload_matches_resident(two_scene_dir, tmp_path):
    """--max-scenes-hbm 1 must reproduce the all-resident run bitwise
    when the net is frozen (texture updates depend only on the scene's
    own batch stream, which scheduling chunks preserve)."""
    from read_tpu import train as TR
    from read_tpu.utils import ckpt as CK

    outs = {}
    for tag, extra in (("resident", []),
                       ("offload", ["--max-scenes-hbm", "1"])):
        rc = TR.main([
            "--paths-file", str(two_scene_dir / "paths.yaml"),
            "--crop-size", "32x32",
            "--batch-size", "1",
            "--epochs", "1",
            "--criterion", "huber_only",
            "--splitter", "split_by_step",
            "--save-dir", str(tmp_path / f"logs_{tag}"),
            "--log-freq", "99",
            "--headless-platform", "cpu",
            "--freeze-net",
            "--name", tag,
        ] + extra)
        assert rc == 0
        root = tmp_path / f"logs_{tag}"
        exp = root / os.listdir(root)[0]
        ck = exp / "checkpoints"
        outs[tag] = {
            s: CK.load_checkpoint(
                str(ck / sorted(c for c in os.listdir(ck)
                                if f"best_scene_{s}" in c)[0]))[0]
            for s in ("a", "b")}
    for s in ("a", "b"):
        np.testing.assert_array_equal(
            outs["resident"][s]["texture"], outs["offload"][s]["texture"])
