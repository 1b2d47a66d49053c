"""End-to-end training slice: overfit a tiny synthetic scene.

The READ capability under test: jointly fit the UNet + per-point neural
descriptors so rendered views match targets (reference ``train.py``
run_epoch behavior), as one fused jitted step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from read_tpu.ops import rasterize as R
from read_tpu.pipelines import texture_pipeline as P
from read_tpu.scene import camera


def _toy_scene(rng, n=3000, h=64, w=64, n_views=3):
    """Colored point cloud + camera ring; targets = point-color splats."""
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
    Pm = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    total_ms, targets = [], []
    for i in range(n_views):
        view = np.eye(4)
        view[0, 3] = 0.3 * i
        m = camera.total_matrix(Pm, view).astype(np.float32)
        idx, _ = R.rasterize_reference(xyz, m, h, w)
        img = np.zeros((h, w, 3), np.float32)
        img[idx >= 0] = colors[idx[idx >= 0]]
        total_ms.append(m)
        targets.append(img)
    return xyz, np.stack(total_ms), np.stack(targets)


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(3)
    xyz, ms, targets = _toy_scene(rng)
    cfg = P.PipelineConfig(crop_size=(64, 64), vgg_ratio=0.0,
                           huber_ratio=1.0, texture_lr=5e-2)
    state, net = P.create_state(jax.random.PRNGKey(0), cfg,
                                n_points=xyz.shape[0])
    train_step = P.make_train_step(net, cfg, vgg_params=None)
    eval_step = P.make_eval_step(net, cfg, vgg_params=None)
    xyz_j = jnp.asarray(xyz)
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(targets)}
    hist = []
    for i in range(80):
        state, metrics = train_step(state, xyz_j, batch)
        hist.append(float(metrics["loss"]))
    return state, net, cfg, xyz_j, batch, hist, eval_step


def test_loss_decreases(fitted):
    *_, hist, _ = fitted
    assert hist[-1] < hist[0] * 0.5, (hist[0], hist[-1])


def test_psnr_improves(fitted):
    state, net, cfg, xyz, batch, hist, eval_step = fitted
    img, metrics = eval_step(state, xyz, batch)
    assert img.shape == batch["target"].shape
    # eval metrics are per-item [B] vectors (padding-free batched val)
    assert metrics["psnr"].shape == (batch["target"].shape[0],)
    assert float(jnp.mean(metrics["psnr"])) > 8.5
    assert 0.0 <= float(jnp.mean(metrics["ssim"])) <= 1.0


def test_batch_stats_advance(fitted):
    state, *_ = fitted
    assert int(state.step) == 80
    leaves = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_texture_actually_trained(fitted):
    state, *_ = fitted
    # texture started at zeros; after fitting it must be non-trivial
    assert float(jnp.abs(state.texture).max()) > 1e-3


def test_plateau_scheduler():
    sched = P.ReduceLROnPlateau(factor=0.5, patience=2)
    assert sched.step(1.0) == 1.0     # improves (first)
    assert sched.step(0.9) == 1.0     # improves
    assert sched.step(0.95) == 1.0    # bad 1
    assert sched.step(0.95) == 1.0    # bad 2
    assert sched.step(0.95) == 0.5    # bad 3 > patience -> drop
    assert sched.step(0.1) == 0.5     # improvement keeps scale
