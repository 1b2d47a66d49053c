"""Segmentation-head and mask-path training coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.ops import rasterize as R
from read_tpu.pipelines import texture_pipeline as TP
from read_tpu.scene import camera


def _scene(rng, n=1500, h=32, w=32, b=2):
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    Pm = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    ms = []
    for i in range(b):
        v = np.eye(4)
        v[0, 3] = 0.2 * i
        ms.append(camera.total_matrix(Pm, v).astype(np.float32))
    return xyz, np.stack(ms)


@pytest.mark.slow
def test_seg_head_trains(rng):
    xyz, ms = _scene(rng)
    targets = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)
    cfg = TP.PipelineConfig(crop_size=(32, 32), vgg_ratio=0.0,
                            huber_ratio=1.0, num_classes=5,
                            seg_ratio=1.0)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg,
                                 n_points=xyz.shape[0])
    step = TP.make_train_step(net, cfg, None)
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(targets),
             "label": jnp.asarray(labels)}
    state, metrics = step(state, jnp.asarray(xyz), batch)
    assert "seg_loss" in metrics
    assert np.isfinite(float(metrics["seg_loss"]))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_mask_and_background_loss(rng):
    xyz, ms = _scene(rng)
    targets = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    mask = np.ones((2, 32, 32, 1), np.float32)
    mask[:, :16] = 0.0
    cfg = TP.PipelineConfig(crop_size=(32, 32), vgg_ratio=0.0,
                            huber_ratio=1.0, use_mask=True,
                            masked_background=True)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg,
                                 n_points=xyz.shape[0])
    step = TP.make_train_step(net, cfg, None)
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(targets),
             "mask": jnp.asarray(mask)}
    state, metrics = step(state, jnp.asarray(xyz), batch)
    assert np.isfinite(float(metrics["loss"]))
    # background term + renormalization make the masked loss larger than
    # the unmasked huber alone
    assert float(metrics["loss"]) > float(metrics["huber_loss"])


@pytest.mark.slow
def test_reg_loss_contributes(rng):
    xyz, ms = _scene(rng, b=1)
    targets = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(targets)}
    losses = {}
    for rw in (0.0, 10.0):
        cfg = TP.PipelineConfig(crop_size=(32, 32), vgg_ratio=0.0,
                                huber_ratio=1.0, reg_weight=rw)
        state, net = TP.create_state(jax.random.PRNGKey(0), cfg,
                                     n_points=xyz.shape[0])
        step = TP.make_train_step(net, cfg, None)
        _, metrics = step(state, jnp.asarray(xyz), batch)
        losses[rw] = float(metrics["loss"])
    assert losses[10.0] > losses[0.0]
