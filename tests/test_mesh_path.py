"""Mesh-texture path of TexturePipeline (+ VGGLossMix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.criterions import vgg as V
from read_tpu.pipelines import texture_pipeline as TP
from read_tpu.scene import camera


@pytest.mark.slow
def test_mesh_texture_pipeline_trains(rng):
    n, h, w = 1500, 32, 32
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    uv2d = rng.uniform(0.05, 0.95, size=(n, 2)).astype(np.float32)
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    Pm = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    m = camera.total_matrix(Pm, np.eye(4)).astype(np.float32)
    target = rng.uniform(size=(1, h, w, 3)).astype(np.float32)

    cfg = TP.PipelineConfig(crop_size=(h, w), vgg_ratio=0.0,
                            huber_ratio=1.0, use_mesh=True,
                            texture_size=16)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    assert isinstance(state.texture, tuple) and len(state.texture) == 4
    assert state.texture[0].shape == (16, 16, 8)

    step = TP.make_train_step(net, cfg, None)
    batch = {"total_m": jnp.asarray(m[None]),
             "target": jnp.asarray(target),
             "uv2d": jnp.asarray(uv2d)}
    losses = []
    for _ in range(15):
        state, metrics = step(state, jnp.asarray(xyz), batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # mesh tables actually received gradient
    assert float(jnp.abs(state.texture[0]).max()) > 0


def test_vgg_loss_mix(rng):
    p1 = V.random_vgg_params(seed=0)
    p2 = V.random_vgg_params(seed=1)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    mix = float(V.vgg_loss_mix(p1, p2, x, y, weight=0.5))
    a = float(V.vgg_loss(p1, x, y, "pytorch"))
    b = float(V.vgg_loss(p2, x, y, "caffe"))
    assert abs(mix - 0.5 * (a + b)) < 1e-3
