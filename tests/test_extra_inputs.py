"""Mixed input modalities in the neural pipeline.

Reference: extra (non-uv) rendered inputs are concatenated before the
texture sample at each scale (``READ/models/compose.py:146-156``);
``label_in_input`` substitutes ground-truth labels into rendered label
maps (``READ/datasets/dynamic.py:243-249``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.pipelines import texture_pipeline as TP
from read_tpu.scene import camera


def _scene(rng, n=512, h=32, w=32, b=2):
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    Pm = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    ms = [camera.total_matrix(Pm, np.eye(4)) for _ in range(b)]
    return xyz, np.stack(ms).astype(np.float32)


def test_net_in_channels():
    cfg = TP.PipelineConfig(extra_modes=(("colors",),) * 4)
    assert cfg.net_in_channels == 8 + 3
    cfg = TP.PipelineConfig(extra_modes=(("labels", "colors"),) * 4)
    assert cfg.net_in_channels == 8 + 1 + 3
    assert TP.PipelineConfig().net_in_channels == 8


@pytest.mark.slow
def test_train_step_with_extra_colors(rng):
    n, h, w = 512, 32, 32
    xyz, ms = _scene(rng, n, h, w)
    cfg = TP.PipelineConfig(crop_size=(h, w), vgg_ratio=0.0,
                            huber_ratio=1.0,
                            extra_modes=(("colors",),) * 4)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    rgb = rng.uniform(size=(n, 3)).astype(np.float32)
    batch = {
        "total_m": jnp.asarray(ms),
        "target": jnp.asarray(rng.uniform(size=(2, h, w, 3))
                              .astype(np.float32)),
        "pointcloud": {"rgb": jnp.asarray(rgb)},
    }
    step = TP.make_train_step(net, cfg, None)
    state2, metrics = step(state, jnp.asarray(xyz), batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_label_in_input_substitution(rng):
    """With label_in_input, the labels modality must reflect the GT
    label image (masked by rendered occupancy), not per-point labels."""
    n, h, w = 512, 32, 32
    xyz, ms = _scene(rng, n, h, w, b=1)
    from read_tpu.ops import rasterize as R
    idx, dep = R.rasterize_batch(xyz, ms, h, w)
    pc = {"labels": jnp.asarray(np.full((n,), 7.0, np.float32))}
    gt = jnp.asarray(np.full((1, h, w), 3.0, np.float32))

    cfg = TP.PipelineConfig(label_in_input=True)
    maps = TP._extra_maps(cfg, ("labels",), idx, dep, pc, gt_label=gt)
    m = np.asarray(maps[0])[0, ..., 0]
    occ = np.asarray(idx[0]) >= 0
    assert (m[occ] == 3.0).all()       # GT value, not the per-point 7
    assert (m[~occ] == 0.0).all()

    cfg = TP.PipelineConfig(label_in_input=False)
    maps = TP._extra_maps(cfg, ("labels",), idx, dep, pc, gt_label=gt)
    m = np.asarray(maps[0])[0, ..., 0]
    assert (m[occ] == 7.0).all()       # rendered per-point labels


def test_view_dependent_extra_matches_render_mode(rng):
    """normals_l/r/d as TRAINING inputs (reference feeds them through the
    input-string DSL: ``READ/gl/programs.py:136-158`` +
    ``datasets/dynamic.py:66-99``): the batched ``_extra_maps`` path with
    per-item view matrices must reproduce ``render_modes.render_mode``
    item by item."""
    from read_tpu.ops import rasterize as R
    from read_tpu.ops import render_modes as RM

    n, h, w, b = 512, 32, 32, 3
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    Pm = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    views, ms = [], []
    for i in range(b):
        view = np.eye(4, dtype=np.float32)
        view[0, 3] = 0.4 * i
        view[2, 3] = 0.1 * i
        views.append(view)
        ms.append(camera.total_matrix(Pm, view).astype(np.float32))
    ms = np.stack(ms)
    views = np.stack(views)
    ix, dep = R.rasterize_batch(jnp.asarray(xyz), jnp.asarray(ms), h, w)
    pc = {"xyz": jnp.asarray(xyz), "normals": jnp.asarray(normals)}
    cfg = TP.PipelineConfig(crop_size=(h, w))

    for mode in ("normals_l", "normals_r", "normals_d"):
        got = TP._extra_maps(cfg, (mode,), ix, dep, pc,
                             view_m=jnp.asarray(views))[0]
        for i in range(b):
            want = RM.render_mode(mode, ix[i], dep[i], pc,
                                  view_matrix=views[i])
            np.testing.assert_allclose(np.asarray(got[i]),
                                       np.asarray(want), atol=1e-6)


def test_view_dependent_extra_requires_view_m(rng):
    from read_tpu.ops import rasterize as R
    n, h, w = 128, 16, 16
    xyz, ms = _scene(rng, n, h, w, b=1)
    ix, dep = R.rasterize_batch(jnp.asarray(xyz), jnp.asarray(ms), h, w)
    cfg = TP.PipelineConfig(crop_size=(h, w))
    pc = {"xyz": jnp.asarray(xyz),
          "normals": jnp.asarray(np.ones((n, 3), np.float32))}
    with pytest.raises(ValueError, match="view matrices"):
        TP._extra_maps(cfg, ("normals_d",), ix, dep, pc)


@pytest.mark.slow
def test_train_step_with_view_dependent_extra(rng):
    """A full train step with normals_d in the input pyramid runs and
    produces a finite loss (the former NotImplementedError path)."""
    n, h, w = 512, 32, 32
    xyz, ms = _scene(rng, n, h, w)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    cfg = TP.PipelineConfig(crop_size=(h, w), vgg_ratio=0.0,
                            huber_ratio=1.0,
                            extra_modes=(("normals_d",),) * 4)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    views = np.stack([np.eye(4, dtype=np.float32)] * 2)
    batch = {
        "total_m": jnp.asarray(ms),
        "target": jnp.asarray(rng.uniform(size=(2, h, w, 3))
                              .astype(np.float32)),
        "pointcloud": {"xyz": jnp.asarray(xyz),
                       "normals": jnp.asarray(normals)},
        "view_matrix": jnp.asarray(views),
    }
    step = TP.make_train_step(net, cfg, None)
    state2, metrics = step(state, jnp.asarray(xyz), batch)
    assert np.isfinite(float(metrics["loss"]))
