"""Pix2Pix and RGBTexture pipeline tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.ops import rasterize as R
from read_tpu.pipelines import pix2pix_pipeline as PX
from read_tpu.pipelines import rgb_texture_pipeline as RT
from read_tpu.pipelines import texture_pipeline as TP
from read_tpu.scene import camera


def _scene(rng, n=2000, h=32, w=32, b=2):
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    Pm = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    ms, tgts = [], []
    for i in range(b):
        view = np.eye(4)
        view[0, 3] = 0.2 * i
        m = camera.total_matrix(Pm, view).astype(np.float32)
        idx, _ = R.rasterize_reference(xyz, m, h, w)
        img = np.zeros((h, w, 3), np.float32)
        img[idx >= 0] = colors[idx[idx >= 0]]
        ms.append(m)
        tgts.append(img)
    return xyz, colors, np.stack(ms), np.stack(tgts)


@pytest.mark.slow
def test_pix2pix_converges(rng):
    xyz, colors, ms, tgts = _scene(rng)
    cfg = TP.PipelineConfig(crop_size=(32, 32), vgg_ratio=0.0,
                            huber_ratio=1.0)
    state, net, opt = PX.create_pix2pix_state(jax.random.PRNGKey(0), cfg,
                                              in_channels=3)
    pc = {"rgb": colors}
    step = PX.make_pix2pix_step(net, cfg, opt, None, pc, mode="colors")
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(tgts)}
    losses = []
    st = state
    for _ in range(25):
        st, metrics = step(st, jnp.asarray(xyz), batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses[::6]
    assert int(st["step"]) == 25


def test_rgb_texture_fits(rng):
    # Fit a mesh texture: points with uv = grid positions; targets are a
    # smooth uv-dependent image, so the texture must converge toward it.
    n, h, w = 1500, 32, 32
    xyz, colors, ms, _ = _scene(rng, n=n, h=h, w=w, b=1)
    uv2d = rng.uniform(0.05, 0.95, size=(n, 2)).astype(np.float32)
    # target color = f(uv)
    point_col = np.stack([uv2d[:, 0], uv2d[:, 1],
                          1 - uv2d[:, 0]], 1).astype(np.float32)
    idx, _ = R.rasterize_reference(xyz, ms[0], h, w)
    tgt = np.zeros((h, w, 3), np.float32)
    tgt[idx >= 0] = point_col[idx[idx >= 0]]
    pc = {"uv2d": uv2d}
    state, opt = RT.create_rgb_texture_state(jax.random.PRNGKey(0),
                                             texture_size=32, lr=5e-2)
    step = RT.make_rgb_texture_step(opt, pc, h, w)
    batch = {"total_m": jnp.asarray(ms),
             "target": jnp.asarray(tgt[None])}
    st = state
    losses = []
    for _ in range(40):
        st, metrics = step(st, jnp.asarray(xyz), batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_multiscale_inputs_grouping(rng):
    xyz, colors, ms, _ = _scene(rng, b=1)
    levels = R.rasterize_pyramid_pooled(xyz, jnp.asarray(ms), (32, 32), 4)
    pyr = PX.multiscale_inputs(["colors"] * 4, levels, {"rgb": colors},
                               input_modality=1)
    assert len(pyr) == 4
    assert pyr[0].shape == (1, 32, 32, 3)
    assert pyr[3].shape == (1, 4, 4, 3)


def test_raster_method_threads_through_pyramid(rng):
    """cfg.raster_method drives _build_pyramid; scatter1 matches sort
    exactly when depths are separated by more than a quantization bin
    (ops/rasterize._zbuffer_scatter1 semantics)."""
    n, h, w = 500, 32, 32
    xyz, _, ms, _ = _scene(rng, n=n, h=h, w=w, b=1)
    # spread depths so no two points share a 2^-db bin
    xyz[:, 2] = -4.0 - 8.0 * np.arange(n) / n
    tex = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    m = jnp.asarray(ms)
    out = {}
    for method in ("sort", "scatter1"):
        cfg = TP.PipelineConfig(crop_size=(h, w), raster_method=method)
        pyr = TP._build_pyramid(cfg, tex, jnp.asarray(xyz), m)
        out[method] = pyr
    assert TP.config_from_dict(
        {"raster_method": "scatter1"}).raster_method == "scatter1"
    for a, b in zip(out["sort"], out["scatter1"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
