"""Round-4 plumbing tests: criterion backends actually switch, freeze-net
trains only textures, crop-by-mask biases crop centers, raster-method
validation fails loudly, scatter1 power-of-two key edge case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.criterions import vgg as V
from read_tpu.ops import rasterize as R
from read_tpu.pipelines import texture_pipeline as TP


# ---------------------------------------------------------------- criteria

def _loss_for(criterion, rng):
    cfg = TP.config_from_dict({"criterion": criterion},
                              crop_size=(32, 32))
    params = V.random_vgg_params()
    pred = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    loss, metrics = TP._losses(cfg, params,
                               {"im_out": pred}, {"target": tgt})
    return float(metrics["vgg_loss"])


def test_criteria_produce_different_vgg_losses(rng):
    """vgg / vgg_pytorch / vgg_mix must differ on the same batch (the
    round-3 dead-knob finding: the choice silently did nothing)."""
    caffe = _loss_for("vgg", rng)
    rng = np.random.default_rng(0)
    pytorch = _loss_for("vgg_pytorch", rng)
    rng = np.random.default_rng(0)
    mix = _loss_for("vgg_mix", rng)
    assert caffe != pytorch
    assert mix != caffe and mix != pytorch
    # mix is the 0.5/0.5 blend of the other two (same weight set)
    assert abs(mix - 0.5 * (caffe + pytorch)) < 1e-3 * abs(mix)


def test_config_backend_mapping():
    assert TP.config_from_dict({"criterion": "vgg"}).vgg_backend == "caffe"
    assert TP.config_from_dict(
        {"criterion": "vgg_pytorch"}).vgg_backend == "pytorch"
    assert TP.config_from_dict(
        {"criterion": "vgg_mix"}).vgg_backend == "mix"
    with pytest.raises(ValueError):
        TP.config_from_dict({"criterion": "vgg_typo"})


def test_vgg_loss_mix_per_item(rng):
    params = V.random_vgg_params()
    pred = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
    per = V.vgg_loss_mix(params, params, pred, tgt, per_item=True)
    assert per.shape == (3,)
    mean = V.vgg_loss_mix(params, params, pred, tgt)
    assert abs(float(jnp.mean(per)) - float(mean)) < 1e-4


# ------------------------------------------------------------- freeze-net

def test_freeze_net_trains_only_texture(rng):
    cfg = TP.PipelineConfig(crop_size=(32, 32), vgg_ratio=0.0,
                            huber_ratio=1.0)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=256)
    xyz = rng.uniform(-2, 2, size=(256, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    from read_tpu.scene import camera
    K = np.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1]])
    P = camera.gl_projection(K, (32, 32), 0.1, 50.0)
    total_m = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]
    batch = {"total_m": jnp.asarray(total_m),
             "target": jnp.asarray(
                 rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))}
    step = TP.make_train_step(net, cfg, None, freeze_net=True)
    new_state, metrics = step(state, jnp.asarray(xyz), batch)
    # net untouched: params, batch_stats, net optimizer state all equal
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.net_opt),
                    jax.tree.leaves(new_state.net_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # texture DID move
    assert not np.allclose(np.asarray(state.texture),
                           np.asarray(new_state.texture))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


# ----------------------------------------------------------- crop-by-mask

def _mini_dataset(crop_by_mask, tmp_path, rng):
    import cv2
    from read_tpu.data.dataset import ViewDataset
    h_src, w_src = 128, 192
    img = (rng.uniform(size=(h_src, w_src, 3)) * 255).astype(np.uint8)
    # mask foreground: a blob in the top-left corner
    mask = np.zeros((h_src, w_src), np.uint8)
    mask[8:40, 8:48] = 255
    tdir = tmp_path / f"cbm_{crop_by_mask}"
    tdir.mkdir()
    tpath, mpath = str(tdir / "t.png"), str(tdir / "m.png")
    cv2.imwrite(tpath, img)
    cv2.imwrite(mpath, mask)
    scene_data = {
        "intrinsic_matrix": np.array([[100.0, 0, w_src / 2],
                                      [0, 100.0, h_src / 2], [0, 0, 1]]),
        "config": {"viewport_size": (w_src, h_src)},
        "pointcloud": {"xyz": np.zeros((8, 3), np.float32)},
    }
    return ViewDataset(
        "train", scene_data, (32, 32), [np.eye(4)], [tpath],
        mask_list=[mpath], inner_batch=4, inner_sample=1,
        random_zoom=(1.0, 1.0), random_shift=(0.0, 1.0),
        crop_by_mask=crop_by_mask, seed=3)


def test_crop_by_mask_biases_centers(tmp_path, rng):
    """With crop_by_mask, crops must overwhelmingly contain mask
    foreground; without, uniform shifts mostly miss the small blob."""
    hits = {}
    for flag in (False, True):
        ds = _mini_dataset(flag, tmp_path, rng)
        fg = 0
        total = 0
        for i in range(6):
            item = ds[0]
            fg += float(item["mask"].sum())
            total += float(np.prod(item["mask"].shape))
        hits[flag] = fg / total
    assert hits[True] > 4 * hits[False] + 0.05, hits


# --------------------------------------------------- raster-method checks

def test_unknown_raster_method_raises():
    xyz = np.zeros((4, 3), np.float32)
    m = np.eye(4, dtype=np.float32)
    with pytest.raises(ValueError, match="unknown raster method"):
        R.rasterize(jnp.asarray(xyz), jnp.asarray(m), 8, 8,
                    method="scatter2")
    with pytest.raises(ValueError, match="unknown raster method"):
        TP.config_from_dict({"raster_method": "scatter2"})


def test_scatter1_power_of_two_far_plane(rng):
    """n_ids an exact power of two + depth at the far plane: the packed
    key must stay below the INT32_MAX empty sentinel (ADVICE r3 #2)."""
    n = 1024  # power of two -> idb bits fully used
    h = w = 8
    # all points at the same pixel, depths spanning to the far plane
    pix = jnp.zeros((n,), jnp.int32)
    depth = jnp.linspace(0.5, 1.0, n)  # last point exactly 1.0
    ids = jnp.arange(n, dtype=jnp.int32)
    idx, dep = R._zbuffer_scatter1(pix, depth, ids, h * w, depth, n)
    assert int(idx[0]) == 0  # nearest point wins
    # now ONLY far-plane points: pixel must still read covered, not empty
    depth_far = jnp.full((n,), 1.0)
    idx2, dep2 = R._zbuffer_scatter1(pix, depth_far, ids, h * w,
                                     depth_far, n)
    assert int(idx2[0]) >= 0, "far-plane covered pixel read as empty"
    assert float(dep2[0]) == 1.0  # exact re-gathered depth


def test_vgg_ens_criterion(rng):
    """vgg_ens averages K independent random-VGG losses (variance
    reduction for the no-pretrained-weights fallback) and differs from
    the single-seed criterion."""
    cfg = TP.config_from_dict({"criterion": "vgg_ens"},
                              crop_size=(32, 32))
    assert cfg.vgg_ensemble == 3
    params = [V.random_vgg_params(s) for s in range(3)]
    pred = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    loss, metrics = TP._losses(cfg, params,
                               {"im_out": pred}, {"target": tgt})
    ens = float(metrics["vgg_loss"])
    singles = [float(V.vgg_loss(p, pred, tgt)) for p in params]
    assert abs(ens - np.mean(singles)) < 1e-3 * abs(ens)
    assert ens != singles[0]


def test_temporal_average_shifts_input_pyramid(rng):
    """--temporal-average (compose.py:167-171): item i's input pyramid
    averages with item i-1's; row 0 keeps itself. Verified by feeding a
    batch whose items come in identical pairs — with averaging, output
    rows 2k+1 must equal a forward of the same view alone, and a batch
    of DISTINCT views must change outputs vs no averaging."""
    from read_tpu.scene import camera

    n, h, w = 512, 32, 32
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    Pm = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    ms = []
    for dx in (0.0, 0.0, 0.4, 0.4):  # two identical pairs
        view = np.eye(4)
        view[0, 3] = dx
        ms.append(camera.total_matrix(Pm, view))
    ms = jnp.asarray(np.stack(ms).astype(np.float32))

    cfg = TP.config_from_dict({"temporal_average": True},
                              crop_size=(h, w))
    assert cfg.temporal_average
    cfg_off = TP.config_from_dict({}, crop_size=(h, w))
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg,
                                 n_points=n)

    out_avg, _, _ = TP._forward(net, cfg, state.params,
                                state.batch_stats, state.texture,
                                jnp.asarray(xyz), ms, train=False)
    out_off, _, _ = TP._forward(net, cfg_off, state.params,
                                state.batch_stats, state.texture,
                                jnp.asarray(xyz), ms, train=False)
    a, b = np.asarray(out_avg["im_out"]), np.asarray(out_off["im_out"])
    # identical-pair rows: averaging two equal pyramids is a no-op
    np.testing.assert_allclose(a[1], b[1], atol=1e-5)
    # row 0 keeps itself by construction
    np.testing.assert_allclose(a[0], b[0], atol=1e-5)
    # row 2 averages view B with view A -> must differ from plain B
    assert np.abs(a[2] - b[2]).max() > 1e-4
