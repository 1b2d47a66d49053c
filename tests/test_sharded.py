"""Multi-chip sharding tests on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from read_tpu.ops import rasterize as R
from read_tpu.parallel import sharded as S
from read_tpu.pipelines import texture_pipeline as TP
from read_tpu.scene import camera


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _scene(rng, n=1024, h=32, w=32, b=4):
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 6.0
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    Pm = camera.gl_projection(K, (w, h), znear=0.1, zfar=50.0)
    ms = []
    for i in range(b):
        view = np.eye(4)
        view[0, 3] = 0.15 * i
        ms.append(camera.total_matrix(Pm, view))
    return xyz, np.stack(ms).astype(np.float32)


def test_sharded_raster_matches_single(rng):
    """Cross-shard z-merge must reproduce the single-device result."""
    n, h, w, b = 1024, 32, 32, 2
    xyz, ms = _scene(rng, n, h, w, b)
    mesh = S.make_mesh(1, 4)
    idx_ref, dep_ref = R.rasterize_batch(xyz, ms, h, w)

    def body(xyz_local, total_m):
        off = (jax.lax.axis_index("points") *
               xyz_local.shape[0]).astype(jnp.int32)
        return S._local_raster_merge(xyz_local, off, total_m, h, w, 0,
                                     "points")

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("points", None), P()),
                  out_specs=(P(), P()), check_vma=False)
    xyz_s = jax.device_put(jnp.asarray(xyz),
                           NamedSharding(mesh, P("points", None)))
    idx, dep = jax.jit(f)(xyz_s, jnp.asarray(ms))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(dep), np.asarray(dep_ref),
                               atol=1e-6)


def test_sharded_gather_matches_single(rng):
    from read_tpu.models import texture as T
    n, c = 1024, 8
    table = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(-1, n, size=(2, 16, 16)), jnp.int32)
    ref = T.sample_point_texture(table, idx)
    mesh = S.make_mesh(1, 4)

    def body(table_local, idx):
        off = (jax.lax.axis_index("points") *
               table_local.shape[0]).astype(jnp.int32)
        return S.sharded_gather(table_local, off, idx)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("points", None), P()),
                  out_specs=P(), check_vma=False)
    table_s = jax.device_put(table, NamedSharding(mesh, P("points", None)))
    out = jax.jit(f)(table_s, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)


def test_sharded_train_step_runs(rng):
    """One sharded step on a (2 data x 4 points) mesh executes, updates
    state, and produces finite metrics."""
    n, h, w = 2048, 32, 32
    xyz, ms = _scene(rng, n, h, w, b=4)
    targets = rng.uniform(size=(4, h, w, 3)).astype(np.float32)
    mesh = S.make_mesh(2, 4)
    cfg = TP.PipelineConfig(crop_size=(h, w), vgg_ratio=0.0,
                            huber_ratio=1.0)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    state = S.shard_state(mesh, state)
    xyz_s, tex_s = S.shard_scene(mesh, xyz, state.texture)
    state = state.replace(texture=tex_s)
    data_sh = NamedSharding(mesh, P("data"))
    batch = {
        "total_m": jax.device_put(jnp.asarray(ms), data_sh),
        "target": jax.device_put(jnp.asarray(targets), data_sh),
    }
    step = S.make_sharded_train_step(net, cfg, None, mesh)
    state2, metrics = step(state, xyz_s, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # texture must change and stay sharded
    assert float(jnp.abs(state2.texture - state.texture).max()) > 0
    state3, metrics = step(state2, xyz_s, batch)
    assert int(state3.step) == 2


def test_sharded_matches_unsharded_losses(rng):
    """With points-only sharding (data axis = 1, so BatchNorm sees the
    identical batch — under data>1 the per-replica BN statistics
    legitimately differ, exactly like torch DataParallel), the sharded
    step's loss must equal the single-device step's loss."""
    n, h, w = 1024, 32, 32
    xyz, ms = _scene(rng, n, h, w, b=2)
    targets = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
    cfg = TP.PipelineConfig(crop_size=(h, w), vgg_ratio=0.0,
                            huber_ratio=1.0)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(targets)}
    single = TP.make_train_step(net, cfg, None)
    _, m_single = single(state, jnp.asarray(xyz), batch)

    mesh = S.make_mesh(1, 4)
    state_s = S.shard_state(mesh, state)
    xyz_s, tex_s = S.shard_scene(mesh, xyz, state_s.texture)
    state_s = state_s.replace(texture=tex_s)
    data_sh = NamedSharding(mesh, P("data"))
    batch_s = {k: jax.device_put(v, data_sh) for k, v in batch.items()}
    sharded = S.make_sharded_train_step(net, cfg, None, mesh)
    _, m_sharded = sharded(state_s, xyz_s, batch_s)
    assert abs(float(m_single["loss"]) - float(m_sharded["loss"])) < 1e-4


def test_sharded_extra_modes_matches_unsharded(rng):
    """Extra input modalities (colors + depth interleaved with the
    descriptor pyramid) with points-sharded attribute tables must
    reproduce the single-device loss exactly (owned-row gather + psum,
    ``sharded.sharded_extra_maps``)."""
    n, h, w = 1024, 32, 32
    xyz, ms = _scene(rng, n, h, w, b=2)
    targets = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
    rgb = rng.uniform(size=(n, 3)).astype(np.float32)
    cfg = TP.PipelineConfig(
        crop_size=(h, w), vgg_ratio=0.0, huber_ratio=1.0,
        extra_modes=(("colors", "depth"),) * 4)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(targets),
             "pointcloud": {"rgb": jnp.asarray(rgb)}}
    single = TP.make_train_step(net, cfg, None)
    _, m_single = single(state, jnp.asarray(xyz), batch)

    mesh = S.make_mesh(1, 4)
    state_s = S.shard_state(mesh, state)
    xyz_s, tex_s = S.shard_scene(mesh, xyz, state_s.texture)
    state_s = state_s.replace(texture=tex_s)
    data_sh = NamedSharding(mesh, P("data"))
    batch_s = {k: jax.device_put(v, data_sh)
               for k, v in batch.items() if k != "pointcloud"}
    pc_s = S.shard_pointcloud_attrs(mesh, {"rgb": rgb})
    sharded = S.make_sharded_train_step(net, cfg, None, mesh)
    _, m_sharded = sharded(state_s, xyz_s, batch_s, pc_s)
    assert abs(float(m_single["loss"]) - float(m_sharded["loss"])) < 1e-4


def test_split_step_matches_replicated(rng):
    """The ``unet='split'`` step (UNet under GSPMD over the whole mesh)
    must reproduce the round-4 ``unet='replicated'`` step: identical
    loss, identical raw texture/param gradients (exposed via identity
    optimizers), and strictly fewer per-device UNet FLOPs. Guards the
    shard_map unreplicate-transpose 1/p cotangent fix
    (``sharded._unreplicate_fix``)."""
    import optax

    n, h, w = 1024, 32, 32
    xyz, ms = _scene(rng, n, h, w, b=2)
    targets = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
    cfg = TP.PipelineConfig(crop_size=(h, w), vgg_ratio=0.0,
                            huber_ratio=1.0)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    mesh = S.make_mesh(1, 4)
    state_s = S.shard_state(mesh, state)
    xyz_s, tex_s = S.shard_scene(mesh, xyz, state_s.texture)
    state_s = state_s.replace(texture=tex_s)
    data_sh = NamedSharding(mesh, P("data"))
    batch_s = {"total_m": jax.device_put(jnp.asarray(ms), data_sh),
               "target": jax.device_put(jnp.asarray(targets), data_sh)}

    orig = TP._make_optimizers
    TP._make_optimizers = lambda cfg: (optax.sgd(1.0), optax.sgd(1.0))
    try:
        out = {}
        for mode in ("replicated", "split"):
            step = S.make_sharded_train_step(net, cfg, None, mesh,
                                             unet=mode)
            s2, m = step(state_s, xyz_s, batch_s)
            out[mode] = (np.asarray(s2.texture),
                         jax.tree.map(np.asarray, s2.params),
                         float(m["loss"]))
    finally:
        TP._make_optimizers = orig

    tex_r, par_r, loss_r = out["replicated"]
    tex_s_, par_s, loss_s = out["split"]
    assert abs(loss_r - loss_s) < 1e-4
    np.testing.assert_allclose(tex_r, tex_s_, atol=2e-5)
    for a, b in zip(jax.tree.leaves(par_r), jax.tree.leaves(par_s)):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_split_step_fewer_flops_per_device(rng):
    """On a (1, 4) mesh the split step's per-device FLOPs must be well
    below the replicated step's (which runs the whole UNet+loss graph
    on every points-shard)."""
    n, h, w = 1024, 32, 32
    xyz, ms = _scene(rng, n, h, w, b=4)
    targets = rng.uniform(size=(4, h, w, 3)).astype(np.float32)
    cfg = TP.PipelineConfig(crop_size=(h, w), vgg_ratio=0.0,
                            huber_ratio=1.0)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    mesh = S.make_mesh(1, 4)
    state_s = S.shard_state(mesh, state)
    xyz_s, tex_s = S.shard_scene(mesh, xyz, state_s.texture)
    state_s = state_s.replace(texture=tex_s)
    data_sh = NamedSharding(mesh, P("data"))
    batch_s = {"total_m": jax.device_put(jnp.asarray(ms), data_sh),
               "target": jax.device_put(jnp.asarray(targets), data_sh)}

    flops = {}
    for mode in ("replicated", "split"):
        step = S.make_sharded_train_step(net, cfg, None, mesh, unet=mode)
        lowered = step.lower(state_s, xyz_s, batch_s)
        cost = lowered.compile().cost_analysis()
        flops[mode] = cost.get("flops", 0.0)
    # per-device: cost_analysis reports per-program (per-device) flops;
    # split spreads the UNet over 4 devices, so expect a >=2x drop.
    assert flops["split"] < flops["replicated"] / 2.0, flops


def test_sharded_view_dependent_extra_matches_unsharded(rng):
    """View-dependent extra modes (normals_d) with points-sharded
    xyz/normals tables + per-item view matrices must reproduce the
    single-device loss (``sharded_extra_maps`` view-dep branch)."""
    n, h, w = 1024, 32, 32
    xyz, ms = _scene(rng, n, h, w, b=2)
    targets = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    views = []
    for i in range(2):
        v = np.eye(4, dtype=np.float32)
        v[0, 3] = 0.15 * i
        views.append(v)
    views = np.stack(views)
    cfg = TP.PipelineConfig(
        crop_size=(h, w), vgg_ratio=0.0, huber_ratio=1.0,
        extra_modes=(("normals_d", "normals_l"),) * 4)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(targets),
             "view_matrix": jnp.asarray(views),
             "pointcloud": {"xyz": jnp.asarray(xyz),
                            "normals": jnp.asarray(normals)}}
    single = TP.make_train_step(net, cfg, None)
    _, m_single = single(state, jnp.asarray(xyz), batch)

    mesh = S.make_mesh(1, 4)
    state_s = S.shard_state(mesh, state)
    xyz_s, tex_s = S.shard_scene(mesh, xyz, state_s.texture)
    state_s = state_s.replace(texture=tex_s)
    data_sh = NamedSharding(mesh, P("data"))
    batch_s = {k: jax.device_put(v, data_sh)
               for k, v in batch.items() if k != "pointcloud"}
    pc_s = S.shard_pointcloud_attrs(mesh, {"xyz": xyz,
                                           "normals": normals})
    sharded = S.make_sharded_train_step(net, cfg, None, mesh)
    _, m_sharded = sharded(state_s, xyz_s, batch_s, pc_s)
    assert abs(float(m_single["loss"]) - float(m_sharded["loss"])) < 1e-4


def test_sharded_mesh_texture_matches_unsharded(rng):
    """--use-mesh under --mesh: replicated 2D tables sampled in stage 2
    with uv maps gathered from the points-sharded uv2d attribute must
    reproduce the single-device mesh-texture step — loss AND the
    updated texture tables (the GSPMD all-reduce of table grads must
    equal the single-chip scatter)."""
    n, h, w = 1024, 32, 32
    xyz, ms = _scene(rng, n, h, w, b=2)
    targets = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
    uv2d = rng.uniform(size=(n, 2)).astype(np.float32)
    cfg = TP.PipelineConfig(crop_size=(h, w), vgg_ratio=0.0,
                            huber_ratio=1.0, use_mesh=True,
                            texture_size=64, reg_weight=1e-2)
    state, net = TP.create_state(jax.random.PRNGKey(0), cfg, n_points=n)
    batch = {"total_m": jnp.asarray(ms), "target": jnp.asarray(targets),
             "uv2d": jnp.asarray(uv2d)}
    single = TP.make_train_step(net, cfg, None)
    s1, m_single = single(state, jnp.asarray(xyz), batch)

    mesh = S.make_mesh(1, 4)
    state_s = S.prepare_scene_state(mesh, state)
    xyz_s = S.shard_points(mesh, xyz)
    data_sh = NamedSharding(mesh, P("data"))
    batch_s = {"total_m": jax.device_put(jnp.asarray(ms), data_sh),
               "target": jax.device_put(jnp.asarray(targets), data_sh)}
    pc_s = S.shard_pointcloud_attrs(mesh, {"uv2d": uv2d})
    sharded = S.make_sharded_train_step(net, cfg, None, mesh)
    s2, m_sharded = sharded(state_s, xyz_s, batch_s, pc_s)

    assert abs(float(m_single["loss"]) - float(m_sharded["loss"])) < 1e-4
    s2u = S.unshard_state(s2, n)
    for a, b in zip(jax.tree.leaves(s1.texture),
                    jax.tree.leaves(s2u.texture)):
        # atol: RMSprop's rsqrt amplifies f32 reduction-order noise on
        # near-zero second moments (observed max ~1.3e-3 on 0.02% of
        # elements); the loss equality above pins the forward path
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)
