"""Point/mesh texture sampling and gradient tests."""

import jax
import jax.numpy as jnp
import numpy as np

from read_tpu.models import texture as T


def test_point_texture_gather(rng):
    table = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
    idx = jnp.array([[[0, 3], [9, -1]]], jnp.int32)  # [1,2,2]
    out = T.sample_point_texture(table, idx)
    assert out.shape == (1, 2, 2, 4)
    np.testing.assert_allclose(out[0, 0, 0], table[0])
    np.testing.assert_allclose(out[0, 0, 1], table[3])
    np.testing.assert_allclose(out[0, 1, 0], table[9])
    np.testing.assert_allclose(out[0, 1, 1], np.zeros(4))  # empty -> zeros


def test_point_texture_grad_is_scatter_add(rng):
    # The backward of the gather must scatter-add cotangents per point;
    # empty pixels (-1) must contribute nothing (incl. to point 0).
    table = jnp.zeros((5, 2), jnp.float32)
    idx = jnp.array([[[1, 1], [2, -1]]], jnp.int32)

    def loss(t):
        s = T.sample_point_texture(t, idx)
        return jnp.sum(s * 2.0)

    g = jax.grad(loss)(table)
    expect = np.zeros((5, 2), np.float32)
    expect[1] = 4.0  # two pixels gathered point 1, d/dt (2t) each = 2
    expect[2] = 2.0
    np.testing.assert_allclose(np.asarray(g), expect)


def test_point_texture_activations(rng):
    table = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    idx = jnp.array([[[0, 1]]], jnp.int32)
    s = T.sample_point_texture(table, idx, activation="sigmoid")
    np.testing.assert_allclose(
        np.asarray(s[0, 0, 0]),
        1.0 / (1.0 + np.exp(-np.asarray(table[0]))), atol=1e-5)
    t = T.sample_point_texture(table, idx, activation="tanh")
    np.testing.assert_allclose(
        np.asarray(t[0, 0, 1]), np.tanh(np.asarray(table[1])), atol=1e-5)


def test_reg_loss():
    table = jnp.ones((8, 2), jnp.float32) * 2.0
    assert float(T.point_texture_reg_loss(table, 0.5)) == 2.0


def test_mesh_texture_levels_and_sum():
    tables = T.init_mesh_texture(None, size=8, n_channels=2, levels=3)
    assert [t.shape for t in tables] == [(8, 8, 2), (4, 4, 2), (2, 2, 2)]
    # constant tables -> sample anywhere inside = sum of constants
    tables = [jnp.full_like(t, i + 1.0) for i, t in enumerate(tables)]
    uv = jnp.array([[[0.5, 0.5], [0.25, 0.75]]])
    out = T.sample_mesh_texture(tables, uv)
    np.testing.assert_allclose(np.asarray(out), 6.0, rtol=1e-5)


def test_mesh_texture_bilinear_matches_torch_grid_sample(rng):
    torch = __import__("pytest").importorskip("torch")
    import torch.nn.functional as F
    tex = rng.normal(size=(1, 3, 6, 6)).astype(np.float32)
    uv01 = rng.uniform(0, 1, size=(1, 4, 5, 2)).astype(np.float32)
    grid = torch.from_numpy(uv01 * 2 - 1)
    ref = F.grid_sample(torch.from_numpy(tex), grid, mode="bilinear",
                        align_corners=False).numpy()  # [1,3,4,5]
    ours = T.sample_mesh_texture(
        [jnp.asarray(tex[0].transpose(1, 2, 0))], jnp.asarray(uv01))
    np.testing.assert_allclose(
        np.asarray(ours), ref[0].transpose(1, 2, 0)[None], atol=1e-5)
