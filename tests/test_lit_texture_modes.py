"""Oracle tests for the last NNScene submodes: Blinn-Phong lighting and
2D texture sampling (reference GLSL ``READ/gl/programs.py:228-246,
253-255``), checked against an independent numpy shader.
"""

import numpy as np
import jax.numpy as jnp

from read_tpu.ops import render_modes as RM


def _numpy_blinn_phong(xyz, normals, view_matrix, light):
    """Literal transcription of the fragment shader ``lightning()`` +
    the live ``use_light`` compositing."""
    vm = np.linalg.inv(view_matrix)
    out = []
    for p, n in zip(xyz, normals):
        pv = (vm[:3, :3] @ p) + vm[:3, 3]
        nv = vm[:3, :3] @ n
        nv = nv / max(np.linalg.norm(nv), 1e-9)
        ld = light - pv
        ld = ld / max(np.linalg.norm(ld), 1e-9)
        lamb = max(float(ld @ nv), 0.0)
        spec = 0.0
        if lamb > 0.0:
            vd = -pv / max(np.linalg.norm(pv), 1e-9)
            half = ld + vd
            half = half / max(np.linalg.norm(half), 1e-9)
            spec = max(float(half @ nv), 0.0) ** 128.0
        linear = 0.1 + lamb * 0.75 + spec * 1.0
        gamma = linear ** (1.0 / 2.2)
        # out_color = mix(vec4(light,1), vec4(0.5,...), 0.65)
        out.append(np.full(3, gamma * 0.35 + 0.5 * 0.65))
    return np.stack(out)


def test_blinn_phong_matches_numpy_shader():
    rng = np.random.default_rng(0)
    n = 64
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 5.0
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    view = np.eye(4)
    view[:3, 3] = [0.3, -0.2, 1.0]
    light = np.asarray(RM.DEFAULT_LIGHT_POSITION)
    ref = _numpy_blinn_phong(xyz, normals, view, light)
    got = np.asarray(RM.blinn_phong_colors(
        jnp.asarray(xyz), jnp.asarray(normals), jnp.asarray(view)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_lit_render_mode_gathers():
    rng = np.random.default_rng(1)
    n = 16
    pc = {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32) - [0, 0, 5],
        "normals": np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32),
    }
    ix = jnp.asarray([[0, 5], [-1, 15]], jnp.int32)
    dep = jnp.zeros((2, 2), jnp.float32)
    out = np.asarray(RM.render_mode("lit", ix, dep, pc,
                                    view_matrix=np.eye(4)))
    assert out.shape == (2, 2, 3)
    assert np.all(out[1, 0] == 0)  # empty pixel
    assert np.all(out[0, 0] > 0)


def test_texture2d_matches_numpy_bilinear():
    rng = np.random.default_rng(2)
    tex = rng.uniform(size=(9, 7, 3)).astype(np.float32)
    uv = rng.uniform(0.05, 0.95, size=(40, 2)).astype(np.float32)
    got = np.asarray(RM.sample_texture2d_colors(jnp.asarray(tex),
                                                jnp.asarray(uv)))

    ht, wt = tex.shape[:2]
    ref = []
    for u, v in uv:
        x = u * wt - 0.5
        y = (1.0 - v) * ht - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0

        def at(yy, xx):
            return tex[np.clip(yy, 0, ht - 1), np.clip(xx, 0, wt - 1)]

        top = at(y0, x0) * (1 - fx) + at(y0, x0 + 1) * fx
        bot = at(y0 + 1, x0) * (1 - fx) + at(y0 + 1, x0 + 1) * fx
        ref.append(top * (1 - fy) + bot * fy)
    np.testing.assert_allclose(got, np.stack(ref), atol=1e-5)


def test_texture2d_render_mode():
    tex = np.zeros((4, 4, 3), np.float32)
    tex[:, :, 0] = 1.0  # red texture
    pc = {"uv2d": np.full((8, 2), 0.5, np.float32),
          "texture_image": tex}
    ix = jnp.asarray([[0, -1]], jnp.int32)
    dep = jnp.zeros((1, 2), jnp.float32)
    out = np.asarray(RM.render_mode("texture2d", ix, dep, pc))
    np.testing.assert_allclose(out[0, 0], [1, 0, 0], atol=1e-6)
    assert np.all(out[0, 1] == 0)
