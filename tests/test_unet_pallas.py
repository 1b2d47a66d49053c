"""Oracle tests: the packed-lane Pallas inference forward must match
the flax UNet (eval mode) on the same variables.

Kernels run in interpret mode on CPU; the real-TPU compile is exercised
by scripts/bench_gated_conv_pack.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.models.unet import UNet
from read_tpu.models import unet_pallas as UP
from read_tpu.ops import gated_conv_pack as GP


def _bn_affine(rng, c):
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    offset = jnp.asarray(rng.normal(size=c).astype(np.float32))
    return scale, offset


@pytest.mark.parametrize("cin,cout,h,w", [(8, 4, 8, 16), (32, 32, 6, 9)])
@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("impl", ["pack9", "dot3"])
def test_gated_conv3x3_chw_oracle(cin, cout, h, w, relu, impl):
    rng = np.random.default_rng(cin + cout + relu)
    x = rng.normal(size=(1, h, w, cin)).astype(np.float32)
    wk = rng.normal(size=(3, 3, cin, 2 * cout)).astype(np.float32) * 0.2
    b = rng.normal(size=2 * cout).astype(np.float32)
    scale, offset = _bn_affine(rng, cout)

    # oracle: XLA conv + explicit gate + affine
    fm = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wk), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    f, m = fm[..., :cout], fm[..., cout:]
    if relu:
        f = jnp.where(f > 0, f, jnp.expm1(jnp.minimum(f, 0)))
    ref = (f * jax.nn.sigmoid(m)) * scale + offset

    x_chw = jnp.asarray(x[0].transpose(2, 0, 1).reshape(cin, h * w))
    out = GP.gated_conv3x3_chw(x_chw, jnp.asarray(wk), jnp.asarray(b),
                               scale, offset, w_img=w, relu=relu,
                               rows=2, interpret=True, impl=impl)
    out = np.asarray(out).reshape(cout, h, w).transpose(1, 2, 0)
    np.testing.assert_allclose(out, np.asarray(ref[0]), atol=2e-5,
                               rtol=1e-4)


def test_gated_conv3x3_chw_minimal_halo():
    """Exercises the reduced-traffic halo path: w=16 -> hr=8 halo rows,
    rows=16 -> rpb=2 halo blocks per mid block, grid=2 so the cross-
    block halo rows actually come from the neighbour fetch."""
    rng = np.random.default_rng(7)
    cin, cout, h, w = 8, 4, 32, 16
    x = rng.normal(size=(1, h, w, cin)).astype(np.float32)
    wk = rng.normal(size=(3, 3, cin, 2 * cout)).astype(np.float32) * 0.2
    b = rng.normal(size=2 * cout).astype(np.float32)
    scale, offset = _bn_affine(rng, cout)
    fm = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wk), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    f, m = fm[..., :cout], fm[..., cout:]
    f = jnp.where(f > 0, f, jnp.expm1(jnp.minimum(f, 0)))
    ref = (f * jax.nn.sigmoid(m)) * scale + offset
    x_chw = jnp.asarray(x[0].transpose(2, 0, 1).reshape(cin, h * w))
    out = GP.gated_conv3x3_chw(x_chw, jnp.asarray(wk), jnp.asarray(b),
                               scale, offset, w_img=w, relu=True,
                               rows=16, interpret=True)
    out = np.asarray(out).reshape(cout, h, w).transpose(1, 2, 0)
    np.testing.assert_allclose(out, np.asarray(ref[0]), atol=2e-5,
                               rtol=1e-4)


def test_gated_conv1x1_chw_oracle():
    rng = np.random.default_rng(3)
    cin, cout, n = 16, 8, 100
    x = rng.normal(size=(cin, n)).astype(np.float32)
    wk = rng.normal(size=(1, 1, cin, 2 * cout)).astype(np.float32)
    b = rng.normal(size=2 * cout).astype(np.float32)
    scale, offset = _bn_affine(rng, cout)
    fm = x.T @ wk.reshape(cin, 2 * cout) + b
    f, m = fm[:, :cout], fm[:, cout:]
    f = np.where(f > 0, f, np.expm1(np.minimum(f, 0)))
    ref = (f / (1 + np.exp(-m))) * np.asarray(scale) + np.asarray(offset)
    out = GP.gated_conv1x1_chw(jnp.asarray(x), jnp.asarray(wk),
                               jnp.asarray(b), scale, offset,
                               relu=True, lanes=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out).T, ref, atol=2e-5,
                               rtol=1e-4)


def test_gated_conv3x3_chw_fused_residual():
    rng = np.random.default_rng(11)
    cin, cout, h, w = 8, 8, 8, 16
    x = rng.normal(size=(1, h, w, cin)).astype(np.float32)
    r = rng.normal(size=(cout, h * w)).astype(np.float32)
    wk = rng.normal(size=(3, 3, cin, 2 * cout)).astype(np.float32) * 0.2
    b = rng.normal(size=2 * cout).astype(np.float32)
    scale, offset = _bn_affine(rng, cout)
    x_chw = jnp.asarray(x[0].transpose(2, 0, 1).reshape(cin, h * w))
    base = GP.gated_conv3x3_chw(x_chw, jnp.asarray(wk), jnp.asarray(b),
                                scale, offset, w_img=w, relu=False,
                                rows=2, interpret=True)
    out = GP.gated_conv3x3_chw(x_chw, jnp.asarray(wk), jnp.asarray(b),
                               scale, offset, jnp.asarray(r), w_img=w,
                               relu=False, rows=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base) + r,
                               atol=2e-5, rtol=1e-4)


def test_gated_conv1x1_cat_chw_oracle():
    """Concat-free 1x1 == 1x1 on the materialized concat (+res fuse)."""
    rng = np.random.default_rng(5)
    cins, cout, n = (16, 8, 4), 8, 300
    ctot = sum(cins)
    xs = [rng.normal(size=(c, n)).astype(np.float32) for c in cins]
    r = rng.normal(size=(cout, n)).astype(np.float32)
    wk = rng.normal(size=(1, 1, ctot, 2 * cout)).astype(np.float32)
    b = rng.normal(size=2 * cout).astype(np.float32)
    scale, offset = _bn_affine(rng, cout)
    ref = GP.gated_conv1x1_chw(
        jnp.concatenate([jnp.asarray(x) for x in xs], axis=0),
        jnp.asarray(wk), jnp.asarray(b), scale, offset,
        jnp.asarray(r), relu=True, lanes=128, interpret=True)
    out = GP.gated_conv1x1_cat_chw(
        tuple(jnp.asarray(x) for x in xs), jnp.asarray(wk),
        jnp.asarray(b), scale, offset, jnp.asarray(r), relu=True,
        lanes=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_unet_pallas_matches_flax():
    rng = np.random.default_rng(0)
    h, w = 32, 64
    pyr = [jnp.asarray(rng.normal(size=(1, h // f, w // f, 8))
                       .astype(np.float32)) for f in (1, 2, 4, 8)]
    net = UNet()
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=False)
    # make batch_stats non-trivial so BN folding is actually exercised
    variables = jax.tree.map(lambda v: v, variables)  # unfreeze copy
    ref = net.apply(variables, *pyr, train=False)
    out = UP.unet_pallas_apply(variables, *pyr, interpret=True)
    assert out["im_out"].shape == ref["im_out"].shape
    np.testing.assert_allclose(np.asarray(out["im_out"]),
                               np.asarray(ref["im_out"]),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_unet_pallas_seg_head():
    rng = np.random.default_rng(1)
    h, w = 32, 32
    pyr = [jnp.asarray(rng.normal(size=(1, h // f, w // f, 8))
                       .astype(np.float32)) for f in (1, 2, 4, 8)]
    net = UNet(num_classes=5)
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=False)
    ref = net.apply(variables, *pyr, train=False)
    out = UP.unet_pallas_apply(variables, *pyr, interpret=True)
    np.testing.assert_allclose(np.asarray(out["seg_out"]),
                               np.asarray(ref["seg_out"]),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_unet_pallas_cat11_matches_flax(monkeypatch):
    # concat-free 1x1 convs (opt-in) vs the flax oracle
    monkeypatch.setenv("READ_TPU_PALLAS_CAT11", "1")
    rng = np.random.default_rng(3)
    h, w = 32, 64
    pyr = [jnp.asarray(rng.normal(size=(1, h // f, w // f, 8))
                       .astype(np.float32)) for f in (1, 2, 4, 8)]
    net = UNet()
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=False)
    ref = net.apply(variables, *pyr, train=False)
    UP.unet_pallas_apply.clear_cache()  # drop default-path trace
    out = UP.unet_pallas_apply(variables, *pyr, interpret=True)
    UP.unet_pallas_apply.clear_cache()
    np.testing.assert_allclose(np.asarray(out["im_out"]),
                               np.asarray(ref["im_out"]),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_unet_pallas_s2d_matches_flax(monkeypatch):
    # space-to-depth strided transitions (opt-in) vs the flax oracle
    monkeypatch.setenv("READ_TPU_PALLAS_S2D", "1")
    rng = np.random.default_rng(2)
    h, w = 32, 64
    pyr = [jnp.asarray(rng.normal(size=(1, h // f, w // f, 8))
                       .astype(np.float32)) for f in (1, 2, 4, 8)]
    net = UNet()
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=False)
    ref = net.apply(variables, *pyr, train=False)
    UP.unet_pallas_apply.clear_cache()  # drop non-s2d trace
    out = UP.unet_pallas_apply(variables, *pyr, interpret=True)
    UP.unet_pallas_apply.clear_cache()
    np.testing.assert_allclose(np.asarray(out["im_out"]),
                               np.asarray(ref["im_out"]),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("impl", ["pack9", "dot3"])
def test_gated_conv3x3_chw_frames_oracle(impl):
    """frames=2 stacked-H batch == two independent single-frame convs
    (the dy halos must NOT leak across the frame boundary)."""
    rng = np.random.default_rng(21)
    cin, cout, hf, w, B = 8, 4, 8, 16, 2
    x = rng.normal(size=(B, hf, w, cin)).astype(np.float32)
    wk = rng.normal(size=(3, 3, cin, 2 * cout)).astype(np.float32) * 0.2
    b = rng.normal(size=2 * cout).astype(np.float32)
    scale, offset = _bn_affine(rng, cout)

    refs = []
    for i in range(B):
        xc = jnp.asarray(x[i].transpose(2, 0, 1).reshape(cin, hf * w))
        refs.append(np.asarray(GP.gated_conv3x3_chw(
            xc, jnp.asarray(wk), jnp.asarray(b), scale, offset,
            w_img=w, relu=True, rows=2, interpret=True)))

    x_st = jnp.asarray(np.transpose(x, (3, 0, 1, 2))
                       .reshape(cin, B * hf * w))
    out = GP.gated_conv3x3_chw(x_st, jnp.asarray(wk), jnp.asarray(b),
                               scale, offset, w_img=w, relu=True,
                               rows=2, frames=B, interpret=True,
                               impl=impl)
    out = np.asarray(out).reshape(cout, B, hf * w)
    for i in range(B):
        np.testing.assert_allclose(out[:, i], refs[i], atol=2e-5,
                                   rtol=1e-4)


@pytest.mark.slow
def test_unet_pallas_batched_frames_matches_flax():
    """B=2 stacked-frames forward == the flax oracle on the same batch
    (the natively-batched inference path: one kernel grid for all B)."""
    rng = np.random.default_rng(4)
    h, w = 32, 64
    pyr = [jnp.asarray(rng.normal(size=(2, h // f, w // f, 8))
                       .astype(np.float32)) for f in (1, 2, 4, 8)]
    net = UNet()
    variables = net.init(jax.random.PRNGKey(0),
                         *[p[:1] for p in pyr], train=False)
    ref = net.apply(variables, *pyr, train=False)
    out = UP.unet_pallas_apply(variables, *pyr, interpret=True)
    assert out["im_out"].shape == ref["im_out"].shape
    np.testing.assert_allclose(np.asarray(out["im_out"]),
                               np.asarray(ref["im_out"]),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_unet_pallas_batched_frames_s2d(monkeypatch):
    """B=2 stacked frames with the s2d strided path ON (the production
    seg forward): frame heights are even so the s2d row pairing must
    stay frame-aligned."""
    monkeypatch.setenv("READ_TPU_PALLAS_S2D", "1")
    rng = np.random.default_rng(6)
    h, w = 32, 64
    pyr = [jnp.asarray(rng.normal(size=(2, h // f, w // f, 8))
                       .astype(np.float32)) for f in (1, 2, 4, 8)]
    net = UNet()
    variables = net.init(jax.random.PRNGKey(0),
                         *[p[:1] for p in pyr], train=False)
    ref = net.apply(variables, *pyr, train=False)
    UP.unet_pallas_apply.clear_cache()
    out = UP.unet_pallas_apply(variables, *pyr, interpret=True)
    UP.unet_pallas_apply.clear_cache()
    np.testing.assert_allclose(np.asarray(out["im_out"]),
                               np.asarray(ref["im_out"]),
                               atol=5e-4, rtol=1e-3)


def test_gated_conv3x3_chw_dot3_full_lane_width():
    """dot3 at a 128-divisible image width: the full-row halo block
    (hr=1) lacks the extra corner lane dy=-1 needs, so the wrapper must
    bump to a 2-row halo."""
    rng = np.random.default_rng(3)
    cin, cout, h, w = 8, 4, 8, 128
    x = rng.normal(size=(1, h, w, cin)).astype(np.float32)
    wk = rng.normal(size=(3, 3, cin, 2 * cout)).astype(np.float32) * 0.2
    b = rng.normal(size=2 * cout).astype(np.float32)
    scale, offset = _bn_affine(rng, cout)
    x_chw = jnp.asarray(x[0].transpose(2, 0, 1).reshape(cin, h * w))
    ref = GP.gated_conv3x3_chw(x_chw, jnp.asarray(wk), jnp.asarray(b),
                               scale, offset, w_img=w, relu=True,
                               rows=2, interpret=True)
    out = GP.gated_conv3x3_chw(x_chw, jnp.asarray(wk), jnp.asarray(b),
                               scale, offset, w_img=w, relu=True,
                               rows=2, interpret=True, impl="dot3")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["pack9", "dot3"])
def test_gated_conv3x3_chw_mxu_bf16(impl):
    """bf16 MXU operands (in-register casts, f32 accumulate): must track
    the f32 kernel within bf16 rounding of the dot inputs."""
    rng = np.random.default_rng(11)
    cin, cout, h, w = 32, 32, 6, 9
    x = rng.normal(size=(cin, h * w)).astype(np.float32)
    wk = rng.normal(size=(3, 3, cin, 2 * cout)).astype(np.float32) * 0.2
    b = rng.normal(size=2 * cout).astype(np.float32)
    scale, offset = _bn_affine(rng, cout)
    args = (jnp.asarray(x), jnp.asarray(wk), jnp.asarray(b), scale,
            offset)
    f32 = GP.gated_conv3x3_chw(*args, w_img=w, relu=True, rows=2,
                               interpret=True, impl=impl)
    bf16 = GP.gated_conv3x3_chw(*args, w_img=w, relu=True, rows=2,
                                interpret=True, impl=impl,
                                mxu_bf16=True)
    # bf16 has ~3 decimal digits; activations here are O(10)
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32),
                               atol=0.35, rtol=0.05)
    # and it must not be a no-op: SOME rounding difference exists
    assert float(np.abs(np.asarray(bf16) - np.asarray(f32)).max()) > 0
