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
def test_gated_conv3x3_chw_oracle(cin, cout, h, w, relu):
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
                               rows=2, interpret=True)
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
