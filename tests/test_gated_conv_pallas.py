"""Pallas fused gated-conv kernels vs the flax BasicConv oracle.

The kernels implement eval-mode BasicConv (conv -> ELU*sigmoid gate ->
BatchNorm affine, ``src/READ/models/unet.py:10-42``) — these tests fold
real BasicConv variables into (scale, offset) and require elementwise
agreement with ``BasicConv.apply`` in inference mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.models.unet import BasicConv
from read_tpu.ops import gated_conv_pallas as G


def _fold_bn(variables):
    bn = variables["params"]["norm"]
    stats = variables["batch_stats"]["norm"]
    scale = bn["scale"] / np.sqrt(np.asarray(stats["var"]) + 1e-5)
    offset = bn["bias"] - stats["mean"] * scale
    return jnp.asarray(scale), jnp.asarray(offset)


def _make(key, h, w, cin, cout, k, relu):
    kx, ki, ks = jax.random.split(key, 3)
    x = jax.random.normal(kx, (1, h, w, cin), jnp.float32)
    mod = BasicConv(cout, kernel_size=k, relu=relu)
    variables = mod.init(ki, x, train=False)
    # non-trivial BN stats so the affine actually tests something
    stats = variables["batch_stats"]["norm"]
    variables = {
        "params": variables["params"],
        "batch_stats": {"norm": {
            "mean": jax.random.normal(ks, stats["mean"].shape) * 0.1,
            "var": jnp.abs(jax.random.normal(ks, stats["var"].shape))
                   + 0.5,
        }},
    }
    ref = mod.apply(variables, x, train=False)
    return x, variables, ref


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("h,w,cin,cout", [
    (16, 32, 8, 16),
    (24, 40, 32, 32),   # non-tile-multiple H
])
def test_conv3x3_matches_basicconv(relu, h, w, cin, cout):
    x, variables, ref = _make(jax.random.PRNGKey(0), h, w, cin, cout,
                              3, relu)
    scale, offset = _fold_bn(variables)
    out = G.gated_conv3x3(
        x[0], variables["params"]["conv_fm"]["kernel"],
        variables["params"]["conv_fm"]["bias"], scale, offset,
        relu=relu, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("relu", [True, False])
def test_conv1x1_matches_basicconv(relu):
    x, variables, ref = _make(jax.random.PRNGKey(1), 20, 24, 48, 16,
                              1, relu)
    scale, offset = _fold_bn(variables)
    out = G.gated_conv1x1(
        x[0], variables["params"]["conv_fm"]["kernel"],
        variables["params"]["conv_fm"]["bias"], scale, offset,
        relu=relu, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_bf16_runs():
    x, variables, ref = _make(jax.random.PRNGKey(2), 16, 16, 8, 8,
                              3, True)
    scale, offset = _fold_bn(variables)
    out = G.gated_conv3x3(
        x[0].astype(jnp.bfloat16),
        variables["params"]["conv_fm"]["kernel"],
        variables["params"]["conv_fm"]["bias"], scale, offset,
        relu=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref[0]),
        rtol=0.1, atol=0.05)
