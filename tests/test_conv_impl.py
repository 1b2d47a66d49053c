"""BasicConv conv_impl='im2col' must match the nn.Conv path bit-for-bit
across every kernel/stride/dilation shape the UNet uses, with the SAME
parameter tree (checkpoints interchange) — ADVICE r2 item 4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.models.unet import BasicConv, UNet


@pytest.mark.parametrize("k,s,d", [(3, 1, 1), (3, 2, 1), (4, 2, 1),
                                   (1, 1, 1), (3, 1, 2)])
def test_basicconv_impls_match(k, s, d):
    rng = np.random.default_rng(k * 10 + s)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    mod_x = BasicConv(out_channels=12, kernel_size=k, stride=s,
                      dilation=d, conv_impl="xla")
    mod_i = BasicConv(out_channels=12, kernel_size=k, stride=s,
                      dilation=d, conv_impl="im2col")
    vars_x = mod_x.init(jax.random.PRNGKey(0), x)
    # identical parameter trees -> identical checkpoints
    def shapes(t):
        return jax.tree.map(lambda a: a.shape, t)
    vars_i = mod_i.init(jax.random.PRNGKey(0), x)
    assert shapes(vars_x["params"]) == shapes(vars_i["params"])
    out_x = mod_x.apply(vars_x, x)
    out_i = mod_i.apply(vars_x, x)  # same params through both impls
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_i),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_unet_impls_match():
    rng = np.random.default_rng(7)
    pyr = [jnp.asarray(rng.normal(size=(1, 32 // f, 32 // f, 8))
                       .astype(np.float32)) for f in (1, 2, 4, 8)]
    net_x = UNet(conv_impl="xla")
    net_i = UNet(conv_impl="im2col")
    variables = net_x.init(jax.random.PRNGKey(0), *pyr, train=False)
    out_x = net_x.apply(variables, *pyr, train=False)
    out_i = net_i.apply(variables, *pyr, train=False)
    np.testing.assert_allclose(np.asarray(out_x["im_out"]),
                               np.asarray(out_i["im_out"]),
                               atol=2e-4, rtol=1e-4)
