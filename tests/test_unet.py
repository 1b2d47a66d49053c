"""MIMO-UNet shape/parity tests."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.models.unet import UNet


def _pyramid(rng, h=64, w=64, c=8, b=1):
    return [jnp.asarray(rng.normal(size=(b, h // s, w // s, c)),
                        jnp.float32) for s in (1, 2, 4, 8)]


@pytest.mark.slow
def test_forward_rectangular(rng):
    # KITTI-style aspect; dims divisible by 32.
    net = UNet()
    pyr = _pyramid(rng, h=32, w=96)
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=False)
    out = net.apply(variables, *pyr, train=False)
    assert out["im_out"].shape == (1, 32, 96, 3)
    assert out["im_out"].dtype == jnp.float32


def test_seg_head(rng):
    net = UNet(num_classes=9)
    pyr = _pyramid(rng, h=32, w=32)
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=False)
    out = net.apply(variables, *pyr, train=False)
    assert out["seg_out"].shape == (1, 32, 32, 9)


def test_batch_stats_update(rng):
    net = UNet()
    pyr = _pyramid(rng, h=32, w=32)
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=True)
    out, mutated = net.apply(variables, *pyr, train=True,
                             mutable=["batch_stats"])
    # running stats must change in train mode
    leaves0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves1 = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leaves1))
    assert changed


def test_param_count_matches_reference():
    """Trainable parameter count must equal the reference UNet's.

    We instantiate the reference model (read-only import from
    /root/reference) purely as an oracle for the count.
    """
    torch = pytest.importorskip("torch")
    sys.dont_write_bytecode = True
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_unet", "/root/reference/src/READ/models/unet.py")
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    ref_net = ref.UNet()
    ref_count = sum(p.numel() for p in ref_net.parameters()
                    if p.requires_grad)
    # The reference defines ConvsOut multi-scale output heads that its
    # forward never calls (reference unet.py:181-186) — dead parameters
    # we intentionally do not replicate.
    dead = sum(p.numel() for p in ref_net.ConvsOut.parameters())
    ref_count -= dead

    net = UNet()
    rng = np.random.default_rng(0)
    pyr = _pyramid(rng, h=32, w=32)
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=False)
    ours = sum(np.prod(p.shape)
               for p in jax.tree_util.tree_leaves(variables["params"]))
    assert int(ours) == int(ref_count), (ours, ref_count)


@pytest.mark.slow
def test_bfloat16_compute(rng):
    net = UNet(dtype=jnp.bfloat16)
    pyr = _pyramid(rng, h=32, w=32)
    variables = net.init(jax.random.PRNGKey(0), *pyr, train=False)
    out = net.apply(variables, *pyr, train=False)
    assert out["im_out"].dtype == jnp.float32  # cast back at the head
    assert np.isfinite(np.asarray(out["im_out"])).all()


@pytest.mark.slow
def test_remat_unet_same_params_and_grads():
    # --remat trades recompute for HBM (10M native-res fit); it must
    # change NOTHING about the math: identical param tree, fwd, grads.
    rng = np.random.default_rng(3)
    h, w = 32, 64
    pyr = [jnp.asarray(rng.normal(size=(1, h // f, w // f, 8))
                       .astype(np.float32)) for f in (1, 2, 4, 8)]
    n0, n1 = UNet(), UNet(remat=True)
    v = n0.init(jax.random.PRNGKey(0), *pyr, train=False)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(
                n1.init(jax.random.PRNGKey(0), *pyr, train=False)))
    o0 = n0.apply(v, *pyr, train=False)["im_out"]
    o1 = n1.apply(v, *pyr, train=False)["im_out"]
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    def loss(net):
        def f(vv):
            out, _ = net.apply(vv, *pyr, train=True,
                               mutable=["batch_stats"])
            return jnp.mean(out["im_out"] ** 2)
        return jax.grad(f)(v)
    g0, g1 = loss(n0), loss(n1)
    for a, b in zip(jax.tree_util.tree_leaves(g0["params"]),
                    jax.tree_util.tree_leaves(g1["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
