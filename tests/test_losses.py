"""Loss/metric parity tests (torch-cpu used as the oracle where apt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.criterions import losses as L
from read_tpu.criterions import vgg as V


def test_huber_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    a = rng.normal(size=(2, 8, 8, 3)).astype(np.float32) * 2
    b = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ours = float(L.huber_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(F.huber_loss(torch.from_numpy(a), torch.from_numpy(b)))
    assert abs(ours - ref) < 1e-6


def test_cross_entropy_ignore0_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    logits = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 4, 4)).astype(np.int64)
    ours = float(L.cross_entropy_ignore0(
        jnp.asarray(logits), jnp.asarray(labels.astype(np.int32))))
    ref = float(F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels), ignore_index=0))
    assert abs(ours - ref) < 1e-5


def test_psnr_known_value():
    a = jnp.zeros((1, 4, 4, 3))
    b = jnp.full((1, 4, 4, 3), 0.1)
    # mse = 0.01 -> psnr = 20
    assert abs(float(L.psnr(a, b)) - 20.0) < 1e-3


def test_psnr_clips_pred():
    a = jnp.full((1, 4, 4, 3), 1.5)  # clipped to 1.0
    b = jnp.ones((1, 4, 4, 3))
    assert float(L.psnr(a, b)) > 100.0


def test_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    assert abs(float(L.ssim(x, x)) - 1.0) < 1e-5


def test_ssim_decreases_with_noise(rng):
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    y = x + jnp.asarray(rng.normal(size=x.shape) * 0.2, jnp.float32)
    assert float(L.ssim(x, y)) < 0.95


def test_ssim_bounded_on_near_uniform_images(rng):
    """f32 cancellation on constant windows used to push per-window
    scores past 1 (val logs showed batch SSIM 1.4); the variance /
    Cauchy-Schwarz clamps must keep every window's score in [-1, 1]."""
    # mostly-black frames with a small bright patch: lots of zero-variance
    # windows, the historical blowup case (black crop borders).
    x = np.zeros((2, 48, 48, 3), np.float32)
    x[:, 20:28, 20:28] = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    y = x + 1e-3 * rng.normal(size=x.shape).astype(np.float32)
    per = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(y),
                            per_item=True))
    assert per.shape == (2,)
    assert np.all(per <= 1.0 + 1e-6) and np.all(per >= -1.0 - 1e-6)
    # large-magnitude inputs (unclipped net outputs) stay bounded too
    big = jnp.asarray(rng.normal(size=(1, 32, 32, 3)) * 50, jnp.float32)
    v = float(L.ssim(big, big * 0.5 + 3.0))
    assert -1.0 - 1e-6 <= v <= 1.0 + 1e-6


def test_vgg_loss_zero_on_identical(rng):
    params = V.random_vgg_params()
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    assert float(V.vgg_loss(params, x, x)) == 0.0


def test_vgg_loss_positive_and_grads_flow(rng):
    params = V.random_vgg_params()
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    val, grad = jax.value_and_grad(
        lambda p: V.vgg_loss(params, p, y))(x)
    assert float(val) > 0
    assert np.abs(np.asarray(grad)).max() > 0


def test_vgg_features_shapes(rng):
    params = V.random_vgg_params()
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    taps = V.vgg19_features(params, x)
    assert len(taps) == 13
    assert taps[0].shape == (1, 64, 64, 64)     # relu1_1
    assert taps[2].shape == (1, 32, 32, 128)    # relu2_1 after pool1
    assert taps[12].shape == (1, 4, 4, 512)     # relu5_1 after pool4


def test_vgg_matches_torch_reference_structure(rng):
    """Drive the SAME random weights through a torch VGG19-with-avgpool
    built the way the reference builds it, and compare the loss value."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    params = V.random_vgg_params()
    # Build the torch twin: 13 convs + relu, avgpool after convs 2,4,8,12.
    layers = []
    cin = 3
    tap_idx = []
    for i, cout in enumerate(V.VGG_CHANNELS, start=1):
        conv = nn.Conv2d(cin, cout, 3, padding=1)
        w, b = params[i - 1]
        conv.weight.data = torch.from_numpy(
            np.asarray(w).transpose(3, 2, 0, 1).copy())
        conv.bias.data = torch.from_numpy(np.asarray(b).copy())
        layers += [conv, nn.ReLU()]
        tap_idx.append(len(layers) - 1)
        if i in (2, 4, 8, 12):
            layers.append(nn.AvgPool2d(2, 2))
        cin = cout
    seq = nn.Sequential(*layers)

    x = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    y = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)

    mean = torch.tensor([103.939, 116.779, 123.680]).view(1, 3, 1, 1) / 255
    def feats(img):
        h = (torch.from_numpy(img.transpose(0, 3, 1, 2)) - mean) * 255.0
        out = []
        for j, layer in enumerate(seq):
            h = layer(h)
            if j in tap_idx:
                out.append(h)
        return out

    ref = sum(
        float(torch.mean(torch.abs(a - b)))
        for a, b in zip(feats(x), feats(y)))
    ours = float(V.vgg_loss(params, jnp.asarray(x), jnp.asarray(y)))
    assert abs(ours - ref) / max(abs(ref), 1e-9) < 1e-3, (ours, ref)


def test_masked_background_loss():
    pred = jnp.ones((1, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4, 1))
    # all-background, pred=1, bkg=0 -> 500 * mean(|1|) = 500
    assert abs(float(L.masked_background_loss(pred, mask)) - 500.0) < 1e-4
    mask = jnp.ones((1, 4, 4, 1))
    assert float(L.masked_background_loss(pred, mask)) == 0.0


def test_partial_conv_matches_reference_oracle(rng):
    """Drive the same weights/mask through the reference PartialConv2d
    (imported read-only from /root/reference as the oracle) and ours."""
    torch = pytest.importorskip("torch")
    import importlib.util
    import sys as _sys
    _sys.dont_write_bytecode = True
    spec = importlib.util.spec_from_file_location(
        "ref_conv", "/root/reference/READ/models/conv.py")
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")

    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    mask = (rng.uniform(size=(2, 16, 16, 1)) > 0.4).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32) * 0.1
    b = rng.normal(size=(8,)).astype(np.float32)

    pc = ref.PartialConv2d(3, 8, kernel_size=(3, 3), stride=(1, 1),
                           padding=(1, 1))
    pc.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
    pc.bias.data = torch.from_numpy(b.copy())
    with torch.no_grad():
        ref_out = pc(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(mask.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(V.partial_conv2d(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w),
        jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref_out, atol=1e-4)


def test_vgg_partialconv_ignores_fully_masked_noise(rng):
    """With partialconv, noise confined to the background (zeros in the
    target) must yield a smaller loss than the same noise under the
    unmasked VGG — the masked variant discounts invalid regions."""
    params = V.random_vgg_params()
    target = np.zeros((1, 32, 32, 3), np.float32)
    target[:, 8:24, 8:24, :] = rng.uniform(
        0.2, 1.0, size=(1, 16, 16, 3)).astype(np.float32)
    pred = target.copy()
    # perturb only the background
    bg = target.sum(-1, keepdims=True) <= 1e-9
    pred = pred + 0.5 * bg * rng.normal(size=pred.shape).astype(
        np.float32)
    lm = float(V.vgg_loss(params, jnp.asarray(pred), jnp.asarray(target),
                          partialconv=True))
    lu = float(V.vgg_loss(params, jnp.asarray(pred),
                          jnp.asarray(target)))
    assert lm < lu
