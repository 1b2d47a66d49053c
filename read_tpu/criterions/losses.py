"""Pixel losses and quality metrics.

Parity targets (reference: /root/reference):
- huber: ``F.huber_loss`` with default delta=1.0 and mean reduction,
  weighted by ``huber_ratio=1e4`` in the src train loop
  (``src/train.py:220,549-550``).
- segmentation CE with ``ignore_index=0``
  (``src/READ/models/compose.py:40``).
- masked background loss: outside-mask pixels pulled toward a background
  color with weight 500, main loss renormalized by the mask mean
  (``train.py:183-197``; src uses black background, ``src/train.py:228``).
- PSNR: ``-10 log10(mse)`` (``src/train.py:39-48``).
- SSIM: not present in the reference code (kornia import commented out at
  ``src/train.py:28``) but required by the benchmark targets; standard
  Wang et al. gaussian SSIM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["huber_loss", "cross_entropy_ignore0", "masked_background_loss",
           "psnr", "ssim", "charbonnier_loss", "l1_loss"]


def huber_loss(pred: jax.Array, target: jax.Array,
               delta: float = 1.0, per_item: bool = False) -> jax.Array:
    """torch ``F.huber_loss`` parity: 0.5*e^2 if |e|<delta else
    delta*(|e|-0.5*delta), mean reduction. ``per_item=True`` reduces all
    but the leading batch axis (unbiased batched-val metrics)."""
    err = pred - target
    abs_err = jnp.abs(err)
    quad = 0.5 * jnp.square(err)
    lin = delta * (abs_err - 0.5 * delta)
    v = jnp.where(abs_err < delta, quad, lin)
    if per_item:
        return jnp.mean(v.reshape(v.shape[0], -1), axis=1)
    return jnp.mean(v)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def charbonnier_loss(pred: jax.Array, target: jax.Array,
                     eps: float = 1e-3) -> jax.Array:
    """Defined-but-unused in the reference (``train.py:114-121``)."""
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


def cross_entropy_ignore0(logits: jax.Array,
                          labels: jax.Array) -> jax.Array:
    """Softmax CE over the channel axis, ignoring label 0
    (``F.cross_entropy(..., ignore_index=0)`` parity).

    Args:
      logits: ``[B, H, W, C]``.
      labels: ``[B, H, W]`` int32 class ids; 0 = ignored.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = labels > 0
    safe = jnp.where(valid, labels, 0)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1)
    return -(picked * valid).sum() / n


def masked_background_loss(pred: jax.Array, mask: jax.Array,
                           bkg_color=(0.0, 0.0, 0.0),
                           weight: float = 500.0) -> jax.Array:
    """Pull outside-mask pixels toward the background color
    (``train.py:183-197``; src bkg=black ``src/train.py:228``).

    Args:
      pred: ``[B, H, W, 3]``; mask: ``[B, H, W, 1]`` in {0,1}.
    Returns the additive background term; the caller renormalizes the main
    loss by ``mask.mean()`` as the reference does.
    """
    bkg = jnp.asarray(bkg_color, pred.dtype)
    off = (1.0 - mask)
    return weight * jnp.mean(jnp.abs((pred - bkg) * off))


def psnr(pred: jax.Array, target: jax.Array,
         per_item: bool = False) -> jax.Array:
    """``-10 log10(mse)`` with pred clipped to [0,1]
    (``src/train.py:39-48``)."""
    se = jnp.square(jnp.clip(pred, 0.0, 1.0) - target)
    if per_item:
        mse = jnp.mean(se.reshape(se.shape[0], -1), axis=1)
    else:
        mse = jnp.mean(se)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(pred: jax.Array, target: jax.Array, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         per_item: bool = False) -> jax.Array:
    """Mean SSIM over a batch of ``[B, H, W, C]`` images (Wang et al.)."""
    k = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    c = pred.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO grouped

    def blur(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_p = blur(pred)
    mu_t = blur(target)
    # E[x^2]-E[x]^2 cancels catastrophically in f32 on near-uniform
    # windows (black crop borders), yielding tiny negative variances and
    # per-window ratios > 1. Clamp variances to >=0 and the covariance to
    # the Cauchy-Schwarz bound so every window's score lies in [-1, 1].
    mu_pp = jnp.maximum(blur(pred * pred) - mu_p * mu_p, 0.0)
    mu_tt = jnp.maximum(blur(target * target) - mu_t * mu_t, 0.0)
    cs_bound = jnp.sqrt(mu_pp * mu_tt)
    mu_pt = jnp.clip(blur(pred * target) - mu_p * mu_t,
                     -cs_bound, cs_bound)
    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (mu_pp + mu_tt + c2)
    v = num / den
    if per_item:
        return jnp.mean(v.reshape(v.shape[0], -1), axis=1)
    return jnp.mean(v)
