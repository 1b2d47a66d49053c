"""Point-cloud training augmentations: dropout and positional jitter.

Parity targets:
- point dropout: the reference discards a random fraction of points per
  item via a per-point discard vertex buffer
  (``dynamic.py:235-236``; ``programs.py:347-351,250-251``).
- point perturbation: pre-banked random screen-space offsets
  (``FastRand``, ``gl/utils.py:40-52``; applied at ``programs.py:127-128,
  352-357``). Here the jitter is applied in NDC space *scaled to pixels*
  (same visual effect, no vertex shader), derived per step from a folded
  PRNG key instead of a pre-banked table — device RNG is cheap on TPU.

Both are pure functions of (key, step): deterministic, reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["drop_points", "perturb_pixels"]

# far enough that the w>0 / NDC-cube test always rejects
_FAR_AWAY = 1e9


def drop_points(key: jax.Array, xyz: jax.Array,
                rate: float) -> jax.Array:
    """Move a random ``rate`` fraction of points outside the frustum
    (rejected by the rasterizer's clip test — equivalent to the GL
    discard buffer)."""
    if rate <= 0:
        return xyz
    keep = jax.random.bernoulli(key, 1.0 - rate, (xyz.shape[0], 1))
    return jnp.where(keep, xyz, _FAR_AWAY)


def pixel_jitter_offsets(key: jax.Array, n: int, amount: float,
                         h: int, w: int) -> jax.Array:
    """Per-point NDC offsets worth up to ``amount`` *pixels* (uniform in
    [-amount/2, amount/2], FastRand's ``p-0.5`` transform,
    ``dynamic.py:176-179``). Feed to ``rasterize(..., ndc_jitter=...)``."""
    u = jax.random.uniform(key, (n, 2)) - 0.5
    scale = jnp.asarray([2.0 * amount / w, 2.0 * amount / h], jnp.float32)
    return u * scale


def perturb_pixels(key: jax.Array, ndc: jax.Array, amount: float,
                   h: int, w: int) -> jax.Array:
    """Jitter projected NDC positions by up to ``amount`` pixels."""
    if amount <= 0:
        return ndc
    return ndc.at[:, :2].add(
        pixel_jitter_offsets(key, ndc.shape[0], amount, h, w))
