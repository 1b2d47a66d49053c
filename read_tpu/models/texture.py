"""Neural point/mesh textures: learnable descriptor tables + samplers.

Parity targets (reference: /root/reference):
- ``PointTexture`` (``READ/models/texture.py:14-70``): a ``[1, C, N]``
  parameter gathered by the rendered point-index map; gradients reach the
  table through the gather's scatter-add backward — the sparse-update
  heart of training.
- ``MeshTexture`` (``READ/models/texture.py:73-130``): ``levels``
  mipmap-like 2D tables bilinearly sampled at uv in [0,1] and summed.

TPU-native design differences:
- Tables are plain JAX arrays ``[N, C]`` living in the train-state pytree
  (not nn.Module attributes); sampling is a pure function so it vmaps,
  pjits and shards freely. Per-scene tables are entries of a dict keyed by
  scene id (the reference's CPU<->GPU texture swapping,
  ``READ/models/compose.py:96-116``, becomes HBM-resident tables).
- Empty pixels are index -1 (see ``ops.rasterize``) and sample a zero
  descriptor, fixing the reference's id-0 ambiguity
  (``point_render.cu:158``) instead of stealing point 0's descriptor.
- Layout is NHWC (TPU conv-friendly), not NCHW.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "init_point_texture",
    "sample_point_texture",
    "sample_point_texture_unique",
    "point_texture_reg_loss",
    "init_mesh_texture",
    "sample_mesh_texture",
    "mesh_texture_reg_loss",
]


def init_point_texture(key: Optional[jax.Array], n_points: int,
                       n_channels: int = 8,
                       init_method: str = "zeros") -> jax.Array:
    """Create a descriptor table ``[n_points, n_channels]`` float32.

    ``init_method``: 'zeros' (reference default) or 'rand' (uniform [0,1)),
    parity with ``texture.py:26-31``.
    """
    shape = (n_points, n_channels)
    if init_method == "zeros":
        return jnp.zeros(shape, jnp.float32)
    if init_method == "rand":
        assert key is not None, "'rand' init needs a PRNG key"
        return jax.random.uniform(key, shape, jnp.float32)
    raise ValueError(f"unknown init_method: {init_method}")


def gather_rows_packed(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather tuned for TPU HBM granularity.

    A naive ``table[idx]`` on a ``[N, C<=8]`` table reads one (8, 128)
    VMEM tile (4 KB) per element for 32 useful bytes. Reshaping the
    table to ``[N/G, G*C]`` rows of >=128 lanes (a FREE view of the same
    bytes) gathers one 512-byte group per element instead, and the
    wanted row is peeled out in-register with a one-hot contraction —
    ~4x less HBM traffic at C=8.

    Args:
      table: ``[N, C]``; idx: ``[...]`` int32 in [0, N).
    Returns ``[..., C]`` (no masking — caller handles empties).
    """
    n, c = table.shape
    g = max(1, 128 // max(c, 1))
    if n % g:
        table = jnp.pad(table, ((0, g - n % g), (0, 0)))
    grouped = table.reshape(-1, g * c)
    rows = grouped[idx // g]                       # [..., G*C]
    onehot = jax.nn.one_hot(idx % g, g, dtype=table.dtype)
    picked = jnp.einsum("...gc,...g->...c",
                        rows.reshape(rows.shape[:-1] + (g, c)), onehot)
    return picked


def sample_point_texture(table: jax.Array, index_map: jax.Array,
                         activation: str = "none") -> jax.Array:
    """Gather descriptors through a point-index map.

    Args:
      table: ``[N, C]`` descriptor table.
      index_map: ``[..., H, W]`` int32 point ids, -1 = empty.
      activation: 'none' | 'sigmoid' | 'tanh'
        (parity: ``texture.py:65-68``).

    Returns:
      ``[..., H, W, C]`` sampled descriptors, zeros at empty pixels.

    The clamp+mask construction (instead of padding the table with a zero
    row) avoids materializing an N+1-row copy of a multi-million-point
    table each step; the output mask zeroes the incoming cotangent at
    empty pixels, so no spurious gradient reaches row 0.
    """
    n = table.shape[0]
    idx = jnp.clip(index_map, 0, n - 1)
    sample = table[idx]
    mask = (index_map >= 0)[..., None].astype(table.dtype)
    sample = sample * mask
    if activation == "sigmoid":
        sample = jax.nn.sigmoid(sample)
    elif activation == "tanh":
        sample = jnp.tanh(sample)
    elif activation != "none":
        raise ValueError(f"unknown activation: {activation}")
    return sample


@jax.custom_vjp
def _gather_unique(table: jax.Array, index_map: jax.Array) -> jax.Array:
    n = table.shape[0]
    idx = jnp.clip(index_map, 0, n - 1)
    return table[idx] * (index_map >= 0)[..., None].astype(table.dtype)


def _gather_unique_fwd(table, index_map):
    return _gather_unique(table, index_map), (index_map, table.shape[0])


def _gather_unique_bwd(res, g):
    index_map, n = res
    c = g.shape[-1]
    # Each point wins at most ONE pixel per image with 1px splats, so the
    # per-image scatter-add has unique indices -> XLA emits a fully
    # parallel scatter instead of a serialized combining one (~100x).
    # Empties (-1) aim at the dump row n and are dropped.
    idx2 = index_map.reshape(-1, *index_map.shape[-2:])
    g2 = g.reshape(-1, *g.shape[-3:])
    acc = jnp.zeros((n + 1, c), g.dtype)
    for b in range(idx2.shape[0]):
        flat_i = idx2[b].reshape(-1)
        tgt = jnp.where(flat_i >= 0, flat_i, n)
        acc = acc.at[tgt].add(g2[b].reshape(-1, c), mode="drop",
                              unique_indices=True)
    return acc[:n], None


_gather_unique.defvjp(_gather_unique_fwd, _gather_unique_bwd)


def sample_point_texture_unique(table: jax.Array, index_map: jax.Array,
                                activation: str = "none") -> jax.Array:
    """:func:`sample_point_texture` with a fast backward that exploits
    index uniqueness per image (valid ONLY for 1px splats — with
    ``point_radius > 0`` a point covers several pixels and the plain
    gather must be used)."""
    sample = _gather_unique(table, index_map)
    if activation == "sigmoid":
        sample = jax.nn.sigmoid(sample)
    elif activation == "tanh":
        sample = jnp.tanh(sample)
    elif activation != "none":
        raise ValueError(f"unknown activation: {activation}")
    return sample


def point_texture_reg_loss(table: jax.Array,
                           reg_weight: float) -> jax.Array:
    """L2 descriptor regularizer (parity: ``texture.py:39-40``)."""
    return reg_weight * jnp.mean(jnp.square(table))


def init_mesh_texture(key: Optional[jax.Array], size: int,
                      n_channels: int = 8, levels: int = 4,
                      init_method: str = "zeros") -> list:
    """Pyramid of 2D tables ``[size/2^i, size/2^i, C]`` (``texture.py:92-101``)."""
    tables = []
    for i in range(levels):
        s = size // (2 ** i)
        shape = (s, s, n_channels)
        if init_method == "zeros":
            t = jnp.zeros(shape, jnp.float32)
        elif init_method == "rand":
            key, sub = jax.random.split(key)
            t = jax.random.uniform(sub, shape, jnp.float32)
        elif init_method == "0.5":
            t = jnp.full(shape, 0.5, jnp.float32)
        else:
            raise ValueError(init_method)
        tables.append(t)
    return tables


def _bilinear_sample_2d(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample ``tex [Ht, Wt, C]`` at ``uv [..., 2]`` in [-1, 1].

    Matches torch ``grid_sample`` defaults (bilinear, align_corners=False,
    zero padding) used by ``MeshTexture.forward`` (``texture.py:119-123``).
    """
    ht, wt = tex.shape[0], tex.shape[1]
    # align_corners=False: x_pix = ((x + 1) * W - 1) / 2
    x = ((uv[..., 0] + 1.0) * wt - 1.0) * 0.5
    y = ((uv[..., 1] + 1.0) * ht - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            inside = (xi >= 0) & (xi < wt) & (yi >= 0) & (yi < ht)
            xi_c = jnp.clip(xi, 0, wt - 1)
            yi_c = jnp.clip(yi, 0, ht - 1)
            val = tex[yi_c, xi_c] * inside[..., None].astype(tex.dtype)
            w = (wx if dx else (1 - wx)) * (wy if dy else (1 - wy))
            out = out + val * w[..., None]
    return out


def sample_mesh_texture(tables: list, uv: jax.Array,
                        activation: str = "none") -> jax.Array:
    """Sum of bilinear samples over all pyramid levels.

    Args:
      tables: list of ``[s, s, C]`` tables.
      uv: ``[..., 2]`` texture coordinates in [0, 1]
        (mapped to [-1, 1] as in ``texture.py:119``).
    """
    g = uv * 2.0 - 1.0
    out = _bilinear_sample_2d(tables[0], g)
    for t in tables[1:]:
        out = out + _bilinear_sample_2d(t, g)
    if activation == "sigmoid":
        out = jax.nn.sigmoid(out)
    elif activation == "tanh":
        out = jnp.tanh(out)
    return out


def mesh_texture_reg_loss(tables: list, reg_weight: float) -> jax.Array:
    """Per-level weighted L2 (weights parity: ``texture.py:105``)."""
    tex_weight = [8.0, 2.0, 1.0, 0.0]
    loss = 0.0
    for i, t in enumerate(tables):
        w = tex_weight[i] if i < len(tex_weight) else 0.0
        loss = loss + reg_weight * w * jnp.mean(jnp.square(t))
    return jnp.asarray(loss)
