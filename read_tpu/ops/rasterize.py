"""Z-buffer point-splat rasterization, TPU-native.

This replaces both of the reference's rasterizers — the OpenGL point
renderer (``READ/gl/programs.py``, ``READ/gl/render.py``) and the CUDA
``pcpr`` kernel (``MyRender/CloudProjection/point_render.cu``) — with one
functional, deterministic formulation that XLA compiles for TPU:

1. project all N points by the composed world->clip matrix and divide by w
   (parity: ``point_render.cu:108-122,137-143``);
2. clip to the NDC cube [-1,1]^3 and map to pixels
   ``u = w(x+1)/2, v = h(1-y)/2``, depth ``(z+1)/2``;
3. per pixel keep the minimum depth and the winning point index via two
   scatter-min passes (depth first, then index among depth winners).

Differences from the reference, by design:
- **Deterministic**: the CUDA kernel breaks depth ties by racey last-write
  (``point_render.cu:148-166``); we break ties by the smallest point index.
- **Empty pixels are -1**, not 0: the reference's index map uses 0 both for
  "no point" and for point id 0 (comment at ``point_render.cu:158``). The
  descriptor sampler masks empties explicitly instead of stealing point 0's
  descriptor.
- Splat sizes > 1px (the GL tree's ``p``/``ps`` point-size modes,
  ``READ/gl/programs.py:183-192``) are square neighborhood scatters here.
- No host round-trips: outputs stay on device (the reference copies to CPU
  every call, ``point_render.cu:196-197``).

All functions are jit/vmap/shard_map friendly: static shapes, no python
control flow on traced values.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RASTER_METHODS",
    "project_points",
    "rasterize",
    "rasterize_batch",
    "rasterize_pyramid",
    "rasterize_pyramid_pooled",
    "rasterize_reference",
    "zbuffer_reference",
]

# Sentinel depth for invalid points; any real NDC depth lies in [0, 1].
_FAR = jnp.float32(2.0)

# Every z-buffer algorithm rasterize() accepts. Checked loudly: an
# unknown string must not silently fall through to a different
# tie-break semantics (config files bypass the CLI argparse choices).
# 'pallas' = scatter1 semantics computed by the sequential-grid Pallas
# kernel (rasterize_pallas.zbuffer_scatter1_pallas) on TPU; on other
# backends it falls back to the bit-identical XLA scatter1.
RASTER_METHODS = ("sort", "sort2", "sort1q", "scatter", "scatter1",
                  "pallas")


def _scatter1_dispatch(pix, depth, ids, n_pixels, depth_by_id, n_ids,
                       method):
    if method == "pallas" and jax.default_backend() == "tpu":
        from read_tpu.ops import rasterize_pallas as _RP
        return _RP.zbuffer_scatter1_pallas(pix, depth, ids, n_pixels,
                                           depth_by_id, n_ids)
    return _zbuffer_scatter1(pix, depth, ids, n_pixels, depth_by_id,
                             n_ids)


def _check_method(method: str) -> None:
    if method not in RASTER_METHODS:
        raise ValueError(
            f"unknown raster method {method!r}; expected one of "
            f"{RASTER_METHODS}")


def project_points(xyz: jax.Array, total_m: jax.Array,
                   return_clip_z: bool = False):
    """Project world points to NDC.

    Args:
      xyz: ``[N, 3]`` float32 world positions.
      total_m: ``[4, 4]`` row-major world->clip matrix
        (``proj @ inv(view)``, see ``scene.camera.total_matrix``).
      return_clip_z: also return the pre-divide clip-space z — the
        quantity the GL vertex shader's z-relative point sizing divides
        by (``gl_PointSize = size / gl_Position.z``,
        ``READ/gl/programs.py:188-192``).

    Returns:
      ``(ndc, valid)``: ``ndc [N, 3]`` post-divide positions and a boolean
      ``valid [N]`` mask of points inside the NDC cube (parity with the
      clip test at ``point_render.cu:139``); with ``return_clip_z`` also
      ``clip_z [N]``.
    """
    xyz = xyz.astype(jnp.float32)
    m = total_m.astype(jnp.float32)
    # Elementwise expansion rather than a [N,3]x[3,4] matmul: keeps the
    # f32 rounding identical whether traced standalone, vmapped over the
    # batch, or inlined into a larger program (a matmul's accumulation
    # order may differ per call pattern and shift boundary pixels).
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    clip = jnp.stack(
        [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3]
         for i in range(3)], axis=-1)
    w = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3]
    # The CUDA kernel divides unconditionally (point_render.cu:120); points
    # behind the camera flip sign and are rejected by the cube test below.
    ndc = clip / w[:, None]
    valid = jnp.all(jnp.abs(ndc) <= 1.0, axis=-1)
    # w <= 0 means the point is at or behind the eye plane; after the
    # divide such points can land inside the cube spuriously, so reject.
    valid &= w > 0
    if return_clip_z:
        return ndc, valid, clip[:, 2]
    return ndc, valid


def _pixel_ids(ndc: jax.Array, valid: jax.Array, h: int, w: int):
    """NDC -> flat pixel ids (invalid -> h*w dump slot) and depths."""
    u = jnp.floor(w * (ndc[:, 0] + 1.0) * 0.5).astype(jnp.int32)
    v = jnp.floor(h * (1.0 - ndc[:, 1]) * 0.5).astype(jnp.int32)
    depth = (ndc[:, 2] + 1.0) * 0.5
    inside = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    pix = jnp.where(inside, v * w + u, h * w)
    depth = jnp.where(inside, depth, _FAR)
    return pix, depth


def _zbuffer(pix: jax.Array, depth: jax.Array, n_pixels: int):
    """Deterministic min-depth scatter with smallest-index tie-break.

    Returns ``(index [n_pixels] int32 with -1 empty, depth [n_pixels])``.
    """
    n = pix.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    dbuf = jnp.full((n_pixels + 1,), _FAR, jnp.float32).at[pix].min(
        depth, mode="drop")
    # Winners: points whose depth equals the per-pixel min.
    win = depth <= dbuf[pix]
    ibuf = jnp.full((n_pixels + 1,), jnp.iinfo(jnp.int32).max,
                    jnp.int32).at[jnp.where(win, pix, n_pixels)].min(
                        ids, mode="drop")
    index = jnp.where(ibuf == jnp.iinfo(jnp.int32).max, -1, ibuf)
    dout = jnp.where(dbuf >= _FAR, 0.0, dbuf)
    return index[:n_pixels], dout[:n_pixels]


def _zbuffer_sort(pix: jax.Array, depth: jax.Array, ids: jax.Array,
                  n_pixels: int):
    """Sort-based deterministic z-buffer.

    Lexicographic sort by (pixel, depth, id) — XLA's TPU sort is a fully
    vectorized bitonic network, unlike scatter-with-min-combiner which
    serializes conflicting updates — then the first element of each pixel
    segment is the winner, written back with a unique-index scatter.
    Same semantics as :func:`_zbuffer` (min depth, smallest id ties,
    -1/0 empties).
    """
    spix, sdep, sid = jax.lax.sort((pix, depth, ids), num_keys=3)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), spix[1:] != spix[:-1]])
    win = first & (spix < n_pixels)
    # Winner targets are unique by construction (one per pixel segment);
    # losers aim at the out-of-bounds dump slot and are dropped.
    # unique_indices lets XLA emit a fully parallel scatter instead of a
    # serialized combining one (~10x on TPU).
    tgt = jnp.where(win, spix, n_pixels)
    ibuf = jnp.full((n_pixels,), -1, jnp.int32).at[tgt].set(
        sid, mode="drop", unique_indices=True)
    dbuf = jnp.zeros((n_pixels,), jnp.float32).at[tgt].set(
        sdep, mode="drop", unique_indices=True)
    return ibuf, dbuf


def _zbuffer_sort2(pix: jax.Array, depth: jax.Array, ids: jax.Array,
                   n_pixels: int):
    """:func:`_zbuffer_sort` with a 2-key comparator.

    Non-negative f32 depths bitcast to int32 preserve order, so the
    (pixel, depth) comparator needs no float compare; the id rides as a
    stable-sort payload — ids enter in increasing order, so stability
    IS the smallest-id tie-break. Same semantics as the 3-key sort.
    """
    dkey = jax.lax.bitcast_convert_type(depth, jnp.int32)
    spix, sdk, sid = jax.lax.sort((pix, dkey, ids), num_keys=2,
                                  is_stable=True)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), spix[1:] != spix[:-1]])
    win = first & (spix < n_pixels)
    tgt = jnp.where(win, spix, n_pixels)
    ibuf = jnp.full((n_pixels,), -1, jnp.int32).at[tgt].set(
        sid, mode="drop", unique_indices=True)
    dbuf = jnp.zeros((n_pixels,), jnp.float32).at[tgt].set(
        jax.lax.bitcast_convert_type(sdk, jnp.float32), mode="drop",
        unique_indices=True)
    return ibuf, dbuf


def _zbuffer_sort1q(pix: jax.Array, depth: jax.Array, ids: jax.Array,
                    n_pixels: int):
    """Single-key quantized sort z-buffer (bench variant).

    Packs (pixel, depth) into ONE int32 key: the depth (always in
    [0, 1]; _FAR marks invalid) is quantized to the bits left over
    after the pixel id — ``key = pix << db | round(depth * (2^db-1))``
    — and a stable 1-key sort with the id as payload gives the same
    winner-per-pixel-segment structure as :func:`_zbuffer_sort` with a
    scalar int comparator instead of a 2/3-key lexicographic one.

    Semantics difference: depths that collide within one quantization
    bin (2^-db of the [0,1] range) tie-break by smallest id instead of
    true depth order. The returned depth is EXACT (re-gathered from the
    winner's id), only the choice among near-equal-depth points can
    differ from :func:`_zbuffer`. Requires ``n_pixels << db < 2^31``.
    """
    db = 0
    while (n_pixels + 2) << (db + 1) < 2 ** 31:
        db += 1
    if db < 8:
        raise ValueError(f"sort1q: only {db} depth bits for "
                         f"{n_pixels} pixels; use method='sort'")
    qmax = (1 << db) - 1
    q = jnp.clip(jnp.round(depth * qmax), 0, qmax).astype(jnp.int32)
    # invalid points carry pix == n_pixels which already sorts last
    key = (pix << db) | q
    skey, sid = jax.lax.sort((key, ids), num_keys=1, is_stable=True)
    spix = skey >> db
    first = jnp.concatenate(
        [jnp.ones((1,), bool), spix[1:] != spix[:-1]])
    win = first & (spix < n_pixels)
    tgt = jnp.where(win, spix, n_pixels)
    ibuf = jnp.full((n_pixels,), -1, jnp.int32).at[tgt].set(
        sid, mode="drop", unique_indices=True)
    # exact winner depth: re-gather through the id map
    dbuf = jnp.where(ibuf >= 0, depth[jnp.maximum(ibuf, 0)], 0.0)
    return ibuf, dbuf


def _zbuffer_scatter1(pix: jax.Array, depth: jax.Array, ids: jax.Array,
                      n_pixels: int, depth_by_id: jax.Array,
                      n_ids: int):
    """ONE-pass packed scatter-min z-buffer (the TPU fast path).

    Packs (quantized depth, id) into a single int32 key —
    ``key = round(depth * (2^db - 1)) << idb | id`` with
    ``idb = ceil(log2(n_ids))`` — and resolves every pixel with ONE
    ``scatter-min`` instead of the two passes of :func:`_zbuffer` or
    the O(N log N) sort of :func:`_zbuffer_sort`. Same-window timing at
    1M points / 447k pixels: 13.1 ms vs 17.3 (sort) / 23.3 (2-pass
    scatter) — RESULTS_r03.md.

    Semantics vs :func:`_zbuffer`: ties *within one depth-quantization
    bin* (2^-db of the [0,1] NDC range) break by smallest id instead of
    exact depth order; winners whose true depths differ by more than a
    bin are identical. Deterministic either way. The returned depth is
    EXACT (re-gathered per id from ``depth_by_id [n_ids]``). Raises if
    fewer than 8 depth bits remain (fall back to ``method='sort'``).
    """
    idb = max(1, (n_ids - 1).bit_length())
    db = 31 - idb
    if db < 8:
        raise ValueError(f"scatter1: only {db} depth bits for "
                         f"{n_ids} ids; use method='sort'")
    qmax = (1 << db) - 1
    # clip to qmax-1, not qmax: when n_ids is an exact power of two the
    # id field can be all-ones, and q == qmax would make the packed key
    # equal the INT32_MAX empty sentinel — a covered far-plane pixel
    # would read as empty. Merging the last two depth bins is harmless
    # (depth == 1.0 only at the far clip plane).
    q = jnp.clip(depth * qmax, 0, qmax - 1).astype(jnp.int32)
    key = jnp.where(pix < n_pixels, (q << idb) | ids,
                    jnp.iinfo(jnp.int32).max)
    buf = jnp.full((n_pixels + 1,), jnp.iinfo(jnp.int32).max, jnp.int32
                   ).at[jnp.minimum(pix, n_pixels)].min(key, mode="drop")
    buf = buf[:n_pixels]
    empty = buf == jnp.iinfo(jnp.int32).max
    ibuf = jnp.where(empty, -1, buf & ((1 << idb) - 1))
    dbuf = jnp.where(empty, 0.0, depth_by_id[jnp.maximum(ibuf, 0)])
    return ibuf, dbuf


def rasterize(xyz: jax.Array, total_m: jax.Array, h: int, w: int,
              point_radius: int = 0, method: str = "sort",
              ndc_jitter: jax.Array = None,
              point_sizes: jax.Array = None,
              relative_size: bool = False,
              min_point_size: float = 1.0):
    """Rasterize one view: ``(index [h,w] int32, depth [h,w] f32)``.

    ``point_radius`` r>0 splats each point over a (2r+1)^2 pixel square
    (GL point-size semantics, ``READ/gl/programs.py:183-192``); each
    covered pixel still depth-tests independently. With ``point_sizes``
    or ``relative_size`` it is the STATIC cap on the splat radius (the
    unroll bound); effective per-point sizes are clamped to
    ``2*point_radius+1``.

    ``point_sizes``: optional ``[N]`` per-point pixel sizes (the GL
    per-point ``a_point_size`` buffer, active when the global size is
    <1; ``programs.py:183-186``; fed from the scene manifest's
    ``point_sizes`` key, ``gl/utils.py:330-336``).

    ``relative_size``: the ``ps`` (z-scaled splat) mode —
    ``size = max(min_point_size, size / clip_z)``
    (``programs.py:188-192``).

    Coverage rule: a point of effective size ``s`` covers pixel offsets
    with ``max(|dx|, |dy|) <= (s-1)/2`` — exact GL parity for odd
    integer sizes; fractional sizes round to the nearest odd square.

    ``method``: 'sort' (vectorized bitonic sort + unique scatter; exact
    reference semantics, the training default), 'scatter1' (ONE packed
    scatter-min, ~25% faster at 1M points; ties within a depth
    quantization bin break by id — see :func:`_zbuffer_scatter1`), or
    'scatter' (two scatter-min passes; simpler, kept as the reference
    XLA formulation and for small point counts).

    ``ndc_jitter``: optional ``[N, 2]`` NDC-space offsets added after
    projection — the screen-space point perturbation augmentation
    (``READ/gl/programs.py:127-128,352-357``; build offsets with
    ``ops.augment.perturb_pixels``).
    """
    _check_method(method)
    varying = point_sizes is not None or relative_size
    ndc, valid, clip_z = project_points(xyz, total_m, return_clip_z=True)
    if ndc_jitter is not None:
        ndc = ndc.at[:, :2].add(ndc_jitter)
    if point_radius == 0 and not varying:
        pix, depth = _pixel_ids(ndc, valid, h, w)
        n = pix.shape[0]
        if method in ("sort", "sort2", "sort1q", "scatter1", "pallas"):
            ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            if method in ("scatter1", "pallas"):
                index, dbuf = _scatter1_dispatch(pix, depth, ids, h * w,
                                                 depth, n, method)
            else:
                zb = {"sort": _zbuffer_sort, "sort2": _zbuffer_sort2,
                      "sort1q": _zbuffer_sort1q}[method]
                index, dbuf = zb(pix, depth, ids, h * w)
        else:
            index, dbuf = _zbuffer(pix, depth, h * w)
        return index.reshape(h, w), dbuf.reshape(h, w)

    # Splat: offset the pixel id by (dy, dx); accumulate min over all
    # offsets with a single combined scatter per offset.
    u = jnp.floor(w * (ndc[:, 0] + 1.0) * 0.5).astype(jnp.int32)
    v = jnp.floor(h * (1.0 - ndc[:, 1]) * 0.5).astype(jnp.int32)
    depth0 = (ndc[:, 2] + 1.0) * 0.5
    n = xyz.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    rad = None
    if varying:
        if point_sizes is not None:
            base = jnp.asarray(point_sizes, jnp.float32)
        else:
            base = jnp.full((n,), float(2 * point_radius + 1),
                            jnp.float32)
        if relative_size:
            size = jnp.maximum(jnp.float32(min_point_size),
                               base / jnp.maximum(clip_z, 1e-6))
        else:
            size = base
        size = jnp.minimum(size, float(2 * point_radius + 1))
        rad = (size - 1.0) * 0.5
    offsets = [(dy, dx)
               for dy in range(-point_radius, point_radius + 1)
               for dx in range(-point_radius, point_radius + 1)]
    pix_all, dep_all = [], []
    for dy, dx in offsets:
        uu, vv = u + dx, v + dy
        inside = valid & (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        if rad is not None and (dy or dx):
            inside &= rad >= (max(abs(dy), abs(dx)) - 1e-4)
        pix_all.append(jnp.where(inside, vv * w + uu, h * w))
        dep_all.append(jnp.where(inside, depth0, _FAR))
    pix = jnp.concatenate(pix_all)
    dep = jnp.concatenate(dep_all)
    ids_rep = jnp.tile(ids, len(offsets))
    if method in ("scatter1", "pallas"):
        # exact winner depth re-gathers by id from the per-point depth0
        index, dout = _scatter1_dispatch(pix, dep, ids_rep, h * w,
                                         jnp.where(valid, depth0, 0.0),
                                         n, method)
        return index.reshape(h, w), dout.reshape(h, w)
    if method in ("sort", "sort2", "sort1q"):
        zb = {"sort": _zbuffer_sort, "sort2": _zbuffer_sort2,
              "sort1q": _zbuffer_sort1q}[method]
        index, dout = zb(pix, dep, ids_rep, h * w)
        return index.reshape(h, w), dout.reshape(h, w)
    dbuf = jnp.full((h * w + 1,), _FAR, jnp.float32)
    dbuf = dbuf.at[pix].min(dep, mode="drop")
    win = dep <= dbuf[pix]
    ibuf = jnp.full((h * w + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    ibuf = ibuf.at[jnp.where(win, pix, h * w)].min(ids_rep, mode="drop")
    index = jnp.where(ibuf == jnp.iinfo(jnp.int32).max, -1, ibuf)
    dout = jnp.where(dbuf >= _FAR, 0.0, dbuf)
    return index[:h * w].reshape(h, w), dout[:h * w].reshape(h, w)


def _rasterize_batch_pallas_splat(xyz, total_m, h, w, point_radius,
                                  ndc_jitter, point_sizes, relative_size,
                                  min_point_size):
    """Batched pallas z-buffer for splatted / per-point-sized points.

    Same coverage rule as :func:`rasterize`'s splat loop (GL parity,
    ``READ/gl/programs.py:183-192``) but built with a batch dimension:
    the (2r+1)^2 offset expansion concatenates along the point axis to
    ``[B, N*K]`` and ONE natively-batched kernel resolves every view.
    """
    from read_tpu.ops import rasterize_pallas as _RP
    b = total_m.shape[0]
    n = xyz.shape[0]
    ndc, valid, clip_z = jax.vmap(
        lambda m: project_points(xyz, m, return_clip_z=True))(total_m)
    if ndc_jitter is not None:
        ndc = ndc.at[:, :, :2].add(ndc_jitter[None])
    u = jnp.floor(w * (ndc[..., 0] + 1.0) * 0.5).astype(jnp.int32)
    v = jnp.floor(h * (1.0 - ndc[..., 1]) * 0.5).astype(jnp.int32)
    depth0 = (ndc[..., 2] + 1.0) * 0.5
    ids = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1), (b, n))
    rad = None
    if point_sizes is not None or relative_size:
        if point_sizes is not None:
            base = jnp.broadcast_to(
                jnp.asarray(point_sizes, jnp.float32)[None], (b, n))
        else:
            base = jnp.full((b, n), float(2 * point_radius + 1),
                            jnp.float32)
        if relative_size:
            size = jnp.maximum(jnp.float32(min_point_size),
                               base / jnp.maximum(clip_z, 1e-6))
        else:
            size = base
        size = jnp.minimum(size, float(2 * point_radius + 1))
        rad = (size - 1.0) * 0.5
    offsets = [(dy, dx)
               for dy in range(-point_radius, point_radius + 1)
               for dx in range(-point_radius, point_radius + 1)]
    pix_all, dep_all = [], []
    for dy, dx in offsets:
        uu, vv = u + dx, v + dy
        inside = valid & (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        if rad is not None and (dy or dx):
            inside &= rad >= (max(abs(dy), abs(dx)) - 1e-4)
        pix_all.append(jnp.where(inside, vv * w + uu, h * w))
        dep_all.append(jnp.where(inside, depth0, _FAR))
    pix = jnp.concatenate(pix_all, axis=1)
    dep = jnp.concatenate(dep_all, axis=1)
    ids_rep = jnp.tile(ids, (1, len(offsets)))
    key, idb = _RP.pack_keys(pix, dep, ids_rep, h * w, n)
    buf = _RP.zbuffer_pallas2(jnp.minimum(pix, h * w), key, h * w)
    empty = buf == jnp.iinfo(jnp.int32).max
    index = jnp.where(empty, -1, buf & ((1 << idb) - 1))
    dby = jnp.where(valid, depth0, 0.0)
    dout = jnp.where(
        empty, 0.0,
        jnp.take_along_axis(dby, jnp.maximum(index, 0), axis=1))
    return index.reshape(b, h, w), dout.reshape(b, h, w)


def rasterize_batch(xyz: jax.Array, total_m: jax.Array, h: int, w: int,
                    point_radius: int = 0, method: str = "sort",
                    ndc_jitter: jax.Array = None,
                    point_sizes: jax.Array = None,
                    relative_size: bool = False,
                    min_point_size: float = 1.0):
    """Batch of views: ``total_m [B,4,4]`` -> ``(index [B,h,w], depth)``.

    Replaces the host loop over the batch at ``point_render.cu:186-192``.
    The 'sort' method z-buffers ALL views in ONE sort by offsetting pixel
    ids with ``view * h * w`` — a bitonic sort is strongly sublinear in
    practice on TPU, so one BxN sort beats B separate N sorts.
    """
    _check_method(method)
    varying = point_sizes is not None or relative_size
    if (method == "pallas" and total_m.ndim == 3
            and jax.default_backend() == "tpu"
            and (varying or point_radius > 0)):
        # splats: build the batched [B, N*K] offset expansion here and
        # feed the natively-batched kernel — vmapping the single-view
        # kernel fails Mosaic's SMEM block-batching rule.
        return _rasterize_batch_pallas_splat(
            xyz, total_m, h, w, point_radius, ndc_jitter, point_sizes,
            relative_size, min_point_size)
    if varying:
        f = functools.partial(
            rasterize, h=h, w=w, point_radius=point_radius,
            method=method, ndc_jitter=ndc_jitter,
            point_sizes=point_sizes, relative_size=relative_size,
            min_point_size=min_point_size)
        return jax.vmap(lambda m: f(xyz, m))(total_m)
    if method == "sort" and point_radius == 0 and total_m.ndim == 3:
        b = total_m.shape[0]
        n = xyz.shape[0]
        ndc, valid = jax.vmap(project_points,
                              in_axes=(None, 0))(xyz, total_m)
        if ndc_jitter is not None:
            ndc = ndc.at[:, :, :2].add(ndc_jitter[None])
        u = jnp.floor(w * (ndc[..., 0] + 1.0) * 0.5).astype(jnp.int32)
        v = jnp.floor(h * (1.0 - ndc[..., 1]) * 0.5).astype(jnp.int32)
        depth = (ndc[..., 2] + 1.0) * 0.5
        inside = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        offs = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) * (h * w)
        pix = jnp.where(inside, v * w + u + offs, b * h * w)
        depth = jnp.where(inside, depth, _FAR)
        ids = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1), (b, n))
        index, dbuf = _zbuffer_sort(pix.reshape(-1), depth.reshape(-1),
                                    ids.reshape(-1), b * h * w)
        return index.reshape(b, h, w), dbuf.reshape(b, h, w)
    if (method == "pallas" and point_radius == 0 and total_m.ndim == 3
            and jax.default_backend() == "tpu"):
        # natively-batched kernel: the flat grid covers all views'
        # chunks back-to-back (vmap over the kernel fails Mosaic's
        # SMEM block-batching rule, and B separate dispatches waste
        # the per-executable entry cost)
        from read_tpu.ops import rasterize_pallas as _RP
        b = total_m.shape[0]
        n = xyz.shape[0]
        ndc, valid = jax.vmap(project_points,
                              in_axes=(None, 0))(xyz, total_m)
        if ndc_jitter is not None:
            ndc = ndc.at[:, :, :2].add(ndc_jitter[None])
        u = jnp.floor(w * (ndc[..., 0] + 1.0) * 0.5).astype(jnp.int32)
        v = jnp.floor(h * (1.0 - ndc[..., 1]) * 0.5).astype(jnp.int32)
        depth = (ndc[..., 2] + 1.0) * 0.5
        inside = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        pix = jnp.where(inside, v * w + u, h * w)
        dep = jnp.where(inside, depth, _FAR)
        ids = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1), (b, n))
        key, idb = _RP.pack_keys(pix, dep, ids, h * w, n)
        buf = _RP.zbuffer_pallas2(jnp.minimum(pix, h * w), key, h * w)
        empty = buf == jnp.iinfo(jnp.int32).max
        index = jnp.where(empty, -1, buf & ((1 << idb) - 1))
        depth0 = jnp.where(valid, depth, 0.0)
        dout = jnp.where(
            empty, 0.0,
            jnp.take_along_axis(depth0, jnp.maximum(index, 0), axis=1))
        return index.reshape(b, h, w), dout.reshape(b, h, w)
    f = functools.partial(rasterize, h=h, w=w, point_radius=point_radius,
                          method=method, ndc_jitter=ndc_jitter)
    return jax.vmap(f, in_axes=(None, 0))(xyz, total_m)


def rasterize_pyramid(xyz: jax.Array, total_m: jax.Array,
                      target_shape: Sequence[int], num_scales: int = 5,
                      point_radius: int = 0, method: str = "sort"):
    """Multi-scale pyramid: scale i renders at ``target/2^i``.

    Mirrors ``MyRender.render`` (``src/READ/gl/myrender.py:32-43``): scale
    comes from list position; one projection pass is shared by all scales.

    Args:
      target_shape: ``(h, w)`` of scale 0.

    Returns:
      list of ``(index [B,hi,wi] int32, depth [B,hi,wi] f32)`` per scale.
    """
    h0, w0 = target_shape
    out = []
    for i in range(num_scales):
        h, w = h0 // (2 ** i), w0 // (2 ** i)
        out.append(rasterize_batch(xyz, total_m, h, w, point_radius,
                                   method))
    return out


def _pool2x2_zbuffer(index: jax.Array, depth: jax.Array):
    """Exact 2x2 min-depth pooling of an (index, depth) buffer pair.

    Because pixel coordinates are floors of a common projection,
    ``floor(u/2^i) == floor(floor(u/2^(i-1))/2)``, the winner of a coarse
    pixel is exactly the lexicographic (depth, id) minimum of its four
    fine sub-pixels. This turns the 5-scale pyramid into ONE rasterization
    + four cheap reductions (the reference rasterizes every scale from
    scratch: ``myrender.py:32-40``).
    """
    b, h, w = index.shape
    ix = index.reshape(b, h // 2, 2, w // 2, 2)
    dp = depth.reshape(b, h // 2, 2, w // 2, 2)
    dp = jnp.where(ix < 0, _FAR, dp)  # empty -> +inf for the min

    def combine(a, c):
        (ia, da), (ic, dc) = a, c
        better = (dc < da) | ((dc == da) & (ic < ia))
        return (jnp.where(better, ic, ia), jnp.where(better, dc, da))

    out = (ix[:, :, 0, :, 0], dp[:, :, 0, :, 0])
    for sy, sx in ((0, 1), (1, 0), (1, 1)):
        out = combine(out, (ix[:, :, sy, :, sx], dp[:, :, sy, :, sx]))
    oi, od = out
    od = jnp.where(oi < 0, 0.0, od)
    return oi, od


def _pool2x2_packed(index: jax.Array, depth: jax.Array, n_ids: int,
                    num_scales: int):
    """Coarse pyramid levels by min-pooling ONE packed int32 key.

    The exact pair pool (:func:`_pool2x2_zbuffer`) costs ~5.7 ms/frame
    at 1216x368 on the TPU — its 16 lane-strided slices + select chains
    lower terribly. Packing (quantized depth << id_bits) | id (the
    :func:`_zbuffer_scatter1` key) turns each level into a single
    int32 ``min`` reduce. Semantics: ties within one depth-quantization
    bin (2^-db of NDC depth) break by smallest id — for buffers that
    came from scatter1/pallas this is EXACTLY the fine-level winner
    rule, so the pool is self-consistent; returned coarse depths are
    bin centers (<= 2^-db absolute error), level 0 stays exact.
    """
    idb = max(1, (n_ids - 1).bit_length())
    db = 31 - idb
    if db < 8:
        raise ValueError(f"packed pool: only {db} depth bits for "
                         f"{n_ids} ids; use pool_impl='exact'")
    qmax = (1 << db) - 1
    sentinel = jnp.iinfo(jnp.int32).max
    q = jnp.clip(depth * qmax, 0, qmax - 1).astype(jnp.int32)
    key = jnp.where(index < 0, sentinel, (q << idb) | index)
    out = [(index, depth)]
    for _ in range(1, num_scales):
        b, hh, ww = key.shape
        key = key.reshape(b, hh // 2, 2, ww // 2, 2).min(axis=(2, 4))
        empty = key == sentinel
        ix = jnp.where(empty, -1, key & ((1 << idb) - 1))
        dq = jnp.where(empty, 0.0,
                       (key >> idb).astype(jnp.float32) / qmax)
        out.append((ix, dq))
    return out


def rasterize_pyramid_pooled(xyz: jax.Array, total_m: jax.Array,
                             target_shape: Sequence[int],
                             num_scales: int = 5,
                             point_radius: int = 0,
                             method: str = "sort",
                             ndc_jitter: jax.Array = None,
                             point_sizes: jax.Array = None,
                             relative_size: bool = False,
                             min_point_size: float = 1.0,
                             pool_impl: str = "exact"):
    """Multi-scale pyramid via one full-res rasterization + exact 2x2
    min-pooling (see :func:`_pool2x2_zbuffer`). Equivalent to
    :func:`rasterize_pyramid` when ``target_shape`` is divisible by
    ``2^(num_scales-1)`` and ``point_radius == 0``; with splats the pooled
    variant applies the splat at full resolution only (a coarse-scale
    splat still covers >=1 pixel after pooling).

    ``pool_impl='packed'`` pools a single packed int32 key instead of
    the (depth, id) pair — much faster on TPU, scatter1-bin tie
    semantics, coarse depths quantized (see :func:`_pool2x2_packed`);
    the inference/bench path uses it, training keeps 'exact'."""
    h0, w0 = target_shape
    idx, dep = rasterize_batch(xyz, total_m, h0, w0, point_radius, method,
                               ndc_jitter, point_sizes=point_sizes,
                               relative_size=relative_size,
                               min_point_size=min_point_size)
    if pool_impl == "packed":
        return _pool2x2_packed(idx, dep, xyz.shape[0], num_scales)
    out = [(idx, dep)]
    for _ in range(1, num_scales):
        idx, dep = _pool2x2_zbuffer(idx, dep)
        out.append((idx, dep))
    return out


def zbuffer_reference(ndc: np.ndarray, valid: np.ndarray, h: int,
                      w: int) -> tuple:
    """Sequential z-buffer oracle over precomputed NDC points (same
    semantics as :func:`rasterize`: min depth, smallest index wins ties,
    -1 empty). Used by tests to validate the scatter logic exactly."""
    index = np.full((h, w), -1, np.int32)
    depth = np.zeros((h, w), np.float64)
    for i in range(ndc.shape[0]):
        if not valid[i]:
            continue
        x, y, z = ndc[i]
        u = int(np.floor(w * (x + 1) * 0.5))
        v = int(np.floor(h * (1 - y) * 0.5))
        if not (0 <= u < w and 0 <= v < h):
            continue
        d = (z + 1) * 0.5
        if index[v, u] < 0 or d < depth[v, u]:
            index[v, u] = i
            depth[v, u] = d
    return index, depth.astype(np.float32)


def rasterize_reference(xyz: np.ndarray, total_m: np.ndarray, h: int,
                        w: int) -> tuple:
    """Full sequential numpy oracle (f64 projection + z-buffer)."""
    xyz = np.asarray(xyz, np.float64)
    m = np.asarray(total_m, np.float64)
    n = xyz.shape[0]
    hom = np.concatenate([xyz, np.ones((n, 1))], axis=1)
    clip = hom @ m.T
    with np.errstate(divide="ignore", invalid="ignore"):
        ndc = clip[:, :3] / clip[:, 3:4]
    valid = (clip[:, 3] > 0) & np.all(np.abs(ndc) <= 1.0, axis=1)
    return zbuffer_reference(ndc, valid, h, w)
