"""Pallas TPU z-buffer scatter kernel.

The device-native replacement for the reference's CUDA ``DepthProject``
kernel (``MyRender/CloudProjection/point_render.cu:125-167``). The CUDA
version resolves write conflicts with a per-pixel atomicCAS spinlock; a
TPU has no atomics, and XLA's scatter-min serializes. This kernel instead
exploits the TPU's *sequential* grid execution:

- the framebuffer (depth + winning index) lives in VMEM for the whole
  pass, laid out ``[HW/128, 128]`` (lane-major);
- point chunks stream through SMEM (scalar memory) so per-point pixel
  ids/depths can be read with dynamic scalar indices;
- each point performs a read-modify-write of its framebuffer row with a
  one-hot lane mask: ``better = onehot(col) & (d < row_depths)``.

Determinism: points are processed in ascending id order (sequential grid
x sequential fori_loop) and ties keep the earlier (smaller) id via the
strict ``<`` test — identical semantics to ``ops.rasterize`` ('sort' and
'scatter' methods) and free of the reference's race on equal depths.

Cost: O(1) VPU row ops per point, independent of conflict density.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["zbuffer_pallas", "rasterize_pallas", "zbuffer_pallas2",
           "pack_keys", "zbuffer_scatter1_pallas"]

_LANES = 128
_FAR = 2.0  # any real NDC depth is in [0, 1]


def _kernel(pix_ref, dep_ref, idx_out, dep_out, *, chunk, n_rows,
            n_valid):
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _init():
        idx_out[:] = jnp.full_like(idx_out[:], -1)
        dep_out[:] = jnp.full_like(dep_out[:], _FAR)

    base = ci * chunk
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def body(j, _):
        p = pix_ref[j]
        d = dep_ref[j]

        @pl.when(p >= 0)  # dump slot for clipped/invalid points is -1
        def _update():
            row = p // _LANES
            col = p % _LANES
            drow = dep_out[pl.ds(row, 1), :]
            better = (lane_ids == col) & (d < drow)
            dep_out[pl.ds(row, 1), :] = jnp.where(better, d, drow)
            irow = idx_out[pl.ds(row, 1), :]
            idx_out[pl.ds(row, 1), :] = jnp.where(better, base + j, irow)

        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=False)


def zbuffer_pallas(pix: jax.Array, depth: jax.Array, n_pixels: int,
                   chunk: int = 1024, interpret: bool = False):
    """Z-buffer N points into a flat framebuffer.

    Args:
      pix: ``[N]`` int32 flat pixel ids; -1 marks invalid points.
        Point id == position in the array.
      depth: ``[N]`` f32 depths in [0, 1].
      n_pixels: framebuffer size (h*w).

    Returns ``(index [n_pixels] int32 (-1 empty), depth [n_pixels] f32
    (0 empty))``.
    """
    n = pix.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        pix = jnp.concatenate([pix, jnp.full((n_pad,), -1, jnp.int32)])
        depth = jnp.concatenate(
            [depth, jnp.zeros((n_pad,), jnp.float32)])
    n_total = pix.shape[0]
    n_rows = -(-n_pixels // _LANES)

    grid = (n_total // chunk,)
    kernel = functools.partial(_kernel, chunk=chunk, n_rows=n_rows,
                               n_valid=n)
    idx, dep = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_rows, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(pix.astype(jnp.int32), depth.astype(jnp.float32))
    idx = idx.reshape(-1)[:n_pixels]
    dep = dep.reshape(-1)[:n_pixels]
    dep = jnp.where(idx < 0, 0.0, dep)
    return idx, dep


def rasterize_pallas(xyz: jax.Array, total_m: jax.Array, h: int, w: int,
                     chunk: int = 1024, interpret: bool = False):
    """Full single-view rasterization using the Pallas z-buffer."""
    from read_tpu.ops.rasterize import project_points

    ndc, valid = project_points(xyz, total_m)
    u = jnp.floor(w * (ndc[:, 0] + 1.0) * 0.5).astype(jnp.int32)
    v = jnp.floor(h * (1.0 - ndc[:, 1]) * 0.5).astype(jnp.int32)
    depth = (ndc[:, 2] + 1.0) * 0.5
    inside = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    pix = jnp.where(inside, v * w + u, -1)
    idx, dep = zbuffer_pallas(pix, depth, h * w, chunk, interpret)
    return idx.reshape(h, w), dep.reshape(h, w)


# ---------------------------------------------------------------------------
# v2: packed single-buffer kernel (scatter1 semantics, batched)
# ---------------------------------------------------------------------------

_INT_MAX = jnp.iinfo(jnp.int32).max


def _kernel2(pix_ref, key_ref, buf, *, chunk, unroll, chunks_per_view):
    """Sequential-grid scatter-min of packed (depth, id) int32 keys.

    One VMEM row read-modify-write per point — half the traffic of the
    v1 kernel (which kept separate depth and index buffers). Invalid
    points carry the dump-row pixel id, so the loop body is branch-free
    (no per-point @pl.when predication). Batched natively: the flat
    grid covers B views' chunks back to back; the framebuffer block
    switches per view via the output index_map and re-inits at each
    view's first chunk. (vmap over the kernel is NOT used: Mosaic
    rejects squeezed SMEM batch blocks on real TPUs.)
    """
    ci = pl.program_id(0)

    @pl.when(ci % chunks_per_view == 0)
    def _init():
        buf[:] = jnp.full_like(buf[:], _INT_MAX)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def body(j, _):
        for u in range(unroll):
            p = pix_ref[j * unroll + u]
            k = key_ref[j * unroll + u]
            row = p >> 7          # _LANES == 128
            col = p & (_LANES - 1)
            krow = buf[0, pl.ds(row, 1), :]
            take = (lane_ids == col) & (k < krow)
            buf[0, pl.ds(row, 1), :] = jnp.where(take, k, krow)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=False)


def zbuffer_pallas2(pix: jax.Array, key: jax.Array, n_pixels: int,
                    chunk: int = 16384, unroll: int = 4,
                    interpret: bool = False) -> jax.Array:
    """Packed-key z-buffer: returns the per-pixel MIN of ``key``
    (``_INT_MAX`` = empty). Semantics identical to
    ``rasterize._zbuffer_scatter1``'s scatter-min, computed by a
    sequential-grid Pallas kernel instead of XLA's serialized scatter
    (8.6 vs 16.0 ms at 1M points / 447k pixels, scripts/bench_r4_probe).

    Args:
      pix: ``[N]`` or ``[B, N]`` int32 flat pixel ids; invalid points
        must carry a dump id ``>= n_pixels``.
      key: same shape, int32 packed ``(qdepth << idb) | point_id``
        (build with :func:`pack_keys`).

    Returns ``[n_pixels]`` (or ``[B, n_pixels]``) min-key buffers.
    """
    batched = pix.ndim == 2
    if not batched:
        pix, key = pix[None], key[None]
    b, n = pix.shape
    n_pad = (-n) % chunk
    n_rows = -(-n_pixels // _LANES) + 1  # +1 dump row band
    dump = n_rows * _LANES - 1
    pix = jnp.minimum(pix, dump)
    if n_pad:
        pix = jnp.concatenate(
            [pix, jnp.full((b, n_pad), dump, jnp.int32)], axis=1)
        key = jnp.concatenate(
            [key, jnp.full((b, n_pad), _INT_MAX, jnp.int32)], axis=1)
    chunks_per_view = pix.shape[1] // chunk
    grid = (b * chunks_per_view,)
    kernel = functools.partial(_kernel2, chunk=chunk, unroll=unroll,
                               chunks_per_view=chunks_per_view)
    buf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_rows, _LANES),
            lambda i: (i // chunks_per_view, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_rows, _LANES), jnp.int32),
        interpret=interpret,
    )(pix.reshape(-1).astype(jnp.int32),
      key.reshape(-1).astype(jnp.int32))
    out = buf.reshape(b, -1)[:, :n_pixels]
    return out if batched else out[0]


def _kernel3(pix_ref, key_ref, buf, *, chunk, unroll):
    """Tile-aligned variant of :func:`_kernel2`: the framebuffer is laid
    out ``[n_tiles, 8, 128]`` and each point read-modify-writes the full
    (8, 128) VMEM tile containing its pixel (dynamic index on the tile
    dim only — no dynamic sublane shifts)."""
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _init():
        buf[:] = jnp.full_like(buf[:], _INT_MAX)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _LANES), 2)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _LANES), 1)

    def body(j, _):
        for u in range(unroll):
            p = pix_ref[j * unroll + u]
            k = key_ref[j * unroll + u]
            tile = p >> 10            # 8 * 128 pixels per tile
            sub = (p >> 7) & 7
            col = p & (_LANES - 1)
            krow = buf[pl.ds(tile, 1), :, :]
            take = (lane_ids == col) & (sub_ids == sub) & (k < krow)
            buf[pl.ds(tile, 1), :, :] = jnp.where(take, k, krow)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=False)


def zbuffer_pallas3(pix: jax.Array, key: jax.Array, n_pixels: int,
                    chunk: int = 16384, unroll: int = 4,
                    interpret: bool = False) -> jax.Array:
    """:func:`zbuffer_pallas2` with the tile-aligned kernel."""
    n = pix.shape[0]
    n_pad = (-n) % chunk
    n_tiles = -(-n_pixels // (8 * _LANES)) + 1  # +1 dump tile
    dump = n_tiles * 8 * _LANES - 1
    pix = jnp.minimum(pix, dump)
    if n_pad:
        pix = jnp.concatenate([pix, jnp.full((n_pad,), dump, jnp.int32)])
        key = jnp.concatenate([key, jnp.full((n_pad,), _INT_MAX,
                                             jnp.int32)])
    grid = (pix.shape[0] // chunk,)
    kernel = functools.partial(_kernel3, chunk=chunk, unroll=unroll)
    buf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((n_tiles, 8, _LANES), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, _LANES), jnp.int32),
        interpret=interpret,
    )(pix.astype(jnp.int32), key.astype(jnp.int32))
    return buf.reshape(-1)[:n_pixels]


def pack_keys(pix: jax.Array, depth: jax.Array, ids: jax.Array,
              n_pixels: int, n_ids: int):
    """scatter1 key packing (``rasterize._zbuffer_scatter1`` parity):
    ``key = clip(round(depth * qmax), 0, qmax-1) << idb | id``; invalid
    points (``pix >= n_pixels``) get ``_INT_MAX``."""
    idb = max(1, (n_ids - 1).bit_length())
    db = 31 - idb
    if db < 8:
        raise ValueError(f"pallas zbuffer: only {db} depth bits for "
                         f"{n_ids} ids; use method='sort'")
    qmax = (1 << db) - 1
    q = jnp.clip(depth * qmax, 0, qmax - 1).astype(jnp.int32)
    key = jnp.where(pix < n_pixels, (q << idb) | ids, _INT_MAX)
    return key, idb


def zbuffer_scatter1_pallas(pix: jax.Array, depth: jax.Array,
                            ids: jax.Array, n_pixels: int,
                            depth_by_id: jax.Array, n_ids: int,
                            interpret: bool = False):
    """Drop-in replacement for ``rasterize._zbuffer_scatter1`` backed by
    :func:`zbuffer_pallas2` (same packed keys, same unpack, EXACT
    re-gathered winner depths)."""
    key, idb = pack_keys(pix, depth, ids, n_pixels, n_ids)
    pix_safe = jnp.where(pix < n_pixels, pix, n_pixels)
    buf = zbuffer_pallas2(pix_safe, key, n_pixels, interpret=interpret)
    empty = buf == _INT_MAX
    ibuf = jnp.where(empty, -1, buf & ((1 << idb) - 1))
    dbuf = jnp.where(empty, 0.0, depth_by_id[jnp.maximum(ibuf, 0)])
    return ibuf, dbuf
