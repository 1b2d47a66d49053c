"""Pallas TPU kernels for the UNet's fused gated convolution (inference).

Why this exists: on this hardware XLA lowers the UNet's NHWC
convolutions at ~4-5 TFLOP/s while plain matmuls reach ~127 TFLOP/s
(scripts/bench_roofline.py) — the conv lowering, not arithmetic, is the
frame-rate ceiling (the MIMO-UNet is ~70% of the fused frame,
RESULTS_r02.md). These kernels re-express the reference's gated
``BasicConv`` (``src/READ/models/unet.py:10-42``: conv -> ELU(f) *
sigmoid(m) -> BatchNorm) as MXU matmuls with the whole epilogue fused in
VMEM:

- ``gated_conv3x3``: each grid step owns a row-band of the image; its
  halo rows come from the neighbouring bands via three overlapping
  BlockSpec views of the same input (index maps ``i-1, i, i+1`` — the
  standard Pallas halo pattern, no manual HBM slicing). A
  (dx, Cin)-concatenated window buffer is built once in VMEM and the
  3x3 conv becomes 3 matmuls contracting over ``3*Cin`` lanes (K=96
  for Cin=32 vs K=32 for the naive per-tap form — 3x better MXU
  occupancy). Gate + folded BatchNorm affine are applied in-register
  before the single output write. Each input byte is read ~3x (band +
  two neighbour reads of its halo rows); no im2col buffer ever touches
  HBM.
- ``gated_conv1x1``: the 1x1 variant is a plain gated matmul.

Inference only (eval-mode BatchNorm is a per-channel affine:
``scale = gamma / sqrt(var + eps)``, ``offset = beta - mean * scale``).
Training keeps the XLA path (its backward is XLA's job). These
row-band kernels are standalone (tests + scripts/bench_gated_conv.py);
the production inference backend is the packed-lane variant in
``ops/gated_conv_pack.py`` (``conv_impl='pallas'``), which supersedes
the C<128 lane-padding limitation measured here.

Accumulation is always f32 (``preferred_element_type``); in/out dtype
may be f32 or bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gated_conv3x3", "gated_conv1x1"]


def _elu(x):
    # explicit ELU: Mosaic has no expm1 lowering (jax.nn.elu uses it)
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _epilogue(acc, bias, scale, offset, relu: bool, gated: bool):
    """acc [M, 2C] f32 -> gated+BN output [M, C] f32.

    Parity with ``BasicConv``: ``norm(act(conv_f(x)) * sigmoid(conv_m(x)))``
    where act is ELU when ``relu`` else identity (``unet.py:32-42``).
    With ``gated=False`` the layer is a plain conv+BN (C outputs).
    """
    acc = acc + bias[None, :]
    if gated:
        c = acc.shape[-1] // 2
        f, m = acc[:, :c], acc[:, c:]
        if relu:
            f = _elu(f)
        out = f * jax.nn.sigmoid(m)
    else:
        out = _elu(acc) if relu else acc
    return out * scale[None, :] + offset[None, :]


def _conv3x3_kernel(xprev_ref, xmid_ref, xnext_ref, w_ref, b_ref, s_ref,
                    o_ref, out_ref, cat, *, th: int, w_img: int,
                    cin: int, relu: bool, gated: bool, out_dtype):
    """One grid step: rows [i*th, i*th+th) of the output.

    x*_ref: [th, W+2, Cin] row bands i-1 / i / i+1 of the W-padded
    input (clamped at the edges; the H halo is zeroed below).
    cat: VMEM scratch [th+2, W, 3*Cin] — the (dx, ci) window buffer.
    w_ref: [3, 3*Cin, C2] weights (dy major, (dx, ci) lanes).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    # window buffer lanes = (dx, ci); built once, reused by all 3 dy.
    # (separate stores: Mosaic cannot concatenate vectors whose source
    # slices start at different sublane offsets)
    for dx in range(3):
        sl = slice(dx * cin, (dx + 1) * cin)
        cat[0, :, sl] = jnp.where(
            i > 0, xprev_ref[th - 1, dx:dx + w_img, :], 0.0)
        cat[1:th + 1, :, sl] = xmid_ref[:, dx:dx + w_img, :]
        cat[th + 1, :, sl] = jnp.where(
            i < n - 1, xnext_ref[0, dx:dx + w_img, :], 0.0)
    c2 = w_ref.shape[-1]
    acc = jnp.zeros((th * w_img, c2), jnp.float32)
    for dy in range(3):
        a = cat[dy:dy + th].reshape(th * w_img, 3 * cin)
        acc = acc + jnp.dot(a, w_ref[dy],
                            preferred_element_type=jnp.float32)
    out = _epilogue(acc, b_ref[:], s_ref[:], o_ref[:], relu, gated)
    out_ref[:] = out.reshape(th, w_img, out.shape[-1]).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "gated", "tile_h", "interpret"))
def gated_conv3x3(x: jax.Array, w: jax.Array, b: jax.Array,
                  scale: jax.Array, offset: jax.Array, *,
                  relu: bool = True, gated: bool = True,
                  tile_h: int = 8, interpret: bool = False) -> jax.Array:
    """Fused 3x3/stride-1 gated conv + BN affine (inference).

    Args:
      x: ``[H, W, Cin]`` (f32 or bf16). H is padded to a tile multiple
        internally; W, Cin are used as-is.
      w: ``[3, 3, Cin, C2]`` HWIO conv weights (C2 = 2*C when gated).
      b: ``[C2]`` conv bias.
      scale, offset: ``[C]`` folded eval-BatchNorm affine.

    Returns: ``[H, W, C]`` in x.dtype.
    """
    h, w_img, cin = x.shape
    c2 = w.shape[-1]
    cout = c2 // 2 if gated else c2
    th = tile_h
    hpad = (-h) % th
    # zero-pad W by the halo, H to a tile multiple (the H halo is
    # handled in-kernel via the neighbour bands / edge zeroing).
    xp = jnp.pad(x, ((0, hpad), (1, 1), (0, 0)))
    wr = w.astype(x.dtype).reshape(3, 3 * cin, c2)
    grid = (h + hpad) // th

    kern = functools.partial(
        _conv3x3_kernel, th=th, w_img=w_img, cin=cin, relu=relu,
        gated=gated, out_dtype=x.dtype)
    band = (th, w_img + 2, cin)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(band, lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(band, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(band,
                         lambda i: (jnp.minimum(i + 1,
                                                pl.num_programs(0) - 1),
                                    0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (th, w_img, cout), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h + hpad, w_img, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w_img, 3 * cin), x.dtype),
        ],
        interpret=interpret,
    )(xp, xp, xp, wr, b.astype(jnp.float32),
      scale.astype(jnp.float32), offset.astype(jnp.float32))
    return out[:h]


def _conv1x1_kernel(x_ref, w_ref, b_ref, s_ref, o_ref, out_ref, *,
                    relu: bool, gated: bool, out_dtype):
    m = x_ref.shape[0] * x_ref.shape[1]
    a = x_ref[:].reshape(m, x_ref.shape[2])
    acc = jnp.dot(a, w_ref[:], preferred_element_type=jnp.float32)
    out = _epilogue(acc, b_ref[:], s_ref[:], o_ref[:], relu, gated)
    out_ref[:] = out.reshape(
        x_ref.shape[0], x_ref.shape[1], out.shape[-1]).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "gated", "tile_h", "interpret"))
def gated_conv1x1(x: jax.Array, w: jax.Array, b: jax.Array,
                  scale: jax.Array, offset: jax.Array, *,
                  relu: bool = True, gated: bool = True,
                  tile_h: int = 16, interpret: bool = False) -> jax.Array:
    """Fused 1x1 gated conv (gated matmul) + BN affine (inference).

    x ``[H, W, Cin]``, w ``[1, 1, Cin, C2]`` or ``[Cin, C2]``.
    """
    h, w_img, cin = x.shape
    if w.ndim == 4:
        w = w.reshape(cin, -1)
    c2 = w.shape[-1]
    cout = c2 // 2 if gated else c2
    th = tile_h
    hpad = (-h) % th
    xp = jnp.pad(x, ((0, hpad), (0, 0), (0, 0))) if hpad else x
    grid = (h + hpad) // th

    kern = functools.partial(_conv1x1_kernel, relu=relu, gated=gated,
                             out_dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((th, w_img, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (th, w_img, cout), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h + hpad, w_img, cout), x.dtype),
        interpret=interpret,
    )(xp, w.astype(x.dtype), b.astype(jnp.float32),
      scale.astype(jnp.float32), offset.astype(jnp.float32))
    return out[:h]
