"""Packed-lane Pallas TPU kernels for the UNet's gated convolutions.

This is the production ``conv_impl='pallas'`` inference backend (the
round-2 row-band kernels in ``gated_conv_pallas.py`` are its
predecessor; their VMEM plan padded C=32 activations 4x because channel
-minor blocks occupy only 32 of 128 lanes).

Layout: activations live as ``[C, H*W]`` — channels on sublanes, pixels
on lanes. Every VMEM buffer then has >=128 useful lanes regardless of C,
which removes the 4x padding entirely. A 3x3/stride-1 convolution
becomes:

- grid over row-groups of ``nr`` image rows (``NT = nr*W`` lanes);
- the dy=-1/+1 halos arrive via three overlapping BlockSpec views of the
  same ``[C, HW]`` array (index maps i-1, i, i+1 — the standard Pallas
  halo pattern);
- a window scratch ``[9*C, NT]`` is filled with the 9 taps, each a
  lane-offset slice of the assembled ``[C, NT+2W]`` window, edge-masked
  at image borders (left/right columns via ``lane % W``, top/bottom rows
  via the global pixel index);
- ONE MXU matmul ``[2*Cout, 9*C] @ [9*C, NT]`` contracts all taps at
  once (K = 9C = 288 at C=32 vs 32 for the naive per-tap form), then the
  whole gated epilogue — bias, ELU(f)*sigmoid(m), folded eval-BatchNorm
  affine — runs in-register before the single output write.

No im2col buffer ever touches HBM; each input byte is read ~3x (its
row-group plus two neighbour halos).

Reference math being fused: ``BasicConv``
(``src/READ/models/unet.py:10-42``): ``norm(act(conv_f(x)) *
sigmoid(conv_m(x)))`` with eval-BatchNorm folded to a per-channel
affine. Inference only; training differentiates the XLA/im2col path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gated_conv3x3_chw", "gated_conv1x1_chw", "pick_rows"]


def _elu(x):
    # explicit ELU: Mosaic has no expm1 lowering (jax.nn.elu uses it)
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _epilogue_chw(acc, bias, scale, offset, relu: bool, gated: bool):
    """acc [C2, NT] f32 -> gated+BN output [C, NT] f32 (channel-major)."""
    acc = acc + bias
    if gated:
        c = acc.shape[0] // 2
        f, m = acc[:c], acc[c:]
        if relu:
            f = _elu(f)
        out = f * jax.nn.sigmoid(m)
    else:
        out = _elu(acc) if relu else acc
    return out * scale + offset


def pick_rows(w_img: int, cin: int = 32,
              target_lanes: int = 0) -> int:
    """Rows per grid step: NT = nr*W lanes sized to the channel count.

    Mosaic requires block lane sizes divisible by 128, so nr is rounded
    to the smallest multiple that makes ``nr*W % 128 == 0``. The lane
    target shrinks with Cin so the window + 9-tap scratch + pipelined
    block buffers stay within VMEM (~50 MB worst case at Cin=256)."""
    import math
    w_img = max(w_img, 1)
    if not target_lanes:
        # chained-kernel microbench (scripts/bench_pack_kernels.py,
        # RESULTS_r03.md): C32 @9728 lanes 37.5 TFLOP/s vs 35.4 @4864;
        # C64 peaks at 2432-4864; C128/C256 fit (VMEM) only at 2432.
        target_lanes = (9728 if cin <= 32 else
                        4864 if cin <= 64 else 2432)
    need = 128 // math.gcd(w_img, 128)
    nr = max(need, int(round(target_lanes / w_img / need)) * need)
    return nr


def _conv3x3_chw_kernel(xprev_ref, xmid_ref, xnext_ref, w_ref, b_ref,
                        s_ref, o_ref, out_ref, win, tap9, *, nt: int,
                        w_img: int, cin: int, relu: bool, gated: bool,
                        out_dtype):
    """One grid step: output lanes [i*NT, (i+1)*NT) of ``[C2, HW]``.

    win: VMEM scratch [C, NT + 2W] — halo'd window (prev tail | mid |
    next head). tap9: VMEM scratch [9C, NT] — the packed taps.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    wv = w_img
    # assemble the halo'd window [pad1 | prev tail W | mid NT |
    # next head W | pad1]; separate stores (Mosaic cannot concatenate
    # vectors whose source slices sit at different offsets). The two
    # single-column pads catch the corner taps (dy=dx=-1 / dy=dx=+1);
    # every read from them is border-masked below.
    win[:, 0:1] = jnp.zeros_like(win[:, 0:1])
    win[:, 1:1 + wv] = jnp.where(i > 0, xprev_ref[:, nt - wv:], 0.0)
    win[:, 1 + wv:1 + wv + nt] = xmid_ref[:, :]
    win[:, 1 + wv + nt:1 + 2 * wv + nt] = jnp.where(
        i < n - 1, xnext_ref[:, :wv], 0.0)
    win[:, 1 + 2 * wv + nt:] = jnp.zeros_like(win[:, 0:1])

    # border masks: lane % W == 0 has no left neighbour, == W-1 no right
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1) % wv
    not_left = (col != 0).astype(win.dtype)
    not_right = (col != wv - 1).astype(win.dtype)
    for t, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1)
                                 for dx in (-1, 0, 1)):
        off = 1 + wv + dy * wv + dx
        tap = win[:, off:off + nt]
        if dx == -1:
            tap = tap * not_left
        elif dx == 1:
            tap = tap * not_right
        tap9[t * cin:(t + 1) * cin, :] = tap

    acc = jax.lax.dot_general(
        w_ref[:], tap9[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = _epilogue_chw(acc, b_ref[:], s_ref[:], o_ref[:], relu, gated)
    out_ref[:, :] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("w_img", "relu", "gated", "rows", "interpret"))
def gated_conv3x3_chw(x: jax.Array, w: jax.Array, b: jax.Array,
                      scale: jax.Array, offset: jax.Array, *,
                      w_img: int, relu: bool = True, gated: bool = True,
                      rows: int = 0, interpret: bool = False
                      ) -> jax.Array:
    """Fused 3x3/stride-1 gated conv + BN affine, channel-major.

    Args:
      x: ``[Cin, H*W]`` activations (f32 or bf16), row-major pixels.
      w: ``[3, 3, Cin, C2]`` HWIO conv weights (C2 = 2*Cout when gated).
      b: ``[C2]``; scale, offset: ``[Cout]`` folded eval-BN affine.
      w_img: the image width W (lanes per image row).

    Returns ``[Cout, H*W]`` in x.dtype.
    """
    cin, hw = x.shape
    assert hw % w_img == 0, (hw, w_img)
    h = hw // w_img
    c2 = w.shape[-1]
    cout = c2 // 2 if gated else c2
    nr = rows or pick_rows(w_img, cin)
    hpad = (-h) % nr
    if hpad:
        x = jnp.pad(x, ((0, 0), (0, hpad * w_img)))
    nt = nr * w_img
    grid = (h + hpad) // nr
    # [3,3,Cin,C2] -> [C2, 9*Cin] with (dy, dx, ci) tap order matching
    # the kernel's tap9 packing
    wr = jnp.transpose(w, (3, 0, 1, 2)).reshape(c2, 9 * cin).astype(
        x.dtype)

    kern = functools.partial(
        _conv3x3_chw_kernel, nt=nt, w_img=w_img, cin=cin, relu=relu,
        gated=gated, out_dtype=x.dtype)
    blk = (cin, nt)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(blk, lambda i: (0, jnp.maximum(i - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk,
                         lambda i: (0, jnp.minimum(
                             i + 1, pl.num_programs(0) - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, nt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, (h + hpad) * w_img),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((cin, nt + 2 * w_img + 2), x.dtype),
            pltpu.VMEM((9 * cin, nt), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * hw * 9 * cin * c2,
            bytes_accessed=x.size * x.dtype.itemsize * 3
            + hw * cout * x.dtype.itemsize,
            transcendentals=2 * hw * cout,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, wr, b.astype(jnp.float32)[:, None],
      scale.astype(jnp.float32)[:, None],
      offset.astype(jnp.float32)[:, None])
    return out[:, :hw]


def _conv1x1_chw_kernel(x_ref, w_ref, b_ref, s_ref, o_ref, out_ref, *,
                        relu: bool, gated: bool, out_dtype):
    acc = jax.lax.dot_general(
        w_ref[:], x_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = _epilogue_chw(acc, b_ref[:], s_ref[:], o_ref[:], relu, gated)
    out_ref[:, :] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "gated", "lanes", "interpret"))
def gated_conv1x1_chw(x: jax.Array, w: jax.Array, b: jax.Array,
                      scale: jax.Array, offset: jax.Array, *,
                      relu: bool = True, gated: bool = True,
                      lanes: int = 8192, interpret: bool = False
                      ) -> jax.Array:
    """Fused 1x1 gated conv (gated matmul) + BN affine, channel-major.

    x ``[Cin, N]``; w ``[1, 1, Cin, C2]`` or ``[Cin, C2]``.
    """
    cin, n = x.shape
    if w.ndim == 4:
        w = w.reshape(cin, -1)
    c2 = w.shape[-1]
    cout = c2 // 2 if gated else c2
    # lane tile sized to the channel count so the pipelined in/out
    # blocks stay within VMEM (AFF 1x1 inputs reach Cin=480); must be a
    # multiple of 128 unless it covers the whole array
    fit = (4 * 1024 * 1024 // (4 * max(cin + c2, 1))) // 128 * 128
    nt = max(512, min(lanes, fit))
    if n <= nt:
        nt = n
    npad = (-n) % nt
    if npad:
        x = jnp.pad(x, ((0, 0), (0, npad)))
    grid = (n + npad) // nt
    wr = w.T.astype(x.dtype)  # [C2, Cin]

    kern = functools.partial(_conv1x1_chw_kernel, relu=relu, gated=gated,
                             out_dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((cin, nt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, nt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, n + npad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * cin * c2,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * cout * x.dtype.itemsize,
            transcendentals=2 * n * cout,
        ),
        interpret=interpret,
    )(x, wr, b.astype(jnp.float32)[:, None],
      scale.astype(jnp.float32)[:, None],
      offset.astype(jnp.float32)[:, None])
    return out[:, :n]
