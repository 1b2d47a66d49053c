"""Packed-lane Pallas TPU kernels for the UNet's gated convolutions.

This is the production ``conv_impl='pallas'`` inference backend (the
round-2 row-band kernels (now ``scripts/gated_conv_pallas_r2.py``) are its
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

No im2col buffer ever touches HBM; each input byte is read ~1.25-1.5x
(its row-group plus two minimal 128-lane-divisible halo row-blocks —
NOT the whole neighbour blocks), which matters because the full-res
C=32 convs sit at the HBM roofline, not the MXU one.

Reference math being fused: ``BasicConv``
(``src/READ/models/unet.py:10-42``): ``norm(act(conv_f(x)) *
sigmoid(conv_m(x)))`` with eval-BatchNorm folded to a per-channel
affine. Inference only; training differentiates the XLA/im2col path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gated_conv3x3_chw", "gated_conv1x1_chw",
           "gated_conv1x1_cat_chw", "pick_rows"]


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


def _mxu(x, mxu_bf16: bool):
    """Cast an MXU operand to bf16 IN REGISTERS (never through a ref).

    The TPU MXU multiplies natively in bf16; an f32 matmul lowers to a
    3-pass bf16 decomposition, so inference that tolerates bf16 inputs
    (f32 accumulation is kept via preferred_element_type) gets ~3x the
    matmul rate. Crucially the cast happens on the VALUE right before
    the dot — no bf16 VMEM ref is ever created, which is what faulted
    the worker in round 3 (Mosaic bf16 (16,128) tiling vs the kernel's
    odd lane-offset tap slices, RESULTS_r03.md)."""
    return x.astype(jnp.bfloat16) if mxu_bf16 else x


def _conv3x3_chw_kernel(*refs, nt: int, hb: int, w_img: int,
                        cins: tuple, relu: bool, gated: bool,
                        has_res: bool, out_dtype, bpf: int = 0,
                        mxu_bf16: bool = False):
    """One grid step: output lanes [i*NT, (i+1)*NT) of ``[C2, HW]``.

    Takes ``len(cins)`` logical inputs (a channel-concat conv without
    the HBM concat — the UNet's AFF/SCM/Convs* consume concatenations
    whose materialization is pure bandwidth waste). Per input j:
    xprev_j/xnext_j are HB-lane halo blocks (the minimal 128-divisible
    row group adjacent to this step's NT lanes), not full neighbour
    blocks — each input byte is fetched ~(1 + 2*HB/NT)x instead of 3x,
    which is what moves the full-res convs off the HBM roofline.
    win_j: VMEM scratch [C_j, NT + 2W] — halo'd window (prev tail |
    mid | next head). tap9: VMEM scratch [9*sum(C), NT] — packed taps,
    channel blocks ordered (tap, input) to match the concat weight
    layout. When ``has_res`` a residual block rides along and is added
    after the epilogue (fuses the ResBlock skip-add; ``unet.py``
    ResBlock).
    """
    k = len(cins)
    xrefs, rest = refs[:3 * k], refs[3 * k:]
    if has_res:
        w_ref, b_ref, s_ref, o_ref, res_ref, out_ref = rest[:6]
        scratch = rest[6:]
    else:
        w_ref, b_ref, s_ref, o_ref, out_ref = rest[:5]
        res_ref = None
        scratch = rest[5:]
    wins, tap9 = scratch[:k], scratch[k]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    wv = w_img
    ctot = sum(cins)
    # batched frames stack along H ([C, B*Hf*W] lanes); with bpf
    # (blocks per frame) > 0 the dy=+-1 halos must not leak between
    # adjacent frames, so the first/last block OF EACH FRAME zeroes its
    # prev/next window fill exactly like the image top/bottom border.
    if bpf:
        is_first = (i % bpf) == 0
        is_last = (i % bpf) == bpf - 1
    else:
        is_first = i == 0
        is_last = i == n - 1
    # border masks: lane % W == 0 has no left neighbour, == W-1 no right
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1) % wv
    not_left = (col != 0).astype(tap9.dtype)
    not_right = (col != wv - 1).astype(tap9.dtype)
    coff = 0
    for j in range(k):
        xprev_ref, xmid_ref, xnext_ref = xrefs[3 * j:3 * j + 3]
        win = wins[j]
        # assemble the halo'd window [pad1 | prev tail W | mid NT |
        # next head W | pad1]; separate stores (Mosaic cannot
        # concatenate vectors whose source slices sit at different
        # offsets). The two single-column pads catch the corner taps
        # (dy=dx=-1 / dy=dx=+1); every read from them is border-masked.
        win[:, 0:1] = jnp.zeros_like(win[:, 0:1])
        win[:, 1:1 + wv] = jnp.where(~is_first, xprev_ref[:, hb - wv:],
                                     0.0)
        win[:, 1 + wv:1 + wv + nt] = xmid_ref[:, :]
        win[:, 1 + wv + nt:1 + 2 * wv + nt] = jnp.where(
            ~is_last, xnext_ref[:, :wv], 0.0)
        win[:, 1 + 2 * wv + nt:] = jnp.zeros_like(win[:, 0:1])

        for t, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1)
                                     for dx in (-1, 0, 1)):
            off = 1 + wv + dy * wv + dx
            tap = win[:, off:off + nt]
            if dx == -1:
                tap = tap * not_left
            elif dx == 1:
                tap = tap * not_right
            tap9[t * ctot + coff:t * ctot + coff + cins[j], :] = tap
        coff += cins[j]

    acc = jax.lax.dot_general(
        _mxu(w_ref[:], mxu_bf16), _mxu(tap9[:], mxu_bf16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = _epilogue_chw(acc, b_ref[:], s_ref[:], o_ref[:], relu, gated)
    if res_ref is not None:
        out = out + res_ref[:, :]
    out_ref[:, :] = out.astype(out_dtype)


def _conv3x3_chw_dot3_kernel(*refs, nt: int, hb: int, w_img: int,
                             cins: tuple, relu: bool, gated: bool,
                             has_res: bool, out_dtype, bpf: int = 0,
                             mxu_bf16: bool = False):
    """3-dot variant of :func:`_conv3x3_chw_kernel` (``impl='dot3'``).

    The pack9 kernel's dominant non-MXU cost is the tap9 scratch: 9
    stores of ``[C, NT]`` lane-offset slices (~9C*NT lanes written +
    read back per block). This variant assembles only a dy-stacked
    window ``win3 [3*C, NT+2]`` (~3C*NT lanes, 7 stores) where
    ``win3[(dy+1)*C + c, q] = x[c, q - 1 + dy*W]``, then contracts the
    three dx taps as three MXU dots against the ±1-lane slices of
    ``win3`` — at C=32 that is 3 single-pass K=96 dots vs one 3-pass
    K=288 dot: identical MXU occupancy, ~3x less scratch traffic.
    Same math, borders, frame masking, and epilogue as pack9.
    """
    k = len(cins)
    xrefs, rest = refs[:3 * k], refs[3 * k:]
    if has_res:
        w_ref, b_ref, s_ref, o_ref, res_ref, out_ref = rest[:6]
        scratch = rest[6:]
    else:
        w_ref, b_ref, s_ref, o_ref, out_ref = rest[:5]
        res_ref = None
        scratch = rest[5:]
    win3 = scratch[0]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    wv = w_img
    ctot = sum(cins)
    if bpf:
        is_first = (i % bpf) == 0
        is_last = (i % bpf) == bpf - 1
    else:
        is_first = i == 0
        is_last = i == n - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1) % wv
    not_left = (col != 0).astype(win3.dtype)
    not_right = (col != wv - 1).astype(win3.dtype)
    coff = 0
    for j in range(k):
        xprev_ref, xmid_ref, xnext_ref = xrefs[3 * j:3 * j + 3]
        c = cins[j]
        r0 = coff                # dy = -1 rows
        r1 = ctot + coff         # dy =  0 rows
        r2 = 2 * ctot + coff     # dy = +1 rows
        # dy=-1: win3[q] = x[q - 1 - W]
        win3[r0:r0 + c, 0:1 + wv] = jnp.where(
            ~is_first, xprev_ref[:, hb - wv - 1:], 0.0)
        win3[r0:r0 + c, 1 + wv:2 + nt] = xmid_ref[:, :nt - wv + 1]
        # dy=0: win3[q] = x[q - 1]
        win3[r1:r1 + c, 0:1] = jnp.where(
            ~is_first, xprev_ref[:, hb - 1:], 0.0)
        win3[r1:r1 + c, 1:1 + nt] = xmid_ref[:, :]
        win3[r1:r1 + c, 1 + nt:2 + nt] = jnp.where(
            ~is_last, xnext_ref[:, :1], 0.0)
        # dy=+1: win3[q] = x[q - 1 + W]
        win3[r2:r2 + c, 0:1 + nt - wv] = xmid_ref[:, wv - 1:]
        win3[r2:r2 + c, 1 + nt - wv:2 + nt] = jnp.where(
            ~is_last, xnext_ref[:, :wv + 1], 0.0)
        coff += c

    acc = None
    for t, dx in enumerate((-1, 0, 1)):
        tap = win3[:, 1 + dx:1 + dx + nt]
        if dx == -1:
            tap = tap * not_left
        elif dx == 1:
            tap = tap * not_right
        d = jax.lax.dot_general(
            _mxu(w_ref[t], mxu_bf16), _mxu(tap, mxu_bf16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    out = _epilogue_chw(acc, b_ref[:], s_ref[:], o_ref[:], relu, gated)
    if res_ref is not None:
        out = out + res_ref[:, :]
    out_ref[:, :] = out.astype(out_dtype)


def _pad_frame_rows(x: jax.Array, frames: int, h: int, w_img: int,
                    hpad: int) -> jax.Array:
    """Zero-pad each stacked frame from ``h`` to ``h+hpad`` rows.

    Zero rows reproduce the conv's bottom zero-padding exactly, so the
    kernel needs no row-level masks — the padded output rows are just
    sliced off afterwards."""
    c = x.shape[0]
    if frames == 1:
        return jnp.pad(x, ((0, 0), (0, hpad * w_img)))
    x = x.reshape(c, frames, h, w_img)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, hpad), (0, 0)))
    return x.reshape(c, frames * (h + hpad) * w_img)


def _unpad_frame_rows(y: jax.Array, frames: int, h: int, w_img: int,
                      hpad: int) -> jax.Array:
    c = y.shape[0]
    if frames == 1:
        return y[:, :h * w_img]
    y = y.reshape(c, frames, h + hpad, w_img)[:, :, :h, :]
    return y.reshape(c, frames * h * w_img)


@functools.partial(
    jax.jit,
    static_argnames=("w_img", "relu", "gated", "rows", "frames",
                     "interpret", "mxu_bf16", "impl"))
def gated_conv3x3_chw(x: jax.Array, w: jax.Array, b: jax.Array,
                      scale: jax.Array, offset: jax.Array,
                      res: Optional[jax.Array] = None, *,
                      w_img: int, relu: bool = True, gated: bool = True,
                      rows: int = 0, frames: int = 1,
                      interpret: bool = False,
                      mxu_bf16: bool = False,
                      impl: str = "pack9") -> jax.Array:
    """Fused 3x3/stride-1 gated conv + BN affine, channel-major.

    Args:
      x: ``[Cin, H*W]`` activations (f32 or bf16), row-major pixels.
        With ``frames`` > 1, ``frames`` same-sized images stacked along
        H (``H = frames * h_frame``) — the TPU-native batch layout: one
        kernel sequence regardless of batch, dy halos masked at frame
        boundaries inside the kernel (block-granular because row-groups
        are padded to divide the frame height).
      w: ``[3, 3, Cin, C2]`` HWIO conv weights (C2 = 2*Cout when gated).
      b: ``[C2]``; scale, offset: ``[Cout]`` folded eval-BN affine.
      res: optional ``[Cout, H*W]`` residual, added after the epilogue
        (fuses the ResBlock skip-add into the conv's output write).
      w_img: the image width W (lanes per image row).

    Returns ``[Cout, H*W]`` in x.dtype.
    """
    import math
    cin, hw = x.shape
    assert hw % (w_img * frames) == 0, (hw, w_img, frames)
    h = hw // w_img // frames
    c2 = w.shape[-1]
    cout = c2 // 2 if gated else c2
    nr = rows or pick_rows(w_img, cin)
    hpad = (-h) % nr
    if hpad:
        x = _pad_frame_rows(x, frames, h, w_img, hpad)
    nt = nr * w_img
    bpf = (h + hpad) // nr  # grid blocks per frame
    grid = frames * bpf
    # minimal 128-lane-divisible halo: hr rows next to the block edge
    # (hr = nr is the fetch-the-whole-neighbour fallback, used when an
    # explicit ``rows`` override is not a multiple of the minimum)
    hr = 128 // math.gcd(w_img, 128)
    if impl == "dot3" and hr * w_img < w_img + 1:
        # dot3's dy=-1 corner tap reads one lane beyond a full halo row
        hr = 2 if nr % 2 == 0 else nr
    if nr % hr:
        hr = nr
    hb = hr * w_img
    rpb = nr // hr  # halo blocks per mid block
    if impl == "dot3":
        # per-dx [C2, 3*Cin] with (dy, ci) row order matching win3
        wr = jnp.transpose(w, (1, 3, 0, 2)).reshape(
            3, c2, 3 * cin).astype(x.dtype)
        kern = functools.partial(
            _conv3x3_chw_dot3_kernel, nt=nt, hb=hb, w_img=w_img,
            cins=(cin,), relu=relu, gated=gated,
            has_res=res is not None, out_dtype=x.dtype, bpf=bpf,
            mxu_bf16=mxu_bf16)
    else:
        # [3,3,Cin,C2] -> [C2, 9*Cin] with (dy, dx, ci) tap order
        # matching the kernel's tap9 packing
        wr = jnp.transpose(w, (3, 0, 1, 2)).reshape(
            c2, 9 * cin).astype(x.dtype)
        kern = functools.partial(
            _conv3x3_chw_kernel, nt=nt, hb=hb, w_img=w_img, cins=(cin,),
            relu=relu, gated=gated, has_res=res is not None,
            out_dtype=x.dtype, bpf=bpf, mxu_bf16=mxu_bf16)
    blk = (cin, nt)
    in_specs = [
        pl.BlockSpec((cin, hb),
                     lambda i: (0, jnp.maximum(i * rpb - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, hb),
                     lambda i: (0, jnp.minimum(
                         (i + 1) * rpb,
                         pl.num_programs(0) * rpb - 1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [x, x, x, wr, b.astype(jnp.float32)[:, None],
                scale.astype(jnp.float32)[:, None],
                offset.astype(jnp.float32)[:, None]]
    if res is not None:
        assert res.shape == (cout, hw), (res.shape, cout, hw)
        if hpad:
            res = _pad_frame_rows(res, frames, h, w_img, hpad)
        in_specs.append(pl.BlockSpec((cout, nt), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(res)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cout, nt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (cout, frames * (h + hpad) * w_img), x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((3 * cin, nt + 2), x.dtype)]
            if impl == "dot3" else
            [pltpu.VMEM((cin, nt + 2 * w_img + 2), x.dtype),
             pltpu.VMEM((9 * cin, nt), x.dtype)]),
        cost_estimate=pl.CostEstimate(
            flops=2 * hw * 9 * cin * c2,
            bytes_accessed=int(
                x.size * x.dtype.itemsize * (1 + 2 / rpb)
                + hw * cout * x.dtype.itemsize),
            transcendentals=2 * hw * cout,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    if hpad:
        return _unpad_frame_rows(out, frames, h, w_img, hpad)
    return out


def _conv1x1_chw_kernel(*refs, relu: bool, gated: bool, has_res: bool,
                        out_dtype, mxu_bf16: bool = False):
    if has_res:
        x_ref, w_ref, b_ref, s_ref, o_ref, res_ref, out_ref = refs
    else:
        x_ref, w_ref, b_ref, s_ref, o_ref, out_ref = refs
        res_ref = None
    acc = jax.lax.dot_general(
        _mxu(w_ref[:], mxu_bf16), _mxu(x_ref[:], mxu_bf16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = _epilogue_chw(acc, b_ref[:], s_ref[:], o_ref[:], relu, gated)
    if res_ref is not None:
        out = out + res_ref[:, :]
    out_ref[:, :] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "gated", "lanes", "interpret", "mxu_bf16"))
def gated_conv1x1_chw(x: jax.Array, w: jax.Array, b: jax.Array,
                      scale: jax.Array, offset: jax.Array,
                      res: Optional[jax.Array] = None, *,
                      relu: bool = True, gated: bool = True,
                      lanes: int = 8192, interpret: bool = False,
                      mxu_bf16: bool = False) -> jax.Array:
    """Fused 1x1 gated conv (gated matmul) + BN affine, channel-major.

    x ``[Cin, N]``; w ``[1, 1, Cin, C2]`` or ``[Cin, C2]``;
    res: optional ``[Cout, N]`` residual added after the epilogue.
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
                             has_res=res is not None, out_dtype=x.dtype,
                             mxu_bf16=mxu_bf16)
    in_specs = [
        pl.BlockSpec((cin, nt), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [x, wr, b.astype(jnp.float32)[:, None],
                scale.astype(jnp.float32)[:, None],
                offset.astype(jnp.float32)[:, None]]
    if res is not None:
        assert res.shape == (cout, n), (res.shape, cout, n)
        if npad:
            res = jnp.pad(res, ((0, 0), (0, npad)))
        in_specs.append(pl.BlockSpec((cout, nt), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(res)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
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
    )(*operands)
    return out[:, :n]


def _conv1x1_cat_kernel(*refs, k: int, relu: bool, gated: bool,
                        has_res: bool, out_dtype,
                        mxu_bf16: bool = False):
    """Concat-free 1x1 conv: out = sum_j w_j @ x_j, epilogue fused.

    The UNet's channel concats (AFF/SCM/Convs*) all feed 1x1 convs, so
    the concat is algebraically a blocked matmul — materializing it in
    HBM (e.g. AFF0's [128, HW] at full res) is pure bandwidth waste.
    """
    xs, ws = refs[:k], refs[k:2 * k]
    b_ref, s_ref, o_ref = refs[2 * k:2 * k + 3]
    res_ref = refs[2 * k + 3] if has_res else None
    out_ref = refs[-1]
    acc = jax.lax.dot_general(
        _mxu(ws[0][:], mxu_bf16), _mxu(xs[0][:], mxu_bf16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    for j in range(1, k):
        acc = acc + jax.lax.dot_general(
            _mxu(ws[j][:], mxu_bf16), _mxu(xs[j][:], mxu_bf16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = _epilogue_chw(acc, b_ref[:], s_ref[:], o_ref[:], relu, gated)
    if res_ref is not None:
        out = out + res_ref[:, :]
    out_ref[:, :] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "gated", "lanes", "interpret", "mxu_bf16"))
def gated_conv1x1_cat_chw(xs, w: jax.Array, b: jax.Array,
                          scale: jax.Array, offset: jax.Array,
                          res: Optional[jax.Array] = None, *,
                          relu: bool = True, gated: bool = True,
                          lanes: int = 8192, interpret: bool = False,
                          mxu_bf16: bool = False) -> jax.Array:
    """Fused 1x1 gated conv over a LOGICAL channel concat of ``xs``.

    xs: tuple of ``[C_j, N]`` channel-major inputs; w: ``[1, 1,
    sum(C_j), C2]`` (or 2-D) — the conv the reference applies to
    ``concat(xs)``. The concat never touches HBM: each grid step
    accumulates per-input MXU matmuls against the corresponding
    row-block of the weight. Epilogue (bias, gate, folded eval-BN,
    optional residual) identical to :func:`gated_conv1x1_chw`.
    """
    xs = tuple(xs)
    k = len(xs)
    cins = tuple(int(x.shape[0]) for x in xs)
    ctot = sum(cins)
    n = xs[0].shape[1]
    for x in xs:
        assert x.shape[1] == n, [x.shape for x in xs]
    if w.ndim == 4:
        w = w.reshape(ctot, -1)
    assert w.shape[0] == ctot, (w.shape, cins)
    c2 = w.shape[-1]
    cout = c2 // 2 if gated else c2
    dtype = xs[0].dtype
    fit = (4 * 1024 * 1024 // (4 * max(ctot + c2, 1))) // 128 * 128
    nt = max(512, min(lanes, fit))
    if n <= nt:
        nt = n
    npad = (-n) % nt
    if npad:
        xs = tuple(jnp.pad(x, ((0, 0), (0, npad))) for x in xs)
    grid = (n + npad) // nt
    # split the concat weight into per-input [C2, C_j] blocks
    wt = w.T.astype(dtype)  # [C2, ctot]
    ws, off = [], 0
    for c in cins:
        ws.append(wt[:, off:off + c])
        off += c

    kern = functools.partial(_conv1x1_cat_kernel, k=k, relu=relu,
                             gated=gated, has_res=res is not None,
                             out_dtype=dtype, mxu_bf16=mxu_bf16)
    in_specs = [pl.BlockSpec((c, nt), lambda i: (0, i),
                             memory_space=pltpu.VMEM) for c in cins]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (k + 3)
    operands = list(xs) + ws + [b.astype(jnp.float32)[:, None],
                                scale.astype(jnp.float32)[:, None],
                                offset.astype(jnp.float32)[:, None]]
    if res is not None:
        assert res.shape == (cout, n), (res.shape, cout, n)
        if npad:
            res = jnp.pad(res, ((0, 0), (0, npad)))
        in_specs.append(pl.BlockSpec((cout, nt), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(res)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cout, nt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, n + npad), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ctot * c2,
            bytes_accessed=(n + npad) * ctot * dtype.itemsize
            + n * cout * dtype.itemsize,
            transcendentals=2 * n * cout,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :n]
