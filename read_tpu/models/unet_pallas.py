"""MIMO-UNet inference forward on the packed-lane Pallas kernels.

``conv_impl='pallas'``: a pure function over the SAME flax variables as
:class:`read_tpu.models.unet.UNet` (checkpoints interchange bit-for-bit)
that runs the whole forward in channel-major ``[C, H, W]`` layout:

- every 3x3/stride-1 gated conv -> ``ops.gated_conv_pack.gated_conv3x3_chw``
  (one MXU matmul per tile, epilogue fused in VMEM);
- every 1x1 conv -> ``gated_conv1x1_chw`` (gated matmul);
- strided transition convs (k3s2 / k4s2) -> space-to-depth 3x3 packed
  kernels in the seg path (im2col matmul fallback for the deep
  transitions whose tap scratch exceeds VMEM);
- the 1x1 concat consumers (AFF / SCM / decoder Convs*) -> low-res
  split matmuls + one fused XLA epilogue (``conv1x1_comb``): the
  concat and the full-res upsamples feeding it never materialize;
- remaining resamples stay XLA ops on the channel-major arrays.

Eval-mode BatchNorm is folded into each kernel's per-channel affine
(``scale = gamma / sqrt(var + eps)``, ``offset = beta - mean*scale``).
Inference only — training differentiates the XLA/im2col path of
``models/unet.py``.

Architecture parity: ``src/READ/models/unet.py:121-280`` (see
``models/unet.py`` for the layer map and reference citations).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from read_tpu.models.unet import _im2col_conv
from read_tpu.ops import gated_conv_pack as GP

__all__ = ["unet_pallas_apply", "unet_pallas_apply_seg"]

_BN_EPS = 1e-5


def _fold_bn(conv_params: Dict, conv_stats: Dict):
    g = conv_params["norm"]["scale"]
    beta = conv_params["norm"]["bias"]
    mean = conv_stats["norm"]["mean"]
    var = conv_stats["norm"]["var"]
    scale = g * jax.lax.rsqrt(var + _BN_EPS)
    return scale, beta - mean * scale


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _S2D_ENABLED(name: str = "") -> bool:
    """Space-to-depth strided convs: opt-in via READ_TPU_PALLAS_S2D.

    ``1`` enables every eligible transition; a comma list of layer
    names (``feat1,feat2``) enables only those — the bisection knob.

    Status (round 3, ATTRIBUTED — scripts/probe_pack_new.py): the
    kernels are oracle-exact and clean in isolation, as per-kernel
    dispatches, and in the two-executable seg path
    (:func:`unet_pallas_apply_seg`, where s2d is ON by default); only
    the single whole-graph executable faults the worker, so this env
    knob stays off by default for the single-jit path."""
    import os
    v = os.environ.get("READ_TPU_PALLAS_S2D", "0")
    if v == "1":
        return True
    return bool(name) and name.split("/")[-1] in v.split(",")


def _CONV3_IMPL() -> str:
    """3x3 kernel formulation: READ_TPU_CONV3_IMPL in {pack9, dot3}.

    ``dot3`` assembles a dy-stacked [3C, NT+2] window and contracts the
    dx taps as three K=3C dots (same MXU pass count, ~3x less scratch
    traffic than pack9's 9-tap scratch); oracle-exact both ways
    (tests/test_unet_pallas.py)."""
    import os
    return os.environ.get("READ_TPU_CONV3_IMPL", "pack9")


def _CAT11_ENABLED(name: str = "") -> bool:
    """Concat-free 1x1 convs: opt-in via READ_TPU_PALLAS_CAT11.

    ``1`` enables every 1x1 concat site (AFF/SCM/Convs*); a comma list
    of layer names (``Convs0,AFF0/BasicConv_0``) enables only those —
    the bisection knob. Status: bit-exact; clean on TPU in the seg
    path; measured NEUTRAL vs the materialized concat (RESULTS_r03)
    and then SUPERSEDED by ``conv1x1_comb`` (low-res split matmuls,
    no concat at all), so this stays a bench/bisect knob only."""
    import os
    v = os.environ.get("READ_TPU_PALLAS_CAT11", "0")
    if v == "1":
        return True
    return bool(name) and name in v.split(",")


def _s2d_weights(w: jax.Array) -> jax.Array:
    """Scatter ``[k, k, C, C2]`` stride-2/pad-1 conv weights onto the
    space-to-depth grid as a ``[3, 3, 4C, C2]`` stride-1 kernel.

    With cells covering input rows ``(2c, 2c+1)``, output ``oh`` reads
    input row ``2oh - 1 + dy`` = cell ``oh + floor((dy-1)/2)``, parity
    ``(dy-1) % 2`` — i.e. a 3x3 window over cells for both k3s2 and
    k4s2 (pad 1), with each original tap landing in exactly one
    (cell offset, parity-channel-block) slot. Zero-padding of cells
    reproduces the original zero-padding exactly.
    """
    k, _, c, c2 = w.shape
    out = jnp.zeros((3, 3, 4 * c, c2), w.dtype)
    for dy in range(k):
        py, cy = (dy - 1) % 2, (dy - 1) // 2 + 1
        for dx in range(k):
            px, cx = (dx - 1) % 2, (dx - 1) // 2 + 1
            blk = (py * 2 + px) * c
            out = out.at[cy, cx, blk:blk + c, :].set(w[dy, dx])
    return out


class _Ctx:
    """Carries variables + options through the forward.

    ``frames`` > 1 is the TPU-native batch: frames stack along H in the
    channel-major layout ([C, B*h, W]), so every kernel runs ONE longer
    grid instead of B dispatches (vmap over the packed-lane kernels
    measured slower AND fails Mosaic lowering for SMEM-blocked kernels).
    The 3x3 kernels mask their dy halos at frame boundaries; resamples
    and 1x1 matmuls are frame-oblivious in this layout."""

    def __init__(self, params, stats, dtype, interpret, s2d=False,
                 frames=1, mxu_bf16=False):
        self.params = params
        self.stats = stats
        self.dtype = dtype
        self.interpret = interpret
        self.s2d = s2d  # explicit opt-in (seg path); OR'd with the env knob
        self.frames = frames
        # bf16 MXU inputs, f32 activations/accumulate (dtype_name
        # 'bf16_mxu'): the cast happens in-register right before each
        # dot — no bf16 VMEM ref exists, avoiding the round-3 Mosaic
        # bf16-tiling fault while tripling the matmul rate
        self.mxu_bf16 = mxu_bf16

    def conv(self, name: str, x: jax.Array, relu: bool,
             stride: int = 1,
             res: Optional[jax.Array] = None) -> jax.Array:
        """One BasicConv on channel-major ``x [C, H, W]``.

        ``res``: optional ``[Cout, H, W]`` skip tensor added inside the
        kernel epilogue (fuses the ResBlock/FAM adds — one less HBM
        round trip per block)."""
        p = _subtree(self.params, name)
        s = _subtree(self.stats, name)
        w = p["conv_fm"]["kernel"]
        b = p["conv_fm"]["bias"]
        scale, offset = _fold_bn(p, s)
        k = w.shape[0]
        cin, h, wd = x.shape
        res2d = None if res is None else res.reshape(res.shape[0],
                                                     h * wd)
        if stride == 1 and k == 3:
            out = GP.gated_conv3x3_chw(
                x.reshape(cin, h * wd), w, b, scale, offset, res2d,
                w_img=wd, relu=relu, gated=True, frames=self.frames,
                interpret=self.interpret, mxu_bf16=self.mxu_bf16,
                impl=_CONV3_IMPL())
            return out.reshape(-1, h, wd)
        if stride == 1 and k == 1:
            out = GP.gated_conv1x1_chw(
                x.reshape(cin, h * wd), w, b, scale, offset, res2d,
                relu=relu, gated=True, interpret=self.interpret,
                mxu_bf16=self.mxu_bf16)
            return out.reshape(-1, h, wd)
        hf = h // self.frames  # rows per frame (stacked along H)
        if (stride == 2 and k in (3, 4) and hf % 2 == 0 and wd % 2 == 0
                and (self.s2d or _S2D_ENABLED(name))):
            # space-to-depth: stride-2 conv == 3x3/stride-1 conv on the
            # [4C, H/2, W/2] parity planes (glue diagnostic: the im2col
            # route + its NHWC transposes cost ~9.7 ms/frame of 50).
            # Frame heights are even, so the row pairing never straddles
            # a frame boundary and the stacked layout is preserved.
            c4 = 4 * cin
            nr = GP.pick_rows(wd // 2, c4)
            tap9 = 9 * c4 * nr * (wd // 2) * 4
            # VMEM scoped-limit guard: at tap9 = 44.8 MB (4C = 512 at
            # the minimum 2432-lane tile) the whole kernel needs ~107 MB
            # and the compile OOMs at the 104 MB scoped limit, so the
            # three deep transitions (feat3/feat6/feat7) keep im2col.
            if tap9 <= 40 * 1024 * 1024:
                xs = x.reshape(cin, h // 2, 2, wd // 2, 2)
                xs = jnp.transpose(xs, (2, 4, 0, 1, 3)).reshape(
                    c4, (h // 2) * (wd // 2))
                out = GP.gated_conv3x3_chw(
                    xs, _s2d_weights(w), b, scale, offset,
                    w_img=wd // 2, relu=relu, gated=True,
                    frames=self.frames, interpret=self.interpret,
                    mxu_bf16=self.mxu_bf16, impl=_CONV3_IMPL())
                return out.reshape(-1, h // 2, wd // 2)
        # fallback: im2col matmul in NHWC (per-frame real batch: a k>1
        # or strided conv over the stacked H would leak between frames)
        pad = (k - 1) // 2
        xn = jnp.transpose(x.reshape(cin, self.frames, hf, wd),
                           (1, 2, 3, 0))  # [B, hf, W, C]
        fm = _im2col_conv(xn, w.astype(self.dtype), b, stride, 1, pad,
                          self.dtype, mxu_bf16=self.mxu_bf16)
        c = fm.shape[-1] // 2
        f, m = fm[..., :c], fm[..., c:]
        if relu:
            f = _elu(f)
        out = f * jax.nn.sigmoid(m)
        out = out * scale + offset
        _, ho, wo, _ = fm.shape
        out = jnp.transpose(out, (3, 0, 1, 2)).reshape(
            c, self.frames * ho, wo).astype(self.dtype)
        return out if res is None else out + res

    def _resample(self, x, mode: str, f: int):
        if mode == "nearest" and f > 1:
            return _nup(x, f, self.frames)
        if mode == "bilinear":
            return _bilinear_up4(x, self.frames)
        return x

    def conv1x1_comb(self, name: str, parts, relu: bool,
                     res: Optional[jax.Array] = None) -> jax.Array:
        """1x1 BasicConv over a logical concat of RESAMPLED inputs.

        ``parts``: list of ``(tensor [C_j, h_j, w_j], mode, f)`` with
        mode in {id, nearest, bilinear}; the concat channel order is
        the parts order. Restructured as low-res matmuls + ONE fused
        XLA epilogue: ``conv1x1(concat(up(x_j))) == sum_j up(W_j@x_j)``
        because the matmul and the resamples are both linear, and the
        gated epilogue is elementwise at output res. This kills both
        the HBM concat (AFF0's is 859 MB/frame at 1216x368) and the
        full-res upsample materializations feeding it (z41 alone is
        458 MB/frame): each input is contracted AT ITS OWN RESOLUTION
        and XLA fuses the repeat/resize + adds + gate into the single
        output write. Reference math: ``AFF``/``SCM``/decoder ``Convs*``
        (src/READ/models/unet.py:44-58,78-97)."""
        p = _subtree(self.params, name)
        s = _subtree(self.stats, name)
        w = p["conv_fm"]["kernel"]
        if w.shape[0] != 1 or _CAT11_ENABLED(name):
            # bench/bisect knob: materialize the resampled inputs and
            # use the kernel path (pallas cat when enabled)
            xs = [self._resample(x, mode, f) for x, mode, f in parts]
            return self.conv_cat(name, xs, relu, res=res)
        b = p["conv_fm"]["bias"]
        scale, offset = _fold_bn(p, s)
        w2 = w.reshape(w.shape[2], w.shape[3])  # [ctot, C2]
        acc, coff = None, 0
        mm_dt = jnp.bfloat16 if self.mxu_bf16 else self.dtype
        for x, mode, f in parts:
            c = x.shape[0]
            wj = w2[coff:coff + c].astype(mm_dt)
            coff += c
            a = jnp.einsum("cn,cd->dn",
                           x.reshape(c, -1).astype(mm_dt), wj,
                           preferred_element_type=jnp.float32)
            a = self._resample(a.reshape(-1, x.shape[1], x.shape[2]),
                               mode, f)
            acc = a if acc is None else acc + a
        assert coff == w2.shape[0], (coff, w2.shape)
        fm = acc + b.astype(jnp.float32)[:, None, None]
        ch = fm.shape[0] // 2
        fmf, fmm = fm[:ch], fm[ch:]
        if relu:
            fmf = _elu(fmf)
        out = fmf * jax.nn.sigmoid(fmm)
        out = (out * scale[:, None, None]
               + offset[:, None, None]).astype(self.dtype)
        return out if res is None else out + res

    def conv_cat(self, name: str, xs, relu: bool,
                 res: Optional[jax.Array] = None) -> jax.Array:
        """BasicConv over a logical concat of channel-major ``xs``.

        For the UNet's 1x1 concat consumers (AFF/SCM/Convs*) the concat
        never materializes — ``gated_conv1x1_cat_chw`` accumulates
        per-input matmuls (AFF0's concat alone is a ~229 MB HBM round
        trip at 1216x368). Non-1x1 weights fall back to a real concat."""
        p = _subtree(self.params, name)
        s = _subtree(self.stats, name)
        w = p["conv_fm"]["kernel"]
        if w.shape[0] != 1 or not _CAT11_ENABLED(name):
            x = jnp.concatenate(list(xs), axis=0)
            return self.conv(name, x, relu, res=res)
        b = p["conv_fm"]["bias"]
        scale, offset = _fold_bn(p, s)
        _, h, wd = xs[0].shape
        res2d = None if res is None else res.reshape(res.shape[0],
                                                     h * wd)
        out = GP.gated_conv1x1_cat_chw(
            tuple(x.reshape(x.shape[0], h * wd) for x in xs),
            w, b, scale, offset, res2d, relu=relu, gated=True,
            interpret=self.interpret, mxu_bf16=self.mxu_bf16)
        return out.reshape(-1, h, wd)


def _subtree(tree: Dict, path: str) -> Dict:
    cur = tree
    for part in path.split("/"):
        cur = cur[part]
    return cur


def _res_block(ctx: _Ctx, name: str, x):
    y = ctx.conv(f"{name}/BasicConv_0", x, relu=True)
    return ctx.conv(f"{name}/BasicConv_1", y, relu=False, res=x)


def _eblock(ctx: _Ctx, name: str, x, num_res: int):
    for i in range(num_res):
        x = _res_block(ctx, f"{name}/ResBlock_{i}", x)
    return x


def _scm(ctx: _Ctx, name: str, x):
    y = ctx.conv(f"{name}/BasicConv_0", x, relu=True)
    y = ctx.conv(f"{name}/BasicConv_1", y, relu=True)
    y = ctx.conv(f"{name}/BasicConv_2", y, relu=True)
    y = ctx.conv(f"{name}/BasicConv_3", y, relu=True)
    return ctx.conv1x1_comb(f"{name}/BasicConv_4",
                            [(x, "id", 1), (y, "id", 1)], relu=False)


def _fam(ctx: _Ctx, name: str, x1, x2):
    return ctx.conv(f"{name}/BasicConv_0", x1 * x2, relu=False, res=x1)


def _aff(ctx: _Ctx, name: str, parts):
    x = ctx.conv1x1_comb(f"{name}/BasicConv_0", parts, relu=True)
    return ctx.conv(f"{name}/BasicConv_1", x, relu=False)


@functools.lru_cache(maxsize=64)
def _resample_mat(n_src: int, n_dst: int, mode: str):
    """Dense ``[n_src, n_dst]`` operator of a 1-D resample.

    Spatial resampling is linear per axis, so strided slices, nearest
    repeats, and bilinear interps are all (mostly-one-hot) matmuls. On
    TPU this matters: the profiled ``jnp.repeat``/``x[:, ::f]`` lower
    to gathers running at ~10 GB/s (1.4 ms for a decoder ``_ndown``),
    while the same work as an MXU matmul is ~0.1 ms. ``bilinear`` is
    built by resizing the identity, so it equals ``jax.image.resize``
    exactly up to float summation order."""
    import numpy as np
    if mode == "repeat":        # nearest upsample: dst j <- src j*n/N
        f = n_dst // n_src
        m = np.zeros((n_src, n_dst), np.float32)
        m[np.arange(n_dst) // f, np.arange(n_dst)] = 1.0
    elif mode == "stride":      # strided downsample: dst j <- src j*f
        f = n_src // n_dst
        m = np.zeros((n_src, n_dst), np.float32)
        m[np.arange(n_dst) * f, np.arange(n_dst)] = 1.0
    elif mode == "bilinear":
        # jax.image.resize 'bilinear' semantics in numpy (must not call
        # jax ops here: this builds constants inside a trace): half-pixel
        # centers x = (j+0.5)*src/dst - 0.5, triangle kernel of radius 1
        # scaled by max(1, src/dst), weights renormalized per output.
        scale = n_src / n_dst
        x = (np.arange(n_dst, dtype=np.float64) + 0.5) * scale - 0.5
        radius = max(1.0, scale)
        lo = np.ceil(x - radius).astype(np.int64)
        width = int(2 * radius + 1) + 1
        idx = lo[:, None] + np.arange(width)[None, :]   # [n_dst, width]
        t = (idx - x[:, None]) / radius
        wgt = np.maximum(0.0, 1.0 - np.abs(t))
        wgt = wgt / np.maximum(wgt.sum(1, keepdims=True), 1e-12)
        m = np.zeros((n_src, n_dst), np.float64)
        np.add.at(m, (np.clip(idx, 0, n_src - 1).ravel(),
                      np.repeat(np.arange(n_dst), width)), wgt.ravel())
        m = m.astype(np.float32)
    else:
        raise ValueError(mode)
    return m  # numpy: jnp.asarray at the use site (a cached jnp
    # constant created inside one trace would leak into the next)


def _resample_mm(x, frames: int, h_mode: str, w_mode: str,
                 H: int, W: int):
    """Separable spatial resample of ``[c, frames*h, w]`` via two
    matmuls (see :func:`_resample_mat`); frames stay stacked along H."""
    c, hs, ws = x.shape
    h = hs // frames
    dt = x.dtype
    out = x
    if W != ws:
        mw = jnp.asarray(_resample_mat(ws, W, w_mode))
        out = (out.reshape(c * hs, ws) @ mw).reshape(c, hs, W)
    if H != h:
        mh = jnp.asarray(_resample_mat(h, H, h_mode))
        out = jnp.einsum("fhw,hH->fHw",
                         out.reshape(c * frames, h, W), mh,
                         preferred_element_type=jnp.float32)
        out = out.reshape(c, frames * H, W)
    return out.astype(dt)


def _ndown(x, f, frames: int = 1):
    c, hs, w = x.shape
    h = hs // frames
    return _resample_mm(x, frames, "stride", "stride", h // f, w // f)


def _nup(x, f, frames: int = 1):
    c, hs, w = x.shape
    h = hs // frames
    return _resample_mm(x, frames, "repeat", "repeat", h * f, w * f)


def _bilinear_up4(x, frames: int = 1):
    c, hs, w = x.shape
    h = hs // frames
    return _resample_mm(x, frames, "bilinear", "bilinear", h * 4, w * 4)


def _check_dtype(dtype_name: str, interpret: bool):
    if dtype_name == "bf16_mxu":
        # bf16 MXU inputs + f32 activations/accumulate: every ref and
        # scratch stays f32 (no bf16 Mosaic tiling anywhere); only the
        # dot operands are cast in-register. Safe on TPU.
        return
    if dtype_name == "bfloat16" and not interpret:
        # Round-3 finding: the packed-lane kernels compile in bf16 but
        # FAULT the TPU worker at run time (Mosaic bf16 (16,128) tiling
        # vs the kernel's odd lane-offset tap slices; crash recorded in
        # RESULTS_r03.md). Recovery takes ~50 min, so refuse instead of
        # crashing: the supported bf16 route is conv_impl='im2col'.
        raise ValueError(
            "conv_impl='pallas' supports float32 only on TPU; "
            "use conv_impl='im2col' for bfloat16 inference")


@functools.partial(jax.jit,
                   static_argnames=("num_res", "interpret", "dtype_name",
                                    "s2d"))
def _encoder_seg(variables: Dict, x, x_2, x_4, x_8, num_res: int,
                 interpret: bool, dtype_name: str, s2d: bool = False):
    """Encoder half: inputs NHWC pyramid -> (res1, res2, res3, z).

    Batch B > 1 runs natively: frames stack along H in the channel-
    major layout (see :class:`_Ctx`), one kernel grid per conv for the
    whole batch."""
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params, stats = variables["params"], variables["batch_stats"]
    frames = x.shape[0]
    ctx = _Ctx(params, stats, dtype, interpret, s2d, frames,
               mxu_bf16=dtype_name == "bf16_mxu")

    def chw(t):
        b, h, w, c = t.shape
        return jnp.transpose(t, (3, 0, 1, 2)).reshape(
            c, b * h, w).astype(dtype)

    x, x_2, x_4, x_8 = chw(x), chw(x_2), chw(x_4), chw(x_8)

    z2 = _scm(ctx, "SCM2", x_2)
    z4 = _scm(ctx, "SCM1", x_4)
    z8 = _scm(ctx, "SCM0", x_8)

    x_ = ctx.conv("feat0", x, relu=True)
    res1 = _eblock(ctx, "Encoder0", x_, num_res)

    z = ctx.conv("feat1", res1, relu=True, stride=2)
    z = _fam(ctx, "FAM2", z, z2)
    res2 = _eblock(ctx, "Encoder1", z, num_res)

    z = ctx.conv("feat2", res2, relu=True, stride=2)
    z = _fam(ctx, "FAM1", z, z4)
    res3 = _eblock(ctx, "Encoder2", z, num_res)

    z = ctx.conv("feat6", res3, relu=True, stride=2)
    z = _fam(ctx, "FAM0", z, z8)
    z = _eblock(ctx, "Encoder3", z, num_res)
    return res1, res2, res3, z


@functools.partial(jax.jit,
                   static_argnames=("num_res", "interpret", "dtype_name",
                                    "s2d", "frames"))
def _decoder_seg(variables: Dict, res1, res2, res3, z, num_res: int,
                 interpret: bool, dtype_name: str, s2d: bool = False,
                 frames: int = 1) -> Dict[str, Any]:
    """Decoder half: (res1, res2, res3, z) -> output dict (NHWC)."""
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params, stats = variables["params"], variables["batch_stats"]
    ctx = _Ctx(params, stats, dtype, interpret, s2d, frames,
               mxu_bf16=dtype_name == "bf16_mxu")

    # downsamples are cheap slices (taken BEFORE the AFF matmul);
    # the upsampled inputs never materialize — conv1x1_comb contracts
    # each at its own resolution (see its docstring)
    z12 = _ndown(res1, 2, frames)
    z13 = _ndown(res1, 4, frames)
    z23 = _ndown(res2, 2, frames)

    res1 = _aff(ctx, "AFF0", [(res1, "id", 1), (res2, "nearest", 2),
                              (res3, "nearest", 4), (z, "nearest", 8)])
    res2 = _aff(ctx, "AFF1", [(z12, "id", 1), (res2, "id", 1),
                              (res3, "nearest", 2), (z, "nearest", 4)])
    res3 = _aff(ctx, "AFF2", [(z13, "id", 1), (z23, "id", 1),
                              (res3, "id", 1), (z, "nearest", 2)])

    z = _eblock(ctx, "Decoder0", z, num_res)
    z = ctx.conv("feat7", z, relu=True, stride=2)
    z = ctx.conv1x1_comb("Convs0", [(z, "bilinear", 4),
                                    (res3, "id", 1)], relu=True)
    z = _eblock(ctx, "Decoder1", z, num_res)

    z = ctx.conv("feat3", z, relu=True, stride=2)
    z = ctx.conv1x1_comb("Convs1", [(z, "bilinear", 4),
                                    (res2, "id", 1)], relu=True)
    z = _eblock(ctx, "Decoder2", z, num_res)

    z = ctx.conv("feat4", z, relu=True, stride=2)
    z = ctx.conv1x1_comb("Convs2", [(z, "bilinear", 4),
                                    (res1, "id", 1)], relu=True)
    feats = _eblock(ctx, "Decoder3", z, num_res)
    im = ctx.conv("feat5", feats, relu=False)

    def nhwc(t):
        c, ht, w = t.shape
        return jnp.transpose(t.reshape(c, frames, ht // frames, w),
                             (1, 2, 3, 0)).astype(jnp.float32)

    out = {"im_out": nhwc(im)}
    if "seg_head" in params:
        out["seg_out"] = nhwc(ctx.conv("seg_head", feats, relu=False))
    return out


@functools.partial(jax.jit,
                   static_argnames=("num_res", "interpret", "dtype_name"))
def unet_pallas_apply(variables: Dict, x, x_2, x_4, x_8,
                      num_res: int = 4, interpret: bool = False,
                      dtype_name: str = "float32") -> Dict[str, Any]:
    """Eval-mode UNet forward. Inputs NHWC ``[1, h, w, c]`` (batch 1);
    returns ``{'im_out': [1, h, w, 3]}`` (+ ``seg_out`` when the
    checkpoint has a seg head) — same contract as ``UNet.apply`` with
    ``train=False``. Whole-graph executable (one dispatch)."""
    _check_dtype(dtype_name, interpret)
    r1, r2, r3, z = _encoder_seg(variables, x, x_2, x_4, x_8,
                                 num_res, interpret, dtype_name)
    return _decoder_seg(variables, r1, r2, r3, z,
                        num_res, interpret, dtype_name,
                        frames=x.shape[0])


def unet_pallas_apply_seg(variables: Dict, x, x_2, x_4, x_8,
                          num_res: int = 4, interpret: bool = False,
                          dtype_name: str = "float32",
                          s2d: bool = True) -> Dict[str, Any]:
    """:func:`unet_pallas_apply` as TWO executables (encoder/decoder),
    with the space-to-depth strided transitions ON by default.

    Round-3 fault attribution (scripts/probe_pack_new.py): the s2d
    strided route and the concat-free 1x1 kernels are bit-exact and
    clean per-kernel AND as per-kernel dispatches (eager full net),
    but fault the TPU worker when compiled into the single whole-graph
    executable alongside the other ~18 Mosaic programs (distinct-
    program COUNT is not the trigger — 56 small programs in one
    executable run clean, scripts/probe_kernel_count.py). Splitting at
    the encoder/decoder boundary keeps each executable under whatever
    resource cliff the runtime hits, at the cost of one extra
    dispatch: measured 40.14 ms/frame vs 43.97 single-graph-no-s2d in
    the same window. Not jitted as a whole BY DESIGN — do not wrap in
    an outer jit (that rebuilds the single faulting executable)."""
    _check_dtype(dtype_name, interpret)
    r1, r2, r3, z = _encoder_seg(variables, x, x_2, x_4, x_8,
                                 num_res, interpret, dtype_name, s2d)
    return _decoder_seg(variables, r1, r2, r3, z,
                        num_res, interpret, dtype_name, s2d,
                        frames=x.shape[0])
