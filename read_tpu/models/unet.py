"""The MIMO-UNet-style refinement network, in flax.linen (NHWC).

Architecture parity with the reference renderer net
(``src/READ/models/unet.py:121-280``; the class is called "UNet" there but
the topology is MIMO-UNet, acknowledged at reference ``README.md:137-138``):

- ``BasicConv`` is a *gated* conv: ``norm(act(conv_f(x)) * sigmoid(conv_m(x)))``
  with BatchNorm and ELU (``unet.py:10-53``). The reference stores a
  ``padding_mode='reflect'`` attribute but never passes it to nn.Conv2d,
  so the effective padding is zeros — we reproduce zero padding.
- 3-level encoder + bottleneck; downscaled inputs x_2, x_4, x_8 enter via
  ``SCM`` shallow modules and are fused by ``FAM`` (mul + conv residual).
- ``AFF`` cross-scale fusion concatenates 4 resolutions at each level
  (nearest-neighbor resampling, parity with ``F.interpolate`` defaults).
- Decoder "upsampling" steps are stride-2 k=4 convs followed by a x4
  bilinear upsample (net x2), then skip-concat + 1x1 conv + DBlock
  (``unet.py:255-280``).
- Output ``{'im_out': z}`` (``src/unet.py:280``); optional segmentation
  head realizes the src tree's latent seg capability
  (``src/READ/models/compose.py:39-40``).

Defaults: 8 input channels, 3 output, base_channel=32, num_res=4
(``unet.py:130-141``). Input spatial dims must be divisible by 32.

TPU notes: NHWC layout; a ``dtype`` knob runs conv math in bfloat16 while
keeping f32 params and BatchNorm statistics.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["BasicConv", "ResBlock", "SCM", "FAM", "AFF", "EBlock",
           "DBlock", "UNet"]


def _nearest_down(x: jax.Array, factor: int) -> jax.Array:
    """torch ``F.interpolate(scale_factor=1/f)`` nearest == strided pick
    of the top-left sample of each block (src index = floor(dst*f))."""
    return x[:, ::factor, ::factor, :]


def _nearest_up(x: jax.Array, factor: int) -> jax.Array:
    """torch nearest upsample == repeat each pixel f times per axis."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def _bilinear_up4(x: jax.Array) -> jax.Array:
    """``nn.Upsample(scale_factor=4, mode='bilinear')`` equivalent
    (align_corners=False == half-pixel centers, jax.image default)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 4, w * 4, c), method="bilinear")


def _im2col_conv(x: jax.Array, kernel: jax.Array, bias, stride: int,
                 dilation: int, pad: int, dtype,
                 mxu_bf16: bool = False) -> jax.Array:
    """Convolution as explicit im2col + one MXU matmul.

    On this TPU stack XLA lowers isolated ``conv_general_dilated`` calls
    at ~4-5 TFLOP/s while plain matmuls reach ~127 TFLOP/s
    (scripts/bench_roofline.py); this path re-expresses the conv as
    shifted-slice patch extraction plus a ``[B*Ho*Wo, kh*kw*Cin] @
    [kh*kw*Cin, Cout]`` MXU dot. Measured end-to-end at the bench point
    (scripts/bench_render_variants.py, same device window): in f32 the
    patch materialization's HBM traffic outweighs the MXU win (9.7 vs
    11.8 fps), so ``conv_impl='xla'`` stays the default — but this path
    COMPILES IN BFLOAT16 (no conv op; XLA's bf16 conv lowering crashes
    the worker at full res), which the native path cannot, and it
    differentiates cleanly so it serves training too.
    """
    kh, kw, cin, cout = kernel.shape
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho = (h + 2 * pad - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * pad - dilation * (kw - 1) - 1) // stride + 1
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            oy, ox = dy * dilation, dx * dilation
            cols.append(jax.lax.slice(
                xp, (0, oy, ox, 0),
                (b, oy + (ho - 1) * stride + 1,
                 ox + (wo - 1) * stride + 1, cin),
                (1, stride, stride, 1)))
    patches = jnp.concatenate(cols, axis=-1).astype(dtype)
    # mxu_bf16: bf16 MXU inputs + f32 accumulate (inference fast path;
    # an f32 TPU matmul is a 3-pass bf16 decomposition, so this is ~3x)
    mm_dt = jnp.bfloat16 if mxu_bf16 else dtype
    out = jax.lax.dot_general(
        patches.reshape(b * ho * wo, kh * kw * cin).astype(mm_dt),
        kernel.reshape(kh * kw * cin, cout).astype(mm_dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32 if mxu_bf16 else dtype
    ).astype(dtype)
    out = out.reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


class _Im2ColConv(nn.Module):
    """Drop-in conv with ``nn.Conv``'s parameter layout (kernel/bias)
    computed via :func:`_im2col_conv`. Checkpoints are interchangeable
    with the ``nn.Conv`` path."""
    features: int
    kernel_size: int
    stride: int
    dilation: int
    pad: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return _im2col_conv(x, kernel, bias, self.stride, self.dilation,
                            self.pad, self.dtype)


class BasicConv(nn.Module):
    """Gated conv block (``src/READ/models/unet.py:10-42``).

    ``conv_impl``: 'xla' (default, ``nn.Conv``'s native lowering) or
    'im2col' (:func:`_im2col_conv` — the bf16-capable formulation).
    Identical math and parameters either way; checkpoints interchange.
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = True
    dilation: int = 1
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = int(self.dilation * (self.kernel_size - 1) / 2)
        # The reference computes conv_f(x) and conv_m(x) as two separate
        # convs over the same input (``unet.py:10-42``). Mathematically
        # that is one conv with 2x the output channels, split in half —
        # fusing halves dispatch count and doubles MXU occupancy at
        # these 32-256 channel widths (same parameters, same math).
        if self.conv_impl == "im2col":
            fm = _Im2ColConv(
                name="conv_fm", features=2 * self.out_channels,
                kernel_size=self.kernel_size, stride=self.stride,
                dilation=self.dilation, pad=p, dtype=self.dtype,
            )(x.astype(self.dtype))
        else:
            fm = nn.Conv(
                name="conv_fm",
                features=2 * self.out_channels,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                kernel_dilation=(self.dilation, self.dilation),
                padding=[(p, p), (p, p)],
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x.astype(self.dtype))
        f = fm[..., :self.out_channels]
        m = fm[..., self.out_channels:]
        if self.relu:
            f = nn.elu(f)
        out = f * jax.nn.sigmoid(m)
        # use_fast_variance=False: the E[x^2]-E[x]^2 formulation loses to
        # cancellation on constant feature maps (the zero-init texture
        # makes whole pyramids constant at step 0) and its backward emits
        # NaN; the two-pass variance is stable there.
        out = nn.BatchNorm(
            name="norm", use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
            use_fast_variance=False,
        )(out.astype(jnp.float32))
        return out.astype(self.dtype)


class ResBlock(nn.Module):
    """Two gated convs with a residual (``unet.py:44-53``)."""
    channels: int
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BasicConv(self.channels, 3, 1, relu=True, dtype=self.dtype, conv_impl=self.conv_impl)(
            x, train)
        y = BasicConv(self.channels, 3, 1, relu=False, dtype=self.dtype, conv_impl=self.conv_impl)(
            y, train)
        return y + x


class EBlock(nn.Module):
    """num_res ResBlocks (``unet.py:73-82``)."""
    channels: int
    num_res: int = 8
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_res):
            x = ResBlock(self.channels, dtype=self.dtype, conv_impl=self.conv_impl)(x, train)
        return x


class DBlock(EBlock):
    """Same body as EBlock (``unet.py:85-93``)."""


class SCM(nn.Module):
    """Shallow conv module for multi-scale inputs (``unet.py:55-70``)."""
    out_plane: int
    in_channels: int = 8
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        op = self.out_plane
        y = BasicConv(op // 4, 3, 1, relu=True, dtype=self.dtype, conv_impl=self.conv_impl)(x, train)
        y = BasicConv(op // 2, 1, 1, relu=True, dtype=self.dtype, conv_impl=self.conv_impl)(y, train)
        y = BasicConv(op // 2, 3, 1, relu=True, dtype=self.dtype, conv_impl=self.conv_impl)(y, train)
        y = BasicConv(op - self.in_channels, 1, 1, relu=True,
                      dtype=self.dtype, conv_impl=self.conv_impl)(y, train)
        y = jnp.concatenate([x, y], axis=-1)
        return BasicConv(op, 1, 1, relu=False, dtype=self.dtype, conv_impl=self.conv_impl)(y, train)


class FAM(nn.Module):
    """Feature attention fusion: x1 + conv(x1*x2) (``unet.py:96-104``)."""
    channels: int
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x = x1 * x2
        return x1 + BasicConv(self.channels, 3, 1, relu=False,
                              dtype=self.dtype, conv_impl=self.conv_impl)(x, train)


class AFF(nn.Module):
    """Cross-scale fusion of 4 resampled feature maps (``unet.py:106-115``)."""
    out_channels: int
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x1, x2, x3, x4, train: bool = False):
        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        x = BasicConv(self.out_channels, 1, 1, relu=True,
                      dtype=self.dtype, conv_impl=self.conv_impl)(x, train)
        return BasicConv(self.out_channels, 3, 1, relu=False,
                         dtype=self.dtype, conv_impl=self.conv_impl)(x, train)


class UNet(nn.Module):
    """MIMO-UNet renderer (``src/READ/models/unet.py:121-280``).

    Call: ``net(x, x_2, x_4, x_8, train=...)`` with NHWC descriptor maps at
    full, 1/2, 1/4, 1/8 resolution (the net consumes 4 of the 5 rendered
    scales, parity with ``unet.py:209-212``). Returns ``{'im_out': rgb}``
    (+ ``'seg_out'`` when ``num_classes`` is set).
    """
    num_input_channels: int = 8
    num_output_channels: int = 3
    base_channel: int = 32
    num_res: int = 4
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32
    conv_impl: str = "xla"
    # rematerialize encoder/decoder blocks in the backward pass: trades
    # ~2x block recompute for dropping their activations from HBM —
    # needed for the 10M-point fit at native 1216x368, whose plain
    # backward OOMs (RESULTS_r03.md config 3)
    remat: bool = False

    @nn.compact
    def __call__(self, x, x_2, x_4, x_8, train: bool = False):
        bc = self.base_channel
        dt = self.dtype
        ci = self.conv_impl
        cin = self.num_input_channels
        EB, DB = ((nn.remat(EBlock, static_argnums=(2,)),
                   nn.remat(DBlock, static_argnums=(2,)))
                  if self.remat else (EBlock, DBlock))

        z2 = SCM(bc * 2, in_channels=cin, dtype=dt, conv_impl=ci, name="SCM2")(x_2, train)
        z4 = SCM(bc * 4, in_channels=cin, dtype=dt, conv_impl=ci, name="SCM1")(x_4, train)
        z8 = SCM(bc * 8, in_channels=cin, dtype=dt, conv_impl=ci, name="SCM0")(x_8, train)

        # Encoder (feat_extract[0..2,6] + EBlocks, unet.py:216-233)
        x_ = BasicConv(bc, 3, 1, relu=True, dtype=dt, conv_impl=ci,
                       name="feat0")(x, train)
        res1 = EB(bc, self.num_res, dtype=dt, conv_impl=ci, name="Encoder0")(x_, train)

        z = BasicConv(bc * 2, 3, 2, relu=True, dtype=dt, conv_impl=ci,
                      name="feat1")(res1, train)
        z = FAM(bc * 2, dtype=dt, conv_impl=ci, name="FAM2")(z, z2, train)
        res2 = EB(bc * 2, self.num_res, dtype=dt, conv_impl=ci, name="Encoder1")(z, train)

        z = BasicConv(bc * 4, 3, 2, relu=True, dtype=dt, conv_impl=ci,
                      name="feat2")(res2, train)
        z = FAM(bc * 4, dtype=dt, conv_impl=ci, name="FAM1")(z, z4, train)
        res3 = EB(bc * 4, self.num_res, dtype=dt, conv_impl=ci, name="Encoder2")(z, train)

        z = BasicConv(bc * 8, 3, 2, relu=True, dtype=dt, conv_impl=ci,
                      name="feat6")(res3, train)
        z = FAM(bc * 8, dtype=dt, conv_impl=ci, name="FAM0")(z, z8, train)
        z = EB(bc * 8, self.num_res, dtype=dt, conv_impl=ci, name="Encoder3")(z, train)

        # Cross-scale AFF fusion (unet.py:239-254); the reference's
        # F.interpolate defaults are nearest for these resamples.
        z12 = _nearest_down(res1, 2)
        z13 = _nearest_down(res1, 4)
        z21 = _nearest_up(res2, 2)
        z23 = _nearest_down(res2, 2)
        z32 = _nearest_up(res3, 2)
        z31 = _nearest_up(res3, 4)
        z43 = _nearest_up(z, 2)
        z42 = _nearest_up(z43, 2)
        z41 = _nearest_up(z42, 2)

        res1 = AFF(bc, dtype=dt, conv_impl=ci, name="AFF0")(res1, z21, z31, z41, train)
        res2 = AFF(bc * 2, dtype=dt, conv_impl=ci, name="AFF1")(z12, res2, z32, z42, train)
        res3 = AFF(bc * 4, dtype=dt, conv_impl=ci, name="AFF2")(z13, z23, res3, z43, train)

        # Decoder (unet.py:255-280): stride-2 k4 conv + x4 bilinear = x2 up.
        z = DB(bc * 8, self.num_res, dtype=dt, conv_impl=ci, name="Decoder0")(z, train)
        z = BasicConv(bc * 4, 4, 2, relu=True, dtype=dt, conv_impl=ci, name="feat7")(z, train)
        z = _bilinear_up4(z)
        z = jnp.concatenate([z, res3], axis=-1)
        z = BasicConv(bc * 4, 1, 1, relu=True, dtype=dt, conv_impl=ci, name="Convs0")(z, train)
        z = DB(bc * 4, self.num_res, dtype=dt, conv_impl=ci, name="Decoder1")(z, train)

        z = BasicConv(bc * 2, 4, 2, relu=True, dtype=dt, conv_impl=ci, name="feat3")(z, train)
        z = _bilinear_up4(z)
        z = jnp.concatenate([z, res2], axis=-1)
        z = BasicConv(bc * 2, 1, 1, relu=True, dtype=dt, conv_impl=ci, name="Convs1")(z, train)
        z = DB(bc * 2, self.num_res, dtype=dt, conv_impl=ci, name="Decoder2")(z, train)

        z = BasicConv(bc, 4, 2, relu=True, dtype=dt, conv_impl=ci, name="feat4")(z, train)
        z = _bilinear_up4(z)
        z = jnp.concatenate([z, res1], axis=-1)
        z = BasicConv(bc, 1, 1, relu=True, dtype=dt, conv_impl=ci, name="Convs2")(z, train)
        feats = DB(bc, self.num_res, dtype=dt, conv_impl=ci, name="Decoder3")(z, train)
        im = BasicConv(self.num_output_channels, 3, 1, relu=False,
                       dtype=dt, conv_impl=ci, name="feat5")(feats, train)

        out = {"im_out": im.astype(jnp.float32)}
        if self.num_classes is not None:
            seg = BasicConv(self.num_classes, 3, 1, relu=False, dtype=dt, conv_impl=ci,
                            name="seg_head")(feats, train)
            out["seg_out"] = seg.astype(jnp.float32)
        return out
