"""Video ResNet family — torchvision r3d_18 / mc3_18 / r2plus1d_18 plus the
reference's "no-stride" forks (reference models/nostridetv.py,
nostridetv_cc.py, nostridetv_cc_smallest.py, nostridetv_positions.py).

Block types (reference nostridetv.py:19-82): Conv3DSimple (3x3x3),
Conv3DNoTemporal (1x3x3), Conv2Plus1D (spatial 1x3x3 -> BN -> ReLU ->
temporal 3x1x1 with the FLOP-matched midplanes). BasicBlock = conv-BN-ReLU,
conv-BN, +residual, ReLU.

Variants:
  r3d / mc3 / r2plus1      torchvision semantics: strided stem (1,2,2),
                           stride-2 stages, 1x1x1 strided downsample,
                           AdaptiveAvgPool + fc (num_classes=1 via the
                           engine's fc replacement, reference engine.py:188-190)
  nostride_r3d             dilated stem (stride 1, dilation (1,2,2)), widths
                           //4, stride-1 blocks with a SAME-padded dilated
                           downsample conv (reference nostridetv.py:252-254 —
                           NOTE the snapshot's unpadded version produces
                           mismatched residual shapes at runtime; the
                           documented "no-stride" intent, resolution
                           preservation, requires SAME padding)
  nostride_r3d_cc          5-channel stem (coord channels appended by
                           prepare_data), 32-wide stem, widths //2 (//4 for
                           stages 3-4), num_classes=1
  nostride_r3d_pos         5-channel stem, normalized meshgrid coords
                           appended INSIDE forward, stride-1 stages
  nostride_video_cc_small  3-ch stem, constant 32-wide stages, last-frame
                           feature map + frame-0 blue-channel target ->
                           Conv2d(33,1,5) -> Linear(1024,1) (reference
                           nostridetv_cc_smallest.py:238-253)

All norms are batch-stat (framework stance; torchvision used running stats),
eps 1e-5 per torch BatchNorm3d. Strided convs in the torchvision variants
use explicit torch-style symmetric padding ((k-1)//2 per dim), NOT XLA
"SAME": for stride 2 on even extents the two place conv windows at
different offsets, and only the explicit form reproduces torchvision
numerics (pinned against torchvision.models.video in
tests/test_video_resnet_oracle.py). The no-stride variants keep
resolution-preserving SAME padding by design: the reference fork is
broken as written (its blocks keep stride-2 main paths while the dilated
downsample is stride-1 and unpadded, so residual shapes mismatch at
runtime, and its dilated stem's torch padding would shrink 32->26) — the
fork's stated intent, preserved resolution for 32x32 tracking, requires
stride-1 + SAME.
Init parity: kaiming-normal fan_out/relu convs, BN (1,0), fc normal(0.01).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import batch_norm, conv2d, conv3d, dense


def _kaiming_out(key, shape, dtype=jnp.float32):
    """kaiming_normal(fan_out, relu) for THWIO kernels."""
    fan_out = int(np.prod(shape[:3])) * shape[4]
    std = float(np.sqrt(2.0 / fan_out))
    return std * jax.random.normal(key, shape, dtype)


_BN_EPS = 1e-5  # torch BatchNorm3d default (reference nostridetv.py norms)


def _torch_pad(kernel: tuple) -> tuple:
    """torch's symmetric conv padding: (k-1)//2 per dim. Equals SAME for
    stride 1 + odd k; differs from SAME for strided convs on even extents."""
    return tuple((k - 1) // 2 for k in kernel)


class _ConvBN(nn.Module):
    cin: int
    cout: int
    kernel: tuple
    stride: tuple = (1, 1, 1)
    dilation: tuple = (1, 1, 1)
    relu: bool = False
    padding: Any = None  # None -> torch-style symmetric; or "SAME"

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _kaiming_out, (*self.kernel, self.cin, self.cout))
        pad = self.padding if self.padding is not None else _torch_pad(self.kernel)
        y = conv3d(x, k, stride=self.stride, padding=pad, dilation=self.dilation)
        y = batch_norm(y, self.param("bn_scale", nn.initializers.ones, (self.cout,)),
                       self.param("bn_bias", nn.initializers.zeros, (self.cout,)),
                       eps=_BN_EPS)
        return jax.nn.relu(y) if self.relu else y


def _midplanes(cin, cout):
    return (cin * cout * 3 * 3 * 3) // (cin * 3 * 3 + 3 * cout)


class _BlockConv(nn.Module):
    """One conv_builder application (reference nostridetv.py:19-60)."""

    kind: str  # 'simple' | 'no_temporal' | '2plus1'
    cin: int
    cout: int
    stride: tuple

    @nn.compact
    def __call__(self, x):
        if self.kind == "simple":
            k = self.param("kernel", _kaiming_out, (3, 3, 3, self.cin, self.cout))
            return conv3d(x, k, stride=self.stride, padding=(1, 1, 1))
        if self.kind == "no_temporal":
            k = self.param("kernel", _kaiming_out, (1, 3, 3, self.cin, self.cout))
            return conv3d(x, k, stride=(1, self.stride[1], self.stride[2]),
                          padding=(0, 1, 1))
        mid = _midplanes(self.cin, self.cout)
        k1 = self.param("kernel_s", _kaiming_out, (1, 3, 3, self.cin, mid))
        y = conv3d(x, k1, stride=(1, self.stride[1], self.stride[2]),
                   padding=(0, 1, 1))
        y = batch_norm(y, self.param("bn_scale", nn.initializers.ones, (mid,)),
                       self.param("bn_bias", nn.initializers.zeros, (mid,)),
                       eps=_BN_EPS)
        y = jax.nn.relu(y)
        k2 = self.param("kernel_t", _kaiming_out, (3, 1, 1, mid, self.cout))
        return conv3d(y, k2, stride=(self.stride[0], 1, 1), padding=(1, 0, 0))


class _BasicBlock(nn.Module):
    kind: str
    cin: int
    planes: int
    stride: int = 1
    nostride: bool = False  # stride-1 main path + dilated SAME downsample

    @nn.compact
    def __call__(self, x):
        s = 1 if self.nostride else self.stride
        stride3 = (s, s, s) if self.kind != "no_temporal" else (1, s, s)
        y = _BlockConv(self.kind, self.cin, self.planes, stride3, name="conv1")(x)
        y = batch_norm(y, self.param("bn1_scale", nn.initializers.ones, (self.planes,)),
                       self.param("bn1_bias", nn.initializers.zeros, (self.planes,)),
                       eps=_BN_EPS)
        y = jax.nn.relu(y)
        y = _BlockConv(self.kind, self.planes, self.planes, (1, 1, 1), name="conv2")(y)
        y = batch_norm(y, self.param("bn2_scale", nn.initializers.ones, (self.planes,)),
                       self.param("bn2_bias", nn.initializers.zeros, (self.planes,)),
                       eps=_BN_EPS)

        residual = x
        if self.stride != 1 or self.cin != self.planes:
            if self.nostride:
                ds = (self.stride,) * 3
                k = self.param("ds_kernel", _kaiming_out, (*ds, self.cin, self.planes))
                residual = conv3d(x, k, stride=1, padding="SAME", dilation=ds)
            else:
                k = self.param("ds_kernel", _kaiming_out, (1, 1, 1, self.cin, self.planes))
                stride_ds = (self.stride,) * 3 if self.kind != "no_temporal" \
                    else (1, self.stride, self.stride)
                residual = conv3d(x, k, stride=stride_ds, padding=(0, 0, 0))
            residual = batch_norm(
                residual,
                self.param("ds_bn_scale", nn.initializers.ones, (self.planes,)),
                self.param("ds_bn_bias", nn.initializers.zeros, (self.planes,)),
                eps=_BN_EPS)
        return jax.nn.relu(y + residual)


VARIANTS: dict[str, dict[str, Any]] = {
    "r3d": dict(kinds=["simple"] * 4, widths=[64, 128, 256, 512], stem="basic",
                stem_out=64, in_ch=3, nostride=False, fac=1, readout="fc"),
    "mc3": dict(kinds=["simple"] + ["no_temporal"] * 3, widths=[64, 128, 256, 512],
                stem="basic", stem_out=64, in_ch=3, nostride=False, fac=1,
                readout="fc"),
    "r2plus1": dict(kinds=["2plus1"] * 4, widths=[64, 128, 256, 512],
                    stem="r2plus1", stem_out=64, in_ch=3, nostride=False, fac=1,
                    readout="fc"),
    "nostride_r3d": dict(kinds=["simple"] * 4, widths=[16, 32, 64, 128],
                         stem="dilated", stem_out=64, in_ch=3, nostride=True,
                         fac=4, readout="fc"),
    "nostride_r3d_cc": dict(kinds=["simple"] * 4, widths=[32, 64, 64, 128],
                            stem="dilated", stem_out=32, in_ch=5, nostride=True,
                            fac=2, readout="fc"),
    "nostride_r3d_pos": dict(kinds=["simple"] * 4, widths=[16, 32, 64, 128],
                             stem="basic_nostride", stem_out=64, in_ch=5,
                             nostride=True, fac=4, readout="fc",
                             add_positions=True),
    "nostride_video_cc_small": dict(kinds=["simple"] * 4, widths=[32, 32, 32, 32],
                                    stem="basic_nostride", stem_out=32, in_ch=3,
                                    nostride=True, fac=1, readout="target"),
}


class VideoResNet(nn.Module):
    variant: str = "r3d"
    num_classes: int = 1
    layers: Sequence[int] = (2, 2, 2, 2)
    timesteps: int | None = None
    # 'bfloat16' runs the whole feedforward net in bf16 (safe without a
    # recurrent carry; BN statistics stay f32 inside ops.layers.batch_norm
    # and the logits are returned f32).
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        cfg = VARIANTS[self.variant]
        xc = common.bcthw_to_bthwc(x)  # [B,T,H,W,C]
        xc = xc.astype(jnp.dtype(self.dtype))
        target = xc[:, 0, :, :, 2] if cfg["readout"] == "target" else None

        if cfg.get("add_positions"):
            b, t, h, w_, _ = xc.shape
            hh, ww = jnp.meshgrid(jnp.arange(h, dtype=xc.dtype),
                                  jnp.arange(w_, dtype=xc.dtype), indexing="ij")
            grid = jnp.stack([ww, hh], -1) / max(h - 1, w_ - 1)
            grid = jnp.broadcast_to(grid[None, None], (b, t, h, w_, 2))
            xc = jnp.concatenate([xc, grid], axis=-1)

        cin = xc.shape[-1]
        so = cfg["stem_out"]
        if cfg["stem"] == "basic":  # torchvision: strided spatial stem
            y = _ConvBN(cin, so, (3, 7, 7), stride=(1, 2, 2), relu=True,
                        padding=(1, 3, 3), name="stem")(xc)
        elif cfg["stem"] == "dilated":
            # nostride: stride 1, dilation (1,2,2); SAME keeps the full
            # 32x32 field (torch pad (1,3,3) would shrink it to 26x26 —
            # see module docstring on the reference fork's intent).
            y = _ConvBN(cin, so, (3, 7, 7), stride=(1, 1, 1), dilation=(1, 2, 2),
                        relu=True, padding="SAME", name="stem")(xc)
        elif cfg["stem"] == "basic_nostride":  # stride 1, no dilation
            y = _ConvBN(cin, so, (3, 7, 7), stride=(1, 1, 1), relu=True,
                        name="stem")(xc)
        else:  # r2plus1 stem
            y = _ConvBN(cin, 45, (1, 7, 7), stride=(1, 2, 2), relu=True,
                        padding=(0, 3, 3), name="stem_s")(xc)
            y = _ConvBN(45, so, (3, 1, 1), stride=(1, 1, 1), relu=True,
                        padding=(1, 0, 0), name="stem_t")(y)

        inplanes = so
        for li, (kind, width, nblocks) in enumerate(
                zip(cfg["kinds"], cfg["widths"], self.layers)):
            # Upstream torchvision builds layer1 with stride 1 (the stem
            # already strides); the reference's no-stride forks build EVERY
            # layer with stride=2 (reference nostridetv.py:213-216), which
            # in the stride-1 design governs the dilated downsample.
            stride = 2 if (li > 0 or cfg["nostride"]) else 1
            for bi in range(nblocks):
                y = _BasicBlock(kind, inplanes, width,
                                stride=stride if bi == 0 else 1,
                                nostride=cfg["nostride"],
                                name=f"layer{li + 1}_{bi}")(y)
                inplanes = width

        if cfg["readout"] == "target":
            # Last-frame features + frame-0 blue target marker
            # (reference nostridetv_cc_smallest.py:238-253).
            last = y[:, -1]  # [B,H,W,32]
            merged = jnp.concatenate([last, target[..., None]], axis=-1)
            tk = self.param("target_conv_kernel", pt_init.torch_conv_default,
                            (5, 5, inplanes + 1, 1))
            tb = self.param("target_conv_bias", nn.initializers.zeros, (1,))
            out = conv2d(merged, tk, tb)
            flat = out.reshape(out.shape[0], -1)
            fk = self.param("fc_kernel",
                            nn.initializers.normal(stddev=0.01),
                            (flat.shape[-1], self.num_classes))
            fb = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
            return dense(flat, fk, fb).astype(jnp.float32)

        pooled = jnp.mean(y, axis=(1, 2, 3))  # AdaptiveAvgPool3d((1,1,1))
        fk = self.param("fc_kernel", nn.initializers.normal(stddev=0.01),
                        (inplanes, self.num_classes))
        fb = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
        return dense(pooled, fk, fb).astype(jnp.float32)


def build(variant: str, timesteps: int | None = None, pretrained: bool = False,
          **kwargs):
    """Factory matching the reference engine's constructors
    (reference utils/engine.py:187-214; fc is always replaced with a 1-unit
    head there, so num_classes defaults to 1)."""
    return VideoResNet(variant=variant, timesteps=timesteps, **kwargs)
