"""TSM-ResNet50 with MotionSqueeze optical flow — reference
models/resnet_TSM.py (arXiv:2004.11347 MotionSqueeze + arXiv:1811.08383 TSM).

Architecture (as intended by the reference; its forward carried a live
pdb.set_trace and returned its input — resnet_TSM.py:428,:445 — so this
implements the coherent MotionSqueeze design the file describes):

  * 2D ResNet-50 over frames (stem conv7x7 stride 1 + maxpool stride 1 —
    the reference keeps full resolution for 32x32 clips, :238-244, and all
    stages run stride 1, :263-266);
  * every bottleneck applies the temporal shift (1/8 fwd, 1/8 bwd) to its
    input before conv1 (:106-143 via tsm_util);
  * after layer2: MotionSqueeze — channel reduction to 64, L2 normalize,
    15x15 correlation between adjacent frames (the CUDA
    spatial_correlation_sampler replaced by ops.correlation), gaussian-kernel
    soft-argmax to a 2-channel flow + top-1 confidence (:319-370), then the
    depthwise/pointwise Flow_refinement stack 3->16->32->64->512 added
    residually to the layer2 features (:169-230);
  * head: per-frame global average pool, 1x1 fc to num_classes, mean over
    frames (TSN consensus).

Contract: torchvision family — forward(x [B,C,T,H,W]) -> logits [B, num_classes].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pathtracker_tpu.models.common import bcthw_to_bthwc
from pathtracker_tpu.ops.correlation import correlation, l2_normalize
from pathtracker_tpu.ops.layers import batch_norm, conv2d, dense
from pathtracker_tpu.ops.tsm import tsm


def _kaiming2d(key, shape, dtype=jnp.float32):
    fan_out = shape[0] * shape[1] * shape[3]
    return float(np.sqrt(2.0 / fan_out)) * jax.random.normal(key, shape, dtype)


class _ConvBN(nn.Module):
    cin: int
    cout: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    relu: bool = True
    zero_bn: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _kaiming2d,
                       (self.kernel, self.kernel, self.cin // self.groups, self.cout))
        y = conv2d(x, k, stride=self.stride, padding="SAME", groups=self.groups)
        init = nn.initializers.zeros if self.zero_bn else nn.initializers.ones
        # torch BatchNorm2d eps (reference resnet_TSM.py uses defaults); all
        # convs here are stride-1 so SAME padding equals torch's k//2.
        y = batch_norm(y, self.param("bn_scale", init, (self.cout,)),
                       self.param("bn_bias", nn.initializers.zeros, (self.cout,)),
                       eps=1e-5)
        return jax.nn.relu(y) if self.relu else y


class _TSMBottleneck(nn.Module):
    """ResNet bottleneck with temporal shift on the block input."""

    cin: int
    planes: int
    stride: int = 1
    shift: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [B, T, H, W, C]; 2D convs run with T folded into batch.
        b, t, h, w, c = x.shape
        shifted = tsm(x) if self.shift else x
        flat = shifted.reshape(b * t, h, w, c)
        cout = self.planes * 4
        y = _ConvBN(c, self.planes, 1, name="conv1")(flat)
        y = _ConvBN(self.planes, self.planes, 3, stride=self.stride, name="conv2")(y)
        y = _ConvBN(self.planes, cout, 1, relu=False, zero_bn=False, name="conv3")(y)
        if self.stride != 1 or c != cout:
            res = _ConvBN(c, cout, 1, stride=self.stride, relu=False, name="down")(
                x.reshape(b * t, h, w, c))
        else:
            res = x.reshape(b * t, h, w, c)
        out = jax.nn.relu(y + res)
        return out.reshape(b, t, out.shape[1], out.shape[2], cout)


class _TSMBasicBlock(nn.Module):
    """ResNet basic block (two 3x3 convs, expansion 1) with temporal shift —
    the block used by the reference's resnet18/34 builders
    (resnet_TSM.py:73-104,:448-484)."""

    cin: int
    planes: int
    stride: int = 1
    shift: bool = True

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        shifted = tsm(x) if self.shift else x
        flat = shifted.reshape(b * t, h, w, c)
        y = _ConvBN(c, self.planes, 3, stride=self.stride, name="conv1")(flat)
        y = _ConvBN(self.planes, self.planes, 3, relu=False, name="conv2")(y)
        if self.stride != 1 or c != self.planes:
            res = _ConvBN(c, self.planes, 1, stride=self.stride, relu=False,
                          name="down")(x.reshape(b * t, h, w, c))
        else:
            res = x.reshape(b * t, h, w, c)
        out = jax.nn.relu(y + res)
        return out.reshape(b, t, out.shape[1], out.shape[2], self.planes)


class _FlowRefinement(nn.Module):
    """Depthwise/pointwise conv stack 3 -> 16 -> 32 -> 64 -> out_channel,
    added residually (reference resnet_TSM.py:169-230)."""

    out_channel: int

    @nn.compact
    def __call__(self, flow_conf, res):
        # flow_conf: [B, T, H, W, 3] (flow u,v + confidence, last frame
        # duplicated to match T); res: [B, T, H, W, out_channel].
        b, t, h, w, _ = flow_conf.shape
        x = flow_conf.reshape(b * t, h, w, 3)
        x = _ConvBN(3, 3, 7, groups=3, name="dw1")(x)
        x = _ConvBN(3, 16, 1, name="pw1")(x)
        x = _ConvBN(16, 16, 3, groups=16, name="dw2")(x)
        x = _ConvBN(16, 32, 1, name="pw2")(x)
        x = _ConvBN(32, 32, 3, groups=32, name="dw3")(x)
        x = _ConvBN(32, 64, 1, name="pw3")(x)
        x = _ConvBN(64, 64, 3, groups=64, name="dw4")(x)
        x = _ConvBN(64, self.out_channel, 1, name="pw4")(x)
        return x.reshape(b, t, h, w, self.out_channel) + res


def _match_to_flow_soft(match, patch: int, temperature: float = 100.0,
                        sigma: float = 5.0):
    """Gaussian-windowed soft-argmax over the correlation volume
    (reference resnet_TSM.py:319-370). match: [N, H, W, P*P].
    Returns (flow [N, H, W, 2] in [-1, 1], confidence [N, H, W, 1])."""
    n, h, w, pp = match.shape
    disp = (patch - 1) / 2.0
    conf = jnp.max(match, axis=-1, keepdims=True)  # top-1 confidence
    idx = jnp.argmax(match, axis=-1)  # [N,H,W]
    idx_y = (idx // patch).astype(match.dtype)[..., None]
    idx_x = (idx % patch).astype(match.dtype)[..., None]
    coords = jnp.arange(pp)
    cx = (coords % patch).astype(match.dtype)[None, None, None]
    cy = (coords // patch).astype(match.dtype)[None, None, None]
    gauss = jnp.exp(-((cx - idx_x) ** 2 + (cy - idx_y) ** 2) / (2 * sigma ** 2))
    weighted = jax.nn.softmax(match * gauss * temperature, axis=-1)
    smax = weighted.reshape(n, h, w, patch, patch)  # [..., y, x]
    kern = jnp.arange(-disp, disp + 1, dtype=match.dtype)
    flow_x = jnp.sum(jnp.sum(smax, axis=3) * kern, axis=-1) / disp
    flow_y = jnp.sum(jnp.sum(smax, axis=4) * kern, axis=-1) / disp
    return jnp.stack([flow_x, flow_y], axis=-1), conf


class TSMResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    num_segments: int = 8
    flow_estimation: bool = True
    num_classes: int = 1
    patch: int = 15
    block: str = "bottleneck"  # 'bottleneck' (r50/101) | 'basic' (r18/34)
    # Per-block rematerialization: the no-stride trunk keeps full 32x32 maps
    # through 1024/2048-wide stages, so backprop residuals dominate HBM
    # (batch 8 x T=64 needs 85G without it). nn.remat stores only block
    # inputs and recomputes intra-block activations during the backward —
    # the standard TPU trade of MXU FLOPs for HBM.
    remat: bool = False

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        xc = bcthw_to_bthwc(x)  # [B,T,H,W,3]
        b, t, h, w, _ = xc.shape
        flat = xc.reshape(b * t, h, w, 3)
        y = _ConvBN(3, 64, 7, name="stem")(flat)
        # maxpool k3 s1 SAME (resolution preserved, reference :244)
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 1, 1, 1),
                                  [(0, 0), (1, 1), (1, 1), (0, 0)])
        y = y.reshape(b, t, h, w, 64)

        block_cls = _TSMBottleneck if self.block == "bottleneck" else _TSMBasicBlock
        if self.remat:
            block_cls = nn.remat(block_cls)
        widths = [64, 128, 256, 512]
        for si, nblocks in enumerate(self.layers):
            for bi in range(nblocks):
                y = block_cls(y.shape[-1], widths[si], stride=1,
                              name=f"layer{si + 1}_{bi}")(y)
            if si == 1 and self.flow_estimation:
                y = self._motion_squeeze(y)

        feat = jnp.mean(y, axis=(2, 3))  # [B,T,2048]
        fk = self.param("fc1_kernel", nn.initializers.normal(stddev=0.01),
                        (feat.shape[-1], self.num_classes))
        fb = self.param("fc1_bias", nn.initializers.zeros, (self.num_classes,))
        logits = dense(feat, fk, fb)  # [B,T,num_classes]
        return jnp.mean(logits, axis=1)  # TSN consensus over frames

    def _motion_squeeze(self, y):
        b, t, h, w, c = y.shape
        red = _ConvBN(c, 64, 1, name="chnl_reduction")(y.reshape(b * t, h, w, c))
        red = red.reshape(b, t, h, w, 64)
        f_pre = l2_normalize(red[:, :-1].reshape(b * (t - 1), h, w, 64))
        f_post = l2_normalize(red[:, 1:].reshape(b * (t - 1), h, w, 64))
        match = jax.nn.relu(correlation(f_pre, f_post, patch=self.patch))
        flow, conf = _match_to_flow_soft(match, self.patch)
        fc = jnp.concatenate([flow, conf], axis=-1).reshape(b, t - 1, h, w, 3)
        fc = jnp.concatenate([fc, fc[:, -1:]], axis=1)  # repeat last frame
        return _FlowRefinement(c, name="flow_refinement")(fc, y)


def resnet50_tsm(num_segments: int = 8, flow_estimation: bool = True,
                 pretrained: bool = False, **kwargs):
    """reference utils/engine.py:192 builds rntsm.resnet50(shift='TSM',
    num_segments=8, flow_estimation=1)."""
    return TSMResNet(num_segments=num_segments, flow_estimation=flow_estimation,
                     **kwargs)


def resnet18_tsm(num_segments: int = 8, flow_estimation: bool = True,
                 pretrained: bool = False, **kwargs):
    """reference resnet_TSM.py:448 — BasicBlock, [2,2,2,2]."""
    return TSMResNet(layers=(2, 2, 2, 2), block="basic",
                     num_segments=num_segments,
                     flow_estimation=flow_estimation, **kwargs)


def resnet34_tsm(num_segments: int = 8, flow_estimation: bool = True,
                 pretrained: bool = False, **kwargs):
    """reference resnet_TSM.py:467 — BasicBlock, [3,4,6,3]."""
    return TSMResNet(layers=(3, 4, 6, 3), block="basic",
                     num_segments=num_segments,
                     flow_estimation=flow_estimation, **kwargs)


def resnet101_tsm(num_segments: int = 8, flow_estimation: bool = True,
                  pretrained: bool = False, **kwargs):
    """reference resnet_TSM.py:505 — Bottleneck, [3,4,23,3]."""
    return TSMResNet(layers=(3, 4, 23, 3), block="bottleneck",
                     num_segments=num_segments,
                     flow_estimation=flow_estimation, **kwargs)
