"""SlowFast networks (arXiv:1812.03982) — reference models/slowfast_utils.py
+ models/cfgs/slowfast.yaml / slowfast_nl.yaml.

The reference built FAIR's SlowFast R50 from yaml; this is an in-repo JAX
implementation of the same architecture with the yaml's values
(cfgs/slowfast.yaml): ALPHA 4, BETA_INV 8, FUSION_CONV_CHANNEL_RATIO 2,
FUSION_KERNEL_SZ 7 (5 for _nl), R50 bottlenecks [3,4,6,3], spatial strides
[1,2,2,2], slow-pathway temporal kernels only in res4/res5, NUM_CLASSES 1,
dropout 0.5 before the head. `slowfast_nl` adds dot-product non-local blocks
at slow res3 blocks [1,3] and res4 blocks [1,3,5]
(cfgs/slowfast_nl.yaml:31) — NOTE the reference's slowfast_nl() never merged
its cfg file (slowfast_utils.py:8-9, a bug); here the nl config is applied
for real.

Input contract matches engine.model_step's SLOWFAST family: a
[slow BCT/4HW, fast BCTHW] list (reference utils/engine.py:47-61).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.models.common import bcthw_to_bthwc
from pathtracker_tpu.models.video_resnet import _kaiming_out
from pathtracker_tpu.ops.layers import batch_norm, conv3d, dense


_BN_EPS = 1e-5  # FAIR slowfast BN epsilon (torch BatchNorm3d default)


class _ConvBN3d(nn.Module):
    cin: int
    cout: int
    kernel: tuple
    stride: tuple = (1, 1, 1)
    relu: bool = True
    zero_bn: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _kaiming_out, (*self.kernel, self.cin, self.cout))
        # torch-style symmetric padding (k//2 per dim), matching FAIR's
        # Conv3d modules — for strided convs (the fuse conv's temporal
        # stride alpha, the stage (1,3,3) stride-2 convs) this places
        # windows differently from XLA SAME and only the explicit form
        # reproduces torch numerics (tests/test_slowfast_oracle.py).
        pad = tuple(kk // 2 for kk in self.kernel)
        y = conv3d(x, k, stride=self.stride, padding=pad)
        init = nn.initializers.zeros if self.zero_bn else nn.initializers.ones
        y = batch_norm(y, self.param("bn_scale", init, (self.cout,)),
                       self.param("bn_bias", nn.initializers.zeros, (self.cout,)),
                       eps=_BN_EPS)
        return jax.nn.relu(y) if self.relu else y


class _Bottleneck(nn.Module):
    """SlowFast bottleneck: (t,1,1) -> (1,3,3) stride -> (1,1,1) x4."""

    cin: int
    inner: int
    temp_kernel: int
    stride: int = 1
    zero_final_bn: bool = True

    @nn.compact
    def __call__(self, x):
        cout = self.inner * 4
        y = _ConvBN3d(self.cin, self.inner, (self.temp_kernel, 1, 1), name="a")(x)
        y = _ConvBN3d(self.inner, self.inner, (1, 3, 3),
                      stride=(1, self.stride, self.stride), name="b")(y)
        y = _ConvBN3d(self.inner, cout, (1, 1, 1), relu=False,
                      zero_bn=self.zero_final_bn, name="c")(y)
        if self.cin != cout or self.stride != 1:
            res = _ConvBN3d(self.cin, cout, (1, 1, 1),
                            stride=(1, self.stride, self.stride), relu=False,
                            name="proj")(x)
        else:
            res = x
        return jax.nn.relu(y + res)


class _NonLocal(nn.Module):
    """Dot-product non-local block (arXiv:1711.07971) with zero-init out BN."""

    channels: int

    @nn.compact
    def __call__(self, x):
        c = self.channels
        half = max(c // 2, 1)
        b = x.shape[0]
        theta = _ConvBN3dless(c, half, name="theta")(x)
        phi = _ConvBN3dless(c, half, name="phi")(x)
        g = _ConvBN3dless(c, half, name="g")(x)
        theta = theta.reshape(b, -1, half)
        phi = phi.reshape(b, -1, half)
        g = g.reshape(b, -1, half)
        attn = jnp.einsum("bnc,bmc->bnm", theta, phi) / jnp.sqrt(float(half))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, g).reshape(*x.shape[:4], half)
        out = _ConvBN3d(half, c, (1, 1, 1), relu=False, zero_bn=True,
                        name="out")(out)
        return x + out


class _ConvBN3dless(nn.Module):
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _kaiming_out, (1, 1, 1, self.cin, self.cout))
        return conv3d(x, k)


class SlowFast(nn.Module):
    alpha: int = 4
    beta_inv: int = 8
    fusion_ratio: int = 2
    fusion_kernel: int = 7
    width: int = 64
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    # Per-stage spatial stride of the first block (RESNET.SPATIAL_STRIDES
    # slow-path column in the yaml).
    stage_strides: Sequence[int] = (1, 2, 2, 2)
    num_classes: int = 1
    dropout_rate: float = 0.5
    nonlocal_slow: Sequence[Sequence[int]] = ((), (), (), ())
    zero_init_final_bn: bool = True  # RESNET.ZERO_INIT_FINAL_BN

    @nn.compact
    def __call__(self, pathways, testmode: bool = False):
        slow, fast = pathways  # BCTHW each
        slow = bcthw_to_bthwc(slow)
        fast = bcthw_to_bthwc(fast)
        w = self.width
        fw = w // self.beta_inv  # fast width

        # Stems: slow (1,7,7), fast (5,7,7), both stride (1,2,2) + spatial pool.
        slow = _ConvBN3d(slow.shape[-1], w, (1, 7, 7), stride=(1, 2, 2),
                         name="slow_stem")(slow)
        fast = _ConvBN3d(fast.shape[-1], fw, (5, 7, 7), stride=(1, 2, 2),
                         name="fast_stem")(fast)

        def pool(z):
            return jax.lax.reduce_window(
                z, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
                [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])

        slow, fast = pool(slow), pool(fast)

        def fuse(slow, fast, idx):
            lat = _ConvBN3d(fast.shape[-1], fast.shape[-1] * self.fusion_ratio,
                            (self.fusion_kernel, 1, 1),
                            stride=(self.alpha, 1, 1), name=f"fuse{idx}")(fast)
            return jnp.concatenate([slow, lat], axis=-1)

        slow = fuse(slow, fast, 0)

        # Stage configs: (inner width, spatial stride, slow temp kernel).
        inners = [w, w * 2, w * 4, w * 8]
        strides = list(self.stage_strides)
        slow_tk = [1, 1, 3, 3]  # temporal convs only in res4/res5 (slow path)
        for si, nblocks in enumerate(self.stage_blocks):
            for bi in range(nblocks):
                slow = _Bottleneck(slow.shape[-1], inners[si], slow_tk[si],
                                   stride=strides[si] if bi == 0 else 1,
                                   zero_final_bn=self.zero_init_final_bn,
                                   name=f"slow_res{si + 2}_{bi}")(slow)
                fast = _Bottleneck(fast.shape[-1], inners[si] // self.beta_inv, 3,
                                   stride=strides[si] if bi == 0 else 1,
                                   zero_final_bn=self.zero_init_final_bn,
                                   name=f"fast_res{si + 2}_{bi}")(fast)
                if bi in self.nonlocal_slow[si]:
                    slow = _NonLocal(slow.shape[-1],
                                     name=f"nl_res{si + 2}_{bi}")(slow)
            if si < len(self.stage_blocks) - 1:
                slow = fuse(slow, fast, si + 1)

        s_pool = jnp.mean(slow, axis=(1, 2, 3))
        f_pool = jnp.mean(fast, axis=(1, 2, 3))
        feat = jnp.concatenate([s_pool, f_pool], axis=-1)
        # Dropout 0.5 before the head (cfgs/slowfast.yaml DROPOUT_RATE):
        # active when the caller supplies a 'dropout' rng (the train step
        # does); inference/eval applies none.
        if self.dropout_rate > 0 and self.has_rng("dropout"):
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                        feat.shape)
            feat = jnp.where(mask, feat / keep, 0.0)
        head_k = self.param("head_kernel", nn.initializers.normal(stddev=0.01),
                            (feat.shape[-1], self.num_classes))
        head_b = self.param("head_bias", nn.initializers.zeros, (self.num_classes,))
        return dense(feat, head_k, head_b)


class SlowOnly(nn.Module):
    """Single-pathway Slow network (reference models/cfgs/slow.yaml,
    MODEL.ARCH: slow — shipped by the reference but unreachable there:
    no model_selector name builds it, reference utils/engine.py:75-217).

    The slow pathway of SlowFast without the fast path or lateral fusion:
    (1,7,7) stem, R50 bottleneck stages with temporal kernels only in
    res4/res5, optional non-local blocks per NONLOCAL.LOCATION, global
    pool + dropout + linear head. Input contract is the TORCHVISION family
    (plain BCTHW clip -> logits; reference utils/engine.py:43-46)."""

    width: int = 64
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    stage_strides: Sequence[int] = (1, 2, 2, 2)
    num_classes: int = 1
    dropout_rate: float = 0.5
    nonlocal_slow: Sequence[Sequence[int]] = ((), (), (), ())
    zero_init_final_bn: bool = True

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        x = bcthw_to_bthwc(x)
        w = self.width
        x = _ConvBN3d(x.shape[-1], w, (1, 7, 7), stride=(1, 2, 2),
                      name="stem")(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])

        inners = [w, w * 2, w * 4, w * 8]
        temp_k = [1, 1, 3, 3]  # temporal convs only in res4/res5
        for si, nblocks in enumerate(self.stage_blocks):
            for bi in range(nblocks):
                x = _Bottleneck(x.shape[-1], inners[si], temp_k[si],
                                stride=self.stage_strides[si] if bi == 0 else 1,
                                zero_final_bn=self.zero_init_final_bn,
                                name=f"res{si + 2}_{bi}")(x)
                if bi in self.nonlocal_slow[si]:
                    x = _NonLocal(x.shape[-1], name=f"nl_res{si + 2}_{bi}")(x)

        feat = jnp.mean(x, axis=(1, 2, 3))
        if self.dropout_rate > 0 and self.has_rng("dropout"):
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                        feat.shape)
            feat = jnp.where(mask, feat / keep, 0.0)
        head_k = self.param("head_kernel", nn.initializers.normal(stddev=0.01),
                            (feat.shape[-1], self.num_classes))
        head_b = self.param("head_bias", nn.initializers.zeros,
                            (self.num_classes,))
        return dense(feat, head_k, head_b)


def build(name: str, cfg_path: str | None = None, **kwargs):
    """Build a SlowFast variant from its yaml config.

    The architecture comes from the yaml (``cfg_path``, defaulting to the
    in-repo pathtracker_tpu/models/cfgs/<name>.yaml mirroring the
    reference's cfg) via slowfast_cfg.load_slowfast_cfg; explicit kwargs
    override yaml values — the reference's merge direction
    (slowfast_utils.py:13-17, cfg file over defaults, caller last).
    """
    from pathtracker_tpu.models.slowfast_cfg import (DEFAULT_CFGS,
                                                     load_slowfast_cfg)

    if name not in DEFAULT_CFGS:
        raise NotImplementedError(name)
    cfg_kwargs = load_slowfast_cfg(cfg_path or DEFAULT_CFGS[name])
    cfg_kwargs.update(kwargs)
    arch = cfg_kwargs.pop("arch", "slowfast")
    # The input contract is dispatched from the model NAME (engine.model_step
    # feeds `slow` one BCTHW array and `slowfast*` a [slow, fast] pair), so a
    # cfg whose MODEL.ARCH contradicts the name would build a model that
    # silently unpacks the wrong axis instead of erroring — reject it here.
    if (name == "slow") != (arch == "slow"):
        raise ValueError(
            f"--model {name} with a cfg whose MODEL.ARCH is '{arch}' "
            f"({cfg_path or DEFAULT_CFGS[name]}): the name picks the input "
            f"contract, the cfg must agree (slow <-> slow)")
    return SlowOnly(**cfg_kwargs) if arch == "slow" else SlowFast(**cfg_kwargs)
