"""Feedforward 3D-conv baseline — reference models/FFnet.py.

8-layer Conv3d stack: conv0 (3->25, k=7, no bias) + BN, then six k=15
conv+BN+ReLU blocks at 25 channels, a 1x1 conv to 2 channels, flatten, and a
Linear to 2 class logits (reference FFnet.py:51-93). The reference hardcoded
batch size 2 in `out.view(2, -1)` and a 64x128x128 clip in the Linear; here
both are shape-derived (the documented intent), and BatchNorm3d uses batch
statistics (the reference's default BN had running stats; under this
framework's pure-function stance all norms are batch-stat — see ops.layers).

Contracts:
  __call__(x) -> (single logit [B,1], jv_penalty)   # engine wiring:
      logit = out[:,1] - out[:,0], the exact binary log-odds of the 2-class
      softmax the reference trained with CrossEntropyLoss
  legacy(x, target, criterion) -> (output [B,2], jv_penalty, loss)
      # the reference's criterion-passed-in contract (FFnet.py:51)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import batch_norm, conv3d, dense


class FFConvNet(nn.Module):
    filt_size: int = 15
    num_iter: int = 50
    exp_name: str = "exp1"
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    width: int = 25

    def _features(self, x):
        c = self.width
        k = self.filt_size
        xc = common.bcthw_to_bthwc(x)  # [B,T,H,W,3]
        w0 = self.param("conv0_kernel", pt_init.torch_conv_default, (7, 7, 7, 3, c))
        out = conv3d(xc, w0)
        # reference BatchNorm3d keeps the torch default eps=1e-5 (FFnet.py:15;
        # unlike the recurrent cells' eps=1e-03 BatchNorm2d, InT.py:102)
        out = batch_norm(out, self.param("bn0_scale", nn.initializers.ones, (c,)),
                         self.param("bn0_bias", nn.initializers.zeros, (c,)),
                         eps=1e-5)
        for i in range(1, 7):
            wi = self.param(f"conv{i}_kernel", pt_init.torch_conv_default,
                            (k, k, k, c, c))
            bi = self.param(f"conv{i}_bias", pt_init.torch_conv_bias(c * k * k * k), (c,))
            out = conv3d(out, wi, bi)
            out = batch_norm(out,
                             self.param(f"bn{i}_scale", nn.initializers.ones, (c,)),
                             self.param(f"bn{i}_bias", nn.initializers.zeros, (c,)),
                             eps=1e-5)
            out = nn.relu(out)
        w7 = self.param("conv7_kernel", pt_init.torch_conv_default, (c, 2))
        b7 = self.param("conv7_bias", pt_init.torch_conv_bias(c), (2,))
        out = dense(out, w7, b7)  # 1x1x1 conv -> [B,T,H,W,2]
        b, t, h, w_, _ = out.shape
        feat = 2 * t * h * w_
        fk = self.param("fc4_kernel", pt_init.torch_conv_default, (feat, 2))
        fb = self.param("fc4_bias", pt_init.torch_conv_bias(feat), (2,))
        flat = common.bthwc_to_bcthw(out).reshape(b, -1)  # CTHW order like torch
        return dense(flat, fk, fb)  # [B, 2]

    @nn.compact
    def __call__(self, x, target=None, criterion=None, testmode: bool = False):
        out = self._features(x)
        if criterion is not None:  # legacy contract (reference FFnet.py:51)
            loss = criterion(out, target)
            return out, jnp.ones((1,), out.dtype), loss
        logit = (out[:, 1] - out[:, 0])[:, None]
        return logit, jnp.ones((1,), logit.dtype)
