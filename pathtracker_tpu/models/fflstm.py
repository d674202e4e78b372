"""LSTM-over-pixels baseline — reference models/fflstm.py.

Frozen gaussian-init Conv3d (3->3, k=7, no bias, stop-gradient) + x^2, the
video flattened into a sequence of 3-dim tokens fed through a 2-layer
bidirectional nn.LSTM (reference fflstm.py:44,:77-81 re-feeds the same
sequence `timesteps` times, carrying the states), InstanceNorm3d over the
outputs reshaped back to a video, AvgPool3d(2), and one Linear -> sigmoid.

Deviations by intent: the snapshot hardcoded batch 2 and a 64x128x128 clip
(fflstm.py:54,:91); here shapes are derived, and tokens are the per-sample
(T*H*W) positions with channels as the 3-dim embedding (the snapshot's
`.view(-1, B, 3)` scrambled samples across the sequence axis — an accident
of memory layout, not a design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import conv3d, dense
from pathtracker_tpu.ops.lstm import lstm_apply, lstm_params


class FFLSTM(nn.Module):
    timesteps: int = 8
    filt_size: int = 15
    num_iter: int = 50
    exp_name: str = "exp1"
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    hgru_size: int = 4
    embedding_dim: int = 3

    @nn.compact
    def __call__(self, x, target=None, criterion=None, testmode: bool = False):
        e = self.embedding_dim
        hh = self.hgru_size
        xc = common.bcthw_to_bthwc(x)  # [B,T,H,W,3]
        b, t, h, w_, _ = xc.shape

        conv00 = self.param("conv00_kernel", nn.initializers.normal(stddev=1.0),
                            (7, 7, 7, 3, e))
        out = conv3d(xc, jax.lax.stop_gradient(conv00))  # frozen gaussian stem
        out = jnp.square(out)

        # [B,T,H,W,E] -> sequence [T*H*W, B, E]
        seq = out.reshape(b, t * h * w_, e).transpose(1, 0, 2)
        params = lstm_params(self, "unit1", e, hh, num_layers=2, bidirectional=True)
        state = None
        for _ in range(self.timesteps):
            output, state = lstm_apply(params, seq, state)

        # InstanceNorm3d over the output video [B, 2H channels, T,H,W]:
        # per-sample, per-channel stats over (T,H,W), no affine.
        vid = output.transpose(1, 0, 2).reshape(b, t, h, w_, 2 * hh)
        mean = jnp.mean(vid, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(vid, axis=(1, 2, 3), keepdims=True)
        vid = (vid - mean) * jax.lax.rsqrt(var + 1e-3)

        # AvgPool3d(2)
        pooled = jax.lax.reduce_window(
            vid, 0.0, jax.lax.add, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID") / 8.0
        flat = pooled.reshape(b, -1)
        feat = flat.shape[-1]
        fc_kern = self.param("fc4_kernel", pt_init.torch_conv_default, (feat, 1))
        fc_bias = self.param("fc4_bias", pt_init.torch_conv_bias(feat), (1,))
        logit = dense(flat, fc_kern, fc_bias)

        if criterion is not None:
            prob = jax.nn.sigmoid(logit.reshape(-1))
            loss = criterion(prob, target)
            return prob, jnp.ones((1,), logit.dtype), loss
        return logit, jnp.ones((1,), logit.dtype)
