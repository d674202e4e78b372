"""LRCN-style baselines — reference models/lrcn_style.py and
lrcn_style_last_readout.py (arXiv:1411.4389 lineage).

Pipeline (reference lrcn_style.py:65-129): gaussian-init Conv3d(3->3) +
leaky_relu, Conv3d(3->E) + leaky_relu, AvgPool3d(2); per pooled frame, the
flattened frame tokens run through LSTM-1; LSTM-2 consumes LSTM-1's outputs
with hidden/cell states fused every frame by chunked-mean over the
concatenated states of both LSTMs (reference :83-93, chunk size 9); a
per-frame readout Linear -> sigmoid produces a probability per frame.

`LRCNStyle` majority-votes the per-frame probabilities (>0.5) into a clip
label and returns pseudo-probabilities 0.7/0.2 (reference :109-124), with
the loss = mean of per-frame BCE. `LRCNStyleLast` reads out only the last
frame. Deviations by intent: shape-derived sizes (the snapshot hardcoded a
64x64 grid and giant unused Linears), per-sample readouts, and dropout is
deterministic-off (the snapshot's p=0.5 train dropout is exposed via the
`deterministic` arg).

Standard contract: (logit [B,1], jv_penalty) where logit is the pre-sigmoid
clip-level readout (last frame), so these train in the common BCE loop.
Legacy contract (criterion passed): the reference's
(pseudo-prob outputs, jv_penalty, mean frame loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import conv3d, dense
from pathtracker_tpu.ops.lstm import lstm_apply, lstm_params


def _chunked_mean_fuse(a, b):
    """Fuse the states of both LSTMs [L,B,H1] + [L,B,H2] by concatenating on
    the feature axis and mean-pooling chunks of size (H1+H2)//H2 down to H2
    features — the reference's split(9) over 32+4 features
    (reference lrcn_style.py:83-93). Result feeds LSTM-2, so it has H2."""
    cat = jnp.concatenate([a, b], axis=2)  # [L, B, H1+H2]
    h2 = b.shape[2]
    chunk = max(cat.shape[2] // h2, 1)
    usable = h2 * chunk
    pooled = cat[:, :, :usable].reshape(cat.shape[0], cat.shape[1], h2, chunk)
    return jnp.mean(pooled, axis=3)


class _LRCNBase(nn.Module):
    batch_size: int = 0  # unused; shapes are derived (snapshot hardcoded it)
    timesteps: int = 8
    filt_size: int = 15
    num_iter: int = 50
    exp_name: str = "exp1"
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    hidden_size: int = 32
    embedding_dim: int = 4
    vote: bool = True  # False = last-frame readout (lrcn_style_last_readout)

    @nn.compact
    def __call__(self, x, target=None, criterion=None, testmode: bool = False,
                 deterministic: bool = True):
        e = self.embedding_dim
        hh = self.hidden_size
        xc = common.bcthw_to_bthwc(x)
        conv0 = self.param("conv0_kernel", nn.initializers.normal(stddev=1.0),
                           (7, 7, 7, 3, 3))
        out = jax.nn.leaky_relu(conv3d(xc, conv0))
        conv1_k = self.param("conv1_kernel", pt_init.torch_conv_default, (7, 7, 7, 3, e))
        conv1_b = self.param("conv1_bias", pt_init.torch_conv_bias(3 * 343), (e,))
        out = jax.nn.leaky_relu(conv3d(out, conv1_k, conv1_b))
        out = jax.lax.reduce_window(
            out, 0.0, jax.lax.add, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID") / 8.0

        b, t, h, w_, _ = out.shape
        lstm1 = lstm_params(self, "lstm1", e, hh, num_layers=2, bidirectional=True)
        lstm2 = lstm_params(self, "lstm2", 2 * hh, e, num_layers=2, bidirectional=True)
        feat = h * w_ * e * 2
        fc_kern = self.param("fc1_kernel", pt_init.torch_conv_default, (feat, 1))
        fc_bias = self.param("fc1_bias", pt_init.torch_conv_bias(feat), (1,))

        state1 = state2 = None
        frame_logits = []
        for ti in range(t):
            seq = out[:, ti].reshape(b, h * w_, e).transpose(1, 0, 2)  # [HW,B,E]
            out1, state1 = lstm_apply(lstm1, seq, state1)
            if state2 is None:
                out2, state2 = lstm_apply(lstm2, out1)
            else:
                h_f = _chunked_mean_fuse(state1[0], state2[0])
                c_f = _chunked_mean_fuse(state1[1], state2[1])
                out2, state2 = lstm_apply(lstm2, out1, (h_f, c_f))
            flat = out2.transpose(1, 0, 2).reshape(b, -1)
            frame_logits.append(dense(flat, fc_kern, fc_bias).reshape(-1))  # [B]
        logits = jnp.stack(frame_logits, axis=1)  # [B, T]

        if self.vote:
            clip_logit = logits[:, -1:]  # standard-contract scalar readout
        else:
            clip_logit = logits[:, -1:]

        if criterion is not None:
            probs = jax.nn.sigmoid(logits)
            frame_losses = jnp.stack(
                [criterion(probs[:, i], target) for i in range(t)])
            if self.vote:
                votes = jnp.sum(probs > 0.5, axis=1) > (t / 2)
                outputs = jnp.where(votes, 0.7, 0.2)
            else:
                outputs = probs[:, -1]
            return outputs, jnp.ones((1,), logits.dtype), frame_losses.mean()
        return clip_logit, jnp.ones((1,), logits.dtype)


class LRCNStyle(_LRCNBase):
    vote: bool = True


class LRCNStyleLast(_LRCNBase):
    vote: bool = False
