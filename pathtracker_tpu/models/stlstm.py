"""PredRNN-style Spatio-Temporal LSTM — reference
models/SpatioTemporalLSTMCell.py + models/ffstlstm.py.

Cell (reference SpatioTemporalLSTMCell.py:30-54): conv_x -> 7 gate maps,
conv_h -> 4, conv_m -> 3 (each followed by LayerNorm over [C,H,W]); dual
memories — temporal c (i,f,g from x,h) and spatiotemporal m (i',f',g' from
x,m) — forget bias 1.0; output gate reads cat(c,m) through conv_o, and
h = o * tanh(conv_last(cat(c,m))).

Stack (reference ffstlstm.py:50-97): 3x (Conv3d k=7 no-bias + ReLU +
MaxPool3d 2) encoder 3->25->10->8, then per encoded frame FOUR layers
sharing ONE cell (reference ffstlstm.py:77-80 reuses self.unit1) and one
memory m threaded through layers and time. Readout from the top h:
batch-stat BN -> AvgPool2d(2) -> flatten -> Linear -> sigmoid.

Deviations from the snapshot, by intent: the reference hardcoded batch 16,
16x16 grids, and a Linear that mixed the whole batch into one vector
(ffstlstm.py:93-94 `view(1,-1)`); here everything is shape-derived and the
readout is per-sample. Contract: standard (logit, jv_penalty) plus the
legacy (output, jv_penalty, loss) when a criterion is passed; the standard
logit is the pre-sigmoid readout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import avg_pool2d, batch_norm, conv2d, conv3d, dense


class SpatioTemporalLSTMCell(nn.Module):
    in_channel: int
    num_hidden: int
    filter_size: int
    layer_norm: bool = True
    forget_bias: float = 1.0

    def _ln(self, name, z):
        """LayerNorm over (H,W,C) per sample with [H,W,C] affine
        (torch nn.LayerNorm([C,H,W]) on NCHW)."""
        if not self.layer_norm:
            return z
        shape = z.shape[1:]
        scale = self.param(f"{name}_scale", nn.initializers.ones, shape)
        bias = self.param(f"{name}_bias", nn.initializers.zeros, shape)
        mean = jnp.mean(z, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(z, axis=(1, 2, 3), keepdims=True)
        return (z - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    @nn.compact
    def __call__(self, x_t, h_t, c_t, m_t):
        ch = self.num_hidden
        k = self.filter_size

        def conv_branch(name, src, n_out, cin):
            kern = self.param(f"{name}_kernel", pt_init.torch_conv_default,
                              (k, k, cin, n_out * ch))
            bias = self.param(f"{name}_bias", pt_init.torch_conv_bias(cin * k * k),
                              (n_out * ch,))
            return self._ln(f"{name}_ln", conv2d(src, kern, bias))

        x_concat = conv_branch("conv_x", x_t, 7, self.in_channel)
        h_concat = conv_branch("conv_h", h_t, 4, ch)
        m_concat = conv_branch("conv_m", m_t, 3, ch)
        i_x, f_x, g_x, i_xp, f_xp, g_xp, o_x = jnp.split(x_concat, 7, axis=-1)
        i_h, f_h, g_h, o_h = jnp.split(h_concat, 4, axis=-1)
        i_m, f_m, g_m = jnp.split(m_concat, 3, axis=-1)

        i_t = jax.nn.sigmoid(i_x + i_h)
        f_t = jax.nn.sigmoid(f_x + f_h + self.forget_bias)
        g_t = jnp.tanh(g_x + g_h)
        c_new = f_t * c_t + i_t * g_t

        i_tp = jax.nn.sigmoid(i_xp + i_m)
        f_tp = jax.nn.sigmoid(f_xp + f_m + self.forget_bias)
        g_tp = jnp.tanh(g_xp + g_m)
        m_new = f_tp * m_t + i_tp * g_tp

        mem = jnp.concatenate([c_new, m_new], axis=-1)
        o_conv = conv_branch("conv_o", mem, 1, ch * 2)
        o_t = jax.nn.sigmoid(o_x + o_h + o_conv)
        last_kern = self.param("conv_last_kernel", pt_init.torch_conv_default,
                               (ch * 2, ch))
        last_bias = self.param("conv_last_bias", pt_init.torch_conv_bias(ch * 2), (ch,))
        h_new = o_t * jnp.tanh(dense(mem, last_kern, last_bias))
        return h_new, c_new, m_new


class FFSTLSTM(nn.Module):
    timesteps: int = 8
    filt_size: int = 15
    num_iter: int = 50
    exp_name: str = "exp1"
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    num_layers: int = 4
    hidden: int = 8

    @nn.compact
    def __call__(self, x, target=None, criterion=None, testmode: bool = False):
        ch = self.hidden
        xc = common.bcthw_to_bthwc(x)  # [B,T,H,W,3]

        def enc(name, z, cin, cout):
            kern = self.param(f"{name}_kernel", pt_init.torch_conv_default,
                              (7, 7, 7, cin, cout))
            z = jax.nn.relu(conv3d(z, kern))
            # MaxPool3d(2,2) over (T,H,W)
            return jax.lax.reduce_window(
                z, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")

        out = enc("conv0", xc, 3, 25)
        out = enc("conv1", out, 25, 10)
        out = enc("conv2", out, 10, ch)
        b, t, h, w_, _ = out.shape

        cell = SpatioTemporalLSTMCell(in_channel=ch, num_hidden=ch,
                                      filter_size=self.filt_size)
        zeros = jnp.zeros((b, h, w_, ch), out.dtype)
        h_t = [zeros] * self.num_layers
        c_t = [zeros] * self.num_layers
        memory = zeros
        # The single shared cell is applied 4x per frame (reference
        # ffstlstm.py:77-80); a Python loop over T keeps flax param reuse
        # simple here — T is already /8 after the 3 temporal pools.
        for ti in range(t):
            y = out[:, ti]
            h_t[0], c_t[0], memory = cell(y, h_t[0], c_t[0], memory)
            for i in range(1, self.num_layers):
                h_t[i], c_t[i], memory = cell(h_t[i - 1], h_t[i], c_t[i], memory)

        top = h_t[self.num_layers - 1]
        bn_scale = self.param("bn_scale", nn.initializers.ones, (ch,))
        bn_bias = self.param("bn_bias", nn.initializers.zeros, (ch,))
        pooled = avg_pool2d(batch_norm(top, bn_scale, bn_bias), 2)
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
