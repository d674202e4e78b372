"""ConvLSTM with frozen Gabor stem, RBP option, and Jacobian penalty —
reference models/convlstm.py.

The reference iterates the cell `timesteps` times on a SINGLE static input
(a [B,1,H,W] image through a frozen Gabor conv0 + x^2, reference
convlstm.py:104-119), i.e. it is a fixed-point recurrent network, not a
video model. Cell (reference :84-90): 4 gates, each Wx*(x) (with bias) +
Wh*(h) (no bias), peepholes disabled.

grad_method:
  'bptt' — differentiate through the full unroll (lax.scan);
  'rbp'  — unroll T-1 steps without gradient (lax.stop_gradient) and take
           one differentiable step wrapped in the Neumann RBP custom-vjp
           (reference :124-135), O(1) memory in T.

The Jacobian penalty is the reference's (J^T 1 - 0.9)^+^2 on both h and c of
the last step (reference :154-163), computed with jax.vjp.

Contract: __call__(x [B,1,H,W], target=None, criterion=None, testmode=False)
  -> (output [B,2,H,W], jv_penalty)            (standard, criterion=None)
  -> (output, jv_penalty, loss)                (legacy, criterion given)
plus a `video` classmethod adapter is not provided — the reference never
wired this model to the clip pipeline either (SURVEY.md §1, legacy contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.gabor import gabor_bank
from pathtracker_tpu.ops.layers import batch_norm, conv2d, dense, scan_unroll
from pathtracker_tpu.ops.penalty import jacobian_penalty
from pathtracker_tpu.ops.rbp import neumann_rbp


def _lstm_step(aux, state):
    """Pure ConvLSTM cell step (reference convlstm.py:84-90). aux carries the
    recurrent kernels and the precomputed input-side gate maps; pure so it can
    cross the RBP custom_vjp boundary."""
    gates, xi, xf, xg, xo = aux
    h, cstate = state
    i_t = jax.nn.sigmoid(xi + conv2d(h, gates["Whi"]))
    f_t = jax.nn.sigmoid(xf + conv2d(h, gates["Whf"]))
    c_t = f_t * cstate + i_t * jnp.tanh(xg + conv2d(h, gates["Whc"]))
    o_t = jax.nn.sigmoid(xo + conv2d(h, gates["Who"]))
    h_t = o_t * jnp.tanh(c_t)
    return h_t, c_t


class ConvLSTM(nn.Module):
    timesteps: int = 8
    filt_size: int = 15
    num_iter: int = 50  # RBP truncation depth (reference convlstm.py:134)
    exp_name: str = "exp1"
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    hidden: int = 25

    @nn.compact
    def __call__(self, x, target=None, criterion=None, testmode: bool = False):
        c = self.hidden
        k = self.filt_size
        fan_x = c * k * k

        # Gabor stem: a TRAINABLE parameter initialized to the exact
        # gabor_serre bank — the reference loads the asset into conv0 and
        # never freezes it (reference convlstm.py:104-106; conv0 sits in
        # the optimizer), so reference-trained checkpoints carry a drifted
        # stem and import must restore it (tests/test_torch_import.py).
        in_ch = x.shape[1]
        gab = self.param(
            "conv0_kernel",
            lambda _k, _s: jnp.asarray(
                gabor_bank(n_filters=c, size=7, in_channels=in_ch)),
            (7, 7, in_ch, c))
        conv0_bias = self.param("conv0_bias", pt_init.torch_conv_bias(in_ch * 49),
                                (c,))
        xc = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        feat = jnp.square(conv2d(xc, gab, conv0_bias))  # conv0 + x^2 (:118-119)

        gates = {}
        for g in ("i", "f", "c", "o"):
            gates[f"Wx{g}"] = self.param(f"Wx{g}_kernel", pt_init.torch_conv_default,
                                         (k, k, c, c))
            gates[f"bx{g}"] = self.param(f"Wx{g}_bias", pt_init.torch_conv_bias(fan_x),
                                         (c,))
            gates[f"Wh{g}"] = self.param(f"Wh{g}_kernel", pt_init.torch_conv_default,
                                         (k, k, c, c))

        bn_scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bn_bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        out_kernel = self.param("conv6_kernel",
                                nn.initializers.xavier_normal(in_axis=0, out_axis=1),
                                (c, 2))
        out_bias = self.param("conv6_bias",
                              pt_init.constant(float(jnp.log((1 - 0.01) / 0.01))), (2,))

        # Precompute the input-side gate convs once — the input is static.
        xi = conv2d(feat, gates["Wxi"]) + gates["bxi"]
        xf = conv2d(feat, gates["Wxf"]) + gates["bxf"]
        xg = conv2d(feat, gates["Wxc"]) + gates["bxc"]
        xo = conv2d(feat, gates["Wxo"]) + gates["bxo"]

        aux = (gates, xi, xf, xg, xo)

        def cell(h, cstate):
            return _lstm_step(aux, (h, cstate))

        h = jnp.zeros_like(feat)
        cstate = jnp.zeros_like(feat)
        states = []
        jv = jnp.ones((1,), feat.dtype)

        if "rbp" in self.grad_method:
            def no_grad_unroll(carry, _):
                hh, cc = carry
                hh, cc = cell(hh, cc)
                return (hh, cc), (hh if testmode else None)

            (h, cstate), hs = jax.lax.scan(
                no_grad_unroll, (h, cstate), None, length=self.timesteps - 1)
            h = jax.lax.stop_gradient(h)
            cstate = jax.lax.stop_gradient(cstate)
            if testmode:
                states = [t for t in hs] if hs is not None else []
            h2 = (h, cstate)
            (h, cstate) = neumann_rbp(_lstm_step, aux, h2, self.num_iter)
            if testmode:
                states.append(h)
        else:  # bptt
            def unroll(carry, _):
                hh, cc = carry
                new = cell(hh, cc)
                return new, (new[0] if testmode else None)

            prev = (h, cstate)
            hs_prev = None
            if self.timesteps > 1:
                prev, hs_prev = jax.lax.scan(unroll, prev, None,
                                             length=self.timesteps - 1,
                                             unroll=scan_unroll(self.timesteps - 1))
            (h, cstate), last_h = unroll(prev, None)
            if testmode:
                if hs_prev is not None:
                    states = [t for t in hs_prev]
                states.append(h)
            # The reference computes the penalty on every training step
            # regardless of the flag (reference convlstm.py:154).
            jv_h = jacobian_penalty(lambda hh: cell(hh, prev[1])[0], prev[0])
            jv_c = jacobian_penalty(lambda cc: cell(prev[0], cc)[1], prev[1])
            jv = jnp.reshape(jv_h + jv_c, (1,))

        output = batch_norm(h, bn_scale, bn_bias)
        output = dense(output, out_kernel, out_bias)  # 1x1 conv -> [B,H,W,2]
        output = jnp.transpose(output, (0, 3, 1, 2))  # NCHW out, like torch

        if criterion is not None:
            loss = criterion(output, target)
            if testmode:
                return output, states, loss
            return output, jv, loss
        if testmode:
            return output, states, jv
        return output, jv
