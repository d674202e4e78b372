"""ConvGRU baseline (`--model gru`) — reference models/kys.py.

Standard reset/update ConvGRU on concat([input, state]) (reference
kys.py:35-48), wrapped like InT: 1x1x1 preproc + softplus, zero-init state,
scan over frames, target-conditioned readout (reference kys.py:102-135).
The three KxK convs per step consume the concatenated [input, state] (or
[input, reset*state]) tensor; the input halves of reset/update are hoisted
out of the scan as one big conv over all frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import conv2d, dense, scan_unroll, softplus


class GRU(nn.Module):
    dimensions: int = 64
    timesteps: int = 64
    kernel_size: int = 15
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    remat: bool = True
    # 'bfloat16' = mixed fast path (bf16 MXU inputs, f32 state; see
    # models/int_circuit.py for why the carry must stay f32).
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        c = self.dimensions
        k = self.kernel_size
        mxu = None if jnp.dtype(self.dtype) == jnp.float32 else jnp.dtype(self.dtype)

        def fconv(z, kern, bias=None):
            return conv2d(z, kern, bias, mxu_dtype=mxu)
        pre_kernel = self.param("preproc_kernel", pt_init.torch_conv_default, (3, c))
        pre_bias = self.param("preproc_bias", pt_init.torch_conv_bias(3), (c,))
        # torch Conv2d(input+hidden -> hidden): fan_in = 2c*k*k. Kernels split
        # into input/state halves so the input half can be hoisted.
        fan_in = 2 * c * k * k

        def split_conv(name):
            kern = self.param(f"{name}_kernel", pt_init.torch_conv_default,
                              (k, k, 2 * c, c))
            bias = self.param(f"{name}_bias", pt_init.torch_conv_bias(fan_in), (c,))
            return kern[:, :, :c, :], kern[:, :, c:, :], bias

        reset_x, reset_h, reset_b = split_conv("conv_reset")
        update_x, update_h, update_b = split_conv("conv_update")
        cand_x, cand_h, cand_b = split_conv("conv_state_new")
        ro = common.make_readout_params(self, c)

        xc = common.bcthw_to_bthwc(x)
        b, t, h, w_, _ = xc.shape
        xbn = softplus(dense(xc, pre_kernel, pre_bias))  # [B,T,H,W,C]

        # Hoist the input halves of all three convs over the full clip:
        # one conv3d-equivalent pass with T folded into batch.
        flat = xbn.reshape(b * t, h, w_, c)
        rx = fconv(flat, reset_x).reshape(b, t, h, w_, c)
        ux = fconv(flat, update_x).reshape(b, t, h, w_, c)
        cx = fconv(flat, cand_x).reshape(b, t, h, w_, c)

        def to_tb(z):
            z = jnp.transpose(z, (1, 0, 2, 3, 4))
            return z.astype(mxu) if mxu is not None else z

        xs = (to_tb(rx), to_tb(ux), to_tb(cx))

        def step(state, xt):
            rx_t, ux_t, cx_t = xt
            reset = jax.nn.sigmoid(rx_t + fconv(state, reset_h) + reset_b)
            update = jax.nn.sigmoid(ux_t + fconv(state, update_h) + update_b)
            cand = jnp.tanh(cx_t + fconv(reset * state, cand_h) + cand_b)
            new_state = (1.0 - update) * state + update * cand
            ys = (new_state, reset) if testmode else None
            return new_state, ys

        if self.remat:
            step = jax.checkpoint(step)
        zeros = jnp.zeros((b, h, w_, c), xbn.dtype)
        state, ys = jax.lax.scan(step, zeros, xs,
                                 unroll=scan_unroll(self.timesteps))

        logit = common.target_readout(ro, state, xc[:, 0, :, :, 2])
        if testmode:
            states_seq, resets = ys
            states = common.readout_state_map(ro, states_seq)
            states = jnp.transpose(states, (1, 0, 4, 2, 3))
            gates = jnp.transpose(resets, (1, 0, 4, 2, 3))
            return logit, states, gates
        return logit, jnp.ones((1,), xbn.dtype)
