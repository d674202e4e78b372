"""Generic multi-layer (bi)directional LSTM as lax.scan — torch nn.LSTM
semantics (gate order i,f,g,o; per-layer weight_ih/weight_hh/bias_ih/bias_hh;
init U(-1/sqrt(H), 1/sqrt(H))). Used by the FFLSTM and LRCN baselines
(reference models/fflstm.py:44, lrcn_style.py:36-37).

Layout: seq [T, B, D] (torch's seq-first default). The input projection
x @ W_ih^T for the whole sequence is hoisted out of the scan as one batched
matmul; only the h-recurrence stays sequential.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pathtracker_tpu.ops.layers import dense


def lstm_params(mod, name: str, input_dim: int, hidden: int, num_layers: int,
                bidirectional: bool):
    """Create torch-layout LSTM params on a flax module."""
    from pathtracker_tpu.ops import initializers as pt_init

    bound_init = pt_init.torch_conv_bias(hidden)  # U(+-1/sqrt(H)) for all
    dirs = 2 if bidirectional else 1
    params = []
    for layer in range(num_layers):
        d_in = input_dim if layer == 0 else hidden * dirs
        layer_p = []
        for d in range(dirs):
            sfx = f"{name}_l{layer}" + ("_rev" if d else "")
            layer_p.append({
                "w_ih": mod.param(f"{sfx}_w_ih", bound_init, (d_in, 4 * hidden)),
                "w_hh": mod.param(f"{sfx}_w_hh", bound_init, (hidden, 4 * hidden)),
                "b_ih": mod.param(f"{sfx}_b_ih", bound_init, (4 * hidden,)),
                "b_hh": mod.param(f"{sfx}_b_hh", bound_init, (4 * hidden,)),
            })
        params.append(layer_p)
    return params


def _direction(seq, p, h0, c0, reverse: bool):
    """One direction of one layer. seq [T,B,D] -> (out [T,B,H], hT, cT)."""
    hidden = h0.shape[-1]
    x_proj = dense(seq, p["w_ih"], p["b_ih"] + p["b_hh"])  # hoisted

    def step(carry, xt):
        h, c = carry
        z = xt + dense(h, p["w_hh"])
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c = f * c + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        return (h, c), h

    (hT, cT), out = jax.lax.scan(step, (h0, c0), x_proj, reverse=reverse)
    return out, hT, cT


def lstm_apply(params, seq, state=None):
    """Run the full stack. Returns (out [T,B,H*dirs], (h_n, c_n)) with
    h_n/c_n shaped [num_layers*dirs, B, H] like torch."""
    num_layers = len(params)
    dirs = len(params[0])
    t, b, _ = seq.shape
    hidden = params[0][0]["w_hh"].shape[0]
    if state is None:
        h0 = jnp.zeros((num_layers * dirs, b, hidden), seq.dtype)
        c0 = jnp.zeros_like(h0)
    else:
        h0, c0 = state
    h_out, c_out = [], []
    out = seq
    for layer in range(num_layers):
        outs = []
        for d in range(dirs):
            idx = layer * dirs + d
            o, hT, cT = _direction(out, params[layer][d], h0[idx], c0[idx],
                                   reverse=bool(d))
            outs.append(o)
            h_out.append(hT)
            c_out.append(cT)
        out = jnp.concatenate(outs, axis=-1) if dirs == 2 else outs[0]
    return out, (jnp.stack(h_out), jnp.stack(c_out))
