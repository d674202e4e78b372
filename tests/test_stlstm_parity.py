"""Golden parity of the SpatioTemporalLSTMCell against a torch oracle built
from the reference equations (reference models/SpatioTemporalLSTMCell.py:
conv_x->7, conv_h->4, conv_m->3 with per-branch LayerNorm, dual memories,
o-gate over cat(c,m), forget bias 1.0)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pathtracker_tpu.models.stlstm import SpatioTemporalLSTMCell  # noqa: E402

B, C, H, W, K = 2, 5, 8, 8, 3


def _t(p, name):
    return torch.from_numpy(np.asarray(p[name]))


def _conv(p, name, z):  # HWIO -> OIHW, NHWC input given as NCHW torch
    w = _t(p, f"{name}_kernel").permute(3, 2, 0, 1)
    b = _t(p, f"{name}_bias")
    return TF.conv2d(z, w, bias=b, padding=K // 2)


def _ln(p, name, z):
    # Our affine is [H, W, C]; torch layout is [C, H, W].
    scale = _t(p, f"{name}_scale").permute(2, 0, 1)
    bias = _t(p, f"{name}_bias").permute(2, 0, 1)
    mean = z.mean(dim=(1, 2, 3), keepdim=True)
    var = z.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
    return (z - mean) / torch.sqrt(var + 1e-5) * scale[None] + bias[None]


def test_stlstm_cell_matches_oracle():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    h0 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    c0 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    m0 = rng.standard_normal((B, H, W, C)).astype(np.float32)

    cell = SpatioTemporalLSTMCell(in_channel=C, num_hidden=C, filter_size=K)
    variables = cell.init(jax.random.key(3), jnp.asarray(x), jnp.asarray(h0),
                          jnp.asarray(c0), jnp.asarray(m0))
    h1, c1, m1 = cell.apply(variables, jnp.asarray(x), jnp.asarray(h0),
                            jnp.asarray(c0), jnp.asarray(m0))

    p = {k: np.asarray(v) for k, v in variables["params"].items()}
    nchw = lambda a: torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    tx, th, tc, tm = nchw(x), nchw(h0), nchw(c0), nchw(m0)

    x_cat = _ln(p, "conv_x_ln", _conv(p, "conv_x", tx))
    h_cat = _ln(p, "conv_h_ln", _conv(p, "conv_h", th))
    m_cat = _ln(p, "conv_m_ln", _conv(p, "conv_m", tm))
    i_x, f_x, g_x, i_xp, f_xp, g_xp, o_x = torch.split(x_cat, C, dim=1)
    i_h, f_h, g_h, o_h = torch.split(h_cat, C, dim=1)
    i_m, f_m, g_m = torch.split(m_cat, C, dim=1)

    i_t = torch.sigmoid(i_x + i_h)
    f_t = torch.sigmoid(f_x + f_h + 1.0)
    g_t = torch.tanh(g_x + g_h)
    c_new = f_t * tc + i_t * g_t
    i_tp = torch.sigmoid(i_xp + i_m)
    f_tp = torch.sigmoid(f_xp + f_m + 1.0)
    g_tp = torch.tanh(g_xp + g_m)
    m_new = f_tp * tm + i_tp * g_tp
    mem = torch.cat([c_new, m_new], dim=1)
    o_conv = _ln(p, "conv_o_ln", _conv(p, "conv_o", mem))
    o_t = torch.sigmoid(o_x + o_h + o_conv)
    last = torch.einsum("bchw,cd->bdhw", mem, _t(p, "conv_last_kernel")) \
        + _t(p, "conv_last_bias")[None, :, None, None]
    h_new = o_t * torch.tanh(last)

    to_nhwc = lambda z: np.transpose(z.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(h1), to_nhwc(h_new), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), to_nhwc(c_new), atol=2e-5)
    np.testing.assert_allclose(np.asarray(m1), to_nhwc(m_new), atol=2e-5)
