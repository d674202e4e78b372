"""Golden-tensor parity for the ConvGRU (kys) and hGRU (ffhgru_hierarchy)
cells against independent torch oracles written from the reference equations
(reference models/kys.py:35-48,102-135; models/ffhgru_hierarchy.py:135-173),
mirroring tests/test_int_parity.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, C, T, H, W, K = 2, 6, 4, 10, 10, 3


def _np_params(variables):
    return {k: np.asarray(v) for k, v in variables["params"].items()}


def _convk(p, name, z, bias=None):
    w = torch.from_numpy(p[name]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = torch.from_numpy(p[bias]) if bias else None
    return TF.conv2d(z, w, bias=b, padding=w.shape[-1] // 2)


def _mm(p, name, z):
    kern = torch.from_numpy(p[f"{name}_kernel"])
    bias = torch.from_numpy(p[f"{name}_bias"])
    return torch.einsum("bchw,cd->bdhw", z, kern) + bias[None, :, None, None]


def _target_readout(p, state, target):
    out = torch.einsum("bchw,cd->bdhw", state,
                       torch.from_numpy(p["readout_conv_kernel"]))
    out = out + torch.from_numpy(p["readout_conv_bias"])[None, :, None, None]
    out = torch.cat([out, target[:, None]], 1)
    tk = torch.from_numpy(p["target_conv_kernel"]).permute(3, 2, 0, 1)
    out = TF.conv2d(out, tk, bias=torch.from_numpy(p["target_conv_bias"]),
                    padding=tk.shape[-1] // 2)
    out = out.mean(dim=(2, 3))
    return out @ torch.from_numpy(p["readout_dense_kernel"]) + \
        torch.from_numpy(p["readout_dense_bias"])


def test_convgru_matches_oracle():
    from pathtracker_tpu.models.convgru import GRU

    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, 3, T, H, W)).astype(np.float32)
    model = GRU(dimensions=C, timesteps=T, kernel_size=K)
    variables = model.init(jax.random.key(5), jnp.asarray(x))
    p = _np_params(variables)

    logit, states, gates = model.apply(variables, jnp.asarray(x), testmode=True)

    # Torch oracle: conv([input, state]) per reference kys.py:35-48.
    tx = torch.from_numpy(x)
    xbn = TF.softplus(torch.einsum(
        "bcthw,cd->bdthw", tx, torch.from_numpy(p["preproc_kernel"]))
        + torch.from_numpy(p["preproc_bias"])[None, :, None, None, None])
    state = torch.zeros((B, C, H, W))

    def catconv(name, a, b):
        w = torch.from_numpy(p[f"{name}_kernel"]).permute(3, 2, 0, 1)
        bias = torch.from_numpy(p[f"{name}_bias"])
        return TF.conv2d(torch.cat([a, b], 1), w, bias=bias, padding=K // 2)

    for t in range(T):
        inp = xbn[:, :, t]
        reset = torch.sigmoid(catconv("conv_reset", inp, state))
        update = torch.sigmoid(catconv("conv_update", inp, state))
        cand = torch.tanh(catconv("conv_state_new", inp, reset * state))
        state = (1 - update) * state + update * cand
    tlogit = _target_readout(p, state, tx[:, 2, 0])

    np.testing.assert_allclose(np.asarray(logit), tlogit.numpy(),
                               atol=1e-3, rtol=5e-3)


def test_hgru_matches_oracle():
    from pathtracker_tpu.models.hgru import FFhGRU

    rng = np.random.default_rng(4)
    x = rng.standard_normal((B, 3, T, H, W)).astype(np.float32)
    model = FFhGRU(dimensions=C, timesteps=T, kernel_size=K)
    variables = model.init(jax.random.key(6), jnp.asarray(x))
    p = _np_params(variables)

    logit, states, gates = model.apply(variables, jnp.asarray(x), testmode=True)

    def bn(idx, z):
        scale = torch.from_numpy(p[f"bn{idx}_scale"])
        bias = torch.from_numpy(p[f"bn{idx}_bias"])
        mean = z.mean(dim=(0, 2, 3))
        var = z.var(dim=(0, 2, 3), unbiased=False)
        return (z - mean[None, :, None, None]) \
            / torch.sqrt(var + 1e-3)[None, :, None, None] \
            * scale[None, :, None, None] + bias[None, :, None, None]

    def sc(name):
        return torch.from_numpy(p[name])[None, :, None, None]

    tx = torch.from_numpy(x)
    xbn = TF.softplus(torch.einsum(
        "bcthw,cd->bdthw", tx, torch.from_numpy(p["preproc_kernel"]))
        + torch.from_numpy(p["preproc_bias"])[None, :, None, None, None])
    exc = torch.zeros((B, C, H, W))
    inh = torch.zeros_like(exc)
    for t in range(T):
        inp = xbn[:, :, t]
        att = torch.sigmoid(_mm(p, "a_w_gate", inp) + _mm(p, "a_u_gate", exc))
        gated_exc = att * exc
        gated_inh = att  # the hGRU quirk (reference ffhgru_hierarchy.py:147)
        inh_intx = bn(0, _convk(p, "w_inh", gated_exc))
        inh_hat = TF.softplus(inp - TF.softplus(
            inh_intx * (sc("alpha") * gated_inh + sc("mu"))))
        g_i = torch.sigmoid(_mm(p, "i_w_gate", inp) + _mm(p, "i_u_gate", gated_inh))
        new_inh = (1 - g_i) * inh + g_i * inh_hat
        g_e = torch.sigmoid(_mm(p, "e_w_gate", gated_inh)
                            + _mm(p, "e_u_gate", gated_exc))
        exc_intx = bn(1, _convk(p, "w_exc", new_inh))
        exc_hat = TF.softplus(exc_intx * (sc("kappa") * new_inh + sc("gamma")))
        exc = (1 - g_e) * exc + g_e * exc_hat
        inh = new_inh
    tlogit = _target_readout(p, exc, tx[:, 2, 0])

    np.testing.assert_allclose(np.asarray(logit), tlogit.numpy(),
                               atol=1e-3, rtol=5e-3)
