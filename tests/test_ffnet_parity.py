"""Golden parity for the FFnet feedforward 3D-conv baseline against a torch
oracle written from the reference equations (reference models/FFnet.py:51-92:
conv0+BN0, six convK+BN+ReLU blocks, 1x1 conv to 2ch, flatten CTHW,
Linear->2). BN is torch BatchNorm3d at train-time batch statistics with the
default eps=1e-5 (FFnet.py:15)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, T, H, W = 2, 4, 8, 8
WIDTH, K = 6, 3


def _bn3d(z, scale, bias, eps=1e-5):
    mean = z.mean(dim=(0, 2, 3, 4), keepdim=True)
    var = z.var(dim=(0, 2, 3, 4), unbiased=False, keepdim=True)
    zhat = (z - mean) / torch.sqrt(var + eps)
    return zhat * scale[None, :, None, None, None] + bias[None, :, None, None, None]


def _torch_oracle(p, x):
    z = torch.from_numpy(x)  # [B,3,T,H,W]

    def conv(z, name, k, bias=True):
        w = torch.from_numpy(p[f"{name}_kernel"]).permute(4, 3, 0, 1, 2)
        b = torch.from_numpy(p[f"{name}_bias"]) if bias else None
        return TF.conv3d(z, w, bias=b, padding=k // 2)

    out = conv(z, "conv0", 7, bias=False)
    out = _bn3d(out, torch.from_numpy(p["bn0_scale"]),
                torch.from_numpy(p["bn0_bias"]))
    for i in range(1, 7):
        out = conv(out, f"conv{i}", K)
        out = _bn3d(out, torch.from_numpy(p[f"bn{i}_scale"]),
                    torch.from_numpy(p[f"bn{i}_bias"]))
        out = TF.relu(out)
    # 1x1x1 conv to 2 channels (stored as a [C,2] dense kernel here)
    w7 = torch.from_numpy(p["conv7_kernel"])  # [C,2]
    b7 = torch.from_numpy(p["conv7_bias"])
    out = torch.einsum("bcthw,cd->bdthw", out, w7) + b7[None, :, None, None, None]
    flat = out.reshape(B, -1)  # CTHW order == torch .view
    fk = torch.from_numpy(p["fc4_kernel"])  # [feat,2]
    fb = torch.from_numpy(p["fc4_bias"])
    return flat @ fk + fb


def test_ffnet_matches_oracle():
    from pathtracker_tpu.models.ffnet import FFConvNet

    model = FFConvNet(filt_size=K, width=WIDTH)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (B, 3, T, H, W)).astype(np.float32)
    variables = model.init(jax.random.key(1), jnp.asarray(x))
    p = {k: np.asarray(v) for k, v in variables["params"].items()}

    out2, _, _ = model.apply(variables, jnp.asarray(x), target=None,
                             criterion=lambda o, t: jnp.float32(0))
    ref = _torch_oracle(p, x).detach().numpy()
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=1e-4, atol=1e-4)

    # the single-logit contract is the exact 2-class log-odds
    logit, _ = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logit)[:, 0], ref[:, 1] - ref[:, 0],
                               rtol=1e-4, atol=1e-4)
