"""Torch oracle for the TSM-ResNet bottleneck (models/tsm_resnet.py).

The reference's own forward is unrunnable (live pdb + returns its input,
reference resnet_TSM.py:428,:445), so the oracle is an independent PyTorch
functional implementation of the documented block (reference
resnet_TSM.py:106-143): temporal shift (1/8 fwd, 1/8 bwd, zero-pad) on the
block input, then 1x1 -> 3x3 -> 1x1 conv-BN bottleneck with ReLUs and a
projection shortcut from the UNSHIFTED input, all stride 1 (the reference
keeps full resolution for 32x32 clips). Weights are shared from this
framework's params (HWIO -> torch OIHW), so conv layout, BN axis/eps, and
the shift wiring are all pinned; a shift-direction flip is the negative
control.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from pathtracker_tpu.models.tsm_resnet import _TSMBottleneck

B, T, H, W, C, PLANES = 2, 4, 8, 8, 8, 4  # cout 16 != cin 8 -> projection shortcut


def _t(a):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))


def _shift_torch(x, flip=False):
    # x: [B, T, C, H, W]; reference tsm_util.py:4-22, zero-pad version.
    c = x.shape[2]
    s = c // 8
    pre, post, peri = x[:, :, :s], x[:, :, s:2 * s], x[:, :, 2 * s:]
    if flip:
        pre, post = post, pre
    pre = torch.cat([pre[:, 1:], torch.zeros_like(pre[:, :1])], dim=1)
    post = torch.cat([torch.zeros_like(post[:, :1]), post[:, :-1]], dim=1)
    return torch.cat([pre, post, peri], dim=2)


def _convbn(p, x, relu=True):
    w = _t(p["kernel"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    y = F.conv2d(x, w, padding=w.shape[-1] // 2)
    y = F.batch_norm(y, None, None, _t(p["bn_scale"]), _t(p["bn_bias"]),
                     training=True, eps=1e-5)
    return F.relu(y) if relu else y


def _oracle(params, x_np, flip_shift=False):
    x = _t(x_np).permute(0, 1, 4, 2, 3)  # BTHWC -> BTCHW
    shifted = _shift_torch(x, flip=flip_shift)
    flat = shifted.reshape(B * T, C, H, W)
    y = _convbn(params["conv1"], flat)
    y = _convbn(params["conv2"], y)
    y = _convbn(params["conv3"], y, relu=False)
    res = _convbn(params["down"], x.reshape(B * T, C, H, W), relu=False)
    out = F.relu(y + res)
    return out.reshape(B, T, PLANES * 4, H, W).permute(0, 1, 3, 4, 2).numpy()


def test_tsm_bottleneck_matches_torch_oracle():
    block = _TSMBottleneck(cin=C, planes=PLANES)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, H, W, C)).astype(np.float32)
    params = block.init(jax.random.key(0), jnp.asarray(x))["params"]
    out = np.asarray(block.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        ref = _oracle(params, x)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # Negative control: flipping the shift direction must break parity.
    with torch.no_grad():
        ref_flipped = _oracle(params, x, flip_shift=True)
    assert np.abs(out - ref_flipped).max() > 1e-3


def test_remat_trunk_matches_plain_value_and_grad():
    """remat=True must be numerically invisible: same logits, same grads —
    it only changes WHAT the backward stores (block inputs vs every
    activation). Tiny full trunk so the remat wrapping crosses the
    MotionSqueeze insertion point after layer2."""
    from pathtracker_tpu.models.tsm_resnet import TSMResNet

    kw = dict(layers=(1, 1, 1, 1), patch=5, flow_estimation=True,
              num_classes=1)
    plain = TSMResNet(remat=False, **kw)
    rem = TSMResNet(remat=True, **kw)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 8, 8)).astype(np.float32))
    params = plain.init(jax.random.key(0), x)["params"]
    # remat wrapping must not change the param tree (same names/shapes).
    params_r = rem.init(jax.random.key(0), x)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_r)

    def loss(model, p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(rem, p))(params)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
