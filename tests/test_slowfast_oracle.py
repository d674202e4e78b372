"""Numeric oracle for the SlowFast network (models/slowfast.py).

An independent PyTorch functional oracle implements the FAIR SlowFast
semantics from the paper/config (arXiv:1812.03982; reference
models/cfgs/slowfast.yaml:10-26): dual stems ((1,7,7) slow / (5,7,7) fast,
stride (1,2,2), k//2 padding), (1,3,3)/(1,2,2)/(0,1,1) max pool, the
fuse-fast-to-slow lateral (conv (fusion_k,1,1), temporal stride alpha,
channel ratio 2, BN+ReLU, concat), bottleneck stages ((t,1,1) -> strided
(1,3,3) -> (1,1,1) x4 + projection shortcut), global average pooling of
both pathways and a linear head. The oracle consumes THIS framework's
parameter tree (transposing THWIO -> torch OITHW), so a transposed kernel,
wrong padding, or wrong BN axis shows up as a logit mismatch — proven by
the negative control. BatchNorm runs on batch statistics on both sides.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from pathtracker_tpu.models.slowfast import SlowFast

ALPHA, BETA_INV, W = 4, 8, 16
B, T, HW = 2, 16, 32
STAGES = (1, 1)  # depth-reduced res2/res3; full R50 depths are config only


def _t(arr):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(arr, np.float32)))


def _conv(x, kern_thwio, stride, relu=True, bn=None):
    w = _t(kern_thwio).permute(4, 3, 0, 1, 2)  # THWIO -> OITHW
    pad = tuple(k // 2 for k in w.shape[2:])
    y = F.conv3d(x, w, stride=stride, padding=pad)
    if bn is not None:
        scale, bias = bn
        y = F.batch_norm(y, None, None, _t(scale), _t(bias), training=True,
                         eps=1e-5)
    return F.relu(y) if relu else y


def _convbn(p, x, stride=(1, 1, 1), relu=True):
    return _conv(x, p["kernel"], stride, relu, (p["bn_scale"], p["bn_bias"]))


def _bottleneck(p, x, temp_k, stride):
    y = _convbn(p["a"], x)
    y = _convbn(p["b"], y, stride=(1, stride, stride))
    y = _convbn(p["c"], y, relu=False)
    if "proj" in p:
        res = _convbn(p["proj"], x, stride=(1, stride, stride), relu=False)
    else:
        res = x
    return F.relu(y + res)


def _oracle(params, slow_np, fast_np):
    slow, fast = _t(slow_np), _t(fast_np)
    slow = _convbn(params["slow_stem"], slow, stride=(1, 2, 2))
    fast = _convbn(params["fast_stem"], fast, stride=(1, 2, 2))
    pool = torch.nn.MaxPool3d((1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))
    slow, fast = pool(slow), pool(fast)

    def fuse(slow, fast, idx):
        lat = _convbn(params[f"fuse{idx}"], fast, stride=(ALPHA, 1, 1))
        return torch.cat([slow, lat], dim=1)

    slow = fuse(slow, fast, 0)
    strides = [1, 2, 2, 2]
    slow_tk = [1, 1, 3, 3]
    for si, nblocks in enumerate(STAGES):
        for bi in range(nblocks):
            slow = _bottleneck(params[f"slow_res{si + 2}_{bi}"], slow,
                               slow_tk[si], strides[si] if bi == 0 else 1)
            fast = _bottleneck(params[f"fast_res{si + 2}_{bi}"], fast,
                               3, strides[si] if bi == 0 else 1)
        if si < len(STAGES) - 1:
            slow = fuse(slow, fast, si + 1)
    feat = torch.cat([slow.mean(dim=(2, 3, 4)), fast.mean(dim=(2, 3, 4))],
                     dim=1)
    return (feat @ _t(params["head_kernel"]) + _t(params["head_bias"])).numpy()


def _build():
    model = SlowFast(alpha=ALPHA, beta_inv=BETA_INV, width=W,
                     stage_blocks=STAGES, num_classes=1, dropout_rate=0.0)
    rng = np.random.default_rng(0)
    slow = rng.standard_normal((B, 3, T // ALPHA, HW, HW)).astype(np.float32)
    fast = rng.standard_normal((B, 3, T, HW, HW)).astype(np.float32)
    params = model.init(jax.random.key(0),
                        [jnp.asarray(slow), jnp.asarray(fast)])["params"]
    return model, params, slow, fast


def test_slowfast_matches_torch_oracle():
    model, params, slow, fast = _build()
    out = np.asarray(model.apply({"params": params},
                                 [jnp.asarray(slow), jnp.asarray(fast)]))
    with torch.no_grad():
        ref = _oracle(params, slow, fast)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-4)

    # Negative control: transpose the fuse conv kernel's channel axes -> the
    # comparison must fail, so the oracle has teeth. zero-init c-branch BNs
    # mean a trunk perturbation alone can vanish; the fuse conv feeds the
    # slow trunk directly.
    bad = {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()}
    k0 = np.asarray(bad["fuse0"]["kernel"])  # [7,1,1,I,O] with I == O ratio
    bad["fuse0"] = dict(bad["fuse0"])
    bad["fuse0"]["kernel"] = np.ascontiguousarray(k0[::-1])  # flip temporal
    out_bad = np.asarray(model.apply({"params": bad},
                                     [jnp.asarray(slow), jnp.asarray(fast)]))
    with torch.no_grad():
        ref_good = _oracle(params, slow, fast)
    assert np.abs(out_bad - ref_good).max() > 1e-3


def test_slowfast_nl_applies_nonlocal():
    """slowfast_nl must actually insert non-local blocks (the reference's
    slowfast_nl() forgot to merge its cfg, reference slowfast_utils.py:8-9;
    here the nl config is real)."""
    model = SlowFast(alpha=ALPHA, beta_inv=BETA_INV, width=W,
                     stage_blocks=(2, 2), num_classes=1, dropout_rate=0.0,
                     fusion_kernel=5, nonlocal_slow=((), (1,), (), ()))
    rng = np.random.default_rng(1)
    slow = jnp.asarray(rng.standard_normal((1, 3, T // ALPHA, HW, HW)),
                       jnp.float32)
    fast = jnp.asarray(rng.standard_normal((1, 3, T, HW, HW)), jnp.float32)
    params = model.init(jax.random.key(0), [slow, fast])["params"]
    assert "nl_res3_1" in params, sorted(params)[:8]
