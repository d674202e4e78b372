"""Numeric oracles for the video-resnet family.

The torchvision variants (r3d/mc3/r2plus1) are compared end-to-end against
an independent PyTorch oracle built here from torchvision's documented
video-resnet architecture (Tran et al., arXiv:1711.11248; torchvision
models/video/resnet.py structure, which the reference's forks keep —
reference models/nostridetv.py:19-176): stem (3,7,7)/(1,2,2)/(1,3,3),
BasicBlocks with conv-BN-ReLU/conv-BN + 1x1x1 strided downsample,
Conv2Plus1D with FLOP-matched midplanes, AdaptiveAvgPool + fc. The oracle
uses torchvision's state-dict naming, so importing its weights via
train/torch_import.py must reproduce its logits exactly (torch model in
train() mode: batch-statistics BN, matching this framework's batch-stat
norms). This pins conv layouts, torch-style strided padding, BN axes/eps,
midplanes, downsample wiring, and the fc head — a transposed kernel fails
loudly (negative control below).

The reference's no-stride forks cannot be execution-oracled: as written
their blocks keep stride-2 main paths while the dilated downsample
(reference nostridetv.py:252-254) is stride-1 and unpadded, so the residual
add raises at runtime. Their intended stride-1 semantics are covered by
test_model_zoo.py and the design note in models/video_resnet.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn

from pathtracker_tpu.models.video_resnet import VideoResNet
from pathtracker_tpu.train.torch_import import import_video_resnet_state_dict

B, T, HW = 2, 4, 32
LAYERS = (1, 1, 1, 1)  # depth-reduced on both sides to keep the test fast


def _midplanes(cin, cout):
    return (cin * cout * 3 * 3 * 3) // (cin * 3 * 3 + 3 * cout)


def _conv_builder(kind, cin, cout, stride):
    if kind == "simple":
        return nn.Conv3d(cin, cout, 3, stride=(stride,) * 3, padding=1,
                         bias=False)
    if kind == "no_temporal":
        return nn.Conv3d(cin, cout, (1, 3, 3), stride=(1, stride, stride),
                         padding=(0, 1, 1), bias=False)
    mid = _midplanes(cin, cout)
    return nn.Sequential(
        nn.Conv3d(cin, mid, (1, 3, 3), stride=(1, stride, stride),
                  padding=(0, 1, 1), bias=False),
        nn.BatchNorm3d(mid), nn.ReLU(inplace=True),
        nn.Conv3d(mid, cout, (3, 1, 1), stride=(stride, 1, 1),
                  padding=(1, 0, 0), bias=False))


class _Block(nn.Module):
    def __init__(self, kind, cin, planes, stride):
        super().__init__()
        self.conv1 = nn.Sequential(_conv_builder(kind, cin, planes, stride),
                                   nn.BatchNorm3d(planes), nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(_conv_builder(kind, planes, planes, 1),
                                   nn.BatchNorm3d(planes))
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != planes:
            ds_stride = (stride,) * 3 if kind != "no_temporal" \
                else (1, stride, stride)
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, planes, 1, stride=ds_stride, bias=False),
                nn.BatchNorm3d(planes))

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        res = self.downsample(x) if self.downsample is not None else x
        return self.relu(out + res)


class _TorchVideoResNet(nn.Module):
    """torchvision.models.video.resnet.VideoResNet structure + naming."""

    def __init__(self, kinds, stem):
        super().__init__()
        if stem == "r2plus1":
            self.stem = nn.Sequential(
                nn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2),
                          padding=(0, 3, 3), bias=False),
                nn.BatchNorm3d(45), nn.ReLU(inplace=True),
                nn.Conv3d(45, 64, (3, 1, 1), stride=1, padding=(1, 0, 0),
                          bias=False),
                nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        else:
            self.stem = nn.Sequential(
                nn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2),
                          padding=(1, 3, 3), bias=False),
                nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        widths = [64, 128, 256, 512]
        cin = 64
        for li, (kind, w, n) in enumerate(zip(kinds, widths, LAYERS)):
            blocks = []
            for bi in range(n):
                blocks.append(_Block(kind, cin, w, 2 if li > 0 and bi == 0 else 1))
                cin = w
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(512, 1)

    def forward(self, x):
        x = self.stem(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.mean(dim=(2, 3, 4))
        return self.fc(x)


_KINDS = {
    "r3d": ["simple"] * 4,
    "mc3": ["simple"] + ["no_temporal"] * 3,
    "r2plus1": ["2plus1"] * 4,
}


def _compare(variant):
    torch.manual_seed(0)
    tv = _TorchVideoResNet(_KINDS[variant],
                           "r2plus1" if variant == "r2plus1" else "basic")
    tv.train()  # batch-statistics BN, matching our batch-stat norms

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 3, T, HW, HW)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.from_numpy(x)).numpy()

    model = VideoResNet(variant=variant, num_classes=1, layers=LAYERS)
    template = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = import_video_resnet_state_dict(tv.state_dict(), template)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-4)
    return params, x, ref, model


def test_r3d_matches_torch_oracle():
    params, x, ref, model = _compare("r3d")

    # Negative control: a transposed stem kernel must NOT reproduce the
    # torch logits — proves the comparison has teeth.
    bad = dict(params)
    bad["stem"] = dict(params["stem"])
    bad["stem"]["kernel"] = np.ascontiguousarray(
        np.swapaxes(np.asarray(params["stem"]["kernel"]), 1, 2))
    out_bad = np.asarray(model.apply({"params": bad}, jnp.asarray(x)))
    assert np.abs(out_bad - ref).max() > 1e-3


def test_mc3_matches_torch_oracle():
    _compare("mc3")


def test_r2plus1_matches_torch_oracle():
    _compare("r2plus1")


def test_kinetics_head_is_skipped():
    """A 400-class Kinetics fc must not block the import: the head is kept
    from the template (the reference also replaced it after loading,
    reference utils/engine.py:188-190)."""
    torch.manual_seed(1)
    tv = _TorchVideoResNet(_KINDS["r3d"], "basic")
    tv.fc = nn.Linear(512, 400)
    model = VideoResNet(variant="r3d", num_classes=1, layers=LAYERS)
    x = jnp.zeros((1, 3, 4, HW, HW), jnp.float32)
    template = model.init(jax.random.key(0), x)["params"]
    params = import_video_resnet_state_dict(tv.state_dict(), template)
    assert np.shape(params["fc_kernel"]) == (512, 1)
    np.testing.assert_array_equal(params["fc_kernel"], template["fc_kernel"])
    # trunk weights did import
    assert not np.array_equal(params["stem"]["kernel"],
                              template["stem"]["kernel"])
