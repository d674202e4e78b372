"""resnet_TSM / torchvision-resnet state_dict <-> models/tsm_resnet.py.

The reference's rntsm keeps torchvision 2-D resnet trunk naming plus the
MotionSqueeze modules (reference models/resnet_TSM.py:233-330,
chnl_reduction :257-261, flow_refinement :180-212, Conv1d head fc1 :269);
the reference also downloaded plain ImageNet resnet weights for the same
trunk (model_urls region, :14-19). Round-trip + logit equivalence, partial
ImageNet-trunk import, and dispatch are pinned here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pathtracker_tpu.models.tsm_resnet import TSMResNet
from pathtracker_tpu.train.torch_import import (
    export_tsm_resnet_state_dict, import_tsm_resnet_state_dict,
    looks_like_tsm_resnet_state_dict)


def _tiny(flow=True):
    model = TSMResNet(layers=(1, 1), block="bottleneck", num_segments=4,
                      flow_estimation=flow)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 16, 16)), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    return model, params, x


def _logit(model, params, x):
    return np.asarray(model.apply({"params": params}, x))


def test_roundtrip_identity_and_logits():
    model, params, x = _tiny()
    sd = export_tsm_resnet_state_dict(params)
    assert looks_like_tsm_resnet_state_dict(sd)
    assert "conv1.weight" in sd and "bn1.weight" in sd
    assert "layer1.0.conv3.weight" in sd and "layer1.0.bn2.bias" in sd
    assert "layer1.0.downsample.0.weight" in sd
    assert "chnl_reduction.0.weight" in sd
    assert "flow_refinement.conv1.0.weight" in sd  # depthwise
    assert "flow_refinement.conv4.4.bias" in sd    # last pw BN
    assert tuple(sd["fc1.weight"].shape)[2:] == (1,)  # Conv1d head
    # Depthwise conv keeps torch's [C, 1, k, k] grouped layout.
    assert tuple(sd["flow_refinement.conv1.0.weight"].shape) == (3, 1, 7, 7)

    back = import_tsm_resnet_state_dict(
        sd, jax.tree.map(jnp.zeros_like, params), strict=True)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))
    np.testing.assert_allclose(_logit(model, back, x),
                               _logit(model, params, x), rtol=1e-6)


def test_imagenet_trunk_partial_import():
    # A bare torchvision-resnet state_dict (trunk only, Linear fc, 1000
    # classes, running stats) fills the trunk and keeps template values for
    # the MotionSqueeze modules and head.
    model, params, x = _tiny()
    sd = export_tsm_resnet_state_dict(params)
    trunk = {k: v for k, v in sd.items()
             if k.startswith(("conv1.", "bn1.", "layer"))}
    trunk["fc.weight"] = torch.zeros((1000, 2048))
    trunk["fc.bias"] = torch.zeros((1000,))
    trunk["bn1.running_mean"] = torch.zeros(64)
    trunk["bn1.running_var"] = torch.ones(64)
    with pytest.raises(ValueError, match="missing"):
        import_tsm_resnet_state_dict(
            trunk, jax.tree.map(jnp.zeros_like, params), strict=True)
    back = import_tsm_resnet_state_dict(
        trunk, jax.tree.map(jnp.zeros_like, params), strict=False)
    np.testing.assert_array_equal(np.asarray(back["stem"]["kernel"]),
                                  np.asarray(params["stem"]["kernel"]))
    assert np.asarray(back["chnl_reduction"]["kernel"]).sum() == 0


def test_transposed_kernel_rejected():
    _, params, _ = _tiny()
    sd = export_tsm_resnet_state_dict(params)
    k = sd["layer1.0.conv2.weight"]  # 3x3 bottleneck conv [O,I,3,3]
    sd["layer1.0.conv2.weight"] = k.permute(2, 1, 0, 3).contiguous()
    with pytest.raises(ValueError, match="cannot map"):
        import_tsm_resnet_state_dict(
            sd, jax.tree.map(jnp.zeros_like, params), strict=True)


def test_load_params_dispatches_tsm(tmp_path):
    from pathtracker_tpu.train.checkpoint import load_params

    model, params, x = _tiny()
    sd = export_tsm_resnet_state_dict(params)
    sd = {f"module.{k}": v for k, v in sd.items()}
    path = str(tmp_path / "tsm.pth.tar")
    torch.save({"state_dict": sd}, path)
    back = load_params(path, template=jax.tree.map(jnp.zeros_like, params))
    np.testing.assert_allclose(_logit(model, back, x),
                               _logit(model, params, x), rtol=1e-6)
