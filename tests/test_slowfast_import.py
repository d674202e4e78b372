"""FAIR pyslowfast state_dict <-> models/slowfast.py params migration.

The reference's trained slowfast/slowfast_nl checkpoints are state_dicts of
FAIR's SlowFast (reference models/slowfast_utils.py:13); the importer must
map that naming onto this framework's params so such artifacts load through
the normal --ckpt path. Tested by round-trip (export to FAIR names ->
import -> identical leaves and identical logits), by checking the exported
key set matches the documented FAIR schema, and by a transposed-kernel
negative control.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pathtracker_tpu.models.slowfast import SlowFast
from pathtracker_tpu.train.torch_import import (
    export_slowfast_state_dict, import_slowfast_state_dict,
    looks_like_slowfast_state_dict)


def _tiny(nl=False):
    # stage_blocks=(1,1) -> res2/res3 only; the nl variant attaches a
    # non-local block after slow res2 block 0.
    model = SlowFast(width=16, stage_blocks=(1, 1), stage_strides=(1, 2),
                     nonlocal_slow=((0,), ()) if nl else ((), ()))
    rng = np.random.default_rng(0)
    fast = jnp.asarray(rng.standard_normal((2, 3, 8, 16, 16)), jnp.float32)
    slow = fast[:, :, ::4]
    params = model.init(jax.random.key(0), [slow, fast])["params"]
    return model, params, [slow, fast]


def _logit(model, params, pathways):
    return np.asarray(model.apply({"params": params}, pathways))


def test_roundtrip_identity_and_logits():
    model, params, pathways = _tiny()
    sd = export_slowfast_state_dict(params)
    assert looks_like_slowfast_state_dict(sd)
    # Exported names follow the FAIR schema.
    assert "s1.pathway0_stem.conv.weight" in sd
    assert "s1.pathway1_stem.conv.weight" in sd
    assert "s1_fuse.conv_f2s.weight" in sd
    assert "s2.pathway0_res0.branch2.a.weight" in sd
    assert "s2.pathway0_res0.branch1.weight" in sd  # projection exists
    assert "s2.pathway1_res0.branch2.b_bn.weight" in sd
    assert "head.projection.weight" in sd
    # FAIR layout: conv weights are OITHW.
    k = sd["s1.pathway1_stem.conv.weight"]
    assert tuple(k.shape)[2:] == (5, 7, 7)  # fast stem (5,7,7)

    zero = jax.tree.map(jnp.zeros_like, params)
    back = import_slowfast_state_dict(sd, zero, strict=True)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))
    np.testing.assert_allclose(_logit(model, back, pathways),
                               _logit(model, params, pathways), rtol=1e-6)


def test_nonlocal_blocks_roundtrip():
    model, params, pathways = _tiny(nl=True)
    sd = export_slowfast_state_dict(params)
    assert "s2.pathway0_nonlocal0.conv_theta.weight" in sd
    assert "s2.pathway0_nonlocal0.bn.weight" in sd
    back = import_slowfast_state_dict(
        sd, jax.tree.map(jnp.zeros_like, params), strict=True)
    np.testing.assert_allclose(_logit(model, back, pathways),
                               _logit(model, params, pathways), rtol=1e-6)


def test_dataparallel_prefix_and_running_stats_dropped():
    _, params, _ = _tiny()
    sd = export_slowfast_state_dict(params)
    sd = {f"module.{k}": v for k, v in sd.items()}
    sd["module.s1.pathway0_stem.bn.running_mean"] = torch.zeros(16)
    sd["module.s1.pathway0_stem.bn.num_batches_tracked"] = torch.tensor(7)
    back = import_slowfast_state_dict(
        sd, jax.tree.map(jnp.zeros_like, params), strict=True)
    np.testing.assert_array_equal(np.asarray(back["slow_stem"]["kernel"]),
                                  np.asarray(params["slow_stem"]["kernel"]))


def test_kinetics_head_skipped():
    _, params, _ = _tiny()
    sd = export_slowfast_state_dict(params)
    feat = sd["head.projection.weight"].shape[1]
    sd["head.projection.weight"] = torch.zeros((400, feat))
    sd["head.projection.bias"] = torch.zeros((400,))
    back = import_slowfast_state_dict(
        sd, jax.tree.map(jnp.zeros_like, params), strict=True)
    assert np.asarray(back["head_kernel"]).sum() == 0  # template kept


def test_transposed_kernel_rejected():
    _, params, _ = _tiny()
    sd = export_slowfast_state_dict(params)
    k = sd["s1.pathway1_stem.conv.weight"]
    sd["s1.pathway1_stem.conv.weight"] = k.permute(0, 1, 4, 3, 2).contiguous()
    with pytest.raises(ValueError, match="cannot map"):
        import_slowfast_state_dict(
            sd, jax.tree.map(jnp.zeros_like, params), strict=True)


def test_unknown_keys_rejected():
    _, params, _ = _tiny()
    sd = export_slowfast_state_dict(params)
    sd["s9.mystery.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unmapped"):
        import_slowfast_state_dict(
            sd, jax.tree.map(jnp.zeros_like, params), strict=True)


def test_load_params_dispatches_slowfast(tmp_path):
    from pathtracker_tpu.train.checkpoint import load_params

    model, params, pathways = _tiny()
    sd = export_slowfast_state_dict(params)
    path = str(tmp_path / "sf.pth.tar")
    torch.save({"state_dict": sd}, path)
    back = load_params(path, template=jax.tree.map(jnp.zeros_like, params))
    np.testing.assert_allclose(_logit(model, back, pathways),
                               _logit(model, params, pathways), rtol=1e-6)
