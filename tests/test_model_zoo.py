"""Contract tests across the whole model zoo: every reference --model name
builds, runs forward with the right family contract, and returns finite
logits of shape [B, 1] (reference utils/engine.py:42-72 families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracker_tpu import engine
from pathtracker_tpu.models.registry import family, model_selector

B, T, HW = 2, 8, 32

SMALL = dict(dimensions=8, fb_kernel_size=3)

ALL_NAMES = [
    "InT", "InT_no_inh", "InT_no_mult", "InT_no_add", "InT_mult_add",
    "InT_only_add", "InT_tanh", "fc", "hgru", "hgru_v2", "clock_hgru",
    "clock_hgru_fixed", "gru",
    "ffnet", "timesformer", "performer", "lambda",
    "r3d", "mc3", "r2plus1", "nostride_r3d", "nostride_r3d_cc",
    "nostride_r3d_pos", "nostride_video_cc_small", "rntsm",
    "slowfast", "slowfast_nl",
]


def _sample_input(name):
    rng = np.random.default_rng(0)
    c = 5 if (("_cc" in name) and name != "nostride_video_cc_small") else 3
    return jnp.asarray(rng.standard_normal((B, c, T, HW, HW)).astype(np.float32))


@pytest.mark.parametrize("name", ALL_NAMES)
def test_model_contract(name):
    kwargs = dict(SMALL)
    if name == "ffnet":
        kwargs = {"filt_size": 5}
    elif name in ("slowfast", "slowfast_nl", "rntsm") or name.startswith(
            ("r3d", "mc3", "r2plus1", "nostride")):
        kwargs = {}
    model = model_selector(name, timesteps=T, **kwargs)
    x = _sample_input(name)
    fam = family(name)
    if fam == "slowfast":
        sample = engine.slowfast_pathways(x)
        variables = model.init(jax.random.key(0), sample)
    else:
        variables = model.init(jax.random.key(0), x)

    out = engine.model_step(model, variables, x, name)
    output, jv_penalty = out
    assert output.shape == (B, 1), f"{name}: {output.shape}"
    assert np.isfinite(np.asarray(output)).all()
    assert np.isfinite(np.asarray(jv_penalty)).all()


@pytest.mark.parametrize("name", ["InT", "hgru", "gru"])
def test_recurrent_testmode_contract(name):
    model = model_selector(name, timesteps=T, **SMALL)
    x = _sample_input(name)
    variables = model.init(jax.random.key(0), x)
    output, states, gates = engine.model_step(model, variables, x, name, test=True)
    assert output.shape == (B, 1)
    assert states.shape[:2] == (B, T)
    assert gates.shape[:2] == (B, T)


@pytest.mark.parametrize("name", ["stlstm", "fflstm", "lrcn", "lrcn_last"])
def test_legacy_contract_models(name):
    """The reference's legacy forward family takes the criterion into the
    model (reference FFnet.py:51 etc.); here they run criterion-free and
    return (logit-like [B, 1], jv_penalty)."""
    model = model_selector(name, timesteps=T)
    x = _sample_input(name)
    variables = model.init(jax.random.key(0), x)
    output, jv_penalty = model.apply(variables, x)
    assert output.shape == (B, 1), f"{name}: {output.shape}"
    assert np.isfinite(np.asarray(output)).all()
    assert np.isfinite(np.asarray(jv_penalty)).all()


def _convlstm_image():
    # ConvLSTM is the reference's fixed-point net over a STATIC image
    # (reference convlstm.py:104-119), not a video model.
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((B, 1, HW, HW)).astype(np.float32))


def test_convlstm_contract():
    model = model_selector("convlstm", timesteps=4)
    x = _convlstm_image()
    variables = model.init(jax.random.key(0), x)
    output, jv_penalty = model.apply(variables, x)
    assert output.shape == (B, 2, HW, HW)
    assert np.isfinite(np.asarray(output)).all()
    assert np.isfinite(np.asarray(jv_penalty)).all()


def test_convlstm_rbp_runs():
    """ConvLSTM is the reference's one model_selector-reachable RBP user
    (grad_method='rbp', reference convlstm.py:124-135)."""
    model = model_selector("convlstm", timesteps=4, grad_method="rbp")
    x = _convlstm_image()
    variables = model.init(jax.random.key(0), x)

    def loss(params):
        out, _ = model.apply({"params": params}, x)
        return jnp.mean(out)

    grads = jax.grad(loss)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(v)))
               for v in jax.tree_util.tree_leaves(grads))


def test_tsm_op_semantics():
    from pathtracker_tpu.ops.tsm import tsm

    x = jnp.asarray(np.arange(2 * 4 * 1 * 1 * 8, dtype=np.float32)
                    .reshape(2, 4, 1, 1, 8))
    y = np.asarray(tsm(x))
    # First 1/8 channels shifted forward (frame t takes t+1), last frame zero.
    np.testing.assert_array_equal(y[:, :-1, ..., 0], np.asarray(x)[:, 1:, ..., 0])
    assert (y[:, -1, ..., 0] == 0).all()
    # Second 1/8 shifted backward, first frame zero.
    np.testing.assert_array_equal(y[:, 1:, ..., 1], np.asarray(x)[:, :-1, ..., 1])
    assert (y[:, 0, ..., 1] == 0).all()
    # Remaining channels unshifted.
    np.testing.assert_array_equal(y[..., 2:], np.asarray(x)[..., 2:])


def test_tsm_depth_variants():
    """The reference ships resnet18/34/50/101 TSM builders
    (resnet_TSM.py:448-522); 18/34 use BasicBlock (expansion 1)."""
    from pathtracker_tpu.models.tsm_resnet import resnet18_tsm, resnet101_tsm

    x = jnp.zeros((2, 3, 4, 16, 16), jnp.float32)
    m18 = resnet18_tsm(num_segments=4)
    v = m18.init(jax.random.key(0), x)
    assert m18.apply(v, x).shape == (2, 1)
    # BasicBlock stages end at width 512 (no 4x expansion).
    feat = v["params"]["fc1_kernel"]
    assert feat.shape[0] == 512
    m101 = resnet101_tsm(num_segments=4)
    assert sum(m101.layers) == 33 and m101.block == "bottleneck"


def test_chrono_matches_reference_distribution():
    """ops.initializers.chrono_gate_bias implements the chrono init the
    reference's models/chrono_initialization.py:6-26 describes."""
    from pathtracker_tpu.ops.initializers import chrono_gate_bias

    vals = np.asarray(chrono_gate_bias(64)(jax.random.key(0), (10000,)))
    assert vals.min() >= 0.0
    assert vals.max() <= np.log(63) + 1e-6
    # log U(1, T-1) has mean ~ (T-1)(log(T-1)-1)+1)/(T-2)
    expected = ((63 * (np.log(63) - 1) + 1) / 62)
    np.testing.assert_allclose(vals.mean(), expected, rtol=0.05)
