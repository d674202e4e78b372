"""Mixed-precision policy guards: dtype='bfloat16' must keep outputs f32 and
stay numerically close to the f32 parity path on the same params — the fast
path reroutes only the MXU inputs; state/BN/loss stay f32 (a pure-bf16 carry
breaks training; BASELINE.md precision study)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _x(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("name", ["InT", "hgru", "gru"])
def test_recurrent_mixed_close_to_f32(name):
    from pathtracker_tpu.models.registry import model_selector

    kw = dict(timesteps=4, dimensions=8, fb_kernel_size=3)
    m32 = model_selector(name, **kw)
    mbf = model_selector(name, **kw, dtype="bfloat16")
    x = _x((2, 3, 4, 12, 12))
    v = m32.init(jax.random.key(0), x)
    l32, _ = m32.apply(v, x)
    lbf, _ = mbf.apply(v, x)
    assert lbf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(l32), np.asarray(lbf), atol=0.05)


def test_video_resnet_mixed_close_to_f32():
    from pathtracker_tpu.models.video_resnet import build

    x = _x((2, 3, 8, 32, 32))
    m32 = build("r3d", timesteps=8)
    v = m32.init(jax.random.key(0), x)
    mbf = build("r3d", timesteps=8, dtype="bfloat16")
    l32 = m32.apply(v, x)
    lbf = mbf.apply(v, x)
    assert lbf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(l32), np.asarray(lbf), atol=0.08)


def test_mixed_train_step_grads_are_f32_masters():
    """Gradients (and thus Adam masters) must come back f32 under the mixed
    policy — casting params to bf16 inside the model must not demote them."""
    from pathtracker_tpu.models.int_circuit import InT

    model = InT(dimensions=8, timesteps=3, kernel_size=3, dtype="bfloat16")
    x = _x((2, 3, 3, 12, 12))
    params = model.init(jax.random.key(0), x)["params"]

    def loss(p):
        logit, _ = model.apply({"params": p}, x)
        return jnp.mean(jax.nn.sigmoid(logit))

    grads = jax.grad(loss)(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert g.dtype == jnp.float32, jax.tree_util.keystr(path)
