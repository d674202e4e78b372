"""Fused Pallas InT cell (ops/int_fused.py) == pure-XLA step, value + grad.

Runs the Pallas kernels in interpreter mode on CPU. Both paths use the
mixed-precision policy (bf16 MXU inputs, f32 accumulation/state), so
agreement is tight; gradients cover the hand-derived backward kernels
(including the block-diagonal weight grads and the BN-stat cotangents that
flow back through XLA's stats computation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracker_tpu.models.int_circuit import InT

B, C, T, HW, K = 4, 32, 5, 16, 5


def _build(fused):
    model = InT(dimensions=C, timesteps=T, kernel_size=K, dtype="bfloat16",
                fused=fused)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 3, T, HW, HW)), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    return model, params, x


def test_fused_forward_matches_unfused():
    m0, params, x = _build(False)
    m1, _, _ = _build(True)
    ref, _ = m0.apply({"params": params}, x)
    out, _ = m1.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_gradients_match_unfused():
    m0, params, x = _build(False)
    m1, _, _ = _build(True)

    def loss(m):
        def f(p):
            logit, _ = m.apply({"params": p}, x)
            return jnp.sum(jnp.square(logit))
        return f

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-3)
        # atol 6e-3 on the normalized grads: the two paths round their bf16
        # cotangents at slightly different points (fused kernels emit bf16
        # once; XLA may carry f32 between fusions), so isolated elements
        # differ by one bf16 ulp of the largest summand.
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=0, atol=6e-3,
            err_msg=jax.tree_util.keystr(ka))


def test_fused_testmode_states_match():
    m0, params, x = _build(False)
    m1, _, _ = _build(True)
    _, s0, g0 = m0.apply({"params": params}, x, testmode=True)
    _, s1, g1 = m1.apply({"params": params}, x, testmode=True)
    # atol 1e-3: the stacked per-step states/gates accumulate one extra bf16
    # round per step on the fused path (kernels emit bf16 once; XLA may keep
    # f32 between fusions), so late-T elements drift by a few bf16 ulps.
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=1e-3)


def test_unsupported_channels_fall_back():
    """C that doesn't divide the 128 lanes silently uses the XLA step."""
    model = InT(dimensions=24, timesteps=3, kernel_size=3, dtype="bfloat16",
                fused=True)
    x = jnp.zeros((2, 3, 3, 8, 8), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    logit, _ = model.apply({"params": params}, x)
    assert logit.shape == (2, 1)


def test_nondivisible_total_falls_back():
    """b*h*w*c not a multiple of 128 (but whose floor-divided row count is
    block-aligned) must fall back to the XLA step, not crash in the packed
    reshape: x of [1,3,2,3,11] gives 2112 elements, 2112 % 128 = 32 yet
    2112 // 128 = 16 which is 8-aligned — the round-2 review repro."""
    model = InT(dimensions=32, timesteps=2, kernel_size=3, dtype="bfloat16",
                fused=True)
    x = jnp.zeros((1, 3, 2, 3, 11), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    logit, _ = model.apply({"params": params}, x)
    assert logit.shape == (1, 1)
